#!/usr/bin/env python
"""Per-primitive in-kernel cost on the chip (Mosaic, (256, 1024) f32 block).

The fused flagger's traced-op census assumed one full-block vector op costs
the same regardless of kind; the parity-fill fast path (2.5x fewer median
ops) moving the needle only ~8% on silicon says otherwise.  This times a
fori_loop chain of each primitive inside ONE Pallas kernel — the marginal
per-step cost isolates the primitive from dispatch/DMA:

  add        x = x + 1.0
  mul        x = x * c
  select     x = where(mask, x + 1.0, x)
  cmp_f32    x = x + (x < c)        (compare + convert, the rank-round body)
  roll_lane  x = pltpu.roll(x, 1, axis=1)
  roll_sub   x = pltpu.roll(x, 1, axis=0)
  shift_ch   x = _shift_channels(x, 1)   (2 rolls + select — the member op)
  reduce     x = x + sum(x, axis=1)      (lane reduction + broadcast add)
  band_mm    x = x + G @ sum(x, axis=1)  (reduce + (R,R)@(R,1) MXU matvec)
"""

import argparse
import functools
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache"))

from katsdpsigproc_tpu.utils import backend as _backend  # noqa: E402

_backend.apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

from katsdpsigproc_tpu.models.rfi import pallas_flagger as pf  # noqa: E402

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: nocover
    pltpu = None


def make_kernel(body, steps: int, unroll: int, rows: int, ww: int, h: int,
                interpret: bool):
    """fori_loop of `steps` trips, each trip = `unroll` interleaved
    (primitive; add) pairs.  The add between primitives breaks
    consecutive-op merging (roll-of-roll folds to one roll) and the
    unrolling amortizes the loop-carry overhead; the pure-add baseline
    (body=None) is subtracted by the caller."""

    def kernel(x_ref, o_ref):
        lane = lax.broadcasted_iota(jnp.int32, (rows, ww), 1)
        mask = lane < (ww // 2)
        g = pf._band_matrix(rows, h)
        env = {"lane": lane, "mask": mask, "g": g, "interpret": interpret}

        def step(_, x):
            for _ in range(unroll):
                if body is not None:
                    x = body(x, env)
                x = x + 1.0
            return x

        o_ref[...] = lax.fori_loop(0, steps, step, x_ref[...])

    @jax.jit
    def run(x):
        kwargs = {}
        if not interpret and pltpu is not None:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, ww), jnp.float32),
            interpret=interpret,
            **kwargs,
        )(x)

    return run


BODIES = {
    "add": lambda x, e: x + 1.0,
    "mul": lambda x, e: x * np.float32(1.0000001),
    "select": lambda x, e: jnp.where(e["mask"], x + 1.0, x),
    "cmp_f32": lambda x, e: x + (x < 0.5).astype(jnp.float32),
    "roll_lane": lambda x, e: pf._roll(x, 1, 1, e["interpret"]),
    "roll_sub": lambda x, e: pf._roll(x, 1, 0, e["interpret"]),
    "shift_ch": lambda x, e: pf._shift_channels(x, 1, e["interpret"], e["lane"]),
    "reduce": lambda x, e: x + jnp.sum(x, axis=1, keepdims=True),
    "band_mm": lambda x, e: x + pf._band_sum(e["g"], jnp.sum(x, axis=1, keepdims=True)),
    "sqrt": lambda x, e: jnp.sqrt(x * x + 1.0) - 1.0,
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--h", type=int, default=32)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--unroll", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--emit-json", action="store_true",
                    help="write the measured table to models/rfi/prim_ns.json "
                         "(consumed by models.rfi.roofline's compute roofline)")
    args = ap.parse_args()

    from katsdpsigproc_tpu.utils.profiling import time_scan

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.uniform(0.25, 0.75, (args.rows, args.width)).astype(np.float32))

    n_ops = args.steps * args.unroll
    base_run = make_kernel(None, args.steps, args.unroll, args.rows, args.width,
                           args.h, args.interpret)
    np.asarray(base_run(x))
    dt_base = time_scan(base_run, (x,), iters=args.iters)
    print(f"{'baseline-add':10s} {dt_base / n_ops * 1e9:8.1f} ns/add  "
          f"({dt_base * 1e3:7.3f} ms per {n_ops}-add chain)", file=sys.stderr)

    results = {}
    for name, body in BODIES.items():
        run = make_kernel(body, args.steps, args.unroll, args.rows, args.width,
                          args.h, args.interpret)
        np.asarray(run(x))  # compile + one execution
        dt = time_scan(run, (x,), iters=args.iters)
        ns = (dt - dt_base) / n_ops * 1e9
        results[name] = ns
        print(f"{name:10s} {ns:8.1f} ns/op  ({dt * 1e3:7.3f} ms per chain)",
              file=sys.stderr)
    base = results.get("add")
    if base and base > 0:
        print("relative to add:", {k: round(v / base, 2) for k, v in results.items()},
              file=sys.stderr)
    if args.emit_json:
        import json

        from katsdpsigproc_tpu.models.rfi import roofline

        # Marginal chain costs can dip ≤0 in noise for near-free ops;
        # floor at 1 ns so the roofline stays finite and honest.
        out = {k: max(1.0, round(v, 1)) for k, v in results.items()}
        with open(roofline._PRIM_JSON, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"wrote {roofline._PRIM_JSON}: {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
