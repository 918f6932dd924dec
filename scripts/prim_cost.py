#!/usr/bin/env python
"""Per-primitive in-kernel cost on the chip (Mosaic, 262144-element f32 block).

Costs are LAYOUT-SENSITIVE — run at the shipped kernel's block aspect
(round 4, fold=8192: ``--rows 32 --width 8192``; the cross-band channel
shift measured 386 ns at (256, 1024) but 133 ns at (32, 8192)).  The
roofline loader consumes whatever aspect was last emitted, so keep
prim_ns.json in step with the shipped fold.

The fused flagger's traced-op census assumed one full-block vector op costs
the same regardless of kind; the parity-fill fast path (2.5x fewer median
ops) moving the needle only ~8% on silicon says otherwise.  This times a
fori_loop chain of each primitive inside ONE Pallas kernel — the marginal
per-rep cost over an empty kernel isolates the primitive from dispatch/DMA.

Foldability is the enemy (round-3/4 lesson), and XLA's algebraic closure
is stronger than it looks.  A chain of ``x + 1.0`` collapses to ``x + N``
once the constant-trip loop unrolls.  A Fibonacci two-carry chain
``(x, y) -> (x + y, x)`` looks unfoldable but is LINEAR, and the
simplifier's reassociation plus ``x + x -> 2*x`` collapse each unrolled
step to two multiplies; ``max(a,b) + min(a,b)`` folds via the identity to
``a + b`` and dies the same way; lane reductions and rolls are linear
too.  Both failure modes measured 0.000 ms on-chip.  Every linear chain
therefore routes through a ``min(., 3.0)`` barrier per rep — nonlinear
(no distributive law through min), uncollapsible, and itself exactly one
add-class VPU op, so the base chain is self-anchoring:

  add        (x, y) -> (min(x, c) + y, x)             2 add-class ops/rep
  minmax     (x, y) -> (min(x, c1) + max(y, c2), x)   3 add-class ops/rep
  mul        (x, y) -> (x * y + 1, x)                 mul (+1 add)
  select     (x, y) -> (where(mask, y, x) + y, x)     select (+1 add)
  cmp_f32    (x, y) -> (x + (y < x), x)               cmp+convert (+1 add)
  roll_lane  (x, y) -> (min(roll(y, 1, lanes), c) + x, x)   roll (+2 add)
  roll_sub   same on the sublane axis
  shift_ch   (x, y) -> (_shift_channels(y) + x, x)    2 rolls + select (+1 add)
  reduce     (x, y) -> (min(x, c) + sum(y, lanes), x) reduction (+2 add)
  band_mm    (x, y) -> (min(x, c) + G @ sum(y, lanes), x)  reduce + MXU
                                                      matvec (+2 add)
  sqrt       (x, y) -> (x + sqrt(y*y + 1), x)         sqrt + mul (+2 adds)

The nonlinear bodies (mul/select/cmp/shift/sqrt) need no barrier — they
measured plausibly on the first run.  The printed per-op ns subtracts the
measured add-class cost times the number of helper ops in the body (noted
above), so each row is the primitive alone.  Rows measuring below the
physical floor (a (256,1024) f32 op touches 256 vregs; < ~30 ns means the
chain folded) are reported but NOT written to prim_ns.json — the roofline
falls back to its modeled default for them.
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

# Implausibly-cheap threshold: a full (256, 1024) f32 block is 256 vregs;
# even at 8 ALU ops/cycle/subcore a sweep is >100 ns.  Below this the
# chain folded and the number is an artifact, not a measurement.
FLOOR_NS = 30.0


def make_kernel(body, steps: int, unroll: int, rows: int, ww: int, h: int,
                interpret: bool):
    """fori_loop of `steps` trips, each trip = `unroll` Fibonacci-carry
    reps of `body`.  body(x, y, env) -> new_x; the old x becomes y.  The
    two-carry dependence makes every rep a fresh expression (see module
    docstring); `body=None` builds the empty kernel whose time (launch +
    block DMA) the caller subtracts."""

    def kernel(x_ref, o_ref):
        lane = lax.broadcasted_iota(jnp.int32, (rows, ww), 1)
        mask = lane < (ww // 2)
        g = pf._band_matrix(rows, h)
        env = {"lane": lane, "mask": mask, "g": g, "h": h, "interpret": interpret}
        x0 = x_ref[...]
        y0 = x0 * np.float32(0.5) + np.float32(0.125)

        def step(_, carry):
            x, y = carry
            for _ in range(unroll):
                x, y = body(x, y, env), x
            return x, y

        if body is None:
            xn, yn = x0, y0
        else:
            xn, yn = lax.fori_loop(0, steps, step, (x0, y0))
        o_ref[...] = xn + yn

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


_C = np.float32(3.0)
_C2 = np.float32(5.0)

# name -> (body, ops_of_interest_per_rep, helper_addclass_per_rep).
# "add-class" = any single-issue elementwise VPU op (add, min, max, or,
# select against a resident mask) — the classes the min-barrier itself
# belongs to, so it anchors its own deduction.
BODIES = {
    "add": (lambda x, y, e: jnp.minimum(x, _C) + y, 2, 0),
    "minmax": (lambda x, y, e: jnp.minimum(x, _C) + jnp.maximum(y, _C2), 3, 0),
    "mul": (lambda x, y, e: x * y + np.float32(1.0), 1, 1),
    "select": (lambda x, y, e: jnp.where(e["mask"], y, x) + y, 1, 1),
    "cmp_f32": (lambda x, y, e: x + (y < x).astype(jnp.float32), 1, 1),
    "roll_lane": (lambda x, y, e: jnp.minimum(pf._roll(y, 1, 1, e["interpret"]), _C) + x,
                  1, 2),
    "roll_sub": (lambda x, y, e: jnp.minimum(pf._roll(y, 1, 0, e["interpret"]), _C) + x,
                 1, 2),
    "shift_ch": (lambda x, y, e: pf._shift_channels(y, 1, e["interpret"], e["lane"],
                                                    e["h"]) + x,
                 1, 1),
    "reduce": (lambda x, y, e: jnp.minimum(x, _C) + jnp.sum(y, axis=1, keepdims=True),
               1, 2),
    # The rank-search round as ONE composite: per-row threshold from the
    # carry → full-block compare+convert → lane reduce → fed back.  This
    # is the serial unit the kernel's 32 rank rounds execute (at h = 1 the
    # band matmul is gone); measuring it whole sidesteps the round-4
    # finding that per-op costs are not additive under ILP (a bare lane
    # reduce nets <= 0 behind add-class ops, yet the round is not free).
    "rank_round": (lambda x, y, e: jnp.minimum(x, _C)
                   + jnp.sum((y < x[:, :1]).astype(jnp.float32), axis=1,
                             keepdims=True),
                   1, 2),
    "band_mm": (lambda x, y, e: jnp.minimum(x, _C)
                + pf._band_sum(e["g"], jnp.sum(y, axis=1, keepdims=True)),
                1, 2),  # reduce + band matvec; charged net of reduce below
    "sqrt": (lambda x, y, e: x + jnp.sqrt(y * y + np.float32(1.0)), 1, 2),
}

# Primitives whose helper ops beyond plain adds must also be netted out:
# name -> list of (other_prim, count)
EXTRA_DEDUCT = {
    "band_mm": [("reduce", 1)],
    "sqrt": [("mul", 1)],
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--h", type=int, default=32)
    # 512 steps x 16 unrolled reps = 8192 reps/chain: ~1-8 ms of chain
    # time per call, an order of magnitude above the remote tunnel's
    # timing jitter.  At the old 32-step default the cheap chains sat at
    # the (tn - t1) resolution floor and read EXACTLY 0.0 on some runs
    # (mul measured 126 ns one run, 0.0 the next, identical HLO).
    ap.add_argument("--steps", type=int, default=512)
    ap.add_argument("--unroll", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--emit-json", action="store_true",
                    help="write the measured table to models/rfi/prim_ns.json "
                         "(consumed by models.rfi.roofline's compute roofline)")
    ap.add_argument("--norm-elems", type=int, default=262144,
                    help="normalize emitted per-op ns to this block element "
                         "count (the roofline convention: 256*1024 f32 "
                         "elements).  Lets the chains run at the SHIPPED "
                         "kernel's exact block aspect even when its element "
                         "count differs — e.g. the (16, 32768) h=1 block is "
                         "2x the convention, so emitted values are halved.")
    args = ap.parse_args()

    from katsdpsigproc_tpu.utils.profiling import time_scan

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.uniform(0.25, 0.75, (args.rows, args.width)).astype(np.float32))

    n_reps = args.steps * args.unroll
    base_run = make_kernel(None, args.steps, args.unroll, args.rows, args.width,
                           args.h, args.interpret)
    np.asarray(base_run(x))
    dt_base = time_scan(base_run, (x,), iters=args.iters)
    print(f"{'empty':10s} {'':>8s}        ({dt_base * 1e3:7.3f} ms launch+IO)",
          file=sys.stderr)

    raw = {}
    for name, (body, n_ops, _) in BODIES.items():
        run = make_kernel(body, args.steps, args.unroll, args.rows, args.width,
                          args.h, args.interpret)
        np.asarray(run(x))  # compile + one execution
        dt = time_scan(run, (x,), iters=args.iters)
        raw[name] = (dt - dt_base) / (n_reps * n_ops) * 1e9

    # Net out helper ops: most bodies carry helper add-class ops, and a
    # few carry another primitive (EXTRA_DEDUCT — applied on the NETTED
    # value, so the other body's own helpers are not deducted twice;
    # BODIES order puts 'mul' and 'reduce' before their dependents).
    add_ns = max(raw.get("add", 0.0), 0.0)
    results = {}
    for name, (_, n_ops, n_helper_adds) in BODIES.items():
        ns = raw[name] - add_ns * n_helper_adds / n_ops
        for other, cnt in EXTRA_DEDUCT.get(name, []):
            ns -= max(results.get(other, 0.0), 0.0) * cnt / n_ops
        results[name] = ns
        tag = "" if ns >= FLOOR_NS else "   [below floor: folded/noise — not emitted]"
        print(f"{name:10s} {ns:8.1f} ns/op  (raw chain {raw[name]:8.1f}){tag}",
              file=sys.stderr)
    if add_ns >= FLOOR_NS:
        print("relative to add:",
              {k: round(v / add_ns, 2) for k, v in results.items()},
              file=sys.stderr)
    if args.emit_json:
        import json

        from katsdpsigproc_tpu.models.rfi import roofline

        scale = args.norm_elems / float(args.rows * args.width)
        out = {k: round(v * scale, 1) for k, v in results.items()
               if v * scale >= FLOOR_NS}
        if scale != 1.0:
            print(f"normalizing per-op ns by {scale:g} "
                  f"({args.rows}x{args.width} block -> {args.norm_elems} elems)",
                  file=sys.stderr)
        dropped = sorted(set(results) - set(out))
        with open(roofline._PRIM_JSON, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"wrote {roofline._PRIM_JSON}: {out}", file=sys.stderr)
        if dropped:
            print(f"dropped (below {FLOOR_NS} ns floor, roofline uses defaults): "
                  f"{dropped}", file=sys.stderr)


if __name__ == "__main__":
    main()
