#!/usr/bin/env python
"""Skeleton kernel: execute EXACTLY the roofline op inventory, nothing else.

The compute roofline (models/rfi/roofline.py) prices the exact flagger's
minimum vector work as Σ count·prim_ns over the op inventory.  Its
denominator is self-graded: the builder chose both the inventory and the
per-primitive costs.  This harness is the independent check the round-4
verdict asked for — a Pallas kernel at the SHIPPED block layout that runs
the inventory op-for-op on dummy data (no masks, no valid-count selects,
no halfway corrections — the floor, not the kernel) through the same DMA
block pipeline, so its measured time can be reconciled against the
model's ``block_ns × n_blocks``:

- skeleton-ms ≈ model-ms  → the floor is priced right; any kernel gap
  above it is real headroom (or real above-floor work).
- skeleton-ms ≫ model-ms  → per-op costs do not compose additively at
  this layout and the floor is too optimistic (fix prim_ns.json).
- skeleton-ms ≪ model-ms  → chains folded or the inventory overcounts.

Inventory mapping (width 13, 4 windows, h = 1 fold — see
roofline.op_inventory):

  amplitude  2 add-class + sqrt
  median     12 shift_ch (= lane rolls at h=1), 2 fill selects,
             the real (13 → ranks 6,7) selection network (61 min/max),
             1 subtract
  rank       32 serially-dependent rank rounds (per-row threshold →
             compare+convert → lane count) + 2 add
  threshold  ladders: 6 shift + 6 add + 4 compares + 1 scale;
             dilation: 6 shift + 6 max
  output     f32 → i32 → u8 cast pair

Usage: python scripts/roofline_skeleton.py [--slab 288] [--bb 16] [--iters 20]
"""

import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from katsdpsigproc_tpu.utils import backend  # noqa: E402

backend.apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from katsdpsigproc_tpu.models.rfi import pallas_flagger as pf, roofline  # noqa: E402
from katsdpsigproc_tpu.ops import rank as rank_ops  # noqa: E402

_C = np.float32(3.0)
_C2 = np.float32(5.0)


def skeleton_block(in_ref, out_ref, *, width: int, interpret: bool):
    half = width // 2
    x = in_ref[...]
    rows, ww = x.shape
    # amplitude: 2 add-class + 1 sqrt
    a = jnp.sqrt(jnp.minimum(x, _C) + x)
    # median: width-1 channel shifts (single rolls at h=1)
    members = [a]
    for d in range(-half, half + 1):
        if d:
            members.append(pf._shift_channels(a, d, interpret, None, 1))
    # 2 edge parity-fill selects (the floor's edge handling allowance)
    lane = lax.broadcasted_iota(jnp.int32, a.shape, 1)
    mask = lane < (ww // 2)
    members[1] = jnp.where(mask, members[1], _C)
    members[2] = jnp.where(mask, members[2], _C2)
    # the REAL two-middle-ranks selection network (61 min/max at width 13)
    rank_ops.apply_selection_network(
        members, rank_ops.selection_network(width, (half, half + 1)))
    dev = members[half] - a  # 1 subtract
    # rank: 32 serial rounds — per-row threshold from the carry, full-block
    # compare+convert, lane count (exactly the measured rank_round unit)
    def round_(i, r):
        c = jnp.sum((dev < r[:, :1]).astype(jnp.float32), axis=1, keepdims=True)
        return c * np.float32(1.0 / 1024.0)  # keep thresholds in-range; (R,1) mul

    r = lax.fori_loop(0, 32, round_, jnp.zeros((rows, 1), jnp.float32))
    # + 2 add-class (halfway-correction allowance)
    s = jnp.minimum(dev, _C) + r
    # threshold ladders: each window 2^k keeps doubling the running sum, so
    # windows 2, 4, 8 add 1 + 2 + 3 = 6 shifted adds total; one compare
    # per window (4 incl. window 1); 1 noise-scale multiply
    flags = (s > r).astype(jnp.float32)  # window 1 compare+convert
    for wlog in (1, 2, 3):
        # each window's ladder restarts from the (clamped) deviations, as
        # the real kernel's does: log2(window) doubling steps per window
        lad = s
        for k in range(wlog):
            lad = lad + pf._shift_channels(lad, 1 << k, interpret, None, 1)
        flags = jnp.maximum(flags, (lad > r * np.float32(1.2)).astype(jnp.float32))
    flags = flags * np.float32(0.5)  # the noise-scale op
    # dilation: 6 shift + 6 max (windows 2, 4, 8 again)
    acc = flags
    for wlog in (1, 2, 3):
        for k in range(wlog):
            acc = jnp.maximum(acc, pf._shift_channels(acc, -(1 << k),
                                                      interpret, None, 1))
    # output cast pair
    out_ref[...] = acc.astype(jnp.int32).astype(jnp.uint8)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--slab", type=int, default=288)
    ap.add_argument("--channels", type=int, default=32768)
    ap.add_argument("--bb", type=int, default=16)
    ap.add_argument("--width", type=int, default=13)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    from katsdpsigproc_tpu.utils.profiling import time_scan

    rows = args.bb  # h = 1: one band per row
    n_blocks = args.slab // args.bb
    rs = np.random.RandomState(1)
    amp = jnp.asarray(
        rs.uniform(0.25, 0.75, (args.slab, args.channels)).astype(np.float32))

    per_block = lambda i, o: skeleton_block(i, o, width=args.width,  # noqa: E731
                                            interpret=args.interpret)

    def kernel(in_hbm, out_hbm):
        pf._dma_block_loop(
            [(lambda idx: in_hbm.at[pl.ds(idx * rows, rows)],
              (rows, args.channels), jnp.float32)],
            [(lambda idx: out_hbm.at[pl.ds(idx * rows, rows)],
              (rows, args.channels), jnp.uint8)],
            per_block, n_blocks=n_blocks)

    @jax.jit
    def run(x):
        kwargs = {}
        if not args.interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((args.slab, args.channels), jnp.uint8),
            interpret=args.interpret,
            **kwargs,
        )(x)

    np.asarray(run(amp))  # compile
    time_scan(lambda v: v.sum(), (amp,), iters=3)  # tunnel warm-up
    times = [time_scan(run, (amp,), iters=args.iters) for _ in range(args.reps)]
    t = float(np.median(times))

    cr = roofline.compute_roofline(args.slab, args.channels, width=args.width)
    model_ms = cr["seconds_per_dump"] * 1e3
    print(f"skeleton: {t * 1e3:.3f} ms/slab over {n_blocks} ({rows}, "
          f"{args.channels}) blocks  [runs: "
          + " ".join(f"{x * 1e3:.3f}" for x in times) + "]")
    print(f"model:    {model_ms:.3f} ms/slab "
          f"(block_ns={cr['block_ns']:.0f}, prims "
          f"{cr['prim_ns_measured'] * 100:.0f}% measured)")
    print(f"skeleton/model = {t * 1e3 / model_ms:.3f}  "
          f"(≈1: floor priced right; ≫1: costs not additive; "
          f"≪1: chain folded / inventory overcounts)")


if __name__ == "__main__":
    main()
