#!/usr/bin/env python
"""Skeleton attribution + amp-ingest A/B, interleaved on-chip.

Round 3's stage ablation left the fused flagger's "skeleton" (everything
that is not median/rank/threshold compute) at 3.84 ms/dump — ~33% — with
~1-2 ms unattributed beyond the corner turn and the streaming floor.
This script (a) attributes the skeleton against measured copy costs and
(b) A/Bs the new ``ingest="amp"`` DMA engine, which computes |vis| in
XLA (fused into the producing pass), streams 4 B/vis instead of the
8 B/vis planar pair, and replaces the planar corner-turn copy with a
FREE reshape (baseline-major amplitude band-folds contiguously).

Legs (all same-process, honest scan timer):

  identity       x + carry on the planar dump — the harness's per-
                 iteration materialization floor (every engine pays it)
  fold_copy      identity + the planar corner turn to (2, B·hh, fold)
  amp_fold       identity + amplitude + free reshape (the amp engine's
                 XLA preamble)
  dma_planar     shipped flag_dump(pipeline="dma")
  dma_amp        flag_dump(pipeline="dma", ingest="amp")

Skeleton accounting: dma_planar − dma_amp isolates (corner turn − amp
pass) + halved kernel read traffic; amp_fold − identity is the amp
engine's entire pre-kernel cost.

Usage: python scripts/skeleton_ab.py [--baselines 2016] [--iters 10]
"""

import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from katsdpsigproc_tpu.utils import backend as _backend  # noqa: E402

_backend.apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from katsdpsigproc_tpu.models.rfi import pallas_flagger as pf  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--baselines", type=int, default=2016)
    ap.add_argument("--channels", type=int, default=32768)
    ap.add_argument("--bb", type=int, default=16)
    ap.add_argument("--fold", type=int, default=8192)
    ap.add_argument("--slab", type=int, default=288)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    from katsdpsigproc_tpu.utils.profiling import time_scan

    B, C = args.baselines, args.channels
    rs = np.random.RandomState(1)
    vis_np = rs.standard_normal((B, C, 2)).astype(np.float32)
    vis_np[rs.random_sample((B, C)) < 1 / 64.0, :] += 30.0
    vis = jnp.asarray(vis_np)  # baseline-major trailing planar
    fold, hh, padded_c = pf._fold_setup(C, args.bb, args.fold, B)

    def identity(v):
        return v

    def fold_copy(v):
        return pf._fold_vis(v, "trailing", B, hh, fold, padded_c, C)

    def amp_fold(v):
        # The engines' shared preamble (includes the channel pad, which a
        # hand-rolled copy here once dropped — crashed at padded shapes).
        return pf._fold_amp(v, "trailing", B, hh, fold, padded_c, C)

    def dma_planar(v):
        return pf.flag_dump(v, slab=args.slab, bb=args.bb, fold=args.fold,
                            pipeline="dma", interpret=args.interpret)

    def dma_amp(v):
        return pf.flag_dump(v, slab=args.slab, bb=args.bb, fold=args.fold,
                            pipeline="dma", ingest="amp", interpret=args.interpret)

    a = np.asarray(dma_planar(vis))
    b = np.asarray(dma_amp(vis))
    print(f"parity dma_amp vs dma_planar: {(a != b).sum()} mismatches",
          file=sys.stderr)
    assert (a == b).all()

    legs = [("identity", identity), ("fold_copy", fold_copy),
            ("amp_fold", amp_fold), ("dma_planar", dma_planar),
            ("dma_amp", dma_amp)]
    times = {n: [] for n, _ in legs}
    for _ in range(args.reps):
        for n, f in legs:
            times[n].append(time_scan(f, (vis,), iters=args.iters))
    n_vis = B * C
    for n, _ in legs:
        ts = sorted(times[n])
        med = ts[len(ts) // 2]
        print(f"{n:11s} min {ts[0] * 1e3:8.3f} ms  med {med * 1e3:8.3f} ms"
              + (f"  ({n_vis / med / 1e9:.2f} Gvis/s)" if n.startswith("dma") else ""),
              file=sys.stderr)
    mid = lambda n: sorted(times[n])[len(times[n]) // 2]  # noqa: E731
    print(f"turn cost (fold_copy - identity):  {(mid('fold_copy') - mid('identity')) * 1e3:7.3f} ms",
          file=sys.stderr)
    print(f"amp preamble (amp_fold - identity): {(mid('amp_fold') - mid('identity')) * 1e3:7.3f} ms",
          file=sys.stderr)
    print(f"amp-ingest gain (planar - amp):     {(mid('dma_planar') - mid('dma_amp')) * 1e3:7.3f} ms "
          f"({(mid('dma_planar') / mid('dma_amp') - 1) * 100:+.1f}%)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
