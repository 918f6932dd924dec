#!/usr/bin/env python
"""Same-process interleaved A/B: the h=1 wide-fold kernel vs the shipped fold.

Round-5 hypothesis: at ``fold = channels`` (32768) the band-fold has ONE
band per row (h = 1), which structurally deletes per-shift cross-band
corrections (3 vector ops → 1 lane roll on every median member and
threshold ladder/dilation shift) and removes the per-rank-round band
matmul from the serial reduce→matmul→select chain (traced census:
324 → 250 full-block ops/block, scripts/opcount.py).  Round 4 swept fold
only to 16384, where h = 2 keeps all the machinery — this measures the
cliff the sweep never reached.

Protocol (CLAUDE.md): SAME-PROCESS interleaved legs only (the box's
absolute speed drifts between processes); bit-exact parity against the
shipped configuration before timing; medians over R interleaved rounds.

Usage: python scripts/widefold_ab.py [--rounds 5] [--iters 20] [--slab 288]
"""

import argparse
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from katsdpsigproc_tpu.utils import backend  # noqa: E402

backend.apply_platform_env()

import jax.numpy as jnp  # noqa: E402

from katsdpsigproc_tpu.models.rfi import pallas_flagger as pf  # noqa: E402
from katsdpsigproc_tpu.utils.profiling import time_scan  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--slab", type=int, default=288)
    ap.add_argument("--channels", type=int, default=32768)
    ap.add_argument("--ingest", default="amp", choices=["amp", "planar"])
    ap.add_argument("--interpret", action="store_true",
                    help="interpret-mode Pallas (CPU smoke; timings meaningless)")
    args = ap.parse_args()

    rs = np.random.RandomState(1)
    vis_t = jnp.asarray(
        rs.standard_normal((args.slab, args.channels, 2)).astype(np.float32))
    time_scan(lambda v: v.sum(), (vis_t,), iters=3)  # tunnel warm-up

    legs = [
        ("shipped  bb=16 fold=8192 ", dict(bb=16, fold=8192)),
        ("widefold bb=8  fold=32768", dict(bb=8, fold=32768)),
        ("widefold bb=16 fold=32768", dict(bb=16, fold=32768)),
    ]

    def call(kw):
        return lambda v: pf.flag_transposed_dma(
            v, width=13, n_sigma=11.0, ingest=args.ingest,
            interpret=args.interpret, **kw)

    # parity (bit-exact across block geometries) + compile warm-up per leg
    ref = None
    alive = []
    for name, kw in legs:
        t0 = time.time()
        try:
            out = np.asarray(call(kw)(vis_t))
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED to compile/run: "
                  f"{str(exc).splitlines()[0][:200]}", flush=True)
            continue
        if ref is None:
            ref = out
        mism = int((out != ref).sum())
        print(f"{name}: compile+first-run {time.time() - t0:.0f}s, "
              f"{mism} flag mismatches vs leg A", flush=True)
        if mism:
            raise SystemExit(f"parity FAILED for {name}")
        alive.append((name, kw))

    times = {name: [] for name, _ in alive}
    for r in range(args.rounds):
        for name, kw in alive:
            dt = time_scan(call(kw), (vis_t,), iters=args.iters)
            times[name].append(dt)
            print(f"round {r}: {name}: {dt * 1e3:.3f} ms/slab", flush=True)

    print("--- medians ---")
    for name, _ in alive:
        med = float(np.median(times[name]))
        print(f"{name}: {med * 1e3:.3f} ms/slab "
              f"({med / args.slab * 1e6:.2f} us/baseline; "
              f"2016-row dump ~{med * 2016 / args.slab * 1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
