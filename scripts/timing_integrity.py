#!/usr/bin/env python
"""Measurement-integrity check for the accumulate-timing harness.

If the remote execution service memoizes identical (program, input)
dispatches, timing N iterations on the SAME input under-reports by ~N.
This script times an expensive jit (binary madnz) three ways:
  same      — N iterations on one input (the harness pattern)
  distinct  — N iterations on N pre-uploaded different inputs
  chained   — N iterations where each input depends on the previous output
              (impossible to cache, serialization guaranteed)
Agreement across the three validates the harness; divergence calibrates it.
"""

import argparse
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache"))

from katsdpsigproc_tpu.utils import backend as _backend  # noqa: E402

_backend.apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from katsdpsigproc_tpu.ops import rank as rank_ops  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--baselines", type=int, default=252)
    parser.add_argument("--channels", type=int, default=32768)
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()

    rs = np.random.RandomState(1)
    base = np.abs(rs.standard_normal((args.baselines, args.channels))).astype(np.float32)

    @jax.jit
    def work(v):
        n = jnp.int32(v.shape[-1])
        z = rank_ops.zeros(v)
        rank2 = n + z
        med = rank_ops.find_rank_float(v, rank2 // 2, (rank2 & 1) == 0)
        return jnp.sum(med)

    @jax.jit
    def perturb(v, s):
        # Data-dependent tweak: output feeds the next iteration's input.
        return v + s * 1e-20

    x = jnp.asarray(base)
    np.asarray(work(x))  # warm + absorb first-timed penalty

    # same
    start = time.perf_counter()
    acc = None
    for _ in range(args.iters):
        s = work(x)
        acc = s if acc is None else acc + s
    np.asarray(acc)
    t_same = (time.perf_counter() - start) / args.iters

    # distinct
    xs = [jnp.asarray(base + np.float32(i + 1)) for i in range(args.iters)]
    np.asarray(work(xs[0]))
    start = time.perf_counter()
    acc = None
    for xi in xs:
        s = work(xi)
        acc = s if acc is None else acc + s
    np.asarray(acc)
    t_distinct = (time.perf_counter() - start) / args.iters

    # chained
    np.asarray(work(x))
    start = time.perf_counter()
    v = x
    acc = None
    for _ in range(args.iters):
        s = work(v)
        acc = s if acc is None else acc + s
        v = perturb(v, s)
    np.asarray(acc)
    t_chained = (time.perf_counter() - start) / args.iters

    for name, t in [("same", t_same), ("distinct", t_distinct), ("chained", t_chained)]:
        print(f"{name:9s} {t * 1e3:9.3f} ms/iter", file=sys.stderr)


if __name__ == "__main__":
    main()
