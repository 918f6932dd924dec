#!/usr/bin/env python
"""Per-stage timing of the 2-D flagger on the current device.

Times each pipeline stage of ``models.rfi.twodflag`` in isolation (jitted,
vmapped over baselines) to locate the bottleneck.  Diagnostics to stderr.
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

from katsdpsigproc_tpu.models.rfi import twodflag  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--time", type=int, default=120)
    parser.add_argument("--channels", type=int, default=1024)
    parser.add_argument("--baselines", type=int, default=8)
    parser.add_argument("--iters", type=int, default=5)
    args = parser.parse_args()

    rs = np.random.RandomState(seed=1)
    shape = (args.time, args.channels, args.baselines)
    amp = np.abs(rs.standard_normal(shape) + 1j * rs.standard_normal(shape)).astype(np.float32)

    flagger = twodflag.SumThresholdFlagger()
    freq_chunk_ends = np.linspace(0, args.channels, flagger.freq_chunks + 1).astype(np.int_)

    data_bl = jnp.asarray(np.moveaxis(amp, -1, 0))  # (bl, T, F)
    flags_bl = jnp.zeros(data_bl.shape, bool)

    from katsdpsigproc_tpu.utils.profiling import time_scan

    def timeit(name, fn, *xs):
        """Scan-inside-jit timing (utils.profiling.time_scan): the only
        honest harness under the remote tunnel — see CLAUDE.md."""
        t = time_scan(fn, xs, iters=args.iters)
        print(f"{name:34s} {t * 1e3:9.2f} ms", file=sys.stderr)
        return jax.jit(fn)(*xs)

    # Stage: time median (per-channel masked median over T)
    timeit("time_median", jax.vmap(twodflag._time_median), data_bl, flags_bl)

    # Stage: full 2-D background (iterative masked gaussian + chunk medians)
    bg2 = functools.partial(
        twodflag._get_background2d,
        iterations=flagger.background_iterations,
        spike_width=np.array((flagger.spike_width_time, flagger.spike_width_freq)),
        reject_threshold=flagger.background_reject,
        freq_chunk_ends=freq_chunk_ends,
    )
    bg = timeit("get_background2d (2-D)", jax.vmap(lambda d, f: bg2(d, f)), data_bl, flags_bl)

    # Sub-stage: one unmasked box-gaussian pair (the filter cost itself)
    sw = np.array((flagger.spike_width_time, flagger.spike_width_freq))
    timeit(
        "masked_gaussian_filter x1",
        jax.vmap(lambda d, f: twodflag.masked_gaussian_filter(d, f, sw)),
        data_bl, flags_bl,
    )

    # Sub-stage: NaN interpolation alone (gather-heavy)
    timeit(
        "linearly_interpolate_nans",
        jax.vmap(lambda d, f: twodflag._linearly_interpolate_nans(jnp.where(f, jnp.nan, d))),
        data_bl, flags_bl,
    )

    # Sub-stage: the per-chunk median_abs calls alone (as in background reject)
    def chunk_medians(d, f):
        outs = []
        for c in range(len(freq_chunk_ends) - 1):
            lo, hi = int(freq_chunk_ends[c]), int(freq_chunk_ends[c + 1])
            outs.append(twodflag._median_abs(d[:, lo:hi], f[:, lo:hi]))
        return jnp.stack(outs)

    timeit("chunk median_abs x10", jax.vmap(chunk_medians), data_bl, flags_bl)

    resid = jax.vmap(lambda d, b: d - b)(data_bl, bg)

    # Stage: SumThreshold in time then frequency
    st_t = functools.partial(
        twodflag._sum_threshold, axis=0, windows=[1, 2, 4, 8],
        outlier_nsigma=flagger.outlier_nsigma, rho=flagger.rho,
    )
    st_f = functools.partial(
        twodflag._sum_threshold, axis=1, windows=[1, 2, 4, 8],
        outlier_nsigma=flagger.outlier_nsigma, rho=flagger.rho,
        chunks=freq_chunk_ends,
    )
    timeit("sum_threshold (time)", jax.vmap(st_t), resid, flags_bl)
    timeit("sum_threshold (freq)", jax.vmap(st_f), resid, flags_bl)

    # Whole pipeline for reference
    impl = flagger._impl((args.time, args.channels, args.baselines))
    vis = jnp.asarray(amp)
    vflags = jnp.zeros(vis.shape, bool)
    timeit("full get_flags impl", lambda v, f: impl(v, f), vis, vflags)


if __name__ == "__main__":
    main()
