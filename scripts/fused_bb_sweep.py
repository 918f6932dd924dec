"""Sweep the fused flagger's bb (baselines/block) on the live chip.

With the planar-leading layout (round 2) the remote AOT service may
accept larger blocks than round 1's bb=1 ceiling; this measures the
in-kernel compute amortization directly: seconds per slab and µs per
baseline for each compiling (engine, bb) combination at headline scale.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from katsdpsigproc_tpu.utils import backend

backend.apply_platform_env()

import jax.numpy as jnp  # noqa: E402

from katsdpsigproc_tpu.models.rfi import pallas_flagger  # noqa: E402
from katsdpsigproc_tpu.utils.profiling import time_scan  # noqa: E402

CHANNELS, SLAB = 32768, 252


def main():
    rs = np.random.RandomState(1)
    vis_t = jnp.asarray(rs.standard_normal((SLAB, CHANNELS, 2)).astype(np.float32))
    # absorb tunnel warm-up
    time_scan(lambda v: v.sum(), (vis_t,), iters=3)
    for engine, fn in [
        ("grid", pallas_flagger.flag_transposed),
        ("dma", pallas_flagger.flag_transposed_dma),
    ]:
        for bb in [1, 2, 4, 8]:
            if SLAB % bb:
                continue
            t0 = time.time()
            try:
                dt = time_scan(
                    lambda v, _bb=bb, _fn=fn: _fn(v, width=13, n_sigma=11.0, bb=_bb),
                    (vis_t,), iters=10,
                )
            except Exception as exc:  # noqa: BLE001
                msg = str(exc).splitlines()[0][:160]
                print(f"{engine} bb={bb}: FAILED ({msg})", flush=True)
                continue
            compile_s = time.time() - t0
            print(
                f"{engine} bb={bb}: {dt * 1e3:.3f} ms/slab "
                f"({dt / SLAB * 1e6:.2f} us/baseline; dump "
                f"{dt * 2016 / SLAB * 1e3:.1f} ms; compile+run {compile_s:.0f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
