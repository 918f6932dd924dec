#!/usr/bin/env python
"""Hardware parity check: native CHANNEL flags vs broadcast-to-FULL.

The native path feeds the kernel one folded (H, fold) uint8 block with a
constant index map and expands it per band via an MXU replication matmul;
this script asserts bit-identical flags vs broadcasting the channel mask
to (baselines, channels) and using the FULL path.
"""

import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache"))

from katsdpsigproc_tpu.utils import backend as _backend  # noqa: E402

_backend.apply_platform_env()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from katsdpsigproc_tpu.models.rfi import pallas_flagger  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--baselines", type=int, default=8)
    parser.add_argument("--channels", type=int, default=32768)
    parser.add_argument("--bb", type=int, default=1)
    parser.add_argument("--interpret", action="store_true")
    args = parser.parse_args()

    rs = np.random.RandomState(3)
    b, c = args.baselines, args.channels
    data = rs.standard_normal((b, c, 2)).astype(np.float32)
    # Plant spikes so flags actually fire (a zero-flag comparison proves
    # nothing) — mirror bench.py's synthetic RFI.
    spikes = rs.random_sample((b, c)) < 1.0 / 64.0
    data[..., 0] += (spikes * (rs.random_sample((b, c)) * 20.0 + 50.0)).astype(np.float32)
    vis_t = jnp.asarray(data)
    cf = (rs.random_sample(c) < 0.05).astype(np.uint8)
    native = np.asarray(
        pallas_flagger.flag_transposed(
            vis_t, channel_flags=jnp.asarray(cf), bb=args.bb, interpret=args.interpret
        )
    )
    full = np.asarray(
        pallas_flagger.flag_transposed(
            vis_t, jnp.asarray(np.broadcast_to(cf, (b, c)).copy()), bb=args.bb,
            interpret=args.interpret,
        )
    )
    mism = int((native != full).sum())
    print(f"mismatches: {mism} of {native.size}; flag fraction {native.mean():.4f}",
          file=sys.stderr)
    if native.mean() == 0:
        print("WARNING: zero flags set — comparison is vacuous", file=sys.stderr)
        sys.exit(1)
    sys.exit(0 if mism == 0 else 1)


if __name__ == "__main__":
    main()
