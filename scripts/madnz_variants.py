#!/usr/bin/env python
"""Timing of madnz (MAD-of-nonzero rank search) formulations on the chip.

Variants:
  binary       — 31 rounds, 1 candidate each (the shipped default)
  radixK       — ceil(31/log2 K) rounds, K-1 candidates via float compares
  radixK-arith — same rounds, counts from the integer digit
                 rel = (bits(v) - cur) >> shift (one elementwise chain per
                 round; all K-1 count reductions share the single read)
"""

import argparse
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

from katsdpsigproc_tpu.models.rfi import MAD_NORMAL  # noqa: E402
from katsdpsigproc_tpu.ops import rank as rank_ops  # noqa: E402


def _shifts(radix_bits):
    shifts = []
    pos = 31
    while pos > 0:
        width = pos % radix_bits or radix_bits
        pos -= width
        shifts.append((pos, width))
    return shifts


def find_rank_arith(values, target_rank, halfway, radix_bits):
    """find_rank_float with integer-digit counting: each round reads the
    data once, computes rel = (bits - cur) >> shift, and derives all
    candidate counts by comparing rel (already in registers) to 1..K-1."""
    bits = lax.bitcast_convert_type(values, jnp.int32)  # NaN → large positive
    batch_shape = values.shape[:-1]
    target_b = jnp.broadcast_to(jnp.asarray(target_rank, jnp.int32), batch_shape)
    cur = jnp.zeros(batch_shape, jnp.int32)
    for shift, width in _shifts(radix_bits):
        k = (1 << width) - 1
        rel = (bits - cur[..., None]) >> shift  # arithmetic: negative → < 0
        j = jnp.arange(1, k + 1, dtype=jnp.int32)
        counts = jnp.sum(
            (rel[..., None, :] < j[:, None]).astype(jnp.int32), axis=-1
        )  # (..., k)
        digit = jnp.sum((counts <= target_b[..., None]).astype(jnp.int32), axis=-1)
        cur = cur | (digit << shift)
    result = lax.bitcast_convert_type(cur, jnp.float32)
    r = jnp.sum((values < result[..., None]).astype(jnp.int32), axis=-1)
    prev = jnp.max(jnp.where(values < result[..., None], values, 0.0), axis=-1)
    need_avg = jnp.broadcast_to(halfway, batch_shape) & (r == target_b)
    return jnp.where(need_avg, (result + prev) * 0.5, result)


def madnz_arith(dev_t, radix_bits):
    values = jnp.abs(dev_t).astype(jnp.float32)
    n = jnp.int32(values.shape[-1])
    z = jnp.sum((values == 0).astype(jnp.int32), axis=-1)
    rank2 = n + z
    return MAD_NORMAL * find_rank_arith(values, rank2 // 2, (rank2 & 1) == 0, radix_bits)


def madnz_ref(dev_t, radix_bits):
    values = jnp.abs(dev_t).astype(jnp.float32)
    n = jnp.int32(values.shape[-1])
    z = rank_ops.zeros(values)
    rank2 = n + z
    return MAD_NORMAL * rank_ops.find_rank_float(
        values, rank2 // 2, (rank2 & 1) == 0, radix_bits=radix_bits
    )


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--baselines", type=int, default=252)
    parser.add_argument("--channels", type=int, default=32768)
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    rs = np.random.RandomState(1)
    dev = rs.standard_normal((args.baselines, args.channels)).astype(np.float32)
    dev[rs.random_sample(dev.shape) < 0.01] = 0.0  # exercise the nonzero logic
    x = jnp.asarray(dev)

    expected = None
    variants = [("binary", lambda v: madnz_ref(v, 1))]
    for k in (2, 4, 8):
        variants.append((f"radix{1 << k if False else 2**k}", lambda v, k=k: madnz_ref(v, k)))
        variants.append((f"radix{2**k}-arith", lambda v, k=k: madnz_arith(v, k)))

    from katsdpsigproc_tpu.utils.profiling import time_scan

    for name, fn in variants:
        jfn = jax.jit(lambda v, f=fn: f(v))
        got = np.asarray(jfn(x))
        if expected is None:
            expected = got
        else:
            ok = np.array_equal(got, expected)
            if not ok:
                print(f"{name}: RESULT MISMATCH", file=sys.stderr)
                sys.exit(1)
        dt = time_scan(fn, (x,), iters=args.iters)
        gb = args.baselines * args.channels * 4 / 1e9
        print(f"{name:16s} {dt * 1e3:9.3f} ms  ({gb / dt:6.1f} GB/s effective)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
