"""Collective rank statistics and halo exchange over a device mesh.

The key insight (SURVEY.md §5 "Distributed communication backend"): the
reference's bitwise binary-search rank selection (rank.mako:197-208) turns
into an **exact distributed percentile** by replacing the local
compare-count with a ``psum`` — 31 rounds of a (batch,)-sized integer
all-reduce, which is bandwidth-trivial on ICI.  No data is ever gathered.

These functions must be called inside ``shard_map`` (or ``pjit`` bodies
with manual axes) where `axis_name` is bound.
"""



import jax
import jax.numpy as jnp
from jax import lax

from ..ops import rank as rank_ops


def collective_count(axis_name: str):
    """A ``count_fn`` for :mod:`katsdpsigproc_tpu.ops.rank` that psums over `axis_name`."""

    def count(mask):
        return lax.psum(jnp.sum(mask, axis=-1, dtype=jnp.int32), axis_name)

    return count


def collective_max_below(axis_name: str):
    """A ``max_below_fn`` that pmaxes the local masked maxima."""

    def max_below(values, limit):
        local = jnp.max(jnp.where(values < limit[..., None], values, 0.0), axis=-1)
        return lax.pmax(local, axis_name)

    return max_below


def collective_count_axis(axis_name: str):
    """Axis-aware ``count_fn`` (straight layout, ``axis != -1``): local
    reduction over the data axis, psummed over `axis_name`."""

    def count(mask, axis):
        return lax.psum(jnp.sum(mask, axis=axis, dtype=jnp.int32), axis_name)

    return count


def collective_max_below_axis(axis_name: str):
    """Axis-aware ``max_below_fn`` for the straight layout."""

    def max_below(values, limit, axis):
        local = jnp.max(jnp.where(values < limit, values, 0.0), axis=axis)
        return lax.pmax(local, axis_name)

    return max_below


def find_rank_float(values, target_rank, halfway, axis_name: str, radix_bits: int = 4,
                    axis: int = -1):
    """Distributed exact order statistic over the sharded data axis.

    `values` is the local shard; rank counts are psummed so every device
    computes the same global result.  Radix-16 digits resolve 4 bits per
    round, so the search costs 8 tiny all-reduce rounds instead of 31 —
    across hosts the round count is pure latency.  ``axis`` selects the
    (locally-sharded) data axis: the default is the lane-major layout;
    any other axis runs the straight-layout search with NO corner turn
    (reference madnz.mako vs madnz_t.mako).
    """
    if axis % values.ndim != values.ndim - 1:
        return rank_ops.find_rank_float(
            values,
            target_rank,
            halfway,
            count_fn=collective_count_axis(axis_name),
            max_below_fn=collective_max_below_axis(axis_name),
            radix_bits=radix_bits,
            axis=axis,
        )
    return rank_ops.find_rank_float(
        values,
        target_rank,
        halfway,
        count_fn=collective_count(axis_name),
        max_below_fn=collective_max_below(axis_name),
        radix_bits=radix_bits,
    )


def median_non_zero(values, n_global, axis_name: str):
    """Distributed median of non-zero values (reference rank.mako:253-267 semantics)."""
    count_fn = collective_count(axis_name)
    z = rank_ops.zeros(values, count_fn)
    rank2 = jnp.asarray(n_global, jnp.int32) + z
    return find_rank_float(values, rank2 // 2, (rank2 & 1) == 0, axis_name)


def fmin(values, axis_name: str):
    """Distributed NaN-ignoring min along the sharded last axis."""
    return lax.pmin(jnp.min(jnp.where(jnp.isnan(values), jnp.inf, values), axis=-1), axis_name)


def fmax(values, axis_name: str):
    """Distributed NaN-ignoring max along the sharded last axis."""
    return lax.pmax(jnp.max(jnp.where(jnp.isnan(values), -jnp.inf, values), axis=-1), axis_name)


def percentile5(values, n_global, axis_name: str):
    """Distributed [min, max, p25, p75, p50] with 'lower' interpolation.

    Matches :func:`katsdpsigproc_tpu.ops.percentile.percentile5` on the
    gathered data, without gathering (assumes positive data; NaN = absent).
    """
    n = jnp.asarray(n_global, jnp.int32)
    # One 31-round collective search resolves all three ranks (cf. the
    # single-device batched variant in ops.percentile.percentile5).
    targets = jnp.stack([(n - 1) // 4, (3 * (n - 1)) // 4, (n - 1) // 2])
    vb = jnp.broadcast_to(values[..., None, :], values.shape[:-1] + (3, values.shape[-1]))
    p = find_rank_float(vb, targets, False, axis_name)  # (..., 3)
    out = jnp.stack(
        [
            fmin(values, axis_name),
            fmax(values, axis_name),
            p[..., 0],
            p[..., 1],
            p[..., 2],
        ]
    )
    return out.astype(jnp.float32)


def halo_exchange(x, h: int, axis_name: str, pad_value=jnp.nan, axis: int = 0):
    """Extend the locally-sharded `axis` of `x` with `h` rows from each neighbour.

    The global-edge shards receive `pad_value` instead (the background
    filter wants NaN = absent; SumThreshold wants 0 but never reads it).
    Communication is two ``ppermute`` shifts over ICI neighbours — the
    TPU-native analogue of the reference's chunk-overlap windows
    (threshold_sum.mako:38-47, rfi/twodflag.py:493-560).
    """
    if h == 0:
        return x
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    def take(arr, sl):
        slicer = [slice(None)] * arr.ndim
        slicer[axis] = sl
        return arr[tuple(slicer)]

    tail = take(x, slice(x.shape[axis] - h, x.shape[axis]))
    head = take(x, slice(0, h))
    # from_left: my left neighbour's tail rows; from_right: right neighbour's head.
    from_left = lax.ppermute(tail, axis_name, [(i, (i + 1) % n) for i in range(n)])
    from_right = lax.ppermute(head, axis_name, [(i, (i - 1) % n) for i in range(n)])
    pad_block = jnp.full(from_left.shape, pad_value, x.dtype)
    from_left = jnp.where(idx == 0, pad_block, from_left)
    from_right = jnp.where(idx == n - 1, pad_block, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=axis)
