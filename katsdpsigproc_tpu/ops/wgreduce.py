"""Reduction-operator library.

The reference ships a Mako metaprogramming library of work-group cooperative
reductions with named operators (reference: src/katsdpsigproc/wg_reduce.mako:
17-33 operator macros, 97-201 raking/shuffle reduction).  On TPU the VPU and
XLA's reduction lowering replace hand-scheduled tree reductions, so the
TPU-native equivalent is a library of *named operator objects* — combine
function + identity + NaN semantics — shared by :mod:`.reduce` (HReduce),
:mod:`.rank`, and Pallas kernel bodies, plus a :func:`reduce` helper usable
both at the JAX level and inside Pallas kernels (where ``jnp`` lowers to VPU
ops).
"""

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp


@dataclass(frozen=True)
class ReduceOp:
    """A commutative reduction operator (reference: wg_reduce.mako:17-33)."""

    name: str
    combine: Callable
    identity_for: Callable  # dtype -> identity scalar

    def identity(self, dtype):
        return self.identity_for(jnp.dtype(dtype))


def _nan_ignoring(fn):
    def combine(a, b):
        return fn(a, b)

    return combine


#: a + b
plus = ReduceOp("plus", lambda a, b: a + b, lambda dt: jnp.zeros((), dt))
#: max(a, b) — NaN propagates (jnp.maximum semantics)
max_ = ReduceOp(
    "max", jnp.maximum, lambda dt: jnp.asarray(jnp.finfo(dt).min if jnp.issubdtype(dt, jnp.floating) else jnp.iinfo(dt).min, dt)
)
#: min(a, b) — NaN propagates
min_ = ReduceOp(
    "min", jnp.minimum, lambda dt: jnp.asarray(jnp.finfo(dt).max if jnp.issubdtype(dt, jnp.floating) else jnp.iinfo(dt).max, dt)
)
#: fmax: NaN-ignoring max (reference op_fmax, wg_reduce.mako:29-33)
fmax = ReduceOp(
    "fmax",
    lambda a, b: jnp.where(jnp.isnan(a), b, jnp.where(jnp.isnan(b), a, jnp.maximum(a, b))),
    lambda dt: jnp.asarray(jnp.nan, dt),
)
#: fmin: NaN-ignoring min (reference op_fmin)
fmin = ReduceOp(
    "fmin",
    lambda a, b: jnp.where(jnp.isnan(a), b, jnp.where(jnp.isnan(b), a, jnp.minimum(a, b))),
    lambda dt: jnp.asarray(jnp.nan, dt),
)

BY_NAME = {op.name: op for op in (plus, max_, min_, fmax, fmin)}


def reduce(values, op: ReduceOp, axis=-1):
    """Reduce `values` along `axis` with `op`.

    Usable at JAX level and inside Pallas kernel bodies.  For the NaN-aware
    operators this lowers to masked min/max rather than a sequential fold.
    """
    if op.name == "plus":
        return jnp.sum(values, axis=axis)
    if op.name == "max":
        return jnp.max(values, axis=axis)
    if op.name == "min":
        return jnp.min(values, axis=axis)
    if op.name == "fmax":
        result = jnp.max(jnp.where(jnp.isnan(values), -jnp.inf, values), axis=axis)
        all_nan = jnp.all(jnp.isnan(values), axis=axis)
        return jnp.where(all_nan, jnp.nan, result).astype(values.dtype)
    if op.name == "fmin":
        result = jnp.min(jnp.where(jnp.isnan(values), jnp.inf, values), axis=axis)
        all_nan = jnp.all(jnp.isnan(values), axis=axis)
        return jnp.where(all_nan, jnp.nan, result).astype(values.dtype)
    # Generic fold for user-defined operators: associative tree via lax.reduce
    import jax

    return jax.lax.reduce(
        values, op.identity(values.dtype), lambda a, b: op.combine(a, b), (axis % values.ndim,)
    )
