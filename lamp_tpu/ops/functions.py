"""Miscellaneous tensor functions from the reference op library.

Everything in the reference's ~80-op autograd library
(lamp-core/src/main/scala/lamp/autograd/ops.scala) that is not a plain jnp
call or a layer lives here — all differentiable through jax.grad:

- ``euclidean_distance`` (EuclideanDistance op, ops.scala:725)
- ``capped_shifted_negative_exponential`` (ops.scala:1002 — the survival-
  analysis activation exp(-(x - shift)) capped below at ``cap``)
- masking / one-hot / scatter helpers matching the indexing op family
  (ops.scala:74-510)
- sparse construction/densification (SparseFromValueAndIndex/ToDense,
  ops.scala:289,316) over jax.experimental.sparse BCOO
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "euclidean_distance",
    "capped_shifted_negative_exponential",
    "mask_fill",
    "mask_select",
    "index_add",
    "index_fill",
    "scatter_add",
    "one_hot",
    "sparse_from_value_and_index",
    "sparse_to_dense",
    "sparse_dense_matmul",
    "logdet",
]


def euclidean_distance(a, b):
    """Pairwise L2 distance matrix [N, M] (reference EuclideanDistance).

    The sqrt is masked at exactly-zero distances (identical rows / the
    self-distance diagonal) so gradients stay finite there (subgradient 0
    instead of 0·inf = NaN)."""
    acc = jnp.promote_types(a.dtype, jnp.float32)
    a2 = jnp.sum(jnp.square(a.astype(acc)), axis=1, keepdims=True)
    b2 = jnp.sum(jnp.square(b.astype(acc)), axis=1, keepdims=True)
    d2 = a2 + b2.T - 2 * jnp.dot(a, b.T, preferred_element_type=acc)
    d2 = jnp.maximum(d2, 0.0)
    pos = d2 > 0
    d = jnp.sqrt(jnp.where(pos, d2, 1.0))
    return jnp.where(pos, d, 0.0).astype(a.dtype)


def capped_shifted_negative_exponential(x, *, shift: float, cap: float):
    """y = max(exp(-(x - shift)), cap) with zero gradient in the capped
    region (reference CappedShiftedNegativeExponential, ops.scala:1002)."""
    y = jnp.exp(-(x - shift))
    return jnp.where(y < cap, cap, y)


def mask_fill(x, mask, value):
    """Reference MaskFill (ops.scala:430)."""
    return jnp.where(mask, jnp.asarray(value, x.dtype), x)


def mask_select(x, mask, *, fill=0):
    """Gather masked entries to a dense prefix. Unlike the reference's
    dynamic-shape MaskSelect (ops.scala:470), TPU wants static shapes: the
    output keeps x's flattened length; selected entries first, ``fill``
    after. Returns (values, count)."""
    flat = x.reshape(-1)
    m = mask.reshape(-1)
    order = jnp.argsort(~m)  # selected first (stable)
    vals = jnp.where(m[order], flat[order], jnp.asarray(fill, x.dtype))
    return vals, jnp.sum(m)


def index_add(x, index, source, *, axis: int = 0):
    """Reference IndexAdd (ops.scala:154)."""
    idx = [slice(None)] * x.ndim
    idx[axis] = index
    return x.at[tuple(idx)].add(source)


def index_fill(x, index, value, *, axis: int = 0):
    """Reference IndexFill (ops.scala:203)."""
    idx = [slice(None)] * x.ndim
    idx[axis] = index
    return x.at[tuple(idx)].set(jnp.asarray(value, x.dtype))


def scatter_add(x, index, source, *, axis: int = 0):
    """Reference ScatterAdd (ops.scala:240): index has source's shape."""
    return x.at[_axis_index(index, axis, x.ndim)].add(source)


def _axis_index(index, axis, ndim):
    # build advanced-index tuple equivalent to torch scatter_add semantics
    # for the common 1D/2D cases used by the reference (graph aggregation)
    if index.ndim == 1:
        idx = [slice(None)] * ndim
        idx[axis] = index
        return tuple(idx)
    # 2D: row/col grids
    rows = jnp.arange(index.shape[0])[:, None]
    if axis == 0:
        return (index, jnp.broadcast_to(jnp.arange(index.shape[1])[None, :],
                                        index.shape))
    return (jnp.broadcast_to(rows, index.shape), index)


def one_hot(index, num_classes: int, dtype=jnp.float32):
    """Reference OneHot (ops.scala:495)."""
    return jax.nn.one_hot(index, num_classes, dtype=dtype)


def sparse_from_value_and_index(values, indices, shape: Tuple[int, ...]):
    """COO sparse tensor (reference SparseFromValueAndIndex, ops.scala:289).

    values [nnz], indices [nnz, ndim] -> BCOO.
    """
    from jax.experimental import sparse

    return sparse.BCOO((values, indices), shape=shape)


def sparse_to_dense(sp):
    """Reference ToDense (ops.scala:316)."""
    return sp.todense()


def sparse_dense_matmul(sp, dense):
    """Sparse @ dense product via BCOO dot."""
    return sp @ dense


def logdet(x):
    """Reference LogDet (ops.scala:787)."""
    sign, ld = jnp.linalg.slogdet(x)
    return ld
