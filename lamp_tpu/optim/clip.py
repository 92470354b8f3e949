"""Gradient clipping.

Reference: global-norm ``gradientClippingInPlace``
(lamp-core/src/main/scala/lamp/nn/package.scala:72-103).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["global_norm", "clip_by_global_norm", "clip_by_value"]


def _leaves(tree):
    return [x for x in jax.tree_util.tree_leaves(tree) if x is not None]


def global_norm(tree):
    leaves = _leaves(tree)
    if not leaves:
        return jnp.float32(0.0)
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves)
    )


def clip_by_global_norm(tree, max_norm: float):
    """Scale all leaves so the global L2 norm is at most ``max_norm``."""
    norm = global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))

    def clip(x):
        if x is None:
            return None
        return (x.astype(jnp.float32) * scale).astype(x.dtype)

    return (
        jax.tree_util.tree_map(clip, tree, is_leaf=lambda x: x is None),
        norm,
    )


def clip_by_value(tree, limit: float):
    def clip(x):
        if x is None:
            return None
        return jnp.clip(x, -limit, limit)

    return jax.tree_util.tree_map(clip, tree, is_leaf=lambda x: x is None)
