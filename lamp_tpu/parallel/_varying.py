"""Shared shard_map helper: mark arrays device-varying along a mesh axis.

Zero-initialized carries inside shard_map are replication-invariant while
loop outputs (after ppermute / axis_index-dependent writes) are varying;
jax's vma checker requires the initial carry to match. ``pvary`` is
idempotent here — already-varying leaves pass through — and falls back to
``jax.lax.pvary`` on jax versions without ``pcast``.
"""

from __future__ import annotations

import jax

__all__ = ["pvary_tree"]


def pvary_tree(tree, axis_name: str):
    def one(x):
        try:
            if axis_name in jax.typeof(x).vma:
                return x
        except (AttributeError, TypeError):
            pass
        try:
            return jax.lax.pcast(x, (axis_name,), to="varying")
        except AttributeError:  # older jax: pvary only
            return jax.lax.pvary(x, (axis_name,))

    return jax.tree_util.tree_map(one, tree)
