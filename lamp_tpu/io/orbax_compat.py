"""Orbax checkpoint interop — the JAX-ecosystem exchange format.

The framework's own format (descriptor + blob, :mod:`lamp_tpu.io.checkpoint`)
is byte-compatible with the reference's Writer/Reader scheme
(Writer.scala:15-35); THIS module additionally reads/writes **orbax**
checkpoints so models and train states exchange with the wider JAX stack
(flax/maxtext tooling, orbax's async/multi-host machinery) — the same
ecosystem role lamp-safetensors plays for HF weights (SURVEY.md §2.5).

Any pytree our modules form (frozen-dataclass ``Module`` nodes, optimizer
state dicts, ``None``-masked leaves) is flattened to a path→array dict
before saving, so the on-disk layout is plain named arrays — readable by
generic orbax tooling without this library. Restore is template-directed
(shape/dtype/sharding from the template leaf), matching the Load-typeclass
convention used everywhere else in :mod:`lamp_tpu.io`.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_orbax", "load_orbax"]


def _flatten(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(
        tree, is_leaf=lambda x: x is None)
    return flat, treedef


def save_orbax(path: str, tree: Any) -> None:
    """Write ``tree`` as an orbax checkpoint directory at ``path``
    (replaced if it exists). Leaves may be arrays, python scalars, or
    ``None`` (skipped; restored from the template)."""
    import orbax.checkpoint as ocp

    flat, _ = _flatten(tree)
    d = {jax.tree_util.keystr(p): leaf for p, leaf in flat
         if leaf is not None}
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, d, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, template: Any) -> Any:
    """Restore a :func:`save_orbax` checkpoint into ``template``'s
    structure. Each restored array takes the TEMPLATE leaf's shape, dtype,
    and (for committed ``jax.Array`` templates) sharding — so a sharded
    train state restores directly onto its mesh without a host gather."""
    import orbax.checkpoint as ocp

    flat, treedef = _flatten(template)
    abstract = {}
    for p, leaf in flat:
        if leaf is None:
            continue
        k = jax.tree_util.keystr(p)
        if isinstance(leaf, jax.Array):
            abstract[k] = jax.ShapeDtypeStruct(
                leaf.shape, leaf.dtype, sharding=leaf.sharding)
        elif hasattr(leaf, "shape"):  # np.ndarray
            abstract[k] = jax.ShapeDtypeStruct(leaf.shape, leaf.dtype)
        else:  # python scalar: restore as saved, cast to template's type
            abstract[k] = np.asarray(leaf)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), abstract)

    leaves = []
    for p, leaf in flat:
        if leaf is None:
            leaves.append(None)
            continue
        r = restored[jax.tree_util.keystr(p)]
        if not hasattr(leaf, "shape"):
            r = type(leaf)(np.asarray(r).item())
        elif isinstance(leaf, np.ndarray):
            r = np.asarray(r)
        leaves.append(r)
    return jax.tree_util.tree_unflatten(treedef, leaves)
