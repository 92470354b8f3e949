"""Pytree-based module system.

TPU-native replacement for the reference's ``GenericModule``/``TrainingMode``/
``Load`` machinery (reference: lamp-core/src/main/scala/lamp/nn/Module.scala:272-600).

Design
------
A :class:`Module` is a frozen dataclass registered as a JAX pytree. Array-valued
fields are pytree leaves (parameters/buffers); fields declared with
``static_field()`` are part of the treedef (hyperparameters, flags). This gives

* ``jax.grad`` / ``jax.jit`` / ``pjit`` work directly on modules,
* functional updates via :meth:`Module.replace`,
* parameter loading (the reference's ``Load`` typeclass) is plain
  ``jax.tree_util.tree_unflatten`` with new leaves.

Instead of the reference's mutable training-mode switch (``asTraining`` /
``asEval``), the train/eval distinction is an explicit ``train=`` keyword on
``forward``; stateful layers (BatchNorm) return an updated module:

    y, new_module = module.forward(x, key=key, train=True)

``module(x)`` is inference shorthand discarding state updates.

Parameter tagging (the reference's ``PTag`` used by per-tag optimizer
hyperparameters, Optimizer.scala:15-24) is provided by :func:`param_tags`,
which labels every leaf with ``"ClassName.field"`` (overridable per class via
``__tags__``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "Module",
    "Frozen",
    "static_field",
    "buffer_field",
    "field",
    "is_array",
    "partition_params",
    "combine",
    "param_tags",
    "parameter_count",
    "tree_replace",
    "filter_grad_mask",
]


def is_array(x) -> bool:
    return isinstance(x, (jax.Array,)) or hasattr(x, "shape") and hasattr(x, "dtype")


def static_field(**kwargs):
    """Declare a dataclass field held in the pytree treedef (not traced)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def buffer_field(**kwargs):
    """Declare a non-trainable array field (e.g. BatchNorm running stats).

    Buffers are pytree leaves (they move with the module across devices and
    are checkpointed) but are masked out of gradients/optimizer updates.
    """
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["buffer"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def field(**kwargs):
    return dataclasses.field(**kwargs)


_MODULE_REGISTRY: Dict[type, Tuple[Tuple[str, ...], Tuple[str, ...]]] = {}


def _split_fields(cls):
    dynamic, static = [], []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            static.append(f.name)
        else:
            dynamic.append(f.name)
    return tuple(dynamic), tuple(static)


class Module:
    """Base class. Subclass with dataclass-style annotated fields.

    Subclasses are automatically converted to frozen dataclasses and
    registered as pytree nodes.
    """

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        cls = dataclasses.dataclass(frozen=True, eq=False, repr=False)(cls)
        dynamic, static = _split_fields(cls)
        _MODULE_REGISTRY[cls] = (dynamic, static)

        def flatten_with_keys(m):
            children = [
                (jax.tree_util.GetAttrKey(name), getattr(m, name))
                for name in dynamic
            ]
            aux = tuple(getattr(m, name) for name in static)
            return children, aux

        def flatten(m):
            return [getattr(m, name) for name in dynamic], tuple(
                getattr(m, name) for name in static
            )

        def unflatten(aux, children):
            m = object.__new__(cls)
            for name, val in zip(dynamic, children):
                object.__setattr__(m, name, val)
            for name, val in zip(static, aux):
                object.__setattr__(m, name, val)
            return m

        jax.tree_util.register_pytree_with_keys(
            cls, flatten_with_keys, unflatten, flatten_func=flatten
        )

    # -- functional update ------------------------------------------------
    def replace(self, **changes) -> "Module":
        return dataclasses.replace(self, **changes)

    # -- forward protocol --------------------------------------------------
    def forward(self, x, *, key: Optional[jax.Array] = None, train: bool = False):
        """Return ``(output, updated_module)``. Stateless default returns self."""
        raise NotImplementedError(type(self).__name__)

    def __call__(self, x, *, key: Optional[jax.Array] = None, train: bool = False):
        out = self.forward(x, key=key, train=train)
        if isinstance(out, tuple) and len(out) == 2 and isinstance(out[1], Module):
            return out[0]
        return out

    # -- introspection -----------------------------------------------------
    @property
    def parameters(self):
        """Trainable leaves as a masked pytree (buffers/None replaced by None)."""
        params, _ = partition_params(self)
        return params

    def parameter_count(self) -> int:
        return parameter_count(self)

    def __repr__(self):
        parts = []
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if is_array(v):
                parts.append(f"{f.name}={v.dtype}{list(v.shape)}")
            elif isinstance(v, Module):
                parts.append(f"{f.name}={v!r}")
            else:
                parts.append(f"{f.name}={v!r}")
        return f"{type(self).__name__}({', '.join(parts)})"


class Frozen(Module):
    """Wrap a module to exclude ALL its leaves from training.

    The wrapped module's arrays become buffers (checkpointed, moved across
    devices, but masked out of gradients and optimizer state). Forward
    delegates unchanged. Typical use: freezing embeddings/norms alongside
    LoRA adapters, or feature extractors under a trainable head.

        model = model.replace(token_embedding=nn.Frozen(model.token_embedding))
    """

    inner: Module = buffer_field()

    def forward(self, *args, **kwargs):
        out = self.inner.forward(*args, **kwargs)
        if (
            isinstance(out, tuple) and len(out) == 2
            and isinstance(out[1], Module)
        ):
            return out[0], self.replace(inner=out[1])
        return out

    def __getattr__(self, name):
        # delegate attribute access (weights, hyperparams) to the wrapped
        # module; only called when normal lookup fails
        if name.startswith("__"):
            raise AttributeError(name)
        return getattr(object.__getattribute__(self, "inner"), name)


def _buffer_paths(module) -> set:
    """Key-paths (as tuples) of every leaf underneath a buffer field."""
    buffer_keys = set()

    def visit(path, node):
        if isinstance(node, Module):
            for f in dataclasses.fields(node):
                sub = getattr(node, f.name)
                subpath = path + (f.name,)
                if f.metadata.get("buffer", False):
                    buffer_keys.add(subpath)
                elif f.metadata.get("static", False):
                    continue
                else:
                    visit(subpath, sub)
        elif isinstance(node, (list, tuple)):
            for i, sub in enumerate(node):
                visit(path + (i,), sub)
        elif isinstance(node, dict):
            for k, sub in node.items():
                visit(path + (k,), sub)

    visit((), module)
    return buffer_keys


def _path_to_tuple(keypath) -> tuple:
    out = []
    for k in keypath:
        if isinstance(k, jax.tree_util.GetAttrKey):
            out.append(k.name)
        elif isinstance(k, jax.tree_util.SequenceKey):
            out.append(k.idx)
        elif isinstance(k, jax.tree_util.DictKey):
            out.append(k.key)
        elif isinstance(k, jax.tree_util.FlattenedIndexKey):
            out.append(k.key)
        else:
            out.append(str(k))
    return tuple(out)


def _is_under_buffer(path_tuple, buffer_paths) -> bool:
    for n in range(len(path_tuple) + 1):
        if path_tuple[:n] in buffer_paths:
            return True
    return False


def filter_grad_mask(module) -> Any:
    """Bool pytree: True for trainable floating-point leaves, False for buffers
    and non-floating leaves (e.g. integer vocab tables)."""
    buffer_paths = _buffer_paths(module)

    def mask(path, leaf):
        pt = _path_to_tuple(path)
        if _is_under_buffer(pt, buffer_paths):
            return False
        return is_array(leaf) and jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.inexact)

    return jax.tree_util.tree_map_with_path(mask, module)


def partition_params(module):
    """Split a module into (trainable, rest) trees of identical structure.

    Non-trainable positions hold ``None`` in the trainable tree and vice versa,
    so ``combine(trainable, rest)`` reconstitutes the module. This is the
    functional analogue of the reference's ``parameters`` vs ``buffers`` split
    (Module.scala:290-310).
    """
    mask = filter_grad_mask(module)
    leaves, treedef = jax.tree_util.tree_flatten(module)
    mask_leaves = jax.tree_util.tree_leaves(mask)
    params = [l if m else None for l, m in zip(leaves, mask_leaves)]
    rest = [None if m else l for l, m in zip(leaves, mask_leaves)]
    return treedef.unflatten(params), treedef.unflatten(rest)


def combine(params, rest):
    """Inverse of :func:`partition_params`."""
    p_leaves, treedef = jax.tree_util.tree_flatten(
        params, is_leaf=lambda x: x is None
    )
    r_leaves = jax.tree_util.tree_flatten(rest, is_leaf=lambda x: x is None)[0]
    merged = [p if p is not None else r for p, r in zip(p_leaves, r_leaves)]
    return treedef.unflatten(merged)


def param_tags(module) -> Any:
    """Pytree of string tags, one per leaf: ``"ClassName.field"`` by default.

    Classes may provide ``__tags__: dict[field_name, tag]`` overrides. This is
    the analogue of the reference's PTag (Module.scala:322-331), consumed by
    per-tag optimizer hyperparameters.
    """

    def tag_of(path, leaf):
        # walk the path, remembering the innermost owning Module and field name
        node = module
        tag = type(module).__name__
        for k in path:
            if isinstance(k, jax.tree_util.GetAttrKey):
                if isinstance(node, Module):
                    override = getattr(type(node), "__tags__", {})
                    tag = override.get(
                        k.name, f"{type(node).__name__}.{k.name}"
                    )
                node = getattr(node, k.name)
            elif isinstance(k, jax.tree_util.SequenceKey):
                node = node[k.idx]
            elif isinstance(k, jax.tree_util.DictKey):
                node = node[k.key]
        return tag

    return jax.tree_util.tree_map_with_path(tag_of, module)


def parameter_count(module) -> int:
    params, _ = partition_params(module)
    return sum(
        x.size for x in jax.tree_util.tree_leaves(params) if x is not None
    )


def tree_replace(tree, where: Callable, replacement):
    """Replace the sub-node selected by ``where(tree)`` with ``replacement``.

    A minimal ``eqx.tree_at`` equivalent for functional surgery on modules.
    """
    target = where(tree)
    sentinel_found = []

    def swap(node):
        if node is target:
            sentinel_found.append(True)
            return replacement
        return node

    out = jax.tree_util.tree_map(
        swap, tree, is_leaf=lambda n: n is target
    )
    if not sentinel_found:
        raise ValueError("tree_replace: target not found in tree")
    return out
