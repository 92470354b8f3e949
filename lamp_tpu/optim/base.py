"""Optimizer protocol.

TPU-native replacement for the reference's ``Optimizer`` trait and per-tag
``OptimizerHyperparameter`` system
(reference: lamp-core/src/main/scala/lamp/nn/Optimizer.scala:5-24).

Optimizers are pure: ``init(params) -> state`` and
``step(params, grads, state, lr_factor) -> (new_params, new_state)``. Both are
jit-compatible pytree functions — a training step jits model fwd/bwd and the
optimizer update into one XLA program (the whole update chain fuses into a
handful of HBM-bandwidth-bound elementwise kernels).

Per-tag hyperparameters: any scalar hyperparameter may instead be a
``dict[tag, value]`` or callable ``tag -> value``; tags come from
``lamp_tpu.nn.param_tags`` (the PTag analogue). The reference example
(example-autoregressivelm train.scala:55-62) uses this to zero weight decay
on bias/norm parameters.
"""

from __future__ import annotations

from typing import Any, Callable, Union

import jax
import jax.numpy as jnp

__all__ = ["Optimizer", "Hyper", "resolve_hyper", "apply_updates", "tree_zeros_like",
           "master_cast", "param_cast"]

Hyper = Union[float, dict, Callable[[str], float]]


def resolve_hyper(hyper: Hyper, tags, params) -> Any:
    """Expand a (possibly per-tag) hyperparameter to a pytree matching params.

    Returns a pytree of python floats (weights are baked into the jitted
    update as constants, like the reference's per-tag closures).
    """
    if callable(hyper):
        fn = hyper
    elif isinstance(hyper, dict):
        default = hyper.get("default", 0.0)
        fn = lambda tag: hyper.get(tag, default)  # noqa: E731
    else:
        val = float(hyper)
        return jax.tree_util.tree_map(lambda _: val, params)
    return jax.tree_util.tree_map(lambda tag: float(fn(tag)), tags)


def tree_zeros_like(params, dtype=None):
    return jax.tree_util.tree_map(
        lambda p: None if p is None else jnp.zeros(p.shape, dtype or p.dtype),
        params,
        is_leaf=lambda x: x is None,
    )


def master_cast(p):
    """f32 master copy for low-precision params (AdamW.scala:47-63 upCast)."""
    if p.dtype in (jnp.bfloat16, jnp.float16):
        return p.astype(jnp.float32)
    return p


def param_cast(master, like):
    return master.astype(like.dtype)


class Optimizer:
    """Base class; subclasses implement ``init`` and ``step``."""

    def init(self, params) -> Any:
        raise NotImplementedError

    def step(self, params, grads, state, lr_factor=1.0):
        raise NotImplementedError


def apply_updates(params, updates):
    """params + updates, leaf-wise, preserving None masks."""
    return jax.tree_util.tree_map(
        lambda p, u: p if u is None else p + u.astype(p.dtype),
        params,
        updates,
        is_leaf=lambda x: x is None,
    )
