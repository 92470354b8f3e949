"""Exponential moving average of parameters.

Companion to SWA (train/swa.py — the reference's averaging method,
lamp-data/src/main/scala/lamp/data/SWA.scala): where SWA averages uniformly
over a tail phase, EMA keeps a continuously-decayed shadow copy — the
standard evaluation/serving trick for diffusion models and modern LM
training. Pure pytree ops; fold :func:`ema_update` into the jitted train
step so the shadow update fuses with the optimizer's elementwise pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ema_init", "ema_update", "ema_params", "ema_swap"]


def _map(fn, *trees):
    def wrapped(*leaves):
        if leaves[0] is None:
            return None
        return fn(*leaves)

    return jax.tree_util.tree_map(wrapped, *trees,
                                  is_leaf=lambda x: x is None)


def ema_init(params):
    """Shadow copy in f32 (bf16 params would lose the small per-step
    increments: decay 0.999 moves values by ~1e-3 of the delta, below
    bf16's ~3e-3 relative resolution)."""
    return _map(lambda p: p.astype(jnp.float32), params)


def ema_update(ema, params, decay=0.999, step=None):
    """ema <- decay * ema + (1 - decay) * params.

    ``step`` (int, 1-based) enables the standard warmup correction
    ``decay_t = min(decay, (1 + t) / (10 + t))`` so early steps average
    quickly instead of being dominated by the random init.
    """
    d = jnp.asarray(decay, jnp.float32)
    if step is not None:
        t = jnp.asarray(step, jnp.float32)
        d = jnp.minimum(d, (1.0 + t) / (10.0 + t))
    return _map(lambda e, p: d * e + (1.0 - d) * p.astype(jnp.float32),
                ema, params)


def ema_params(ema, like):
    """The shadow parameters cast back to the dtypes of ``like`` (use for
    evaluation/serving/checkpointing)."""
    return _map(lambda e, p: e.astype(p.dtype), ema, like)


def ema_swap(ema, params):
    """(ema cast to params' dtypes, params promoted to a new shadow) —
    swap the live model to its average, keeping the raw weights as the
    shadow so the swap is reversible."""
    return ema_params(ema, params), ema_init(params)
