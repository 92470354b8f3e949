"""Batched on-device token sampling for the serving engines.

The reference's only inference-time sampling is global-temperature
multinomial in ``autoregressiveInference`` (reference
lamp-data/src/main/scala/lamp/data/languagemodel/package.scala:93-106).
This module is the serving-grade superset: PER-REQUEST temperature,
top-k and nucleus (top-p) filtering, evaluated fully on device for a
whole batch of heterogeneous requests in one fused program — no
per-request host round trips.

Semantics follow the common sequential-filter convention (temperature
scale, then top-k, then top-p over the top-k-filtered distribution);
``temperature == 0`` rows decode greedily regardless of the filters.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["SamplingParams", "sample_tokens"]

_NEG_INF = jnp.finfo(jnp.float32).min * 0.5


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Per-request decode controls.

    temperature: 0 = greedy; otherwise softmax temperature.
    top_k:       keep only the k highest-probability tokens (0 = off).
    top_p:       nucleus sampling — keep the smallest prefix of the
                 sorted distribution with cumulative probability >=
                 ``top_p`` (1.0 = off).
    max_tokens:  stop after this many generated tokens (engine-level).
    stop_tokens: token ids that terminate the request (engine-level).
    """

    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    max_tokens: Optional[int] = None
    stop_tokens: Tuple[int, ...] = ()

    def __post_init__(self):
        if self.temperature < 0:
            raise ValueError("temperature must be >= 0")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError("top_p must be in (0, 1]")
        if self.top_k < 0:
            raise ValueError("top_k must be >= 0")
        if self.max_tokens is not None and self.max_tokens < 1:
            raise ValueError("max_tokens must be >= 1")


def _apply_filters(scaled, top_k, top_p):
    """Apply top-k then nucleus filtering with ONE descending sort.

    Sequential semantics (top-p evaluated on the top-k-renormalized
    distribution) are preserved exactly: within the sorted order the top-k
    survivors' mass is ``z = csum[k-1]``, so the nucleus condition on the
    renormalized probabilities, ``(csum' - p') < top_p``, is
    ``(csum - p) < top_p * z``. Rows with top_k <= 0 / top_p >= 1 pass
    through unchanged; the best token is always kept.
    """
    v = scaled.shape[-1]
    sl = -jnp.sort(-scaled, axis=-1)  # descending
    if top_k is not None:
        k = jnp.where(top_k <= 0, v, jnp.clip(top_k, 1, v))
    else:
        k = jnp.full(scaled.shape[:-1], v, jnp.int32)
    kth = jnp.take_along_axis(sl, (k - 1)[:, None], axis=-1)
    keep = sl >= kth
    if top_p is not None:
        probs = jax.nn.softmax(sl, axis=-1)
        csum = jnp.cumsum(probs, axis=-1)
        z = jnp.take_along_axis(csum, (k - 1)[:, None], axis=-1)
        keep = keep & ((csum - probs) < top_p[:, None] * z)
    thresh = jnp.min(jnp.where(keep, sl, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(scaled >= thresh, scaled, _NEG_INF)


def sample_tokens(logits, key, temperature, top_k=None, top_p=None):
    """Sample one token per row with per-row controls.

    logits:      [B, V] float
    temperature: [B] f32 (0 = greedy for that row), or None (STATIC) when
                 every row is greedy — compiles to a bare argmax with no
                 categorical/PRNG work at all
    top_k:       [B] int32 or None (None skips the sort entirely)
    top_p:       [B] f32 or None

    Returns [B] int32. Jit-safe; pass ``top_k=None`` / ``top_p=None``
    (static) when no active request uses the filter to avoid the
    [B, V] sorts.
    """
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if temperature is None:
        return greedy
    t = temperature[:, None]
    scaled = logits / jnp.where(t > 0, t, 1.0)
    if top_k is not None or top_p is not None:
        scaled = _apply_filters(scaled, top_k, top_p)
    sampled = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    return jnp.where(temperature > 0, sampled, greedy)
