"""KV-cached autoregressive generation for the LM family.

The reference regenerates the FULL forward pass per sampled token
(SURVEY.md §3.4, languagemodel/package.scala:36-113 — no KV cache). This
module is the TPU-idiomatic fast path: per-block K/V caches in HBM, one
fixed-shape jitted decode step per token (O(ctx) per token instead of
O(ctx²)), with the same sampling semantics (temperature / greedy).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.lm import LanguageModelModule

__all__ = ["KVCache", "init_cache", "prefill", "decode_step", "generate"]


class KVCache(NamedTuple):
    k: jnp.ndarray  # [layers, B, H, ctx, hd]
    v: jnp.ndarray
    length: jnp.ndarray  # scalar int32


def _block_dims(model: LanguageModelModule):
    block = model.encoder.blocks[0]
    heads = block.attention.num_heads
    qk_dim = block.attention.w_q.weight.shape[1]
    return len(model.encoder.blocks), heads, qk_dim // heads


def init_cache(model: LanguageModelModule, batch: int,
               dtype=None) -> KVCache:
    layers, heads, hd = _block_dims(model)
    ctx = model.context_length
    dt = dtype or model.token_embedding.weight.dtype
    return KVCache(
        k=jnp.zeros((layers, batch, heads, ctx, hd), dt),
        v=jnp.zeros((layers, batch, heads, ctx, hd), dt),
        length=jnp.zeros((), jnp.int32),
    )


def _split_heads(x, heads):
    b, t, d = x.shape
    return x.reshape(b, t, heads, d // heads).transpose(0, 2, 1, 3)


def _attend_cached(q, k_cache, v_cache, valid_len):
    """q: [B,H,1,hd]; cache: [B,H,ctx,hd]; mask positions >= valid_len."""
    import math

    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k_cache, preferred_element_type=jnp.float32
    ) * scale
    pos = jnp.arange(k_cache.shape[2])[None, None, None, :]
    s = jnp.where(pos < valid_len, s, jnp.finfo(jnp.float32).min * 0.7)
    p = jax.nn.softmax(s, axis=-1).astype(v_cache.dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p, v_cache, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def decode_step(model: LanguageModelModule, cache: KVCache, token):
    """One cached decode step. token: [B] int32 (the newest token).
    Returns (logits [B, V], new_cache)."""
    b = token.shape[0]
    pos = cache.length
    x = (
        model.token_embedding(token[:, None])
        + model.position_embedding(pos[None, None])
    )  # [B,1,D]
    new_k = cache.k
    new_v = cache.v
    for li, block in enumerate(model.encoder.blocks):
        att = block.attention
        h = att.num_heads
        a_in = block.norm1(x)
        q = _split_heads(att.w_q(a_in), h)
        k = _split_heads(att.w_k(a_in), h)  # [B,H,1,hd]
        v = _split_heads(att.w_v(a_in), h)
        zero = jnp.zeros((), pos.dtype)
        li_idx = jnp.asarray(li, pos.dtype)
        new_k = jax.lax.dynamic_update_slice(
            new_k, k[None], (li_idx, zero, zero, pos, zero)
        )
        new_v = jax.lax.dynamic_update_slice(
            new_v, v[None], (li_idx, zero, zero, pos, zero)
        )
        o = _attend_cached(q, new_k[li], new_v[li], pos + 1)
        o = att.w_o(o.transpose(0, 2, 1, 3).reshape(b, 1, -1))
        x = x + o * block.scale1
        m = block.w2(block.activation(block.w1(block.norm2(x))))
        x = x + m * block.scale2
    x = model.final_norm(x)
    w = model.token_embedding.weight
    logits = jnp.einsum(
        "btd,vd->btv", x, w, preferred_element_type=jnp.float32
    )[:, 0, :]
    return logits, KVCache(new_k, new_v, pos + 1)


def prefill(model: LanguageModelModule, cache: KVCache, tokens):
    """Feed a prompt through the cache one token at a time (jit-unrolled via
    scan; the full-forward prefill optimization can come later)."""

    def body(cache, tok):
        logits, cache = decode_step(model, cache, tok)
        return cache, logits

    cache, logits = jax.lax.scan(body, cache, tokens.T)
    return logits[-1], cache


def generate(model: LanguageModelModule, prefix, length: int, *,
             temperature: float = 1.0, key=None) -> np.ndarray:
    """Sample ``length`` tokens after ``prefix`` using the KV cache.

    Equivalent semantics to the reference's autoregressiveInference
    (temperature sampling), O(ctx) per token.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    prefix = jnp.asarray(prefix)
    if prefix.ndim == 1:
        prefix = prefix[None]
    b, t0 = prefix.shape
    assert t0 + length <= model.context_length, "exceeds context length"

    cache = init_cache(model, b)

    @jax.jit
    def do_prefill(model, cache, tokens):
        return prefill(model, cache, tokens)

    @jax.jit
    def step(model, cache, tok, key):
        logits, cache = decode_step(model, cache, tok)
        if temperature <= 0:
            nxt = jnp.argmax(logits, axis=-1)
        else:
            nxt = jax.random.categorical(key, logits / temperature, axis=-1)
        return nxt.astype(jnp.int32), cache

    logits, cache = do_prefill(model, cache, prefix.astype(jnp.int32))
    key, sub = jax.random.split(key)
    if temperature <= 0:
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    else:
        tok = jax.random.categorical(sub, logits / temperature, axis=-1).astype(
            jnp.int32
        )
    out = [np.asarray(tok)[:, None]]
    for _ in range(length - 1):
        key, sub = jax.random.split(key)
        tok, cache = step(model, cache, tok, sub)
        out.append(np.asarray(tok)[:, None])
    return np.concatenate(out, axis=1)
