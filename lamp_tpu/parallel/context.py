"""Context (sequence) parallelism: ring attention over a mesh axis.

Beyond reference parity (the reference has NO long-context scaling beyond the
fused kernel — SURVEY.md §2.7/§5): shard the KV sequence over a mesh axis and
rotate KV blocks around the ring with ``jax.lax.ppermute`` while each device
computes flash attention on the block in front of it, merging partial results
with online-softmax corrections. Communication is point-to-point over ICI and
overlaps with compute; memory per device is O(S/N).

Two entry points:
- :func:`ring_attention` — inside shard_map/pjit with a named axis.
- :func:`make_ring_attention` — wraps it in shard_map over a given mesh for
  [B, H, S, D] inputs sharded on S.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ring_attention", "make_ring_attention",
           "ulysses_attention", "make_ulysses_attention"]


def _local_attend(q, k, v, sm_scale, q_start, kv_start, causal,
                  q_chunk: Optional[int] = None):
    """Partial attention of local q against one kv block; returns
    (out_unnormalized, m, l) online-softmax statistics. All f32 stats.

    ``q_chunk`` bounds the materialized score matrix to
    [B, H, q_chunk, Skv] by mapping over query chunks; each chunk is
    rematerialized on the backward pass (jax.checkpoint) — without that the
    scan would stack every chunk's score residuals and rebuild the very
    O(Sq·Skv) memory the chunking exists to avoid. Non-divisible lengths
    are padded up (padded rows are sliced off)."""
    acc = jnp.promote_types(q.dtype, jnp.float32)

    def attend(q, q_start):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=acc)
        s = s * sm_scale
        if causal:
            sq = q.shape[2]
            skv = k.shape[2]
            qpos = q_start + jnp.arange(sq)[:, None]
            kpos = kv_start + jnp.arange(skv)[None, :]
            s = jnp.where(kpos <= qpos, s, jnp.finfo(jnp.float32).min * 0.7)
        m = jnp.max(s, axis=-1)                       # [B,H,Sq]
        p = jnp.exp(s - m[..., None])
        l = jnp.sum(p, axis=-1)                       # [B,H,Sq]
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                       preferred_element_type=acc)
        return o, m, l

    sq = q.shape[2]
    if q_chunk is None or sq <= q_chunk:
        return attend(q, q_start)
    b, h, _, d = q.shape
    pad = (-sq) % q_chunk
    if pad:  # padded rows' outputs are sliced off below (so their
        # cotangents are zero — they never affect dk/dv either)
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    n = (sq + pad) // q_chunk
    qs = jnp.moveaxis(q.reshape(b, h, n, q_chunk, d), 2, 0)  # [n,B,H,c,d]
    starts = q_start + q_chunk * jnp.arange(n)
    chunk_fn = jax.checkpoint(lambda args: attend(*args))
    o, m, l = jax.lax.map(chunk_fn, (qs, starts))
    o = jnp.moveaxis(o, 0, 2).reshape(b, h, sq + pad, d)[:, :, :sq]
    m = jnp.moveaxis(m, 0, 2).reshape(b, h, sq + pad)[:, :, :sq]
    l = jnp.moveaxis(l, 0, 2).reshape(b, h, sq + pad)[:, :, :sq]
    return o, m, l


def ring_attention(q, k, v, *, axis_name: str, n_devices: int,
                   causal: bool = False, sm_scale: Optional[float] = None,
                   q_chunk: Optional[int] = None):
    """Ring attention inside a shard_map: q/k/v are the LOCAL sequence shards
    [B, H, S/N, D]; returns the local output shard. ``n_devices`` is the
    (static) ring size, i.e. the mesh axis size. ``q_chunk`` bounds per-step
    score memory (see _local_attend)."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    return _ring_attention_impl(q, k, v, axis_name, n_devices, causal,
                                sm_scale, q_chunk)


def _ring_attention_impl(q, k, v, axis_name: str, n_devices: int,
                         causal: bool, sm_scale: float,
                         q_chunk: Optional[int] = None):
    my = jax.lax.axis_index(axis_name)
    chunk = k.shape[2]
    q_start = my * chunk
    b, h, sq, d = q.shape
    perm = [(i, (i + 1) % n_devices) for i in range(n_devices)]

    m_acc = jnp.full((b, h, sq), -jnp.inf, jnp.float32)
    l_acc = jnp.zeros((b, h, sq), jnp.float32)
    o_acc = jnp.zeros((b, h, sq, d), jnp.float32)

    k_blk, v_blk = k, v
    for i in range(n_devices):
        src = (my - i) % n_devices
        kv_start = src * chunk
        o_i, m_i, l_i = _local_attend(q, k_blk, v_blk, sm_scale, q_start,
                                      kv_start, causal, q_chunk)
        m_new = jnp.maximum(m_acc, m_i)
        alpha = jnp.exp(jnp.where(jnp.isinf(m_acc), -jnp.inf, m_acc) - m_new)
        alpha = jnp.where(jnp.isinf(m_acc) & jnp.isinf(m_new), 0.0, alpha)
        beta = jnp.exp(m_i - m_new)
        l_acc = alpha * l_acc + beta * l_i
        o_acc = o_acc * alpha[..., None] + o_i * beta[..., None]
        m_acc = m_new
        if i < n_devices - 1:
            # rotate the kv block around the ring; overlaps with the next
            # step's matmuls under XLA latency hiding
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm=perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm=perm)

    l_safe = jnp.where(l_acc == 0.0, 1.0, l_acc)
    return (o_acc / l_safe[..., None]).astype(q.dtype)


def ulysses_attention(q, k, v, *, axis_name: str, n_devices: int,
                      causal: bool = False,
                      sm_scale: Optional[float] = None,
                      implementation: Optional[str] = None):
    """DeepSpeed-Ulysses sequence parallelism inside a shard_map: q/k/v are
    LOCAL sequence shards [B, H, S/N, D]. Two ``all_to_all`` collectives
    re-shard sequence->heads so each device runs FULL (unsharded-S) attention
    for H/N heads through the normal kernel dispatch (XLA / compact / flash
    Pallas), then heads->sequence to restore the input layout.

    Complements :func:`ring_attention`: Ulysses moves O(S·D·H/N) activation
    bytes in two dense all-to-alls (cheap on ICI) and keeps the attention
    itself a single fused kernel — the better choice while ``H % N == 0``
    and S fits one device's kernel; the ring is the choice when S itself
    must never be materialized whole. Requires H divisible by the axis size.
    """
    from ..ops.attention import dot_product_attention

    h = q.shape[1]
    if h % n_devices:
        raise ValueError(
            f"ulysses_attention needs heads ({h}) divisible by the mesh "
            f"axis size ({n_devices}); use ring_attention otherwise"
        )
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    # [B, H, S/N, D] -> [B, H/N, S, D]: split heads across the axis, gather
    # the full sequence (tiled all-to-all = one ICI transpose)
    a2a = functools.partial(
        jax.lax.all_to_all, axis_name=axis_name, tiled=True
    )
    qh = a2a(q, split_axis=1, concat_axis=2)
    kh = a2a(k, split_axis=1, concat_axis=2)
    vh = a2a(v, split_axis=1, concat_axis=2)
    o = dot_product_attention(
        qh, kh, vh, causal=causal, sm_scale=sm_scale,
        implementation=implementation,
    )
    # [B, H/N, S, D] -> [B, H, S/N, D]
    return a2a(o, split_axis=2, concat_axis=1)


def make_ulysses_attention(mesh: Mesh, axis: str = "sp", *,
                           causal: bool = False,
                           sm_scale: Optional[float] = None,
                           implementation: Optional[str] = None):
    """Build a jitted Ulysses attention over ``mesh``: takes GLOBAL
    [B, H, S, D] q/k/v (S sharded over ``axis``) and returns the global
    output with the same sharding."""
    from jax import shard_map

    n = mesh.shape[axis]
    spec = P(None, None, axis, None)

    def fn(q, k, v):
        scale = (sm_scale if sm_scale is not None
                 else 1.0 / math.sqrt(q.shape[-1]))
        inner = functools.partial(
            ulysses_attention, axis_name=axis, n_devices=n, causal=causal,
            sm_scale=scale, implementation=implementation,
        )
        return shard_map(
            lambda a, b_, c: inner(a, b_, c),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        )(q, k, v)

    return jax.jit(fn)


def make_ring_attention(mesh: Mesh, axis: str = "sp", *, causal: bool = False,
                        sm_scale: Optional[float] = None,
                        q_chunk: Optional[int] = None):
    """Build a jitted ring-attention function over ``mesh``: takes GLOBAL
    [B, H, S, D] q/k/v (S sharded over ``axis``) and returns the global
    output with the same sharding."""
    from jax import shard_map

    n = mesh.shape[axis]
    spec = P(None, None, axis, None)

    def fn(q, k, v):
        scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(q.shape[-1])
        inner = functools.partial(
            _ring_attention_impl, axis_name=axis, n_devices=n, causal=causal,
            sm_scale=scale, q_chunk=q_chunk,
        )
        return shard_map(
            lambda a, b_, c: inner(a, b_, c),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        )(q, k, v)

    return jax.jit(fn)
