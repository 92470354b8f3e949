"""Paged attention: decode-time attention over a paged KV cache.

Serving infrastructure beyond reference parity: the KV cache for a batch of
concurrent sequences lives in fixed-size pages scattered across HBM (virtual
memory for KV), so sequences of different lengths share one physical pool
with no fragmentation. The Pallas kernel gathers each sequence's pages with
async DMA (double-buffered: the next block loads while the current one
computes) and runs online-softmax attention of one query token against the
gathered keys/values. GQA-aware: query heads are grouped per kv head.

Page layout (heads fused into lanes so DMA slices stay 128-aligned for any
head_dim):
  q:            [B, H, D]              one decode token per sequence
  k_pages:      [P, page, H_kv * D]    physical page pool
  v_pages:      [P, page, H_kv * D]
  page_indices: [B, pages_per_seq]     logical -> physical page table
  lengths:      [B]                    valid tokens per sequence

``H_kv * D`` must be a multiple of 128 on real TPUs (lane tiling).
A pure-jnp reference backs the kernel on CPU and in tests.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["paged_attention", "paged_attention_reference", "PagedKVCache"]

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def paged_attention_reference(q, k_pages, v_pages, page_indices, lengths, *,
                              num_kv_heads: int,
                              sm_scale: Optional[float] = None):
    """jnp reference: gather pages then masked attention."""
    b, h, d = q.shape
    page = k_pages.shape[1]
    pages_per_seq = page_indices.shape[1]
    h_kv = num_kv_heads
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    # gather: [B, pages, page, H_kv*D] -> [B, T, H_kv, D] -> [B, H_kv, T, D]
    k = k_pages[page_indices].reshape(b, pages_per_seq * page, h_kv, d)
    v = v_pages[page_indices].reshape(b, pages_per_seq * page, h_kv, d)
    k = jnp.moveaxis(k, 2, 1)
    v = jnp.moveaxis(v, 2, 1)
    if h_kv != h:
        k = jnp.repeat(k, h // h_kv, axis=1)
        v = jnp.repeat(v, h // h_kv, axis=1)
    s = jnp.einsum("bhd,bhkd->bhk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    pos = jnp.arange(pages_per_seq * page)[None, None, :]
    s = jnp.where(pos < lengths[:, None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhk,bhkd->bhd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _paged_kernel(
    # scalar prefetch
    page_indices_ref,    # [B * pages_per_seq] int32 (flattened)
    lengths_ref,         # [B] int32
    # inputs
    q_ref,               # [1, H, D] VMEM (this sequence's query heads)
    k_pages_ref,         # [P, page, H_kv*D] ANY (stays in HBM)
    v_pages_ref,
    # outputs
    o_ref,               # [1, H, D]
    # scratch
    k_buf, v_buf,        # [2, pages_per_block, page, H_kv*D] VMEM
    sems,                # DMA semaphores [2, 2]
    *, pages_per_seq, pages_per_block, page, sm_scale, num_kv_heads, head_dim,
):
    b = pl.program_id(0)
    n_blocks = pages_per_seq // pages_per_block
    length = lengths_ref[b]
    # only touch blocks that hold live tokens: DMA + compute for the unused
    # page capacity beyond `length` would otherwise dominate decode time
    # (pages_per_seq is sized for the max context, sequences are usually far
    # shorter). At least one block so the unconditional first DMA is waited.
    block_tokens_ = pages_per_block * page
    n_live = jnp.clip(
        (length + block_tokens_ - 1) // block_tokens_, 1, n_blocks
    )

    def page_dma(slot, block_idx):
        copies = []
        for i in range(pages_per_block):
            logical = block_idx * pages_per_block + i
            phys = page_indices_ref[b * pages_per_seq + logical]
            copies.append(pltpu.make_async_copy(
                k_pages_ref.at[phys], k_buf.at[slot, i], sems.at[slot, 0]
            ))
            copies.append(pltpu.make_async_copy(
                v_pages_ref.at[phys], v_buf.at[slot, i], sems.at[slot, 1]
            ))
        return copies

    def start(slot, block_idx):
        for c in page_dma(slot, block_idx):
            c.start()

    def wait(slot, block_idx):
        for c in page_dma(slot, block_idx):
            c.wait()

    start(0, 0)

    block_tokens = pages_per_block * page
    hq = q_ref.shape[1]
    d = head_dim
    hkv = num_kv_heads
    q_per_kv = hq // hkv

    def body(block_idx, carry):
        m_acc, l_acc, o_acc = carry
        slot = block_idx % 2

        @pl.when(block_idx + 1 < n_live)
        def _():
            start((block_idx + 1) % 2, block_idx + 1)

        wait(slot, block_idx)
        # [tokens, H_kv * D]
        k = k_buf[slot].reshape(block_tokens, hkv * d)
        v = v_buf[slot].reshape(block_tokens, hkv * d)
        q = q_ref[0]  # [H, D]
        # group q by kv head and contract against that head's lane slice
        s_parts = []
        for g in range(hkv):
            kg = k[:, g * d:(g + 1) * d]               # [tokens, D]
            qg = q[g * q_per_kv:(g + 1) * q_per_kv]    # [q_per_kv, D]
            s_parts.append(jax.lax.dot_general(
                qg, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        s = jnp.concatenate(s_parts, axis=0) * sm_scale  # [H, tokens]
        tok = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
            + block_idx * block_tokens
        s = jnp.where(tok < length, s, NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_acc, m_cur)
        alpha = jnp.exp(m_acc - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_acc + jnp.sum(p, axis=1, keepdims=True)
        o_parts = []
        for g in range(hkv):
            vg = v[:, g * d:(g + 1) * d]
            pg = p[g * q_per_kv:(g + 1) * q_per_kv]
            o_parts.append(jax.lax.dot(
                pg.astype(vg.dtype), vg, preferred_element_type=jnp.float32
            ))
        o_blk = jnp.concatenate(o_parts, axis=0)  # [H, D]
        o_new = o_acc * alpha + o_blk
        return m_new, l_new, o_new

    m0 = jnp.full((hq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((hq, 1), jnp.float32)
    o0 = jnp.zeros((hq, d), jnp.float32)
    m, l, o = jax.lax.fori_loop(0, n_live, body, (m0, l0, o0))
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0] = (o * l_inv).astype(o_ref.dtype)


def paged_attention(q, k_pages, v_pages, page_indices, lengths, *,
                    num_kv_heads: int,
                    sm_scale: Optional[float] = None,
                    pages_per_block: int = 4,
                    interpret: Optional[bool] = None):
    """Decode attention over the paged KV pool (shapes in module docstring).
    Returns [B, H, D]. Grid: one cell per sequence."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, d = q.shape
    total_pages, page, fused = k_pages.shape
    assert fused == num_kv_heads * d, (fused, num_kv_heads, d)
    pages_per_seq = page_indices.shape[1]
    assert h % num_kv_heads == 0
    if pages_per_seq % pages_per_block != 0:
        pages_per_block = math.gcd(pages_per_seq, pages_per_block) or 1
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    kernel = functools.partial(
        _paged_kernel, pages_per_seq=pages_per_seq,
        pages_per_block=pages_per_block, page=page, sm_scale=sm_scale,
        num_kv_heads=num_kv_heads, head_dim=d,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, d), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, pages_per_block, page, fused), k_pages.dtype),
            pltpu.VMEM((2, pages_per_block, page, fused), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        interpret=interpret,
    )(
        page_indices.reshape(-1).astype(jnp.int32),
        lengths.astype(jnp.int32),
        q, k_pages, v_pages,
    )


class PagedKVCache:
    """Host-side page-pool manager for batch serving.

    Allocates/frees pages per sequence, appends tokens (writing K/V into the
    right page slot on device), and exposes the arrays paged_attention needs.
    """

    def __init__(self, *, num_kv_heads: int, head_dim: int, page_size: int,
                 total_pages: int, max_pages_per_seq: int, dtype=jnp.bfloat16):
        self.page_size = page_size
        self.num_kv_heads = num_kv_heads
        self.head_dim = head_dim
        self.max_pages_per_seq = max_pages_per_seq
        self.k_pages = jnp.zeros(
            (total_pages, page_size, num_kv_heads * head_dim), dtype
        )
        self.v_pages = jnp.zeros_like(self.k_pages)
        self.free_pages = list(range(total_pages - 1, -1, -1))
        self.seq_pages = {}   # seq_id -> [page ids]
        self.seq_len = {}     # seq_id -> tokens

    def add_sequence(self, seq_id) -> None:
        self.seq_pages[seq_id] = []
        self.seq_len[seq_id] = 0

    def free_sequence(self, seq_id) -> None:
        self.free_pages.extend(self.seq_pages.pop(seq_id))
        self.seq_len.pop(seq_id)

    def append(self, seq_id, k, v) -> None:
        """Append one token's K/V ([H_kv, D]) for a sequence."""
        pos = self.seq_len[seq_id]
        if pos % self.page_size == 0:
            if not self.free_pages:
                raise RuntimeError("KV page pool exhausted")
            self.seq_pages[seq_id].append(self.free_pages.pop())
        pg = self.seq_pages[seq_id][pos // self.page_size]
        slot = pos % self.page_size
        self.k_pages = self.k_pages.at[pg, slot].set(k.reshape(-1))
        self.v_pages = self.v_pages.at[pg, slot].set(v.reshape(-1))
        self.seq_len[seq_id] = pos + 1

    def batch_views(self, seq_ids):
        """(page_indices [B, max_pages], lengths [B]) for paged_attention."""
        import numpy as np

        b = len(seq_ids)
        idx = np.zeros((b, self.max_pages_per_seq), np.int32)
        lens = np.zeros((b,), np.int32)
        for i, sid in enumerate(seq_ids):
            pages = self.seq_pages[sid]
            idx[i, :len(pages)] = pages
            lens[i] = self.seq_len[sid]
        return jnp.asarray(idx), jnp.asarray(lens)
