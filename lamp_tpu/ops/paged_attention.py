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

FUSED layout (pass ``v_pages=None``): K and V of a page live in ONE array
  kv_pages:     [P, 2, page, H_kv * D]   (index 0 = K, 1 = V)
so each page needs ONE async copy instead of two — decode attention at
short fills is bound by DMA-programming overhead, not KV bytes, so
halving the copy count is a direct win (docs/serving_headroom.md).

``H_kv * D`` must be a multiple of 128 on real TPUs (lane tiling).
A pure-jnp reference backs the kernel on CPU and in tests.

Pools may be stored in fp8 (``jnp.float8_e4m3fn``): half the KV HBM and
half the DMA bytes of bf16; the kernel upcasts blocks to bf16 in VMEM
before the MXU dots. Serve with ``BatchServer(kv_dtype=jnp.float8_e4m3fn)``.
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

# "no limit" sentinel for per-request windows (fits int32, larger than any
# real context length); plain int so kernels don't capture an array constant
_NO_WINDOW = 0x3FFFFFFF


def _is_low_precision_kv(dtype) -> bool:
    """True for KV-pool dtypes that need an in-kernel upcast before the
    attention dots (fp8 storage: half the KV HBM of bf16, so double the
    concurrent batch/context per chip; dequantization is a free elementwise
    cast fused into the VMEM read)."""
    return jnp.dtype(dtype) in (
        jnp.dtype(jnp.float8_e4m3fn), jnp.dtype(jnp.float8_e5m2),
    )


def _effective_window(window, windows, b):
    """Per-row window limit [B] combining a static ``window`` with an
    optional per-request ``windows`` array (<=0 entries mean "no limit");
    None when neither imposes a limit."""
    if windows is None:
        if window is None:
            return None
        return jnp.full((b,), window, jnp.int32)
    w = jnp.where(windows > 0, windows.astype(jnp.int32), _NO_WINDOW)
    if window is not None:
        w = jnp.minimum(w, jnp.int32(window))
    return w


def paged_attention_reference(q, k_pages, v_pages, page_indices, lengths, *,
                              num_kv_heads: int,
                              sm_scale: Optional[float] = None,
                              window: Optional[int] = None,
                              windows=None,
                              append_kv=None,
                              page_offset: int = 0):
    """jnp reference: gather pages then masked attention. ``window``
    restricts each decode token to its last ``window`` keys (Mistral-style
    sliding-window attention at serve time). ``windows`` is an optional
    per-request [B] int32 limit (<=0 rows mean "no limit"); when both are
    given each row uses the tighter of the two. ``v_pages=None`` selects
    the FUSED layout (k_pages is kv_pages [P, 2, page, H_kv*D]).

    ``append_kv=(new_k [B, H_kv*D], new_v [B, H_kv*D])`` injects the
    CURRENT decode token's K/V directly into the attention (as key
    position ``lengths[b]``, always visible to its own query) without it
    being in the pool — the serving engine uses this to DEFER all layers'
    pool writes to one batched scatter per step instead of two scatters
    per layer (docs/serving_headroom.md). ``page_offset`` is added to
    every physical page id — layer ``li`` of a layer-stacked pool
    ``[L*P, ...]`` is addressed with ``page_offset=li * P`` so no
    XLA-level layer slice (= full pool copy) ever materializes."""
    if v_pages is None:
        k_pages, v_pages = k_pages[:, 0], k_pages[:, 1]
    b, h, d = q.shape
    page = k_pages.shape[1]
    pages_per_seq = page_indices.shape[1]
    h_kv = num_kv_heads
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if _is_low_precision_kv(k_pages.dtype):
        # fp8 KV cache: dequantize after the gather (f8 has no implicit
        # promotion path, so the einsums below would reject it)
        k_pages = k_pages.astype(q.dtype)
        v_pages = v_pages.astype(q.dtype)
    # gather: [B, pages, page, H_kv*D] -> [B, T, H_kv, D] -> [B, H_kv, T, D]
    k = k_pages[page_indices + page_offset].reshape(
        b, pages_per_seq * page, h_kv, d)
    v = v_pages[page_indices + page_offset].reshape(
        b, pages_per_seq * page, h_kv, d)
    eff_lengths = lengths
    if append_kv is not None:
        new_k, new_v = append_kv
        # place the new token at key position lengths[b] (clamped into the
        # table; the engine guarantees the slot's page is allocated)
        pos_new = jnp.minimum(lengths, pages_per_seq * page - 1)
        k = k.at[jnp.arange(b), pos_new].set(
            new_k.reshape(b, h_kv, d).astype(k.dtype))
        v = v.at[jnp.arange(b), pos_new].set(
            new_v.reshape(b, h_kv, d).astype(v.dtype))
        eff_lengths = lengths + 1
    k = jnp.moveaxis(k, 2, 1)
    v = jnp.moveaxis(v, 2, 1)
    if h_kv != h:
        k = jnp.repeat(k, h // h_kv, axis=1)
        v = jnp.repeat(v, h // h_kv, axis=1)
    s = jnp.einsum("bhd,bhkd->bhk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    pos = jnp.arange(pages_per_seq * page)[None, None, :]
    keep = pos < eff_lengths[:, None, None]
    w_eff = _effective_window(window, windows, b)
    if w_eff is not None:
        keep = keep & (pos >= eff_lengths[:, None, None]
                       - w_eff[:, None, None])
    s = jnp.where(keep, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhk,bhkd->bhd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    # no valid keys -> zero output (not the meaningless uniform-softmax mean)
    o = jnp.where(eff_lengths[:, None, None] > 0, o, 0.0)
    return o.astype(q.dtype)


def _paged_kernel(
    # scalar prefetch (SMEM; the last two are WRITABLE cross-cell state)
    page_indices_ref,    # [B * pages_per_seq] int32 (flattened)
    lengths_ref,         # [B] int32
    windows_ref,         # [B] int32 per-request limits (<=0: none)
    cnt_ref,             # [1] int32 — cumulative blocks DMA'd (slot parity)
    init_ref,            # [1] int32 — 1 until the first cell ran
    # inputs
    q_ref,               # [G, H, D] VMEM (this cell's G sequences' queries)
    new_k_ref,           # [G, H_kv*D] VMEM (append mode) or None
    new_v_ref,           # [G, H_kv*D] VMEM (append mode) or None
    k_pages_ref,         # [P, page, H_kv*D] ANY (stays in HBM); with
                         # fused_kv: kv_pages [P, 2, page, H_kv*D]
    v_pages_ref,         # None with fused_kv
    # outputs
    o_ref,               # [G, H, D]
    # scratch
    k_buf,               # [2, G, pages_per_block, page, H_kv*D] VMEM; with
                         # fused_kv: [2, G, pages_per_block, 2, page, H_kv*D]
    v_buf,               # None with fused_kv
    sems,                # DMA semaphores [2, 2]
    *, pages_per_seq, pages_per_block, page, sm_scale, num_kv_heads,
    head_dim, batch, group, window=None, dynamic_window=False, cast_kv=False,
    fused_kv=False, single_pass=False, page_offset=0,
):
    """One GROUP of G sequences per cell. Measured on v5e
    (scripts/exp_paged_sweep.py): per-cell fixed cost (~1.6us: grid
    sequencing, DMA programming, epilogue) dominates decode-attention time
    at B=32 — KV bytes are only ~10% of it — so packing G sequences per
    cell amortizes the fixed cost G-fold. An in-cell ``fori_loop`` with a
    DYNAMIC bound walks the union of the group's live kv blocks (per-seq
    masking keeps rows correct), and the last live block prefetches the
    NEXT group's first block — the double-buffer slot parity rides in a
    writable scalar-prefetch counter, so DMA latency is hidden across cell
    boundaries too. With ``window`` (static, per-layer) and/or
    ``dynamic_window`` (per-request limits in ``windows_ref``) the walk
    starts at the first block intersecting the group's sliding bands
    ``[length - w, length)``, so DMA and compute are bounded by the
    windows, not the sequence lengths.

    Two grid modes:
      - ``single_pass=False``: grid = (B/G,), one Mosaic grid cell per
        group; q_ref/o_ref are [G, H, D] blocks and the double-buffer
        parity crosses cells through the writable ``cnt_ref`` scalar.
      - ``single_pass=True``: grid = (1,), ALL groups walked by an
        internal ``fori_loop``; q_ref/o_ref are the full [B, H, D] arrays
        (dynamic slices per group) and the parity is a loop carry. This
        pays the per-cell fixed cost ONCE per kernel launch instead of
        B/G times — at the serving bench shapes that cost is ~40% of the
        whole kernel (docs/serving_headroom.md).
    """
    bk = pages_per_block * page
    n_blocks = pages_per_seq // pages_per_block
    G = group
    hq = q_ref.shape[1]
    d = head_dim
    hkv = num_kv_heads
    q_per_kv = hq // hkv

    append = new_k_ref is not None

    def win_of(b_):
        """Effective window for row b_: python int, traced int32, or None.
        In append mode the window covers the OLD tokens plus the injected
        self token, so the old-token band is one narrower: the mask
        ``tok >= len - (w-1)`` equals ``tok >= (len+1) - w``."""
        if not dynamic_window:
            if window is None:
                return None
            return max(window - 1, 0) if append else window
        w = windows_ref[b_]
        w = jnp.where(w > 0, w, _NO_WINDOW)
        if window is not None:
            w = jnp.minimum(w, jnp.int32(window))
        if append:
            w = jnp.maximum(w - 1, 0)
        return w

    # a length-0 sequence still walks one block so the DMA chain stays
    # balanced; its output is explicitly zeroed at the end (matching the
    # reference implementation's convention for no-valid-keys rows)
    def live_range(cell_):
        """Union of the cell's G sequences' live block ranges."""
        start = end = None
        for g in range(G):
            b_ = cell_ * G + g
            ln = lengths_ref[b_]
            end_g = jnp.clip((ln + bk - 1) // bk, 1, n_blocks)
            w = win_of(b_)
            if w is None:
                start_g = jnp.int32(0)
            else:
                start_g = jnp.minimum(
                    jnp.maximum(ln - w, 0) // bk, end_g - 1)
            start = start_g if start is None else jnp.minimum(start, start_g)
            end = end_g if end is None else jnp.maximum(end, end_g)
        return start, end

    def page_dma(slot, cell_, block_idx):
        copies = []
        for g in range(G):
            b_ = cell_ * G + g
            for j in range(pages_per_block):
                logical = block_idx * pages_per_block + j
                phys = (page_indices_ref[b_ * pages_per_seq + logical]
                        + page_offset)
                if fused_kv:
                    # ONE copy moves the page's K and V together — at short
                    # fills decode attention is bound by DMA programming,
                    # not bytes, so halving the copy count is a direct win
                    copies.append(pltpu.make_async_copy(
                        k_pages_ref.at[phys], k_buf.at[slot, g, j],
                        sems.at[slot, 0]
                    ))
                else:
                    copies.append(pltpu.make_async_copy(
                        k_pages_ref.at[phys], k_buf.at[slot, g, j],
                        sems.at[slot, 0]
                    ))
                    copies.append(pltpu.make_async_copy(
                        v_pages_ref.at[phys], v_buf.at[slot, g, j],
                        sems.at[slot, 1]
                    ))
        return copies

    # fixed (cell-independent) iotas for the score-matrix masks
    rows = jax.lax.broadcasted_iota(jnp.int32, (G * hq, d), 0) % hq
    seq_row = jax.lax.broadcasted_iota(jnp.int32, (G * hq, 1), 0) // hq
    col_seq = jax.lax.broadcasted_iota(jnp.int32, (1, G * bk), 1) // bk
    tok0 = jax.lax.broadcasted_iota(jnp.int32, (1, G * bk), 1) % bk
    windowed = window is not None or dynamic_window

    def run_cell(cell, entry_cnt):
        """Attend the G sequences of group ``cell`` (block walk + online
        softmax + output store); returns the number of blocks walked so the
        caller can advance the double-buffer parity."""
        start, end = live_range(cell)
        n_live = end - start
        # hoisted out of the block loop: expand q block-diagonally
        # ([G*H, H_kv*D], head h nonzero only in its own kv group's lane
        # slice) so ONE matmul per sequence contracts every group at once —
        # a per-group loop of tiny [q_per_kv, D] dots costs several times
        # the DMA time in per-instruction overhead
        if single_pass:
            q_all = q_ref[pl.ds(cell * G, G)].reshape(G * hq, d)
        else:
            q_all = q_ref[...].reshape(G * hq, d)
        q_exp = jnp.concatenate(
            [jnp.where(rows // q_per_kv == g, q_all, 0) for g in range(hkv)],
            axis=1,
        )  # [G*H, H_kv*D]

        # per-row (= per q head, grouped by sequence) lengths and windows as
        # [G*H, 1] columns, hoisted out of the block loop; the block masks
        # below are then a handful of broadcast compares on the full
        # [G*H, G*bk] score matrix instead of G per-sequence passes
        lengths = [lengths_ref[cell * G + g] for g in range(G)]
        wins = [win_of(cell * G + g) for g in range(G)]
        len_col = jnp.concatenate(
            [jnp.zeros((hq, 1), jnp.int32) + lengths[g] for g in range(G)],
            axis=0,
        ) if G > 1 else jnp.zeros((hq, 1), jnp.int32) + lengths[0]
        if windowed:
            win_col = jnp.concatenate(
                [jnp.zeros((hq, 1), jnp.int32) +
                 (wins[g] if wins[g] is not None else _NO_WINDOW)
                 for g in range(G)],
                axis=0,
            ) if G > 1 else (jnp.zeros((hq, 1), jnp.int32) + wins[0])
        else:
            win_col = None

        def body(i, carry):
            m_acc, l_acc, o_acc = carry  # [G*H, 1], [G*H, 1], [G*H, Hkv*D]
            slot = (entry_cnt + i) % 2
            nslot = (entry_cnt + i + 1) % 2

            @pl.when(i + 1 < n_live)
            def _():  # next block of this group
                for c in page_dma(nslot, cell, start + i + 1):
                    c.start()

            @pl.when((i + 1 == n_live) & (cell + 1 < batch))
            def _():  # last live block: prefetch next group's first block
                for c in page_dma(nslot, cell + 1, live_range(cell + 1)[0]):
                    c.start()

            for c in page_dma(slot, cell, start + i):
                c.wait()

            # ONE [G*H, fused] x [G*bk, fused]^T dot for the whole group:
            # G^2-G of its blocks are cross-sequence garbage (masked below),
            # but on the MXU the big dot measures 2.5x faster PER SEQUENCE
            # than G small [H, bk] dots (1.66 vs 4.14 us/block,
            # scripts/exp_mxu_forms.py) — M=12-row dots leave the systolic
            # array idle while tiles load.
            if fused_kv:
                kv = k_buf[slot]  # [G, ppb, 2, page, fused]
                k_all = kv[:, :, 0].reshape(G * bk, hkv * d)
                v_all = kv[:, :, 1].reshape(G * bk, hkv * d)
            else:
                k_all = k_buf[slot].reshape(G * bk, hkv * d)
                v_all = v_buf[slot].reshape(G * bk, hkv * d)
            if cast_kv:
                # fp8 pool: upcast to bf16 for the MXU dots (elementwise,
                # fused into the VMEM read; the DMA moved half the bytes)
                k_all = k_all.astype(jnp.bfloat16)
                v_all = v_all.astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                q_exp, k_all, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale  # [G*H, G*bk]
            tok = tok0 + (start + i) * bk      # [1, G*bk] block-global pos
            keep = (col_seq == seq_row) & (tok < len_col)
            if windowed:
                keep = keep & (tok >= len_col - win_col)
            s = jnp.where(keep, s, NEG_INF)

            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_acc, m_cur)
            alpha = jnp.exp(m_acc - m_new)
            # the where-guard (not just the NEG_INF fill) matters: a row
            # whose current block is FULLY masked (group walk covers the
            # union of the members' live ranges, so a member can see blocks
            # outside its own band) has m_new == NEG_INF on first touch and
            # exp(s - m_new) == 1 for every masked entry without it
            p = jnp.where(keep, jnp.exp(s - m_new), 0.0)
            l_new = alpha * l_acc + jnp.sum(p, axis=1, keepdims=True)
            # o_exp[h] = p[h] @ v over ALL lane groups (cross-sequence p
            # entries are exactly 0 after the mask, so each row only picks
            # up its own sequence's v rows); each head's own group slice is
            # extracted at the end
            o_blk = jax.lax.dot(
                p.astype(v_all.dtype), v_all,
                preferred_element_type=jnp.float32,
            )  # [G*H, H_kv*D]
            return m_new, l_new, o_acc * alpha + o_blk

        m0 = jnp.full((G * hq, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((G * hq, 1), jnp.float32)
        o0 = jnp.zeros((G * hq, hkv * d), jnp.float32)
        m, l, o_exp = jax.lax.fori_loop(0, n_live, body, (m0, l0, o0))

        if append:
            # inject the CURRENT token's K/V (VMEM inputs, not yet in the
            # pool) as one extra online-softmax column — always visible to
            # its own query, so the engine can defer all pool writes to one
            # batched scatter per step
            if single_pass:
                ak = new_k_ref[pl.ds(cell * G, G)]
                av = new_v_ref[pl.ds(cell * G, G)]
            else:
                ak = new_k_ref[...]
                av = new_v_ref[...]
            if cast_kv:
                ak = ak.astype(jnp.bfloat16)
                av = av.astype(jnp.bfloat16)
            # [G, F] -> [G*H, F] (each query head sees its sequence's row;
            # q_exp's zero-masking picks the head's own kv-group D-slice)
            nk = jnp.broadcast_to(
                ak[:, None, :].astype(jnp.float32), (G, hq, hkv * d)
            ).reshape(G * hq, hkv * d)
            nv = jnp.broadcast_to(
                av[:, None, :].astype(jnp.float32), (G, hq, hkv * d)
            ).reshape(G * hq, hkv * d)
            s_new = jnp.sum(
                q_exp.astype(jnp.float32) * nk, axis=1, keepdims=True
            ) * sm_scale
            m_f = jnp.maximum(m, s_new)
            alpha = jnp.exp(m - m_f)
            p_new = jnp.exp(s_new - m_f)
            l = l * alpha + p_new
            o_exp = o_exp * alpha + p_new * nv

        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_exp = o_exp * l_inv
        o = jnp.zeros((G * hq, d), jnp.float32)
        for g in range(hkv):
            o = o + jnp.where(
                rows // q_per_kv == g, o_exp[:, g * d:(g + 1) * d], 0.0
            )
        if not append:
            # no valid keys -> zero output, per sequence (append mode always
            # has >= 1 valid key: the injected self token)
            len_rows = jnp.concatenate(
                [jnp.zeros((hq, 1), jnp.int32) + lengths[g]
                 for g in range(G)],
                axis=0,
            ) if G > 1 else jnp.zeros((hq, 1), jnp.int32) + lengths[0]
            o = jnp.where(len_rows > 0, o, 0.0)
        o = o.reshape(G, hq, d).astype(o_ref.dtype)
        if single_pass:
            o_ref[pl.ds(cell * G, G)] = o
        else:
            o_ref[...] = o
        return n_live

    if single_pass:
        # grid = (1,): walk every group in ONE Mosaic cell, slot parity as
        # a loop carry; the first group's first block is DMA'd up front
        for c in page_dma(0, 0, live_range(0)[0]):
            c.start()

        def cell_body(cell, cnt):
            return cnt + run_cell(cell, cnt)

        jax.lax.fori_loop(0, batch, cell_body, jnp.int32(0))
    else:
        cell = pl.program_id(0)
        entry_cnt = cnt_ref[0]

        @pl.when(init_ref[0] == 1)
        def _first():  # the very first cell starts its own first-block DMA
            for c in page_dma(entry_cnt % 2, cell, live_range(cell)[0]):
                c.start()

        init_ref[0] = 0
        cnt_ref[0] = entry_cnt + run_cell(cell, entry_cnt)


def paged_attention(q, k_pages, v_pages, page_indices, lengths, *,
                    num_kv_heads: int,
                    sm_scale: Optional[float] = None,
                    pages_per_block: int = 2,
                    window: Optional[int] = None,
                    windows=None,
                    append_kv=None,
                    page_offset: int = 0,
                    single_pass: Optional[bool] = None,
                    interpret: Optional[bool] = None):
    """Decode attention over the paged KV pool (shapes in module docstring).
    Returns [B, H, D]. Grid: one cell per sequence. ``window`` restricts each
    decode token to its last ``window`` keys and skips the pages below the
    band entirely (sliding-window serving: cost bounded by the window).
    ``windows`` adds PER-REQUEST limits: a [B] int32 array where entry b
    caps row b's attention to its last ``windows[b]`` keys (<=0 entries
    mean "no per-request limit"); rows use the tighter of the two limits.

    ``append_kv=(new_k [B, H_kv*D], new_v [B, H_kv*D])`` injects the
    current decode token's K/V as key position ``lengths[b]`` straight
    from VMEM (it need not be in the pool): the serving engine defers all
    layers' pool writes to ONE batched scatter per step. ``lengths`` are
    then the OLD lengths; the effective count is ``lengths + 1`` and the
    self token is always visible (also inside any window).
    ``page_offset`` (static int) is added to every physical page id so a
    layer-stacked pool ``[L*P, ...]`` is addressed per layer without any
    XLA-level slicing (``page_offset=li * P``)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if window is not None:
        window = int(window)
        if window <= 0:
            raise ValueError("window must be a positive int")
    b, h, d = q.shape
    fused_kv = v_pages is None
    if fused_kv:
        total_pages, two, page, fused = k_pages.shape
        assert two == 2, f"fused kv_pages must be [P, 2, page, fused]"
    else:
        total_pages, page, fused = k_pages.shape
    assert fused == num_kv_heads * d, (fused, num_kv_heads, d)
    if windows is not None:
        windows = jnp.asarray(windows, jnp.int32)
        if windows.shape != (b,):
            raise ValueError(f"windows must be [B]={b}, got {windows.shape}")
    if append_kv is not None:
        new_k, new_v = append_kv
        if new_k.shape != (b, fused) or new_v.shape != (b, fused):
            raise ValueError(
                f"append_kv arrays must be [B={b}, {fused}], got "
                f"{new_k.shape} / {new_v.shape}")
        append_kv = (new_k.astype(k_pages.dtype)
                     if not _is_low_precision_kv(k_pages.dtype)
                     else new_k.astype(q.dtype),
                     new_v.astype(k_pages.dtype)
                     if not _is_low_precision_kv(k_pages.dtype)
                     else new_v.astype(q.dtype))
    if not interpret and fused % 128:
        # Mosaic requires HBM DMA slices lane-aligned (fused width % 128);
        # models too narrow for the kernel take the gather-based path.
        return paged_attention_reference(
            q, k_pages, v_pages, page_indices, lengths,
            num_kv_heads=num_kv_heads, sm_scale=sm_scale, window=window,
            windows=windows, append_kv=append_kv, page_offset=page_offset,
        )
    pages_per_seq = page_indices.shape[1]
    assert h % num_kv_heads == 0
    if pages_per_seq % pages_per_block != 0:
        pages_per_block = math.gcd(pages_per_seq, pages_per_block) or 1
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    # group G sequences per grid cell and score them with ONE
    # [G*H, G*bk] dot: measured on v5e (scripts/exp_mxu_forms.py), the big
    # dot runs 2.5x faster PER SEQUENCE than G small [H, bk] dots — decode
    # attention is bound by KV bytes moving through the MXU, and 12-row dots
    # leave the systolic array idle while tiles load. G is the largest value
    # whose double-buffered K/V staging fits a ~6MB VMEM budget (v5e has
    # ~16MB; the f32 score/prob matrices and Mosaic temporaries need the
    # rest)
    esize = jnp.dtype(k_pages.dtype).itemsize
    block_bytes = 2 * pages_per_block * page * fused * esize * 2
    g_vmem = max(1, (6 << 20) // block_bytes)
    group = 1
    for cand in (8, 4, 2):
        if b % cand == 0 and cand <= g_vmem:
            group = cand
            break

    if single_pass is None:
        # one Mosaic cell walking all groups internally beats one cell per
        # group whenever there is more than one group: the per-cell fixed
        # cost (~1.6us on v5e) is paid once per launch instead of B/G times
        single_pass = b // group > 1

    append = append_kv is not None
    base_kernel = functools.partial(
        _paged_kernel, pages_per_seq=pages_per_seq,
        pages_per_block=pages_per_block, page=page, sm_scale=sm_scale,
        num_kv_heads=num_kv_heads, head_dim=d, batch=b // group, group=group,
        window=window, dynamic_window=windows is not None,
        cast_kv=_is_low_precision_kv(k_pages.dtype), fused_kv=fused_kv,
        single_pass=single_pass, page_offset=page_offset,
    )
    if append:
        if single_pass:
            nk_spec = pl.BlockSpec((b, fused), lambda *_: (0, 0))
        else:
            nk_spec = pl.BlockSpec((group, fused), lambda bi, *_: (bi, 0))
        append_specs = [nk_spec, nk_spec]
        append_args = (append_kv[0], append_kv[1])
    else:
        append_specs = []
        append_args = ()
    if fused_kv:
        if append:
            def kernel(pi, ln, wins, cnt, init, q_r, nk_r, nv_r, kv_r,
                       o_r, kv_b, sems):
                base_kernel(pi, ln, wins, cnt, init, q_r, nk_r, nv_r,
                            kv_r, None, o_r, kv_b, None, sems)
        else:
            def kernel(pi, ln, wins, cnt, init, q_r, kv_r, o_r, kv_b,
                       sems):
                base_kernel(pi, ln, wins, cnt, init, q_r, None, None,
                            kv_r, None, o_r, kv_b, None, sems)

        kv_in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
        kv_scratch = [pltpu.VMEM(
            (2, group, pages_per_block, 2, page, fused), k_pages.dtype)]
        kv_args = (k_pages,)
    else:
        if append:
            def kernel(pi, ln, wins, cnt, init, q_r, nk_r, nv_r, k_r, v_r,
                       o_r, k_b, v_b, sems):
                base_kernel(pi, ln, wins, cnt, init, q_r, nk_r, nv_r,
                            k_r, v_r, o_r, k_b, v_b, sems)
        else:
            def kernel(pi, ln, wins, cnt, init, q_r, k_r, v_r, o_r, k_b,
                       v_b, sems):
                base_kernel(pi, ln, wins, cnt, init, q_r, None, None,
                            k_r, v_r, o_r, k_b, v_b, sems)

        kv_in_specs = [pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pl.ANY)]
        kv_scratch = [
            pltpu.VMEM((2, group, pages_per_block, page, fused),
                       k_pages.dtype),
            pltpu.VMEM((2, group, pages_per_block, page, fused),
                       v_pages.dtype),
        ]
        kv_args = (k_pages, v_pages)
    if single_pass:
        # full q/o in VMEM (dynamic [G]-slices per group inside the kernel)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(1,),
            in_specs=[pl.BlockSpec((b, h, d), lambda *_: (0, 0, 0))]
            + append_specs + kv_in_specs,
            out_specs=pl.BlockSpec((b, h, d), lambda *_: (0, 0, 0)),
            scratch_shapes=kv_scratch + [pltpu.SemaphoreType.DMA((2, 2))],
        )
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(b // group,),
            in_specs=[pl.BlockSpec((group, h, d), lambda bi, *_: (bi, 0, 0))]
            + append_specs + kv_in_specs,
            out_specs=pl.BlockSpec((group, h, d), lambda bi, *_: (bi, 0, 0)),
            scratch_shapes=kv_scratch + [pltpu.SemaphoreType.DMA((2, 2))],
        )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            # cross-cell DMA state (slot counter, init flag) requires a
            # single sequential traversal
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        page_indices.reshape(-1).astype(jnp.int32),
        lengths.astype(jnp.int32),
        (jnp.zeros((b,), jnp.int32) if windows is None else windows),
        jnp.zeros((1,), jnp.int32),   # block counter (writable SMEM state)
        jnp.ones((1,), jnp.int32),    # init flag
        q, *append_args, *kv_args,
    )


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _pool_append(k_pages, v_pages, k, v, pg, slot):
    return (k_pages.at[pg, slot].set(k.astype(k_pages.dtype)),
            v_pages.at[pg, slot].set(v.astype(v_pages.dtype)))


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
        # jitted with donated pools: the scatter updates in place instead of
        # copying the whole pool per appended token
        self.k_pages, self.v_pages = _pool_append(
            self.k_pages, self.v_pages, k.reshape(-1), v.reshape(-1),
            jnp.asarray(pg, jnp.int32), jnp.asarray(slot, jnp.int32),
        )
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
