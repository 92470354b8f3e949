"""Fused scaled-dot-product attention (flash attention) for TPU.

TPU-native replacement for the reference's cuDNN flash-attention binding
(reference: lamp-sten/src/main/scala/lamp/STen.scala:501-585
``scaledDotProductAttention(Backward)`` and the autograd op
lamp-core/src/main/scala/lamp/autograd/ops.scala:2342 with its routing gate
Transformer.scala:949-961).

Design: a Pallas forward kernel with online softmax (never materializes the
(Sq, Skv) score matrix), saving per-row logsumexp residuals; two Pallas
backward kernels (dq, and dk/dv) that recompute attention weights from the
residuals — the standard flash-attention-2 structure. All softmax statistics
are f32; QK^T and PV matmuls accumulate in f32 on the MXU.

The public entry :func:`dot_product_attention` routes to the Pallas kernel on
TPU (with the same eligibility conditions as the reference gate: no dropout —
dropout is applied outside) and to a pure-XLA reference implementation
elsewhere.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dot_product_attention", "flash_attention", "compact_attention",
           "mha_reference"]

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128


def mha_reference(q, k, v, *, causal=False, sm_scale=None, mask=None,
                  window=None, segment_ids=None):
    """Pure-XLA attention, used on CPU and as the numerics oracle in tests.

    q: [B, H, Sq, D], k/v: [B, H, Skv, D]. ``mask`` is an optional boolean
    array broadcastable to [B, H, Sq, Skv]; True = attend. ``window`` (with
    ``causal=True``) restricts each query row to the last ``window`` keys —
    Mistral-style sliding-window attention. ``segment_ids`` ([B, S] int, or a
    ``(q_ids, kv_ids)`` pair) restricts attention to keys in the same
    segment — packed-document masking.
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    if segment_ids is not None:
        q_ids, kv_ids = (segment_ids if isinstance(segment_ids, tuple)
                         else (segment_ids, segment_ids))
        seg = q_ids[:, None, :, None] == kv_ids[:, None, None, :]
        mask = seg if mask is None else (mask & seg)
    acc = jnp.promote_types(q.dtype, jnp.float32)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=acc
    ) * sm_scale
    if causal:
        sq, skv = q.shape[2], k.shape[2]
        # align diagonals to the *end* of the kv sequence (standard convention
        # when Sq != Skv, e.g. decoding)
        qpos = jnp.arange(sq)[:, None] + (skv - sq)
        kpos = jnp.arange(skv)[None, :]
        keep = kpos <= qpos
        if window is not None:
            keep = keep & (kpos > qpos - window)
        s = jnp.where(keep, s, NEG_INF)
    elif window is not None:
        raise ValueError("window requires causal=True")
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=acc,
    ).astype(q.dtype)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(lim_ref, sq_ref, sk_ref, m_ref, q_ref, k_ref, v_ref, o_ref,
                lse_ref, m_scr, l_scr, acc_scr,
                *, sm_scale, causal, block_q, block_k, kv_len, q_offset,
                heads, window=None):
    # lse_ref is None in the inference-only variant (no residuals saved);
    # lim_ref ([1, 1, block_q] int32 VMEM) is None without kv-length limits —
    # per-QUERY-ROW limits, covering both the reference's 1D (per-batch) and
    # 2D (per-query-token) maxLength protocols in-kernel; sq_ref/sk_ref
    # ([1, 1, block_q] / [1, 1, block_k] int32) are the q/kv segment-id tiles
    # for packed-document masking, None when unsegmented; m_ref
    # ([1, block_q, block_k] int8) is the arbitrary keep-mask tile (nonzero =
    # attend), None when unmasked — all-zero tiles skip the block's matmuls
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)
    if lim_ref is not None:
        kv_limit = jnp.minimum(lim_ref[0, 0][:, None], kv_len)  # [block_q, 1]
    else:
        kv_limit = kv_len

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # causal: skip kv tiles entirely above the diagonal; window: also skip
    # tiles entirely below the sliding band
    run = True
    if causal:
        run = (qi + 1) * block_q + q_offset > ki * block_k
        if window is not None:
            run = run & (
                (ki + 1) * block_k > qi * block_q + q_offset - (window - 1)
            )
    if sq_ref is not None:
        # tiles whose [min, max] id ranges don't overlap share no segment:
        # with packed (sorted) ids this skips everything off the block
        # diagonal, making compute linear in sum(len_i * len_i)
        run = run & (jnp.max(sk_ref[0, 0]) >= jnp.min(sq_ref[0, 0])) \
                  & (jnp.min(sk_ref[0, 0]) <= jnp.max(sq_ref[0, 0]))
    if m_ref is not None:
        # block-sparse masks (prefix-LM, block-diagonal, ...) skip the
        # matmuls of fully-masked tiles
        run = run & (jnp.max(m_ref[0]) > 0)

    @pl.when(run)
    def _compute():
        q = q_ref[0]  # [block_q, d]
        k = k_ref[0]  # [block_k, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale  # [block_q, block_k]

        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        valid = cols < kv_limit
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) \
                + qi * block_q + q_offset
            valid = valid & (cols <= rows)
            if window is not None:
                valid = valid & (cols > rows - window)
        if sq_ref is not None:
            valid = valid & (sq_ref[0, 0][:, None] == sk_ref[0, 0][None, :])
        if m_ref is not None:
            valid = valid & (m_ref[0] != 0)
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_scr[...]           # [block_q, LANES]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]  # [block_q, 1]
        m_next = jnp.maximum(m_prev, m_curr)  # broadcast to LANES
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])        # [block_q, block_k]
        l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
        m_scr[...] = m_next
        l_scr[...] = l_next

        v = v_ref[0]
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(ki == n_k - 1)
    def _store():
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * l_inv[:, :1]).astype(o_ref.dtype)
        if lse_ref is not None:
            m = m_scr[...]
            lse = m[:, :1] + jnp.log(jnp.maximum(l[:, :1], 1e-37))
            lse_ref[0] = jnp.broadcast_to(
                lse, lse_ref.shape[1:]
            ).astype(jnp.float32)


def _opt_inputs(limits, seg_q, seg_kv, heads, block_q, block_k, qmap, kmap,
                mask=None, mmap=None):
    """Assemble the optional kv-limit / segment-id / arbitrary-mask kernel
    inputs: returns (extra in_specs, extra args, wrap) where ``wrap(base)``
    adapts a kernel expecting ``(lim_ref, sq_ref, sk_ref, m_ref, *rest)`` to
    only the present refs. ``qmap``/``kmap`` are the grid index maps of q
    tiles / kv tiles; ``mmap`` maps to the [*, block_q, block_k] mask tile
    (leading dim bh for per-head masks, b for head-broadcast ones)."""
    specs, args = [], []
    has_len = limits is not None
    has_seg = seg_q is not None
    has_mask = mask is not None
    if has_len:
        specs.append(pl.BlockSpec((1, 1, block_q), qmap))
        args.append(limits)
    if has_seg:
        specs.append(pl.BlockSpec((1, 1, block_q), qmap))
        args.append(seg_q)
        specs.append(pl.BlockSpec((1, 1, block_k), kmap))
        args.append(seg_kv)
    if has_mask:
        specs.append(pl.BlockSpec((1, block_q, block_k), mmap))
        args.append(mask)

    def wrap(base):
        def kernel(*refs):
            i = 0
            lim = refs[0] if has_len else None
            i += has_len
            sq_ = refs[i] if has_seg else None
            sk_ = refs[i + 1] if has_seg else None
            i += 2 * has_seg
            m_ = refs[i] if has_mask else None
            i += has_mask
            return base(lim, sq_, sk_, m_, *refs[i:])

        return base if (has_len and has_seg and has_mask) else kernel

    return specs, args, wrap


def _fwd(q, k, v, limits, seg_q, seg_kv, mask, sm_scale, causal, block_q,
         block_k, kv_len, q_offset, heads, interpret, save_residuals=True,
         window=None):
    bh, sq, d = q.shape
    skv = k.shape[1]
    grid = (bh, sq // block_q, skv // block_k)

    base = functools.partial(
        _fwd_kernel, sm_scale=sm_scale, causal=causal, block_q=block_q,
        block_k=block_k, kv_len=kv_len, q_offset=q_offset, heads=heads,
        window=window,
    )
    mdiv = heads if mask is not None and mask.shape[0] != bh else 1
    opt_specs, opt_args, wrap = _opt_inputs(
        limits, seg_q, seg_kv, heads, block_q, block_k,
        qmap=lambda b, i, j: (b // heads, 0, i),
        kmap=lambda b, i, j: (b // heads, 0, j),
        mask=mask, mmap=lambda b, i, j: (b // mdiv, i, j),
    )
    if save_residuals:
        kernel = wrap(base)
        out_shapes = (
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),          # o
            jax.ShapeDtypeStruct((bh, sq, LANES), jnp.float32),  # lse
        )
        out_specs = (
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, LANES), lambda b, i, j: (b, i, 0)),
        )
    else:
        def base_nolse(lim_ref, sq_ref, sk_ref, m_ref, q_ref, k_ref, v_ref,
                       o_ref, *scr):
            base(lim_ref, sq_ref, sk_ref, m_ref, q_ref, k_ref, v_ref, o_ref,
                 None, *scr)

        kernel = wrap(base_nolse)
        out_shapes = jax.ShapeDtypeStruct((bh, sq, d), q.dtype)
        out_specs = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0))

    in_specs = opt_specs + [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
    ]
    args = tuple(opt_args) + (q, k, v)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    if save_residuals:
        o, lse = out
        return o, lse[:, :, 0]
    return out, None


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(lim_ref, sq_ref, sk_ref, m_ref, q_ref, k_ref, v_ref,
                   do_ref, lse_ref, di_ref,
                   dq_ref, dq_scr, *, sm_scale, causal, block_q, block_k,
                   kv_len, q_offset, heads, window=None):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)
    if lim_ref is not None:
        kv_limit = jnp.minimum(lim_ref[0, 0][:, None], kv_len)  # [block_q, 1]
    else:
        kv_limit = kv_len

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    run = True
    if causal:
        run = (qi + 1) * block_q + q_offset > ki * block_k
        if window is not None:
            run = run & (
                (ki + 1) * block_k > qi * block_q + q_offset - (window - 1)
            )
    if sq_ref is not None:
        run = run & (jnp.max(sk_ref[0, 0]) >= jnp.min(sq_ref[0, 0])) \
                  & (jnp.min(sk_ref[0, 0]) <= jnp.max(sq_ref[0, 0]))
    if m_ref is not None:
        run = run & (jnp.max(m_ref[0]) > 0)

    @pl.when(run)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0]  # [block_q, LANES] replicated
        di = di_ref[0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) \
            + qi * block_q + q_offset
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        valid = cols < kv_limit
        if causal:
            valid = valid & (cols <= rows)
            if window is not None:
                valid = valid & (cols > rows - window)
        if sq_ref is not None:
            valid = valid & (sq_ref[0, 0][:, None] == sk_ref[0, 0][None, :])
        if m_ref is not None:
            valid = valid & (m_ref[0] != 0)
        s = jnp.where(valid, s, NEG_INF)
        p = jnp.exp(s - lse[:, :1])  # [block_q, block_k]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - di[:, :1]) * sm_scale
        dq_scr[...] += jax.lax.dot(
            ds.astype(q.dtype), k, preferred_element_type=jnp.float32
        )

    @pl.when(ki == n_k - 1)
    def _store():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(lim_ref, sq_ref, sk_ref, m_ref, q_ref, k_ref, v_ref,
                    do_ref, lse_ref, di_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr,
                    *, sm_scale, causal, block_q, block_k, kv_len, q_offset,
                    heads, window=None):
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    n_q = pl.num_programs(2)
    if lim_ref is not None:
        kv_limit = jnp.minimum(lim_ref[0, 0][:, None], kv_len)  # [block_q, 1]
    else:
        kv_limit = kv_len

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    run = True
    if causal:
        run = (qi + 1) * block_q + q_offset > ki * block_k
        if window is not None:
            run = run & (
                (ki + 1) * block_k > qi * block_q + q_offset - (window - 1)
            )
    if sq_ref is not None:
        run = run & (jnp.max(sk_ref[0, 0]) >= jnp.min(sq_ref[0, 0])) \
                  & (jnp.min(sk_ref[0, 0]) <= jnp.max(sq_ref[0, 0]))
    if m_ref is not None:
        run = run & (jnp.max(m_ref[0]) > 0)

    @pl.when(run)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0]
        di = di_ref[0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) \
            + qi * block_q + q_offset
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        valid = cols < kv_limit
        if causal:
            valid = valid & (cols <= rows)
            if window is not None:
                valid = valid & (cols > rows - window)
        if sq_ref is not None:
            valid = valid & (sq_ref[0, 0][:, None] == sk_ref[0, 0][None, :])
        if m_ref is not None:
            valid = valid & (m_ref[0] != 0)
        s = jnp.where(valid, s, NEG_INF)
        p = jnp.exp(s - lse[:, :1])           # [block_q, block_k]
        # dv += P^T @ do
        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - di[:, :1]) * sm_scale  # [block_q, block_k]
        # dk += dS^T @ q
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(qi == n_q - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_fused_kernel(lim_ref, sq_ref, sk_ref, m_ref, q_ref, k_ref, v_ref,
                      do_ref, lse_ref, di_ref,
                      dqp_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                      *, sm_scale, causal, block_q, block_k, kv_len, q_offset,
                      heads, window=None):
    """One backward kernel for dq+dk+dv (5 matmuls per block pair vs 7 for
    the split dq/dkv kernels, which each recompute s and dp).

    dk/dv accumulate in VMEM scratch over the inner q sweep; dq cannot be
    accumulated the same way (it sums over the *outer* kv dimension), so each
    kv block writes its partial dq to an HBM slab [n_kv, BH, Sq, D] that the
    caller reduces — the structure of the production splash-attention fused
    backward.
    """
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    n_q = pl.num_programs(2)
    if lim_ref is not None:
        kv_limit = jnp.minimum(lim_ref[0, 0][:, None], kv_len)  # [block_q, 1]
    else:
        kv_limit = kv_len

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    dqp_ref[0, 0] = jnp.zeros_like(dqp_ref[0, 0])

    run = True
    if causal:
        run = (qi + 1) * block_q + q_offset > ki * block_k
        if window is not None:
            run = run & (
                (ki + 1) * block_k > qi * block_q + q_offset - (window - 1)
            )
    if sq_ref is not None:
        run = run & (jnp.max(sk_ref[0, 0]) >= jnp.min(sq_ref[0, 0])) \
                  & (jnp.min(sk_ref[0, 0]) <= jnp.max(sq_ref[0, 0]))
    if m_ref is not None:
        run = run & (jnp.max(m_ref[0]) > 0)

    @pl.when(run)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        # do stays in its storage dtype (bf16): a kernel-wide f32 upcast
        # put the dv and dp dots on the HALF-RATE f32 MXU path — measured
        # round 5 (scripts/exp_bwd_bisect.py): the dkv dots were ~half the
        # kernel. bf16 inputs with f32 accumulation (preferred_element_type)
        # is the same precision contract the forward uses.
        do = do_ref[0]
        # SLIM per-row side inputs: lse/di arrive as [block_q, 8] blocks
        # (8 lanes is Mosaic's minimum tile; the former [BH, Sq, 128]
        # broadcasts materialized 50 MB per array at the longctx shape only
        # for lane 0 to be read in here — 16x the bytes)
        lse = lse_ref[0]
        di = di_ref[0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) \
            + qi * block_q + q_offset
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        valid = cols < kv_limit
        if causal:
            valid = valid & (cols <= rows)
            if window is not None:
                valid = valid & (cols > rows - window)
        if sq_ref is not None:
            valid = valid & (sq_ref[0, 0][:, None] == sk_ref[0, 0][None, :])
        if m_ref is not None:
            valid = valid & (m_ref[0] != 0)
        s = jnp.where(valid, s, NEG_INF)
        p = jnp.exp(s - lse[:, :1])           # [block_q, block_k]
        # dv += P^T @ do
        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - di[:, :1]) * sm_scale  # [block_q, block_k]
        # dk += dS^T @ q
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # partial dq for this kv block
        dqp_ref[0, 0] = jax.lax.dot(
            ds.astype(q.dtype), k, preferred_element_type=jnp.float32
        ).astype(dqp_ref.dtype)

    @pl.when(qi == n_q - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _int_grads(*xs):
    """float0 cotangents for the integer operands (lengths / segment ids)."""
    import numpy as _np

    return tuple(None if x is None else _np.zeros(x.shape, jax.dtypes.float0)
                 for x in xs)


def _bwd_fused(sm_scale, causal, block_q, block_k, kv_len, q_offset, heads,
           interpret, window,
               res, g):
    q, k, v, lengths, seg_q, seg_kv, mask, o, lse = res
    bh, sq, d = q.shape
    skv = k.shape[1]
    do = g
    n_kv = skv // block_k

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    # lse/di ride SLIM (8 lanes — Mosaic's minimum tile — instead of 128):
    # the old [bh, sq, 128] broadcasts cost 2x50 MB of HBM writes+reads at
    # the longctx shape for a single read lane in the kernel
    lse_rep = jnp.broadcast_to(lse[:, :, None], (bh, sq, 8))
    di_rep = jnp.broadcast_to(di[:, :, None], (bh, sq, 8))

    data_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
        pl.BlockSpec((1, block_q, 8), lambda b, j, i: (b, i, 0)),
        pl.BlockSpec((1, block_q, 8), lambda b, j, i: (b, i, 0)),
    ]
    args = (q, k, v, do, lse_rep, di_rep)
    base = functools.partial(
        _bwd_fused_kernel, sm_scale=sm_scale, causal=causal,
        block_q=block_q, block_k=block_k, kv_len=kv_len, q_offset=q_offset,
        heads=heads, window=window,
    )
    mdiv = heads if mask is not None and mask.shape[0] != bh else 1
    opt_specs, opt_args, wrap = _opt_inputs(
        lengths, seg_q, seg_kv, heads, block_q, block_k,
        qmap=lambda b, j, i: (b // heads, 0, i),
        kmap=lambda b, j, i: (b // heads, 0, j),
        mask=mask, mmap=lambda b, j, i: (b // mdiv, i, j),
    )
    kernel = wrap(base)
    in_specs = opt_specs + data_specs
    call_args = tuple(opt_args) + args

    # partial-dq slab in q.dtype: each partial is a complete f32-accumulated
    # matmul; the outer reduction below sums in f32
    dqp, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh, n_kv, sq // block_q),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d), lambda b, j, i: (j, b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((n_kv, bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*call_args)

    dq = jnp.sum(dqp, axis=0, dtype=jnp.float32).astype(q.dtype)
    return (dq, dk, dv) + _int_grads(lengths, seg_q, seg_kv, mask)


# HBM budget for the fused backward's partial-dq slab; beyond it the split
# two-kernel backward is used (slab bytes grow as Skv/block_k * |q|).
# 1 GB keeps the 8x12-head ctx-8192 bf16 training config on the fused path
# (805 MB transient slab), measured 1.11-1.12x faster f+b than split.
_FUSED_BWD_SLAB_BYTES = 1024 * 1024 * 1024


def _bwd(sm_scale, causal, block_q, block_k, kv_len, q_offset, heads,
         interpret, window, res, g):
    # NOTE (round 5): backward-specific block sizes were prototyped after
    # a ctx-4096 sweep read bwd 512x2048 at 3.1x — the reading did not
    # replicate under long-chain interleaved A/B (docs/lm_step_headroom.md
    # "Backward-kernel investigation"), so the backward shares the
    # forward's blocks and no extra plumbing is carried.
    q, k, v = res[:3]
    n_kv = k.shape[1] // block_k
    slab = n_kv * q.size * q.dtype.itemsize
    if slab <= _FUSED_BWD_SLAB_BYTES:
        return _bwd_fused(sm_scale, causal, block_q, block_k, kv_len,
                          q_offset, heads, interpret, window, res, g)
    return _bwd_split(sm_scale, causal, block_q, block_k, kv_len, q_offset,
                      heads, interpret, window, res, g)


def _bwd_split(sm_scale, causal, block_q, block_k, kv_len, q_offset, heads,
           interpret, window,
               res, g):
    q, k, v, lengths, seg_q, seg_kv, mask, o, lse = res
    bh, sq, d = q.shape
    skv = k.shape[1]
    do = g

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    lse_rep = jnp.broadcast_to(lse[:, :, None], (bh, sq, LANES))
    di_rep = jnp.broadcast_to(di[:, :, None], (bh, sq, LANES))

    data_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_q, LANES), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_q, LANES), lambda b, i, j: (b, i, 0)),
    ]
    args = (q, k, v, do, lse_rep, di_rep)
    base_dq = functools.partial(
        _bwd_dq_kernel, sm_scale=sm_scale, causal=causal, block_q=block_q,
        block_k=block_k, kv_len=kv_len, q_offset=q_offset, heads=heads,
        window=window,
    )
    mdiv = heads if mask is not None and mask.shape[0] != bh else 1
    dq_opt_specs, dq_opt_args, dq_wrap = _opt_inputs(
        lengths, seg_q, seg_kv, heads, block_q, block_k,
        qmap=lambda b, i, j: (b // heads, 0, i),
        kmap=lambda b, i, j: (b // heads, 0, j),
        mask=mask, mmap=lambda b, i, j: (b // mdiv, i, j),
    )
    dq_kernel = dq_wrap(base_dq)
    dq_specs = dq_opt_specs + data_specs
    dq_args = tuple(dq_opt_args) + args

    dq = pl.pallas_call(
        dq_kernel,
        grid=(bh, sq // block_q, skv // block_k),
        in_specs=dq_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*dq_args)

    kv_data_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
        pl.BlockSpec((1, block_q, LANES), lambda b, j, i: (b, i, 0)),
        pl.BlockSpec((1, block_q, LANES), lambda b, j, i: (b, i, 0)),
    ]
    base_dkv = functools.partial(
        _bwd_dkv_kernel, sm_scale=sm_scale, causal=causal,
        block_q=block_q, block_k=block_k, kv_len=kv_len, q_offset=q_offset,
        heads=heads, window=window,
    )
    dkv_opt_specs, dkv_opt_args, dkv_wrap = _opt_inputs(
        lengths, seg_q, seg_kv, heads, block_q, block_k,
        qmap=lambda b, j, i: (b // heads, 0, i),
        kmap=lambda b, j, i: (b // heads, 0, j),
        mask=mask, mmap=lambda b, j, i: (b // mdiv, i, j),
    )
    dkv_kernel = dkv_wrap(base_dkv)
    dkv_specs = dkv_opt_specs + kv_data_specs
    dkv_args = tuple(dkv_opt_args) + args

    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bh, skv // block_k, sq // block_q),
        in_specs=dkv_specs,
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*dkv_args)

    return (dq, dk, dv) + _int_grads(lengths, seg_q, seg_kv, mask)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(7, 8, 9, 10, 11, 12, 13, 14, 15))
def _flash(q, k, v, lengths, seg_q, seg_kv, mask, sm_scale, causal, block_q,
           block_k, kv_len, q_offset, heads, interpret, window):
    o, _ = _fwd(q, k, v, lengths, seg_q, seg_kv, mask, sm_scale, causal,
                block_q, block_k, kv_len, q_offset, heads, interpret,
                save_residuals=False, window=window)
    return o


def _flash_fwd(q, k, v, lengths, seg_q, seg_kv, mask, sm_scale, causal,
               block_q, block_k, kv_len, q_offset, heads, interpret, window):
    o, lse = _fwd(q, k, v, lengths, seg_q, seg_kv, mask, sm_scale, causal,
                  block_q, block_k, kv_len, q_offset, heads, interpret,
                  window=window)
    return o, (q, k, v, lengths, seg_q, seg_kv, mask, o, lse)


_flash.defvjp(_flash_fwd, _bwd)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def flash_attention(q, k, v, *, causal: bool = False,
                    sm_scale: Optional[float] = None,
                    kv_lengths=None, window: Optional[int] = None,
                    segment_ids=None, mask=None,
                    block_q: int = 0, block_k: int = 0,
                    interpret: Optional[bool] = None):
    """Flash attention on [B, H, S, D] tensors via Pallas TPU kernels.

    Handles non-multiple sequence lengths by padding (padded kv positions are
    masked inside the kernel; padded q rows are sliced off). ``kv_lengths``
    masks keys/values inside the kernel — the reference's maxLength protocol
    (Transformer.scala:663-750), BOTH variants: [B] int (per batch element)
    or [B, Sq] int (per query row; the reference's own fused-kernel gate
    disables the cuDNN kernel for 2D masks — here the fast path keeps them).
    ``window`` (requires ``causal=True``) is Mistral-style sliding-window
    attention: each query attends to its last ``window`` keys; kv tiles
    entirely outside the band are skipped, making compute linear in
    ``S * window`` rather than quadratic (forward AND both backward kernels).
    ``segment_ids`` ([B, S] int, or a ``(q_ids [B, Sq], kv_ids [B, Skv])``
    pair) restricts each query to keys with an EQUAL segment id —
    packed-document (sequence-packing) masking. With contiguously packed
    (sorted) ids the kernels skip every tile whose q/kv id ranges cannot
    overlap, so compute is linear in ``sum(len_i^2)`` instead of ``S^2``
    (forward AND backward). Composes with ``causal``/``window``/lengths.
    ``mask`` is an ARBITRARY boolean keep-mask broadcastable to
    [B, H, Sq, Skv] (True = attend) — the case the reference's fused-kernel
    gate (Transformer.scala:949-961) punts to the unfused path. Mask tiles
    stream beside the score tiles as int8 (per-batch when broadcast over
    heads); fully-masked tiles skip their matmuls, so block-sparse masks
    (prefix-LM, block-diagonal) cost their live blocks only — forward AND
    both backward kernels. Composes with everything above.
    The backward pass recomputes attention weights from the saved logsumexp.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if window is not None:
        if not causal:
            raise ValueError("window requires causal=True")
        window = int(window)
        if window <= 0:
            raise ValueError("window must be a positive int")
        if window >= k.shape[2]:
            window = None  # band covers everything: plain causal
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    if block_q == 0:  # auto-tune: bigger blocks amortize grid overhead
        # (measured on v5e: 1024x1024 beats 512x1024 at ctx 2048-8192,
        # fwd and bwd; VMEM at 1024x1024 f32 scores = 4MB, well in budget)
        block_q = min(1024, _round_up(sq, 128))
    if block_k == 0:
        block_k = min(1024, _round_up(skv, 128))
    block_q_eff = min(block_q, _round_up(sq, 8))
    block_k_eff = min(block_k, _round_up(skv, 8))
    sq_p = _round_up(sq, block_q_eff)
    skv_p = _round_up(skv, block_k_eff)

    qr = q.reshape(b * h, sq, d)
    kr = k.reshape(b * h, skv, d)
    vr = v.reshape(b * h, skv, d)
    if sq_p != sq:
        qr = jnp.pad(qr, ((0, 0), (0, sq_p - sq), (0, 0)))
    if skv_p != skv:
        kr = jnp.pad(kr, ((0, 0), (0, skv_p - skv), (0, 0)))
        vr = jnp.pad(vr, ((0, 0), (0, skv_p - skv), (0, 0)))

    limits = None
    if kv_lengths is not None:
        limits = jnp.asarray(kv_lengths, jnp.int32)
        if limits.ndim == 1:
            limits = jnp.broadcast_to(limits[:, None], (b, sq))
        if sq_p != sq:  # padded q rows are sliced off; any limit works
            limits = jnp.pad(limits, ((0, 0), (0, sq_p - sq)))
        limits = limits[:, None, :]  # [B, 1, Sq]: Mosaic wants >=2 tiled dims

    seg_q = seg_kv = None
    if segment_ids is not None:
        q_ids, kv_ids = (segment_ids if isinstance(segment_ids, tuple)
                         else (segment_ids, segment_ids))
        seg_q = jnp.asarray(q_ids, jnp.int32)
        seg_kv = jnp.asarray(kv_ids, jnp.int32)
        # distinct negative pad ids: padded q rows (sliced off below) match
        # nothing, and real q rows never match padded kv columns
        if sq_p != sq:
            seg_q = jnp.pad(seg_q, ((0, 0), (0, sq_p - sq)),
                            constant_values=-1)
        if skv_p != skv:
            seg_kv = jnp.pad(seg_kv, ((0, 0), (0, skv_p - skv)),
                             constant_values=-2)
        seg_q = seg_q[:, None, :]    # [B, 1, Sq]
        seg_kv = seg_kv[:, None, :]  # [B, 1, Skv]

    m_arr = None
    if mask is not None:
        m_arr = jnp.asarray(mask)
        if m_arr.ndim != 4:
            raise ValueError("mask must broadcast to [B, H, Sq, Skv]")
        if m_arr.shape[1] == 1:  # broadcast over heads: per-batch tiles
            m_arr = jnp.broadcast_to(m_arr[:, 0], (b, sq, skv))
        else:
            m_arr = jnp.broadcast_to(
                m_arr, (b, h, sq, skv)
            ).reshape(b * h, sq, skv)
        m_arr = m_arr.astype(jnp.int8)
        # padded q rows are sliced off; padded kv columns are masked by the
        # in-kernel kv_len bound — pad value 0 also skips all-pad tiles
        if sq_p != sq or skv_p != skv:
            m_arr = jnp.pad(
                m_arr, ((0, 0), (0, sq_p - sq), (0, skv_p - skv))
            )

    # diagonal alignment from the UNPADDED lengths: padding q and kv by
    # different amounts must not shift the causal diagonal
    q_offset = skv - sq if causal else 0
    o = _flash(qr, kr, vr, limits, seg_q, seg_kv, m_arr, sm_scale, causal,
               block_q_eff, block_k_eff, skv, q_offset, h, interpret, window)
    return o[:, :sq, :].reshape(b, h, sq, d)


# ---------------------------------------------------------------------------
# compact kernels — short sequences (Skv <= ~1024)
# ---------------------------------------------------------------------------
#
# At short context the flash structure is overhead-bound: its backward
# materializes per-row logsumexp/delta broadcasts ([B*H, S, 128] f32) and a
# partial-dq slab in HBM, which at S=384 costs more than the score matrix it
# avoids. Here the whole (Sq, Skv) tile fits VMEM, so one grid cell per
# (batch, head) computes plain softmax forward, and the backward recomputes
# scores in-cell and emits dq/dk/dv directly — the only HBM traffic is
# q/k/v/do/o in and dq/dk/dv out. Measured on v5e at B8 H12 S384 D64 bf16:
# fwd+bwd 2.2x faster than the XLA unfused path, 4.5x faster than the flash
# kernels (see dispatch gate in :func:`dot_product_attention`).


def _compact_mask(tq, tkv, q_offset, causal, window, lim,
                  seg_q=None, seg_kv=None, row0=0, mask_tile=None):
    """Boolean keep-mask [tq, tkv] combining causal band, sliding window,
    per-row kv limits and (optional) segment-id equality. ``lim`` is an
    int32 [tq] row of kv-length limits; ``seg_q``/``seg_kv`` are int32
    [tq]/[tkv] packed-document ids; ``row0`` is the (traced) absolute query
    row of this tile's first row when the q axis is grid-blocked;
    ``mask_tile`` is an optional int8 [tq, tkv] arbitrary keep-mask
    (nonzero = attend)."""
    kpos = jax.lax.broadcasted_iota(jnp.int32, (tq, tkv), 1)
    keep = kpos < lim[:, None]
    if causal:
        qpos = (jax.lax.broadcasted_iota(jnp.int32, (tq, tkv), 0)
                + q_offset + row0)
        keep &= kpos <= qpos
        if window is not None:
            keep &= kpos > qpos - window
    if seg_q is not None:
        keep &= seg_q[:, None] == seg_kv[None, :]
    if mask_tile is not None:
        keep &= mask_tile != 0
    return keep


def _compact_softmax(s, keep):
    """Row softmax of a fully-resident score tile. Fully-masked rows come out
    uniform (finite NEG_INF), matching :func:`mha_reference`."""
    s = jnp.where(keep, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=1, keepdims=True)


def _compact_fwd_kernel(lim_ref, sq_ref, sk_ref, m_ref, q_ref, k_ref, v_ref,
                        o_ref, *, sm_scale, causal, window, q_offset):
    # sq_ref/sk_ref ([1, 1, T] int32 segment ids) are None when unsegmented;
    # m_ref ([1, Tq, Tkv] int8 arbitrary keep-mask) is None when unmasked
    q = q_ref[0]  # [Tq, D] (Tq = q block; kv stays fully resident)
    row0 = pl.program_id(1) * q.shape[0]
    s = jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale  # [Tq, Tkv] f32, resident in VMEM
    keep = _compact_mask(s.shape[0], s.shape[1], q_offset, causal, window,
                         lim_ref[0, 0],
                         None if sq_ref is None else sq_ref[0, 0],
                         None if sk_ref is None else sk_ref[0, 0],
                         row0=row0,
                         mask_tile=None if m_ref is None else m_ref[0])
    p = _compact_softmax(s, keep)
    o_ref[0] = jax.lax.dot_general(
        p.astype(q.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _compact_bwd_kernel(lim_ref, sq_ref, sk_ref, m_ref, q_ref, k_ref, v_ref,
                        do_ref, o_ref, dq_ref, dk_ref, dv_ref, *,
                        sm_scale, causal, window, q_offset, accumulate):
    # ``accumulate``: when the q axis is grid-blocked (nq > 1), dk/dv blocks
    # map to the same (batch*head) slab for every q step — qi is the minor
    # grid dim, so the block stays VMEM-resident and this kernel adds each q
    # block's contribution into it (f32 out dtype; cast happens outside)
    q = q_ref[0]
    k = k_ref[0]
    do = do_ref[0]
    qi = pl.program_id(1)
    row0 = qi * q.shape[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * sm_scale
    keep = _compact_mask(s.shape[0], s.shape[1], q_offset, causal, window,
                         lim_ref[0, 0],
                         None if sq_ref is None else sq_ref[0, 0],
                         None if sk_ref is None else sk_ref[0, 0],
                         row0=row0,
                         mask_tile=None if m_ref is None else m_ref[0])
    p = _compact_softmax(s, keep)
    pb = p.astype(q.dtype)
    dv = jax.lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    di = jnp.sum(do.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
                 axis=1, keepdims=True)  # [Tq, 1]
    # mask ds explicitly: for partially-masked rows p is already exactly 0 at
    # masked entries, but fully-masked rows fall back to uniform p (finite
    # NEG_INF) — the where keeps their score gradient at 0, matching the
    # jnp.where cotangent semantics of mha_reference
    ds = jnp.where(keep, p * (dp - di) * sm_scale, 0.0).astype(q.dtype)
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    if not accumulate:
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)
    else:
        @pl.when(qi == 0)
        def _store_first():
            dk_ref[0] = dk.astype(dk_ref.dtype)
            dv_ref[0] = dv.astype(dv_ref.dtype)

        @pl.when(qi > 0)
        def _accumulate():
            dk_ref[0] += dk.astype(dk_ref.dtype)
            dv_ref[0] += dv.astype(dv_ref.dtype)


def _compact_specs(heads, block_q, tkv, d, mask_per_head=False):
    # limits/segment ids ride as [B, 1, T] so the trailing block dims
    # satisfy Mosaic's (8, 128)-or-full-dim tiling rule; the q-side inputs
    # are blocked along the (possibly trivial) second grid dim, the kv-side
    # blocks stay whole per (batch, head) cell
    lim = pl.BlockSpec((1, 1, block_q), lambda bh, qi: (bh // heads, 0, qi))
    skv_spec = pl.BlockSpec((1, 1, tkv), lambda bh, qi: (bh // heads, 0, 0))
    qs = pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0))
    ks = pl.BlockSpec((1, tkv, d), lambda bh, qi: (bh, 0, 0))
    if mask_per_head:
        ms = pl.BlockSpec((1, block_q, tkv), lambda bh, qi: (bh, qi, 0))
    else:
        ms = pl.BlockSpec((1, block_q, tkv),
                          lambda bh, qi: (bh // heads, qi, 0))
    return lim, skv_spec, qs, ks, ms


def _compact_opt(seg_q, seg_kv, mask, lim_spec, skv_spec, mask_spec):
    """(extra specs, extra args, wrap) for the optional segment-id and
    arbitrary-mask inputs, mirroring _opt_inputs: wrap(base) adapts a
    kernel expecting ``(lim_ref, sq_ref, sk_ref, m_ref, ...)`` to only the
    refs that are present."""
    has_seg = seg_q is not None
    has_mask = mask is not None
    specs, args = [], []
    if has_seg:
        specs += [lim_spec, skv_spec]
        args += [seg_q, seg_kv]
    if has_mask:
        specs.append(mask_spec)
        args.append(mask)

    def wrap(base):
        if has_seg and has_mask:
            return base
        if has_seg:
            return lambda lim, sq_, sk_, *r: base(lim, sq_, sk_, None, *r)
        if has_mask:
            return lambda lim, m_, *r: base(lim, None, None, m_, *r)
        return lambda lim, *r: base(lim, None, None, None, *r)

    return specs, tuple(args), wrap


def _compact_run_fwd(q, k, v, limits, seg_q, seg_kv, mask, sm_scale, causal,
                     window, q_offset, heads, block_q, interpret):
    bh, tq, d = q.shape
    tkv = k.shape[1]
    per_head = mask is not None and mask.shape[0] == bh
    lim, skv_spec, qs, ks, ms = _compact_specs(heads, block_q, tkv, d,
                                               per_head)
    opt_specs, opt_args, wrap = _compact_opt(seg_q, seg_kv, mask, lim,
                                             skv_spec, ms)
    kernel = wrap(functools.partial(
        _compact_fwd_kernel, sm_scale=sm_scale, causal=causal, window=window,
        q_offset=q_offset,
    ))
    return pl.pallas_call(
        kernel,
        grid=(bh, tq // block_q),
        in_specs=[lim] + opt_specs + [qs, ks, ks],
        out_specs=qs,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(limits, *opt_args, q, k, v)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def _compact(q, k, v, limits, seg_q, seg_kv, mask, sm_scale, causal, window,
             q_offset, heads, block_q, interpret):
    return _compact_run_fwd(q, k, v, limits, seg_q, seg_kv, mask, sm_scale,
                            causal, window, q_offset, heads, block_q,
                            interpret)


def _compact_vjp_fwd(q, k, v, limits, seg_q, seg_kv, mask, sm_scale, causal,
                     window, q_offset, heads, block_q, interpret):
    o = _compact_run_fwd(q, k, v, limits, seg_q, seg_kv, mask, sm_scale,
                         causal, window, q_offset, heads, block_q, interpret)
    return o, (q, k, v, limits, seg_q, seg_kv, mask, o)


def _compact_vjp_bwd(sm_scale, causal, window, q_offset, heads, block_q,
                     interpret, res, g):
    q, k, v, limits, seg_q, seg_kv, mask, o = res
    bh, tq, d = q.shape
    tkv = k.shape[1]
    nq = tq // block_q
    per_head = mask is not None and mask.shape[0] == bh
    lim, skv_spec, qs, ks, ms = _compact_specs(heads, block_q, tkv, d,
                                               per_head)
    opt_specs, opt_args, wrap = _compact_opt(seg_q, seg_kv, mask, lim,
                                             skv_spec, ms)
    kernel = wrap(functools.partial(
        _compact_bwd_kernel, sm_scale=sm_scale, causal=causal, window=window,
        q_offset=q_offset, accumulate=nq > 1,
    ))
    # with a blocked q axis dk/dv accumulate across q steps — keep those
    # output blocks f32 and cast after; single-cell grids write once in the
    # input dtype (the original compact regime, unchanged)
    acc_dtype = jnp.float32 if nq > 1 else k.dtype
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh, nq),
        in_specs=[lim] + opt_specs + [qs, ks, ks, qs, qs],
        out_specs=(qs, ks, ks),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, acc_dtype),
            jax.ShapeDtypeStruct(v.shape, acc_dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(limits, *opt_args, q, k, v, g, o)
    if nq > 1:
        dk = dk.astype(k.dtype)
        dv = dv.astype(v.dtype)
    return (dq, dk, dv) + _int_grads(limits, seg_q, seg_kv, mask)


_compact.defvjp(_compact_vjp_fwd, _compact_vjp_bwd)

# padded Skv ceiling for the compact path. kv (k, v, dk, dv slabs) must stay
# fully VMEM-resident per (batch, head) cell; past 2048 the q blocks shrink
# below one MXU tile and the flash kernels win anyway
COMPACT_MAX_KV = 2048

# score-tile budget: the backward keeps ~4 [block_q, Skv] f32 tiles live
# (s, p, dp, ds); 512K f32 words each caps that at ~8 MB of the 16 MB VMEM
_COMPACT_CELL_WORDS = 1 << 19


def _compact_block_q(sq_p, skv_p):
    """Largest q block (multiple of 128, <= sq_p) whose backward score tiles
    fit the VMEM budget. Up to 1024x1024 the whole q axis rides in one cell
    (the original single-cell compact regime)."""
    if sq_p * skv_p <= (1 << 20):
        return sq_p
    bq = max(LANES, _COMPACT_CELL_WORDS // skv_p // LANES * LANES)
    return min(bq, sq_p)


# dispatch crossover for dot_product_attention, measured f+b on v5e
# (B8 H12 D64 bf16 causal, ms/iter): compact/flash = 1.5/2.1 @1024,
# 4.2/6.2 @1536, 5.6/6.1 @1792, 7.0/5.4 @2048 — the q-blocked compact
# kernels win through 1792, flash wins at 2048 (q blocks shrink to 256 and
# the whole-kv slab stops paying for itself)
COMPACT_DISPATCH_MAX_KV = 1792


def compact_attention(q, k, v, *, causal: bool = False,
                      sm_scale: Optional[float] = None,
                      kv_lengths=None, window: Optional[int] = None,
                      segment_ids=None, mask=None,
                      interpret: Optional[bool] = None):
    """Short-sequence fused attention on [B, H, S, D] tensors: one Pallas
    grid cell per (batch, head) with the whole score tile resident in VMEM.
    Differentiable (fused single-kernel backward with in-cell recompute).
    Same masking semantics as :func:`flash_attention`: ``causal`` (diagonal
    aligned to the end of kv when Sq != Skv), ``kv_lengths`` [B] or [B, Sq],
    ``window`` (requires causal), ``segment_ids`` ([B, S] int or a
    ``(q_ids, kv_ids)`` pair — packed-document masking; a VPU compare on
    the resident tile, no tile-skipping needed at these sizes). Padded Skv
    must stay <= COMPACT_MAX_KV.

    ``mask`` additionally accepts an ARBITRARY boolean keep-mask
    broadcastable to [B, H, Sq, Skv] (True = attend) — the case the
    reference's fused-kernel gate (Transformer.scala:949-961) punts to the
    unfused path. The mask tile rides next to the resident score tile as
    int8 (per-batch when broadcast over heads, so HBM traffic stays
    B*Sq*Skv bytes); it composes with causal/window/lengths/segments.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if window is not None:
        if not causal:
            raise ValueError("window requires causal=True")
        window = int(window)
        if window <= 0:
            raise ValueError("window must be a positive int")
        if window >= k.shape[2]:
            window = None
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    skv_p = _round_up(skv, LANES)
    if skv_p > COMPACT_MAX_KV:
        raise ValueError(
            f"compact_attention: padded kv length {skv_p} exceeds "
            f"{COMPACT_MAX_KV}; use flash_attention"
        )
    block_q = _compact_block_q(_round_up(sq, LANES), skv_p)
    sq_p = _round_up(sq, block_q)

    qr = q.reshape(b * h, sq, d)
    kr = k.reshape(b * h, skv, d)
    vr = v.reshape(b * h, skv, d)
    if sq_p != sq:
        qr = jnp.pad(qr, ((0, 0), (0, sq_p - sq), (0, 0)))
    if skv_p != skv:
        kr = jnp.pad(kr, ((0, 0), (0, skv_p - skv), (0, 0)))
        vr = jnp.pad(vr, ((0, 0), (0, skv_p - skv), (0, 0)))

    # always-on limits row masks padded kv columns; user kv_lengths tighten it
    if kv_lengths is None:
        limits = jnp.full((b, sq_p), skv, jnp.int32)
    else:
        limits = jnp.minimum(jnp.asarray(kv_lengths, jnp.int32), skv)
        if limits.ndim == 1:
            limits = jnp.broadcast_to(limits[:, None], (b, sq))
        if sq_p != sq:
            limits = jnp.pad(limits, ((0, 0), (0, sq_p - sq)),
                             constant_values=skv)

    seg_q = seg_kv = None
    if segment_ids is not None:
        q_ids, kv_ids = (segment_ids if isinstance(segment_ids, tuple)
                         else (segment_ids, segment_ids))
        seg_q = jnp.asarray(q_ids, jnp.int32)
        seg_kv = jnp.asarray(kv_ids, jnp.int32)
        # distinct negative pad ids (same scheme as flash_attention):
        # padded q rows match nothing and are sliced off; real q rows never
        # match padded kv columns (which the limits row also masks)
        if sq_p != sq:
            seg_q = jnp.pad(seg_q, ((0, 0), (0, sq_p - sq)),
                            constant_values=-1)
        if skv_p != skv:
            seg_kv = jnp.pad(seg_kv, ((0, 0), (0, skv_p - skv)),
                             constant_values=-2)
        seg_q = seg_q[:, None, :]
        seg_kv = seg_kv[:, None, :]

    m_arr = None
    if mask is not None:
        m_arr = jnp.asarray(mask)
        if m_arr.ndim != 4:
            raise ValueError("mask must broadcast to [B, H, Sq, Skv]")
        if m_arr.shape[1] == 1:  # broadcast over heads: per-batch tiles
            m_arr = jnp.broadcast_to(m_arr[:, 0], (b, sq, skv))
        else:
            m_arr = jnp.broadcast_to(
                m_arr, (b, h, sq, skv)
            ).reshape(b * h, sq, skv)
        m_arr = m_arr.astype(jnp.int8)
        # padded q rows are sliced off; padded kv columns are masked by the
        # always-on limits row — pad value is irrelevant, use 0
        if sq_p != sq or skv_p != skv:
            m_arr = jnp.pad(
                m_arr, ((0, 0), (0, sq_p - sq), (0, skv_p - skv))
            )

    q_offset = skv - sq if causal else 0
    o = _compact(qr, kr, vr, limits[:, None, :], seg_q, seg_kv, m_arr,
                 sm_scale, causal, window, q_offset, h, block_q, interpret)
    return o[:, :sq, :].reshape(b, h, sq, d)


def dot_product_attention(q, k, v, *, causal: bool = False, mask=None,
                          sm_scale: Optional[float] = None,
                          window: Optional[int] = None,
                          segment_ids=None,
                          implementation: Optional[str] = None):
    """Route attention to the fused Pallas kernel when eligible, matching the
    reference's dispatch gate (Transformer.scala:949-961): on accelerator,
    causal-or-unmasked, no arbitrary mask (segment ids ride the fused path).
    Otherwise use the XLA path.
    """
    if implementation is None:
        on_tpu = jax.default_backend() == "tpu"
        # three regimes, measured f+b on v5e (B8 H12 D64 bf16 causal):
        #   kv <= 512          XLA's fused unflashed formulation wins
        #                      (batched narrow-N matmuls; O(S^2) memory is
        #                      still negligible)
        #   512 < kv <= 1792   compact Pallas kernels win 1.1-3x over both
        #                      (kv resident in VMEM, no flash residual/slab
        #                      round trips; q grid-blocked past 1024)
        #   kv > 1792          flash kernels (the shrinking q blocks stop
        #                      paying for the whole-kv VMEM slab)
        # arbitrary masks ride the fused kernels in both bands: the mask
        # tile sits in VMEM beside the scores (compact) or streams with the
        # kv tiles (flash, with all-masked-tile skipping)
        skv = k.shape[2]
        if not on_tpu or skv <= 512:
            implementation = "xla"
        elif _round_up(skv, LANES) <= COMPACT_DISPATCH_MAX_KV:
            implementation = "compact"
        else:
            implementation = "flash"
    if implementation == "compact":
        return compact_attention(q, k, v, causal=causal, sm_scale=sm_scale,
                                 window=window, segment_ids=segment_ids,
                                 mask=mask)
    if implementation == "flash":
        return flash_attention(q, k, v, causal=causal, sm_scale=sm_scale,
                               window=window, segment_ids=segment_ids,
                               mask=mask)
    return mha_reference(q, k, v, causal=causal, sm_scale=sm_scale, mask=mask,
                         window=window, segment_ids=segment_ids)
