"""Modern transformer components: RMSNorm, rotary embeddings, SwiGLU,
llama-style decoder blocks.

Beyond reference parity: the components a production LM stack needs today
(the reference predates them). Composes with everything else in the
framework: GQA (nn.MultiheadAttention), the flash kernel, MoE, remat,
tensor-parallel sharding rules.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import (compact_attention, flash_attention,
                             mha_reference)
from . import init as initializers
from .layers import Embedding, Linear
from .module import Module, buffer_field, static_field

__all__ = ["RMSNorm", "apply_rope", "rope_frequencies", "SwiGLU",
           "LlamaBlock", "ModernLM"]


class RMSNorm(Module):
    """Root-mean-square norm (no mean subtraction, no bias)."""

    weight: jax.Array
    eps: float = static_field()
    __tags__ = {"weight": "RMSNorm.weight"}

    @staticmethod
    def init(dim: int, *, eps: float = 1e-6, dtype=jnp.float32) -> "RMSNorm":
        return RMSNorm(weight=jnp.ones((dim,), dtype), eps=eps)

    def forward(self, x, *, key=None, train=False):
        sd = jnp.promote_types(x.dtype, jnp.float32)
        xf = x.astype(sd)
        ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(ms + self.eps) * self.weight.astype(sd)
        return y.astype(x.dtype), self


def rope_frequencies(head_dim: int, max_len: int, *, base: float = 10000.0,
                     scaling: Optional[dict] = None, dtype=jnp.float32):
    """Precompute (cos, sin) tables [max_len, head_dim/2].

    ``scaling`` extends a base-trained context window (HF
    ``config.rope_scaling`` schema; all need ``{"factor": f}``):

    - ``{"type": "linear"}``: position interpolation (Chen et al. 2023) —
      positions divided by ``factor``.
    - ``{"type": "ntk"}``: NTK-aware base stretch — ``base *
      factor^(d/(d-2))``; high frequencies kept, low frequencies
      interpolated.
    - ``{"type": "yarn", "original_max_len": L}``: YaRN (Peng et al.
      2023) — per-frequency ramp between interpolated and extrapolated
      angles (``beta_fast``/``beta_slow`` rotations bound the ramp,
      defaults 32/1) with the ``0.1·ln(f)+1`` attention-temperature
      folded into the tables (HF's ``attention_scaling``).
    - ``{"type": "llama3", "original_max_len": L, "low_freq_factor": 1,
      "high_freq_factor": 4}``: Llama-3.1's frequency-banded
      interpolation.
    """
    compute = jnp.promote_types(dtype, jnp.float32)
    half = jnp.arange(0, head_dim, 2, dtype=compute) / head_dim
    attn_scale = 1.0
    if scaling is None:
        inv = 1.0 / (base ** half)
        t = jnp.arange(max_len, dtype=compute)
    else:
        kind = scaling.get("type", "linear")
        factor = float(scaling["factor"])
        t = jnp.arange(max_len, dtype=compute)
        if kind == "linear":
            inv = 1.0 / (base ** half)
            t = t / factor
        elif kind == "ntk":
            stretched = base * factor ** (head_dim / (head_dim - 2))
            inv = 1.0 / (stretched ** half)
        elif kind == "yarn":
            orig = int(scaling.get("original_max_len", max_len))
            beta_fast = float(scaling.get("beta_fast", 32.0))
            beta_slow = float(scaling.get("beta_slow", 1.0))
            inv = 1.0 / (base ** half)
            # dims doing >= beta_fast rotations over the original window
            # extrapolate (keep inv), <= beta_slow rotations interpolate
            # (inv / factor); the blend is the paper's (and HF's) linear
            # ramp in DIMENSION index between the floor/ceil-truncated
            # correction dims of the two rotation bounds
            def corr_dim(n_rot):
                return (head_dim * math.log(orig / (n_rot * 2.0 * math.pi))
                        / (2.0 * math.log(base)))

            lo = max(math.floor(corr_dim(beta_fast)), 0)
            hi = min(math.ceil(corr_dim(beta_slow)), head_dim - 1)
            if lo == hi:
                hi += 0.001  # avoid 0/0 on a degenerate range
            ramp = jnp.clip(
                (jnp.arange(head_dim // 2, dtype=compute) - lo) / (hi - lo),
                0.0, 1.0,
            )
            extrapolate = 1.0 - ramp
            inv = inv * extrapolate + (inv / factor) * (1.0 - extrapolate)
            attn_scale = (0.1 * math.log(factor) + 1.0) if factor > 1 else 1.0
        elif kind == "llama3":
            orig = int(scaling.get("original_max_len", max_len))
            low_f = float(scaling.get("low_freq_factor", 1.0))
            high_f = float(scaling.get("high_freq_factor", 4.0))
            inv = 1.0 / (base ** half)
            wavelen = 2.0 * math.pi / inv
            # long wavelengths (rarely completed in the original window)
            # interpolate by the full factor; short ones keep base angles;
            # smooth blend between the two bands
            smooth = (orig / wavelen - low_f) / max(high_f - low_f, 1e-6)
            smooth = jnp.clip(smooth, 0.0, 1.0)
            inv = jnp.where(
                wavelen > orig / low_f,
                inv / factor,
                jnp.where(wavelen < orig / high_f, inv,
                          (1 - smooth) * inv / factor + smooth * inv),
            )
        else:
            raise ValueError(f"unknown rope scaling type {kind!r}")
    freqs = jnp.outer(t, inv)
    return (
        (jnp.cos(freqs) * attn_scale).astype(dtype),
        (jnp.sin(freqs) * attn_scale).astype(dtype),
    )


def apply_rope(x, cos, sin, *, positions=None):
    """Rotate q/k ([B, H, T, D]) by position-dependent angles.

    cos/sin: [max_len, D/2]; positions: optional [T] or [B, T] overrides.
    """
    t = x.shape[2]
    if positions is None:
        c = cos[:t][None, None, :, :]
        s = sin[:t][None, None, :, :]
    else:
        c = jnp.take(cos, positions, axis=0)
        s = jnp.take(sin, positions, axis=0)
        if positions.ndim == 1:
            c = c[None, None, :, :]
            s = s[None, None, :, :]
        else:  # [B, T]
            c = c[:, None, :, :]
            s = s[:, None, :, :]
    acc = jnp.promote_types(x.dtype, jnp.float32)
    c = c.astype(acc)
    s = s.astype(acc)
    x1, x2 = jnp.split(x.astype(acc), 2, axis=-1)
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)


class SwiGLU(Module):
    """Gated MLP: w2(silu(w1 x) * w3 x)."""

    w1: Linear
    w3: Linear
    w2: Linear

    @staticmethod
    def init(dim: int, hidden: int, *, key, dtype=jnp.float32) -> "SwiGLU":
        k1, k2, k3 = jax.random.split(key, 3)
        return SwiGLU(
            w1=Linear.init(dim, hidden, key=k1, bias=False, dtype=dtype),
            w3=Linear.init(dim, hidden, key=k2, bias=False, dtype=dtype),
            w2=Linear.init(hidden, dim, key=k3, bias=False, dtype=dtype),
        )

    def forward(self, x, *, key=None, train=False):
        return self.w2(jax.nn.silu(self.w1(x)) * self.w3(x)), self


def _moe_mlp(dim, hidden, experts, top_k, dispatch, capacity_factor,
             group_size, key, dtype):
    """Mixtral-style sparse MLP for ``ModernLM.init(moe_experts=...)``."""
    from .moe import SwiGLUMoE

    return SwiGLUMoE.init(dim, hidden, experts, key=key, top_k=top_k,
                          dispatch=dispatch, capacity_factor=capacity_factor,
                          group_size=group_size, dtype=dtype)


class LlamaBlock(Module):
    """Pre-RMSNorm decoder block: RoPE attention (GQA) + SwiGLU."""

    norm1: RMSNorm
    norm2: RMSNorm
    w_q: Linear
    w_k: Linear
    w_v: Linear
    w_o: Linear
    mlp: SwiGLU  # or SwiGLUMoE (ModernLM.init(moe_experts=...))
    num_heads: int = static_field()
    num_kv_heads: int = static_field()
    window: Optional[int] = static_field(default=None)

    @staticmethod
    def init(dim: int, num_heads: int, *, key, num_kv_heads: Optional[int] = None,
             mlp_hidden: Optional[int] = None, window: Optional[int] = None,
             norm_eps: float = 1e-6, moe_experts: Optional[int] = None,
             moe_top_k: int = 2, moe_dispatch: str = "dense",
             moe_capacity_factor: float = 1.25, moe_group_size: int = 0,
             dtype=jnp.float32) -> "LlamaBlock":
        kv_heads = num_kv_heads or num_heads
        mlp_hidden = mlp_hidden or int(dim * 8 / 3 // 64 * 64) or dim * 2
        head_dim = dim // num_heads
        keys = jax.random.split(key, 5)
        return LlamaBlock(
            norm1=RMSNorm.init(dim, eps=norm_eps, dtype=dtype),
            norm2=RMSNorm.init(dim, eps=norm_eps, dtype=dtype),
            w_q=Linear.init(dim, dim, key=keys[0], bias=False, dtype=dtype),
            w_k=Linear.init(dim, kv_heads * head_dim, key=keys[1], bias=False,
                            dtype=dtype),
            w_v=Linear.init(dim, kv_heads * head_dim, key=keys[2], bias=False,
                            dtype=dtype),
            w_o=Linear.init(dim, dim, key=keys[3], bias=False, dtype=dtype),
            mlp=(
                SwiGLU.init(dim, mlp_hidden, key=keys[4], dtype=dtype)
                if moe_experts is None else _moe_mlp(
                    dim, mlp_hidden, moe_experts, moe_top_k, moe_dispatch,
                    moe_capacity_factor, moe_group_size, keys[4], dtype)
            ),
            num_heads=num_heads,
            num_kv_heads=kv_heads,
            window=window,
        )

    def forward(self, x_and_rope, *, key=None, train=False,
                segment_ids=None, positions=None, with_aux=False):
        # segment_ids/positions ([B, T] int): packed-document training —
        # attention stays within each document and RoPE restarts per document
        # with_aux: additionally return the MoE load-balancing aux scalar
        # (0 for dense blocks) as a third output
        x, (cos, sin) = x_and_rope
        b, t, d = x.shape
        h, hk = self.num_heads, self.num_kv_heads
        hd = d // h
        a = self.norm1(x)
        q = self.w_q(a).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        k = self.w_k(a).reshape(b, t, hk, hd).transpose(0, 2, 1, 3)
        v = self.w_v(a).reshape(b, t, hk, hd).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin, positions=positions)
        k = apply_rope(k, cos, sin, positions=positions)
        if hk != h:
            k = jnp.repeat(k, h // hk, axis=1)
            v = jnp.repeat(v, h // hk, axis=1)
        on_tpu = jax.default_backend() == "tpu"
        # length crossovers measured on v5e (see ops.attention dispatch):
        # XLA <= 512 < compact <= 1024 < flash (segment ids ride both
        # kernel paths, so packed-document batches keep the fast path)
        if on_tpu and t > 1024:
            o = flash_attention(q, k, v, causal=True, window=self.window,
                                segment_ids=segment_ids)
        elif on_tpu and t > 512:
            o = compact_attention(q, k, v, causal=True, window=self.window,
                                  segment_ids=segment_ids)
        else:
            o = mha_reference(q, k, v, causal=True, window=self.window,
                              segment_ids=segment_ids)
        x = x + self.w_o(o.transpose(0, 2, 1, 3).reshape(b, t, d))
        a2 = self.norm2(x)
        m, _ = self.mlp.forward(a2, key=key, train=train)
        x = x + m
        if with_aux:
            aux = (self.mlp.load_balancing_loss(a2)
                   if hasattr(self.mlp, "load_balancing_loss")
                   else jnp.zeros((), jnp.float32))
            return (x, (cos, sin)), self, aux
        return (x, (cos, sin)), self


class ModernLM(Module):
    """Llama-style LM: token embedding -> N LlamaBlocks -> RMSNorm -> tied
    (or untied) logits. RoPE positions, GQA, SwiGLU."""

    token_embedding: Embedding
    blocks: Tuple[LlamaBlock, ...]
    final_norm: RMSNorm
    lm_head: Optional[Linear]
    rope_cos: jax.Array = buffer_field()
    rope_sin: jax.Array = buffer_field()
    context_length: int = static_field()
    remat: bool = static_field(default=False)

    @staticmethod
    def init(*, vocab_size: int, context_length: int, num_blocks: int,
             embed_dim: int, num_heads: int, num_kv_heads: Optional[int] = None,
             mlp_hidden: Optional[int] = None, tied: bool = True, key,
             rope_base: float = 10000.0, rope_scaling: Optional[dict] = None,
             window=None, remat: bool = False,
             norm_eps: float = 1e-6, moe_experts: Optional[int] = None,
             moe_top_k: int = 2, moe_dispatch: str = "dense",
             moe_capacity_factor: float = 1.25, moe_group_size: int = 0,
             dtype=jnp.float32) -> "ModernLM":
        keys = jax.random.split(key, num_blocks + 2)
        cos, sin = rope_frequencies(embed_dim // num_heads, context_length,
                                    base=rope_base, scaling=rope_scaling)
        # window: None (full attention), int (sliding window every block) or
        # a per-block sequence, e.g. Gemma-style alternation
        # [None, 4096] * (n // 2)
        if window is None or isinstance(window, int):
            windows = [window] * num_blocks
        else:
            windows = list(window)
            if len(windows) != num_blocks:
                raise ValueError("per-block window list length mismatch")
        return ModernLM(
            token_embedding=Embedding(
                weight=initializers.normal(0.02)(
                    keys[0], (vocab_size, embed_dim), dtype
                )
            ),
            blocks=tuple(
                LlamaBlock.init(
                    embed_dim, num_heads, key=keys[i + 1],
                    num_kv_heads=num_kv_heads, mlp_hidden=mlp_hidden,
                    window=windows[i], norm_eps=norm_eps,
                    moe_experts=moe_experts, moe_top_k=moe_top_k,
                    moe_dispatch=moe_dispatch,
                    moe_capacity_factor=moe_capacity_factor,
                    moe_group_size=moe_group_size, dtype=dtype,
                )
                for i in range(num_blocks)
            ),
            final_norm=RMSNorm.init(embed_dim, eps=norm_eps, dtype=dtype),
            lm_head=(
                None if tied
                else Linear.init(embed_dim, vocab_size, key=keys[-1],
                                 bias=False, dtype=dtype)
            ),
            rope_cos=cos,
            rope_sin=sin,
            context_length=context_length,
            remat=remat,
        )

    def extend_context(self, context_length: int, *,
                       rope_base: float = 10000.0,
                       rope_scaling: Optional[dict] = None) -> "ModernLM":
        """Long-context extension of a trained model: rebuild the RoPE
        tables for a larger window, optionally with interpolation
        (``rope_scaling`` as in :func:`rope_frequencies` — e.g.
        ``{"type": "yarn", "factor": 4, "original_max_len": old_ctx}``).
        Weights are untouched; typical use is scale-then-finetune (or
        NTK/YaRN zero-shot inference at the longer window)."""
        import dataclasses as _dc

        head_half = self.rope_cos.shape[1]
        cos, sin = rope_frequencies(head_half * 2, context_length,
                                    base=rope_base, scaling=rope_scaling,
                                    dtype=self.rope_cos.dtype)
        return _dc.replace(self, rope_cos=cos, rope_sin=sin,
                           context_length=context_length)

    def hidden(self, tokens, *, key=None, train=False, segment_ids=None,
               positions=None, with_aux=False):
        """Final-norm hidden states [B, T, D] (no logits projection).

        ``segment_ids``/``positions`` ([B, T] int) enable packed-document
        (sequence-packing) training: attention is restricted to each
        document and RoPE angles restart at document starts (see
        :func:`lamp_tpu.data.lm_data.pack_documents`). ``with_aux``
        additionally returns the summed MoE load-balancing loss of the
        blocks (0.0 for a dense model).
        """
        if isinstance(tokens, tuple):
            tokens = tokens[0]
        x = self.token_embedding(tokens)
        rope = (self.rope_cos, self.rope_sin)
        keys = (
            jax.random.split(key, len(self.blocks))
            if key is not None else [None] * len(self.blocks)
        )

        def run_block(block, x, rope, k, seg, pos):
            (y, _), _, aux = block.forward((x, rope), key=k, train=train,
                                           segment_ids=seg, positions=pos,
                                           with_aux=True)
            return y, aux

        if self.remat:  # recompute each block's activations on backward
            run_block = jax.checkpoint(run_block, static_argnums=())
        aux_total = jnp.zeros((), jnp.float32)
        for block, k in zip(self.blocks, keys):
            x, aux = run_block(block, x, rope, k, segment_ids, positions)
            aux_total = aux_total + aux
        h = self.final_norm(x)
        return (h, aux_total) if with_aux else h

    @property
    def output_weight(self):
        """[V, D] logits projection weight (tied embedding or lm_head)."""
        if self.lm_head is not None:
            return self.lm_head.weight.T
        return self.token_embedding.weight

    def forward(self, tokens, *, key=None, train=False, segment_ids=None,
                positions=None):
        x = self.hidden(tokens, key=key, train=train,
                        segment_ids=segment_ids, positions=positions)
        acc = jnp.promote_types(x.dtype, jnp.float32)
        if self.lm_head is not None:
            return self.lm_head(x).astype(acc), self
        w = self.token_embedding.weight
        return jnp.einsum("btd,vd->btv", x, w, preferred_element_type=acc), self

    def loss(self, tokens, targets, *, key=None, train=False,
             ignore_index: int = -100, row_chunk=None, segment_ids=None,
             positions=None, moe_aux_coef: float = 0.0):
        """Mean next-token CE WITHOUT materializing the [B, T, V] logits —
        routes through the chunked fused linear+cross-entropy
        (:mod:`lamp_tpu.ops.fused_ce`). At vocab 32k / ctx 2k the logits are
        the largest tensor of the whole training step; this removes them."""
        from ..ops.fused_ce import fused_lm_loss
        x, aux = self.hidden(tokens, key=key, train=train,
                             segment_ids=segment_ids, positions=positions,
                             with_aux=True)
        loss = fused_lm_loss(x, self.output_weight, targets,
                             ignore_index=ignore_index, row_chunk=row_chunk)
        if moe_aux_coef:
            # Switch-style balancing objective (see SwiGLUMoE); scale ~1e-2
            loss = loss + moe_aux_coef * aux
        return loss
