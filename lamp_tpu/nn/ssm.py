"""Selective state-space models (Mamba).

A modern sequence-model family beyond the reference's RNN/transformer zoo
(SURVEY.md §2.3 ends at GPT/BERT/graph): Mamba's selective SSM (Gu & Dao
2023) offers transformer-class quality at O(T) train compute and O(1)
decode state — no KV cache at all.

TPU-first design decisions:

- The selective scan — the part the original implements as a custom CUDA
  kernel — is a :func:`jax.lax.associative_scan` over the first-order
  linear recurrence ``h_t = a_t * h_{t-1} + b_t``: log2(T) elementwise VPU
  passes, fully fused by XLA, no Pallas needed (the op is bandwidth-bound
  elementwise work, exactly what XLA fusion already does at speed of
  light).
- The short causal depthwise conv is unrolled into ``width`` shifted
  multiply-adds (width is 4; a real conv op would lower to the same
  elementwise chain with worse fusion seams).
- Decode keeps a tuple carry ``(conv window [B, W-1, Di], ssm state
  [B, Di, Ds])`` per block — constant memory per step, the SSM analogue of
  (and replacement for) the transformer KV cache.

Matmuls accumulate via ``preferred_element_type`` per the repo convention
(f64 gradchecks).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.fused_ce import fused_lm_loss
from . import init as initializers
from .layers import Embedding, Linear
from .modern import RMSNorm
from .module import Module, static_field

__all__ = ["MambaBlock", "MambaLM", "selective_scan"]


def _accum(x):
    return jnp.promote_types(x.dtype, jnp.float32)


def selective_scan(a, b):
    """Parallel prefix solve of ``h_t = a_t * h_{t-1} + b_t`` (h_0 = 0)
    along axis 1. ``a``/``b``: [B, T, ...]; returns h with the same shape.

    The pair (a, b) represents the affine map ``h -> a*h + b``; composing
    two segments left-then-right gives ``(a2*a1, a2*b1 + b2)`` — an
    associative product, so the whole recurrence solves in log2(T)
    elementwise passes on the VPU.
    """

    def comb(l, r):
        al, bl = l
        ar, br = r
        return al * ar, bl * ar + br

    return jax.lax.associative_scan(comb, (a, b), axis=1)[1]


class MambaBlock(Module):
    """One Mamba (S6) mixer: in-proj → short causal depthwise conv → SiLU →
    input-selective SSM → gate → out-proj. Residual/norm live in the LM."""

    in_proj: Linear     # D -> 2*Di (x and gate z)
    conv_w: jax.Array   # [W, Di] depthwise causal conv taps
    conv_b: jax.Array   # [Di]
    x_proj: Linear      # Di -> dt_rank + 2*Ds (dt bottleneck, B, C)
    dt_proj: Linear     # dt_rank -> Di (bias carries the dt prior)
    A_log: jax.Array    # [Di, Ds]; A = -exp(A_log) (S4D-real init)
    D: jax.Array        # [Di] skip
    out_proj: Linear    # Di -> D
    d_state: int = static_field()
    d_conv: int = static_field()
    dt_rank: int = static_field()

    @staticmethod
    def init(dim: int, *, key, d_state: int = 16, d_conv: int = 4,
             expand: int = 2, dt_rank: Optional[int] = None,
             dt_min: float = 1e-3, dt_max: float = 0.1,
             dtype=jnp.float32) -> "MambaBlock":
        di = expand * dim
        dt_rank = dt_rank or max(1, math.ceil(dim / 16))
        k = jax.random.split(key, 6)
        # dt_proj: small uniform weight, bias = softplus^-1 of a
        # log-uniform dt sample in [dt_min, dt_max] (the paper's init: the
        # step-size prior spans timescales)
        dt_std = dt_rank ** -0.5
        dt_w = jax.random.uniform(k[0], (dt_rank, di), jnp.float32,
                                  -dt_std, dt_std)
        dt = jnp.exp(jax.random.uniform(k[1], (di,), jnp.float32,
                                        math.log(dt_min), math.log(dt_max)))
        dt_b = jnp.log(jnp.expm1(dt))  # softplus(dt_b) == dt
        a = jnp.broadcast_to(jnp.arange(1, d_state + 1, dtype=jnp.float32),
                             (di, d_state))
        return MambaBlock(
            in_proj=Linear.init(dim, 2 * di, key=k[2], bias=False,
                                dtype=dtype),
            conv_w=(jax.random.uniform(
                k[3], (d_conv, di), jnp.float32,
                -(1 / d_conv) ** 0.5, (1 / d_conv) ** 0.5
            )).astype(dtype),
            conv_b=jnp.zeros((di,), dtype),
            x_proj=Linear.init(di, dt_rank + 2 * d_state, key=k[4],
                               bias=False, dtype=dtype),
            dt_proj=Linear(weight=dt_w.astype(dtype),
                           bias=dt_b.astype(dtype)),
            A_log=jnp.log(a).astype(dtype),
            D=jnp.ones((di,), dtype),
            out_proj=Linear.init(di, dim, key=k[5], bias=False, dtype=dtype),
            d_state=d_state, d_conv=d_conv, dt_rank=dt_rank,
        )

    def _conv(self, x):
        """Causal depthwise conv over time, unrolled into W shifted MACs.
        x: [B, T, Di]."""
        w = self.conv_w.astype(_accum(x))
        y = jnp.zeros(x.shape, _accum(x))
        for j in range(self.d_conv):
            tap = w[j][None, None, :]
            shift = self.d_conv - 1 - j  # tap j sees x[t - shift]
            if shift == 0:
                y = y + tap * x
            else:
                y = y + tap * jnp.pad(x, ((0, 0), (shift, 0), (0, 0)))[:, :-shift]
        return (y + self.conv_b).astype(x.dtype)

    def _ssm_inputs(self, x):
        """dt [B,T,Di], B/C [B,T,Ds] from the post-conv activations."""
        proj, _ = self.x_proj.forward(x)
        dt_r = proj[..., :self.dt_rank]
        bm = proj[..., self.dt_rank:self.dt_rank + self.d_state]
        cm = proj[..., self.dt_rank + self.d_state:]
        dt_lin, _ = self.dt_proj.forward(dt_r)
        dt = jax.nn.softplus(dt_lin.astype(_accum(x)))
        return dt, bm, cm

    def forward(self, u, *, key=None, train=False):
        """u: [B, T, D] -> [B, T, D]."""
        xz, _ = self.in_proj.forward(u)
        di = xz.shape[-1] // 2
        x, z = xz[..., :di], xz[..., di:]
        x = jax.nn.silu(self._conv(x).astype(_accum(u)))
        dt, bm, cm = self._ssm_inputs(x.astype(u.dtype))
        acc = _accum(u)
        a = -jnp.exp(self.A_log.astype(acc))                  # [Di, Ds]
        ad = jnp.exp(dt[..., None] * a)                       # [B,T,Di,Ds]
        bx = (dt[..., None] * bm.astype(acc)[:, :, None, :]
              * x[..., None])                                 # [B,T,Di,Ds]
        h = selective_scan(ad, bx)
        y = jnp.einsum("btds,bts->btd", h, cm.astype(acc),
                       preferred_element_type=acc)
        y = y + self.D.astype(acc) * x
        y = y * jax.nn.silu(z.astype(acc))
        out, _ = self.out_proj.forward(y.astype(u.dtype))
        return out, self

    # -- O(1)-state decoding ------------------------------------------------

    def init_state(self, batch: int, dtype=jnp.float32):
        """(conv window [B, W-1, Di], ssm state [B, Di, Ds]) zeros."""
        di = self.A_log.shape[0]
        return (
            jnp.zeros((batch, self.d_conv - 1, di), dtype),
            jnp.zeros((batch, di, self.d_state), jnp.float32),
        )

    def step(self, u, state):
        """One token: u [B, D], state from :meth:`init_state` or a prior
        step. Returns (y [B, D], new_state). Matches :meth:`forward`
        position-for-position (tested)."""
        conv_win, h = state
        xz, _ = self.in_proj.forward(u)
        di = xz.shape[-1] // 2
        x, z = xz[..., :di], xz[..., di:]
        acc = _accum(u)
        window = jnp.concatenate([conv_win, x[:, None, :]], axis=1)
        xc = (jnp.einsum("bwd,wd->bd", window.astype(acc),
                         self.conv_w.astype(acc)) + self.conv_b)
        x = jax.nn.silu(xc)
        dt, bm, cm = self._ssm_inputs(x.astype(u.dtype)[:, None])
        dt, bm, cm = dt[:, 0], bm[:, 0], cm[:, 0]
        a = -jnp.exp(self.A_log.astype(acc))
        ad = jnp.exp(dt[..., None] * a)                       # [B,Di,Ds]
        bx = dt[..., None] * bm.astype(acc)[:, None, :] * x[..., None]
        h = ad * h + bx
        y = jnp.einsum("bds,bs->bd", h, cm.astype(acc),
                       preferred_element_type=acc)
        y = y + self.D.astype(acc) * x
        y = y * jax.nn.silu(z.astype(acc))
        out, _ = self.out_proj.forward(y.astype(u.dtype))
        return out, (window[:, 1:], h)


class MambaLM(Module):
    """Mamba language model: embedding → N × (RMSNorm → MambaBlock,
    residual) → RMSNorm → tied (or untied) logits. The SSM sibling of
    :class:`ModernLM` — same loss/serving-facing surface where it applies,
    but decode carries O(1) state instead of a KV cache."""

    token_embedding: Embedding
    blocks: Tuple[MambaBlock, ...]
    norms: Tuple[RMSNorm, ...]
    final_norm: RMSNorm
    lm_head: Optional[Linear]
    context_length: int = static_field()
    remat: bool = static_field(default=False)

    @staticmethod
    def init(*, vocab_size: int, context_length: int, num_blocks: int,
             embed_dim: int, d_state: int = 16, d_conv: int = 4,
             expand: int = 2, tied: bool = True, remat: bool = False,
             key, dtype=jnp.float32) -> "MambaLM":
        keys = jax.random.split(key, num_blocks + 2)
        return MambaLM(
            token_embedding=Embedding(
                weight=initializers.normal(0.02)(
                    keys[0], (vocab_size, embed_dim), dtype)
            ),
            blocks=tuple(
                MambaBlock.init(embed_dim, key=keys[i + 1], d_state=d_state,
                                d_conv=d_conv, expand=expand, dtype=dtype)
                for i in range(num_blocks)
            ),
            norms=tuple(RMSNorm.init(embed_dim, dtype=dtype)
                        for _ in range(num_blocks)),
            final_norm=RMSNorm.init(embed_dim, dtype=dtype),
            lm_head=(None if tied else Linear.init(
                embed_dim, vocab_size, key=keys[-1], bias=False, dtype=dtype)),
            context_length=context_length,
            remat=remat,
        )

    @property
    def output_weight(self):
        """[V, D] logits projection (tied embedding or lm_head)."""
        if self.lm_head is not None:
            return self.lm_head.weight.T
        return self.token_embedding.weight

    def hidden(self, tokens, *, key=None, train=False):
        x = self.token_embedding(tokens)

        def run(block, norm, x):
            y, _ = block.forward(norm(x), train=train)
            return x + y

        if self.remat:
            run = jax.checkpoint(run)
        for block, norm in zip(self.blocks, self.norms):
            x = run(block, norm, x)
        return self.final_norm(x)

    def forward(self, tokens, *, key=None, train=False):
        h = self.hidden(tokens, key=key, train=train)
        acc = _accum(h)
        logits = jnp.einsum("btd,vd->btv", h, self.output_weight,
                            preferred_element_type=acc)
        return logits.astype(h.dtype), self

    def loss(self, tokens, targets, *, key=None, train=False,
             ignore_index: int = -100, row_chunk=None):
        """Mean next-token CE via the fused linear+CE (no [B,T,V] logits)."""
        h = self.hidden(tokens, key=key, train=train)
        return fused_lm_loss(h, self.output_weight, targets,
                             ignore_index=ignore_index, row_chunk=row_chunk)

    # -- O(1)-state decoding ------------------------------------------------

    def init_state(self, batch: int):
        dtype = self.token_embedding.weight.dtype
        return tuple(b.init_state(batch, dtype) for b in self.blocks)

    def step(self, tokens, state):
        """One decode step: tokens [B] int32 -> (logits [B, V], new_state).
        Equivalent to column T of ``forward`` on the full history, with
        constant memory (tested)."""
        x = self.token_embedding(tokens)
        new_states = []
        for block, norm, st in zip(self.blocks, self.norms, state):
            y, st2 = block.step(norm(x), st)
            x = x + y
            new_states.append(st2)
        h = self.final_norm(x)
        acc = _accum(h)
        logits = jnp.einsum("bd,vd->bv", h, self.output_weight,
                            preferred_element_type=acc)
        return logits.astype(h.dtype), tuple(new_states)

    def generate(self, prompt_tokens, *, max_tokens: int, key=None,
                 temperature: float = 0.0):
        """Greedy/sampled generation with the recurrent state: prompt is
        consumed with a ``lax.scan`` of steps (no KV cache — the state IS
        the cache, O(1) per layer)."""
        prompt = jnp.asarray(prompt_tokens, jnp.int32)
        if prompt.ndim == 1:
            prompt = prompt[None]
        b = prompt.shape[0]
        state = self.init_state(b)

        def consume(state, tok):
            logits, state = self.step(tok, state)
            return state, logits

        state, logits = jax.lax.scan(consume, state, prompt.T)
        last = logits[-1]

        def sample(logits, k):
            if temperature == 0.0:
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return jax.random.categorical(
                k, logits.astype(jnp.float32) / temperature, axis=-1
            ).astype(jnp.int32)

        if key is None:
            key = jax.random.PRNGKey(0)

        def gen(carry, k):
            state, logits = carry
            tok = sample(logits, k)
            logits, state = self.step(tok, state)
            return (state, logits), tok

        _, toks = jax.lax.scan(gen, (state, last),
                               jax.random.split(key, max_tokens))
        return toks.T  # [B, max_tokens]
