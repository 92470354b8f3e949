"""Diffusion Transformer (DiT) image generation — denoising model + samplers.

Beyond-parity model family (the reference pityka/lamp has no generative
image models; its vision zoo is the CIFAR conv classifier,
example-cifar100/cnn.scala:11-180). This adds the Peebles & Xie 2022 DiT
architecture on the SAME attention/linear building blocks as the ViT/LM
stacks, plus a self-contained Gaussian diffusion process (DDPM training
loss, DDPM ancestral and DDIM samplers, classifier-free guidance).

TPU-first choices
-----------------
- Patchify is one [N, C·p²]×[C·p², D] MXU GEMM (same trick as
  :class:`~lamp_tpu.models.vit.ViT`) — no im2col, static patch count.
- adaLN-Zero conditioning: per-block shift/scale/gate come from ONE
  [B, D]×[D, 6D] matmul on the conditioning vector; the gates are
  zero-initialised so every block starts as identity (stable bf16 training).
- The whole sampling loop is a single ``lax.scan`` under jit — every
  denoise step reuses one compiled program; no per-step dispatch through
  the host.
- Classifier-free guidance doubles the batch (cond ‖ uncond) into one
  forward — one big GEMM beats two half-sized ones on the MXU.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn import LayerNorm, Linear, Module, static_field
from ..nn.transformer import MultiheadAttention

__all__ = ["DiT", "GaussianDiffusion", "RectifiedFlow", "timestep_embedding"]


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """Sinusoidal embeddings of integer timesteps ``t`` [B] → [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _modulate(x, shift, scale):
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class DiTBlock(Module):
    """Pre-norm transformer block with adaLN-Zero conditioning."""

    norm1: LayerNorm
    attn: MultiheadAttention
    norm2: LayerNorm
    fc1: Linear
    fc2: Linear
    ada: Linear  # cond [B, D] -> 6 (shift, scale, gate) chunks

    @staticmethod
    def init(dim: int, num_heads: int, *, key, mlp_ratio: int = 4,
             dtype=jnp.float32) -> "DiTBlock":
        k1, k2, k3, k4 = jax.random.split(key, 4)
        ada = Linear.init(dim, 6 * dim, key=k4, bias=True, dtype=dtype)
        # adaLN-Zero: zero weights AND bias -> all gates start at 0, every
        # block starts as the identity function
        ada = ada.replace(weight=jnp.zeros_like(ada.weight),
                          bias=jnp.zeros_like(ada.bias))
        return DiTBlock(
            norm1=LayerNorm.init(dim, elementwise=False),
            attn=MultiheadAttention.init(dim, dim, dim, num_heads, key=k1,
                                         bias=True, dtype=dtype),
            norm2=LayerNorm.init(dim, elementwise=False),
            fc1=Linear.init(dim, mlp_ratio * dim, key=k2, dtype=dtype),
            fc2=Linear.init(mlp_ratio * dim, dim, key=k3, dtype=dtype),
            ada=ada,
        )

    def forward(self, x_and_cond, *, key=None, train=False):
        x, c = x_and_cond
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = jnp.split(
            self.ada(jax.nn.silu(c)), 6, axis=-1)
        h, _ = self.attn.forward(_modulate(self.norm1(x), sh_a, sc_a),
                                 key=key, train=train)
        x = x + g_a[:, None, :] * h
        h = self.fc2(jax.nn.gelu(self.fc1(_modulate(self.norm2(x), sh_m,
                                                    sc_m))))
        x = x + g_m[:, None, :] * h
        return (x, c), self


class DiT(Module):
    """Denoiser over NCHW images: predicts the noise ``eps`` added to x_t.

    Usage::

        model = DiT.init(image_size=32, patch_size=4, channels=3,
                         embed_dim=192, num_blocks=6, num_heads=3,
                         num_classes=10, key=key)
        eps, _ = model.forward((x_t, t, labels))     # labels None => uncond

    ``num_classes > 0`` adds a label embedding with an extra "null" class
    (index ``num_classes``) used for classifier-free guidance dropout.
    """

    patch_proj: Linear
    pos_embed: jax.Array        # [1, T, D]
    t_fc1: Linear
    t_fc2: Linear
    label_embed: Optional[jax.Array]   # [num_classes + 1, D] or None
    blocks: Tuple[DiTBlock, ...]
    final_norm: LayerNorm
    final_ada: Linear
    proj_out: Linear
    patch_size: int = static_field()
    image_size: int = static_field()
    channels: int = static_field()
    num_classes: int = static_field(default=0)

    @staticmethod
    def init(*, image_size: int, patch_size: int, channels: int,
             embed_dim: int, num_blocks: int, num_heads: int, key,
             num_classes: int = 0, mlp_ratio: int = 4,
             dtype=jnp.float32) -> "DiT":
        if image_size % patch_size != 0:
            raise ValueError("image_size must be divisible by patch_size")
        n = (image_size // patch_size) ** 2
        keys = jax.random.split(key, num_blocks + 7)
        patch_dim = channels * patch_size * patch_size
        final_ada = Linear.init(embed_dim, 2 * embed_dim, key=keys[2],
                                bias=True, dtype=dtype)
        final_ada = final_ada.replace(weight=jnp.zeros_like(final_ada.weight),
                                      bias=jnp.zeros_like(final_ada.bias))
        proj_out = Linear.init(embed_dim, patch_dim, key=keys[3], dtype=dtype)
        proj_out = proj_out.replace(weight=jnp.zeros_like(proj_out.weight),
                                    bias=jnp.zeros_like(proj_out.bias))
        label = None
        if num_classes:
            label = (jax.random.normal(keys[4], (num_classes + 1, embed_dim))
                     * 0.02).astype(dtype)
        return DiT(
            patch_proj=Linear.init(patch_dim, embed_dim, key=keys[0],
                                   dtype=dtype),
            pos_embed=(jax.random.normal(keys[1], (1, n, embed_dim))
                       * 0.02).astype(dtype),
            t_fc1=Linear.init(256, embed_dim, key=keys[5], dtype=dtype),
            t_fc2=Linear.init(embed_dim, embed_dim, key=keys[6], dtype=dtype),
            label_embed=label,
            blocks=tuple(
                DiTBlock.init(embed_dim, num_heads, key=keys[7 + i],
                              mlp_ratio=mlp_ratio, dtype=dtype)
                for i in range(num_blocks)),
            final_norm=LayerNorm.init(embed_dim, elementwise=False),
            final_ada=final_ada,
            proj_out=proj_out,
            patch_size=patch_size,
            image_size=image_size,
            channels=channels,
            num_classes=num_classes,
        )

    def _patchify(self, x):
        b, c, hh, ww = x.shape
        p = self.patch_size
        x = x.reshape(b, c, hh // p, p, ww // p, p)
        x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, H/p, W/p, C, p, p]
        return x.reshape(b, (hh // p) * (ww // p), c * p * p)

    def _unpatchify(self, x):
        b, n, _ = x.shape
        p, c = self.patch_size, self.channels
        g = self.image_size // p
        x = x.reshape(b, g, g, c, p, p).transpose(0, 3, 1, 4, 2, 5)
        return x.reshape(b, c, g * p, g * p)

    def forward(self, inputs, *, key=None, train=False):
        """inputs = (x_t [B,C,H,W], t [B] int, labels [B] int or None)."""
        x_t, t, labels = inputs
        h = self.patch_proj(self._patchify(x_t)) + self.pos_embed
        c = self.t_fc2(jax.nn.silu(self.t_fc1(
            timestep_embedding(t, 256).astype(h.dtype))))
        if labels is not None:
            if self.label_embed is None:
                raise ValueError("model built with num_classes=0")
            c = c + self.label_embed[labels]
        for i, blk in enumerate(self.blocks):
            bk = None if key is None else jax.random.fold_in(key, i)
            (h, c), _ = blk.forward((h, c), key=bk, train=train)
        sh, sc = jnp.split(self.final_ada(jax.nn.silu(c)), 2, axis=-1)
        out = self.proj_out(_modulate(self.final_norm(h), sh, sc))
        return self._unpatchify(out), self


class GaussianDiffusion:
    """DDPM process: cosine (default) or linear beta schedule.

    Pure container of schedule arrays; every method is jit-traceable.
    """

    def __init__(self, num_steps: int = 1000, schedule: str = "cosine"):
        self.num_steps = num_steps
        if schedule == "linear":
            betas = jnp.linspace(1e-4, 0.02, num_steps)
        elif schedule == "cosine":
            s = 0.008
            ts = jnp.arange(num_steps + 1) / num_steps
            f = jnp.cos((ts + s) / (1 + s) * math.pi / 2) ** 2
            betas = jnp.clip(1.0 - f[1:] / f[:-1], 0.0, 0.999)
        else:
            raise ValueError(f"unknown schedule {schedule!r}")
        self.betas = betas
        self.alphas = 1.0 - betas
        self.alphas_cumprod = jnp.cumprod(self.alphas)

    def q_sample(self, x0, t, noise):
        """Forward (noising) process: x_t ~ q(x_t | x_0)."""
        acp = self.alphas_cumprod[t][:, None, None, None]
        return jnp.sqrt(acp) * x0 + jnp.sqrt(1.0 - acp) * noise

    def loss(self, model: DiT, x0, *, key, labels=None,
             cfg_dropout: float = 0.0):
        """Epsilon-prediction MSE at uniformly sampled timesteps.

        ``cfg_dropout`` replaces that fraction of labels with the null class
        so the same model learns the unconditional branch (for guidance).
        """
        kt, kn, kd, kf = jax.random.split(key, 4)
        b = x0.shape[0]
        t = jax.random.randint(kt, (b,), 0, self.num_steps)
        noise = jax.random.normal(kn, x0.shape, dtype=x0.dtype)
        if labels is not None and cfg_dropout > 0.0:
            drop = jax.random.bernoulli(kd, cfg_dropout, (b,))
            labels = jnp.where(drop, model.num_classes, labels)
        eps, _ = model.forward((self.q_sample(x0, t, noise), t, labels),
                               key=kf, train=True)
        return jnp.mean((eps - noise) ** 2)

    def _predict(self, model, x, t, labels, guidance_scale):
        """eps prediction with optional classifier-free guidance."""
        b = x.shape[0]
        tb = jnp.full((b,), t, jnp.int32)
        if labels is None and guidance_scale != 1.0:
            raise ValueError(
                "guidance_scale != 1.0 requires labels (classifier-free "
                "guidance contrasts conditional vs null-label predictions; "
                "an unconditional model has nothing to guide toward)"
            )
        if labels is None or guidance_scale == 1.0:
            eps, _ = model.forward((x, tb, labels))
            return eps
        null = jnp.full((b,), model.num_classes, jnp.int32)
        eps, _ = model.forward((jnp.concatenate([x, x]),
                                jnp.concatenate([tb, tb]),
                                jnp.concatenate([labels, null])))
        cond, uncond = jnp.split(eps, 2)
        return uncond + guidance_scale * (cond - uncond)

    def ddim_sample(self, model: DiT, *, key, batch: int, num_steps: int = 50,
                    labels=None, guidance_scale: float = 1.0,
                    eta: float = 0.0):
        """DDIM sampler (Song et al. 2020); ``eta=0`` is deterministic.

        One ``lax.scan`` over a strided timestep ladder — a single compiled
        program for the whole trajectory.
        """
        shape = (batch, model.channels, model.image_size, model.image_size)
        # round (not truncate) for an even ladder without duplicate steps
        ts = jnp.round(
            jnp.linspace(self.num_steps - 1, 0, num_steps)
        ).astype(jnp.int32)
        ts_prev = jnp.concatenate([ts[1:], jnp.array([-1])])
        acp = self.alphas_cumprod

        def step(carry, t_pair):
            x, k = carry
            t, tp = t_pair
            k, kn = jax.random.split(k)
            eps = self._predict(model, x, t, labels, guidance_scale)
            a_t = acp[t]
            a_p = jnp.where(tp >= 0, acp[jnp.maximum(tp, 0)], 1.0)
            x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
            sigma = eta * jnp.sqrt((1 - a_p) / (1 - a_t)) * jnp.sqrt(
                1 - a_t / a_p)
            dir_xt = jnp.sqrt(jnp.maximum(1 - a_p - sigma ** 2, 0.0)) * eps
            noise = jax.random.normal(kn, x.shape, dtype=x.dtype)
            x = jnp.sqrt(a_p) * x0 + dir_xt + sigma * noise
            return (x, k), None

        key, k0 = jax.random.split(key)
        x = jax.random.normal(k0, shape)
        (x, _), _ = jax.lax.scan(step, (x, key), (ts, ts_prev))
        return x

    def ddpm_sample(self, model: DiT, *, key, batch: int, labels=None,
                    guidance_scale: float = 1.0):
        """Full ancestral DDPM sampler (num_steps denoise steps)."""
        shape = (batch, model.channels, model.image_size, model.image_size)
        acp, alphas, betas = self.alphas_cumprod, self.alphas, self.betas

        def step(carry, t):
            x, k = carry
            k, kn = jax.random.split(k)
            eps = self._predict(model, x, t, labels, guidance_scale)
            coef = betas[t] / jnp.sqrt(1 - acp[t])
            mean = (x - coef * eps) / jnp.sqrt(alphas[t])
            noise = jax.random.normal(kn, x.shape, dtype=x.dtype)
            x = mean + jnp.where(t > 0, jnp.sqrt(betas[t]), 0.0) * noise
            return (x, k), None

        key, k0 = jax.random.split(key)
        x = jax.random.normal(k0, shape)
        ts = jnp.arange(self.num_steps - 1, -1, -1)
        (x, _), _ = jax.lax.scan(step, (x, key), ts)
        return x


class RectifiedFlow:
    """Flow matching / rectified flow (Liu et al. 2022, Lipman et al. 2022).

    The modern alternative to DDPM on the same :class:`DiT` backbone: the
    model predicts the straight-line velocity ``v = x1 - x0`` along
    ``x_t = t·x1 + (1-t)·x0`` (x0 noise, x1 data, t ∈ [0,1]); sampling is
    plain Euler integration — no beta schedules. Continuous t is fed to the
    sinusoidal embedding scaled by ``time_scale``.
    """

    def __init__(self, time_scale: float = 1000.0):
        self.time_scale = time_scale

    def loss(self, model: DiT, x1, *, key, labels=None,
             cfg_dropout: float = 0.0):
        kt, kn, kd, kf = jax.random.split(key, 4)
        b = x1.shape[0]
        t = jax.random.uniform(kt, (b,))
        x0 = jax.random.normal(kn, x1.shape, dtype=x1.dtype)
        if labels is not None and cfg_dropout > 0.0:
            drop = jax.random.bernoulli(kd, cfg_dropout, (b,))
            labels = jnp.where(drop, model.num_classes, labels)
        xt = t[:, None, None, None] * x1 + (1 - t)[:, None, None, None] * x0
        v, _ = model.forward((xt, t * self.time_scale, labels), key=kf,
                             train=True)
        return jnp.mean((v - (x1 - x0)) ** 2)

    def sample(self, model: DiT, *, key, batch: int, num_steps: int = 32,
               labels=None, guidance_scale: float = 1.0):
        """Euler ODE integration noise → data in ``num_steps`` steps."""
        shape = (batch, model.channels, model.image_size, model.image_size)
        dt = 1.0 / num_steps

        def velocity(x, t):
            tb = jnp.full((batch,), t * self.time_scale)
            if labels is None or guidance_scale == 1.0:
                v, _ = model.forward((x, tb, labels))
                return v
            null = jnp.full((batch,), model.num_classes, jnp.int32)
            v, _ = model.forward((jnp.concatenate([x, x]),
                                  jnp.concatenate([tb, tb]),
                                  jnp.concatenate([labels, null])))
            cond, uncond = jnp.split(v, 2)
            return uncond + guidance_scale * (cond - uncond)

        def step(x, i):
            t = i.astype(jnp.float32) * dt
            return x + dt * velocity(x, t), None

        x = jax.random.normal(key, shape)
        x, _ = jax.lax.scan(step, x, jnp.arange(num_steps))
        return x
