"""CLIP / SigLIP: contrastive image-text pretraining.

Beyond reference parity (the reference has no multimodal family): a dual
tower built ENTIRELY from this framework's existing stacks — the image
tower is the :class:`~lamp_tpu.models.vit.ViT` patchify + shared
:class:`~lamp_tpu.nn.transformer.TransformerEncoder`, the text tower is a
causal TransformerEncoder with learned positions — plus the two standard
contrastive objectives:

- :func:`clip_loss` — symmetric InfoNCE over the batch (Radford et al.
  2021), with a learnable log temperature.
- :func:`siglip_loss` — pairwise sigmoid loss (Zhai et al. 2023), with
  learnable temperature AND bias; no batch-level softmax, so it shards
  cleanly over a data-parallel mesh.

Both losses take ``axis_name=`` for mesh training: embeddings are
all-gathered over the axis so every device scores its local pairs against
the GLOBAL batch's negatives (the standard distributed-CLIP recipe — the
gather moves [B_local, E] activations, tiny next to the towers' FLOPs; XLA
rides it on ICI). Labels/diagonals are offset by ``axis_index`` so the
sharded loss equals the single-device loss on the concatenated batch
(tested on the 8-device CPU mesh in tests/test_parallel.py).

TPU-first notes: towers run in bf16 with f32 logits; the similarity matrix
is one [B, E] x [E, B] MXU matmul; L2 normalization fuses into it.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn import Embedding, LayerNorm, Linear, Module, static_field
from ..nn.transformer import TransformerEncoder
from .vit import ViT

__all__ = ["CLIP", "clip_loss", "siglip_loss"]


def _l2_normalize(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    return xf / jnp.maximum(jnp.linalg.norm(xf, axis=-1, keepdims=True), eps)


class CLIP(Module):
    """Dual-tower contrastive model.

    ``forward((images, tokens, lengths))`` returns L2-normalized f32
    ``(image_embeddings, text_embeddings)`` of shape [B, embed_dim] plus the
    learnable ``logit_scale`` (and ``logit_bias`` when initialised for
    SigLIP) to feed :func:`clip_loss` / :func:`siglip_loss`.

    Text pooling: features at the last valid token (``lengths - 1``), the
    CLIP EOT convention. Image pooling: the ViT's own cls/mean pooling; the
    ViT head becomes the image projection.
    """

    image_tower: ViT
    text_embed: Embedding
    text_pos: jax.Array                 # [1, T, D]
    text_encoder: TransformerEncoder
    text_norm: LayerNorm
    text_proj: Linear
    logit_scale: jax.Array              # scalar, log temperature
    logit_bias: Optional[jax.Array]     # scalar (SigLIP) or None (CLIP)
    context_length: int = static_field()

    @staticmethod
    def init(*, image_size: int, patch_size: int, vocab_size: int,
             context_length: int, embed_dim: int,
             image_blocks: int = 6, image_heads: int = 4,
             image_width: Optional[int] = None,
             text_blocks: int = 4, text_heads: int = 4,
             text_width: Optional[int] = None,
             channels: int = 3, key, dropout: float = 0.0,
             siglip: bool = False, remat: bool = False,
             dtype=jnp.float32) -> "CLIP":
        image_width = image_width or embed_dim
        text_width = text_width or embed_dim
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        tower = ViT.init(
            image_size=image_size, patch_size=patch_size,
            num_classes=embed_dim, embed_dim=image_width,
            num_blocks=image_blocks, num_heads=image_heads,
            channels=channels, key=k1, dropout=dropout, pool="cls",
            remat=remat, dtype=dtype,
        )
        return CLIP(
            image_tower=tower,
            text_embed=Embedding.init(vocab_size, text_width, key=k2,
                                      dtype=dtype),
            text_pos=(0.01 * jax.random.normal(
                k3, (1, context_length, text_width))).astype(dtype),
            text_encoder=TransformerEncoder.init(
                text_blocks, text_width, text_width, text_heads,
                4 * text_width, key=k4, dropout=dropout, causal=True,
                gpt_order=True, remat=remat, dtype=dtype),
            text_norm=LayerNorm.init((text_width,), dtype=dtype),
            text_proj=Linear.init(text_width, embed_dim, key=k5, bias=False,
                                  dtype=dtype),
            # CLIP init: 1/0.07 temperature; SigLIP init: t'=log 10, b=-10
            logit_scale=jnp.asarray(
                math.log(10.0) if siglip else math.log(1.0 / 0.07),
                jnp.float32),
            logit_bias=jnp.asarray(-10.0, jnp.float32) if siglip else None,
            context_length=context_length,
        )

    def encode_image(self, images, *, key=None, train=False):
        emb, _ = self.image_tower.forward(images, key=key, train=train)
        return _l2_normalize(emb)

    def encode_text(self, tokens, lengths=None, *, key=None, train=False):
        x, _ = self.text_embed.forward(tokens)
        x = x + self.text_pos[:, : x.shape[1]].astype(x.dtype)
        (enc, _), _ = self.text_encoder.forward((x, lengths), key=key,
                                                train=train)
        if lengths is None:
            pooled = enc[:, -1]
        else:
            idx = jnp.clip(jnp.asarray(lengths) - 1, 0, enc.shape[1] - 1)
            pooled = jnp.take_along_axis(
                enc, idx[:, None, None].astype(jnp.int32), axis=1
            )[:, 0]
        normed, _ = self.text_norm.forward(pooled)
        proj, _ = self.text_proj.forward(normed)
        return _l2_normalize(proj)

    def forward(self, batch, *, key=None, train=False):
        images, tokens = batch[0], batch[1]
        lengths = batch[2] if len(batch) > 2 else None
        k1 = k2 = None
        if key is not None:
            k1, k2 = jax.random.split(key)
        img = self.encode_image(images, key=k1, train=train)
        txt = self.encode_text(tokens, lengths, key=k2, train=train)
        return (img, txt), self


def _gather_with_offset(img, txt, axis_name):
    """All-gather both embedding sets over the mesh axis; return the global
    arrays plus this device's row offset into them."""
    n = jax.lax.axis_size(axis_name)
    b_local = img.shape[0]
    img_all = jax.lax.all_gather(img, axis_name, tiled=True)
    txt_all = jax.lax.all_gather(txt, axis_name, tiled=True)
    offset = jax.lax.axis_index(axis_name) * b_local
    return img_all, txt_all, offset, n * b_local


def clip_loss(img, txt, logit_scale, *, axis_name: Optional[str] = None):
    """Symmetric InfoNCE. ``img``/``txt``: L2-normalized [B, E] f32;
    ``logit_scale``: scalar log temperature. With ``axis_name`` (inside
    shard_map) the batch dimension is the LOCAL shard and negatives span the
    gathered global batch; the returned mean is the local-pair mean (psum
    with example weights outside gives the global mean)."""
    scale = jnp.exp(logit_scale)
    b = img.shape[0]
    if axis_name is None:
        txt_all, img_all, offset = txt, img, 0
    else:
        img_all, txt_all, offset, _ = _gather_with_offset(img, txt, axis_name)
    logits_i = scale * jnp.dot(img, txt_all.T,
                               preferred_element_type=jnp.float32)
    logits_t = scale * jnp.dot(txt, img_all.T,
                               preferred_element_type=jnp.float32)
    labels = offset + jnp.arange(b)
    li = -jnp.take_along_axis(
        jax.nn.log_softmax(logits_i, axis=-1), labels[:, None], axis=1
    ).mean()
    lt = -jnp.take_along_axis(
        jax.nn.log_softmax(logits_t, axis=-1), labels[:, None], axis=1
    ).mean()
    return 0.5 * (li + lt)


def siglip_loss(img, txt, logit_scale, logit_bias, *,
                axis_name: Optional[str] = None):
    """Pairwise sigmoid loss (SigLIP): every (image, text) pair is an
    independent binary classification — positives on the (global) diagonal.
    Returns the sum over pairs divided by the LOCAL batch size, matching the
    paper's normalization (so the mesh version psum-averages to the same
    value as single-device)."""
    scale = jnp.exp(logit_scale)
    b = img.shape[0]
    if axis_name is None:
        txt_all, offset, b_global = txt, 0, b
    else:
        _, txt_all, offset, b_global = _gather_with_offset(
            img, txt, axis_name)
    logits = scale * jnp.dot(img, txt_all.T,
                             preferred_element_type=jnp.float32) + logit_bias
    signs = 2.0 * jax.nn.one_hot(
        offset + jnp.arange(b), b_global, dtype=jnp.float32) - 1.0
    # -log sigmoid(sign * logit), summed over the row of pairs
    return jnp.sum(jax.nn.softplus(-signs * logits)) / b
