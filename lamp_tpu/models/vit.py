"""Vision Transformer (ViT) image classifier.

The reference's vision zoo is conv-only (example-cifar100 cnn.scala:11-180);
this adds the transformer-based family (Dosovitskiy et al. 2020) on top of
the SAME :class:`~lamp_tpu.nn.transformer.TransformerEncoder` used by the
BERT/LM stacks — one attention implementation (with its Pallas flash
kernels and measured dispatch) serves every modality.

TPU-first choices:
- Patch embedding is an explicit reshape + ONE [N, C·p²]×[C·p², D] matmul
  (not a strided conv): it lowers to a single large MXU GEMM with no
  im2col, and the patch count is static so XLA tiles it directly.
- Pre-norm blocks (``gpt_order=True``), gelu MLP, learned positional
  embeddings, class-token or mean pooling.
- ``remat=True`` flows through to the encoder for big-image training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import LayerNorm, Linear, Module, static_field
from ..nn.transformer import TransformerEncoder

__all__ = ["ViT"]


class ViT(Module):
    """ViT-{S,B,...} classifier over NCHW images.

    Usage:
        model = ViT.init(image_size=32, patch_size=4, num_classes=100,
                         embed_dim=192, num_blocks=6, num_heads=3,
                         key=key)
        logits, _ = model.forward(images)          # [B, num_classes]
    """

    patch_proj: Linear
    cls_token: jax.Array          # [1, 1, D]
    pos_embed: jax.Array          # [1, tokens, D]
    encoder: TransformerEncoder
    norm: LayerNorm
    head: Linear
    patch_size: int = static_field()
    pool: str = static_field(default="cls")

    @staticmethod
    def init(*, image_size: int, patch_size: int, num_classes: int,
             embed_dim: int, num_blocks: int, num_heads: int,
             mlp_hidden: int = None, channels: int = 3, key,
             dropout: float = 0.0, pool: str = "cls", remat: bool = False,
             dtype=jnp.float32) -> "ViT":
        if image_size % patch_size != 0:
            raise ValueError("image_size must be divisible by patch_size")
        if pool not in ("cls", "mean"):
            raise ValueError(f"pool must be 'cls' or 'mean', got {pool!r}")
        n_patches = (image_size // patch_size) ** 2
        tokens = n_patches + (1 if pool == "cls" else 0)
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        patch_dim = channels * patch_size * patch_size
        return ViT(
            patch_proj=Linear.init(patch_dim, embed_dim, key=k1,
                                   dtype=dtype),
            cls_token=(0.02 * jax.random.normal(
                k2, (1, 1, embed_dim))).astype(dtype),
            pos_embed=(0.02 * jax.random.normal(
                k3, (1, tokens, embed_dim))).astype(dtype),
            encoder=TransformerEncoder.init(
                num_blocks, embed_dim, embed_dim, num_heads,
                mlp_hidden if mlp_hidden is not None else 4 * embed_dim,
                key=k4, dropout=dropout, causal=False, gpt_order=True,
                remat=remat, dtype=dtype),
            norm=LayerNorm.init((embed_dim,), dtype=dtype),
            head=Linear.init(embed_dim, num_classes, key=k5, dtype=dtype),
            patch_size=patch_size,
            pool=pool,
        )

    def _patchify(self, x):
        """[B, C, H, W] -> [B, HW/p², C·p²] — pure reshape/transpose, no
        gather; the projection is then one MXU matmul."""
        b, c, h, w = x.shape
        p = self.patch_size
        x = x.reshape(b, c, h // p, p, w // p, p)
        x = x.transpose(0, 2, 4, 1, 3, 5)          # b, hp, wp, c, p, p
        return x.reshape(b, (h // p) * (w // p), c * p * p)

    def forward(self, x, *, key=None, train=False):
        tok, _ = self.patch_proj.forward(self._patchify(x))
        if self.pool == "cls":
            cls = jnp.broadcast_to(
                self.cls_token.astype(tok.dtype),
                (tok.shape[0], 1, tok.shape[2]))
            tok = jnp.concatenate([cls, tok], axis=1)
        tok = tok + self.pos_embed.astype(tok.dtype)
        (enc, _), _ = self.encoder.forward((tok, None), key=key, train=train)
        pooled = enc[:, 0] if self.pool == "cls" else jnp.mean(enc, axis=1)
        normed, _ = self.norm.forward(pooled)
        logits, _ = self.head.forward(normed)
        return logits, self
