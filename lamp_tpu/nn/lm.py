"""GPT-style autoregressive language model.

Capability parity with the reference's languagemodel package
(lamp-core/src/main/scala/lamp/nn/languagemodel/lm.scala): learned token +
position embeddings -> causal TransformerEncoder -> final LayerNorm -> logits
via the tied embedding transpose (lm.scala:213-257, tying at :251), plus the
loss wrapper (:76).

TPU extension beyond reference parity: an optional KV-cached single-token
decode path for fast sampling (the reference recomputes the full forward per
generated token — call stack SURVEY.md §3.4).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import init as initializers
from .layers import Embedding, LayerNorm
from .losses import sequence_nll
from .module import Module, static_field
from .transformer import TransformerEncoder


__all__ = ["LanguageModelModule", "LanguageModelInput", "LanguageModelLoss",
           "lm_loss"]


class LanguageModelInput(NamedTuple):
    """Reference: lm.scala:39 — tokens [B,T], optional lengths [B], optional
    positions [B,P] selecting which output positions feed the loss."""

    tokens: jax.Array
    lengths: Optional[jax.Array] = None
    positions: Optional[jax.Array] = None


class LanguageModelModule(Module):
    """Reference: lm.scala:213-257."""

    token_embedding: Embedding
    position_embedding: Embedding
    encoder: TransformerEncoder
    final_norm: LayerNorm
    context_length: int = static_field()

    @staticmethod
    def init(*, vocab_size: int, context_length: int, num_blocks: int,
             embed_dim: int, attention_heads: int,
             attention_hidden: Optional[int] = None,
             mlp_hidden: Optional[int] = None, dropout: float = 0.0, key,
             linearized: bool = False, dtype=jnp.float32) -> "LanguageModelModule":
        k1, k2, k3 = jax.random.split(key, 3)
        attention_hidden = attention_hidden or embed_dim
        return LanguageModelModule(
            token_embedding=Embedding(
                weight=initializers.normal(0.02)(k1, (vocab_size, embed_dim), dtype)
            ),
            position_embedding=Embedding(
                weight=initializers.normal(0.02)(
                    k2, (context_length, embed_dim), dtype
                )
            ),
            encoder=TransformerEncoder.init(
                num_blocks, embed_dim, attention_hidden, attention_heads,
                mlp_hidden, key=k3, dropout=dropout, causal=True,
                gpt_order=True, linearized=linearized, dtype=dtype,
            ),
            final_norm=LayerNorm.init(embed_dim, dtype=dtype),
            context_length=context_length,
        )

    @property
    def vocab_size(self):
        return self.token_embedding.weight.shape[0]

    def forward(self, inp, *, key=None, train=False):
        if isinstance(inp, LanguageModelInput):
            tokens, lengths, positions = inp.tokens, inp.lengths, inp.positions
        elif isinstance(inp, tuple):
            tokens, lengths, positions = (inp + (None, None))[:3]
        else:
            tokens, lengths, positions = inp, None, None
        b, t = tokens.shape
        pos_ids = jnp.arange(t)[None, :]
        x = self.token_embedding(tokens) + self.position_embedding(pos_ids)
        (x, _), _ = self.encoder.forward((x, lengths), key=key, train=train)
        x = self.final_norm(x)
        if positions is not None:
            x = jnp.take_along_axis(x, positions[:, :, None], axis=1)
        # tied embedding transpose (lm.scala:251)
        w = self.token_embedding.weight
        logits = jnp.einsum(
            "btd,vd->btv", x, w,
            preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
        )
        return logits, self


def lm_loss(logits, target, *, ignore_index: int = -100):
    """Sequence NLL over shifted targets (reference LanguageModelLoss
    lm.scala:76 + SequenceNLL)."""
    return sequence_nll(logits, target, ignore_index=ignore_index)


class LanguageModelLoss(Module):
    """Module pairing the LM with its loss (reference lm.scala:56-120)."""

    lm: LanguageModelModule

    @staticmethod
    def init(lm: LanguageModelModule) -> "LanguageModelLoss":
        return LanguageModelLoss(lm=lm)

    def forward(self, batch, *, key=None, train=False):
        inp, target = batch
        logits, _ = self.lm.forward(inp, key=key, train=train)
        return lm_loss(logits, target), self
