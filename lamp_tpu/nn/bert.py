"""BERT pretraining modules.

Capability parity with the reference's bert package
(lamp-core/src/main/scala/lamp/nn/bert/bert.scala): ``BertEncoder`` (:385) =
TransformerEmbedding + encoder blocks with segment embeddings, a [CLS]-style
first token; ``MaskedLanguageModelModule`` (:312) projecting encoder output at
masked positions to vocab logits; ``BertPretrainModule`` (:209) adding the
next-sentence-prediction head; ``BertLoss`` (:42-146) = MLM NLL + NSP BCE.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import init as initializers
from .layers import Embedding, LayerNorm, Linear
from .losses import bce_with_logits_loss, nll_loss
from .module import Module
from .transformer import TransformerEncoder

__all__ = [
    "BertEncoder",
    "MaskedLanguageModelModule",
    "BertPretrainModule",
    "BertPretrainInput",
    "bert_loss",
]


class BertPretrainInput(NamedTuple):
    """Reference: bert.scala:163-200 — token/segment ids and the positions
    that were masked for the MLM objective."""

    tokens: jax.Array          # [B, T] int
    segments: jax.Array        # [B, T] int (0/1 sentence id)
    positions: jax.Array       # [B, P] int, masked positions
    max_length: Optional[jax.Array] = None  # [B] valid lengths


class BertEncoder(Module):
    """Token + position + segment embeddings -> transformer encoder.

    Reference: bert.scala:385-470.
    """

    token_embedding: Embedding
    position_embedding: Embedding
    segment_embedding: Embedding
    norm: LayerNorm
    encoder: TransformerEncoder

    @staticmethod
    def init(*, vocab_size: int, segments: int, max_length: int,
             num_blocks: int, embed_dim: int, attention_heads: int,
             attention_hidden: Optional[int] = None,
             mlp_hidden: Optional[int] = None, dropout: float = 0.0, key,
             dtype=jnp.float32) -> "BertEncoder":
        k1, k2, k3, k4 = jax.random.split(key, 4)
        attention_hidden = attention_hidden or embed_dim
        return BertEncoder(
            token_embedding=Embedding(
                weight=initializers.normal(0.02)(k1, (vocab_size, embed_dim), dtype)
            ),
            position_embedding=Embedding(
                weight=initializers.normal(0.02)(k2, (max_length, embed_dim), dtype)
            ),
            segment_embedding=Embedding(
                weight=initializers.normal(0.02)(k3, (segments, embed_dim), dtype)
            ),
            norm=LayerNorm.init(embed_dim, dtype=dtype),
            encoder=TransformerEncoder.init(
                num_blocks, embed_dim, attention_hidden, attention_heads,
                mlp_hidden, key=k4, dropout=dropout, causal=False,
                gpt_order=False, dtype=dtype,
            ),
        )

    def forward(self, inp, *, key=None, train=False):
        tokens, segments, lengths = inp
        t = tokens.shape[1]
        pos_ids = jnp.arange(t)[None, :]
        x = (
            self.token_embedding(tokens)
            + self.position_embedding(pos_ids)
            + self.segment_embedding(segments)
        )
        x = self.norm(x)
        (x, _), _ = self.encoder.forward((x, lengths), key=key, train=train)
        return x, self


class MaskedLanguageModelModule(Module):
    """Projects encoder states at masked positions to vocab log-probs.

    Reference: bert.scala:312-384.
    """

    mlp1: Linear
    norm: LayerNorm
    mlp2: Linear

    @staticmethod
    def init(*, embed_dim: int, vocab_size: int, key,
             dtype=jnp.float32) -> "MaskedLanguageModelModule":
        k1, k2 = jax.random.split(key)
        return MaskedLanguageModelModule(
            mlp1=Linear.init(embed_dim, embed_dim, key=k1, dtype=dtype),
            norm=LayerNorm.init(embed_dim, dtype=dtype),
            mlp2=Linear.init(embed_dim, vocab_size, key=k2, dtype=dtype),
        )

    def forward(self, encoded_and_positions, *, key=None, train=False):
        encoded, positions = encoded_and_positions
        g = jnp.take_along_axis(encoded, positions[:, :, None], axis=1)
        h = self.norm(jax.nn.gelu(self.mlp1(g)))
        logits = self.mlp2(h)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), self


class BertPretrainModule(Module):
    """Encoder + MLM head + next-sentence head on the first token.

    Reference: bert.scala:209-311 (output BertPretrainOutput: encoded,
    languageModelScores, wholeSentenceBinaryClassifierScore).
    """

    encoder: BertEncoder
    mlm: MaskedLanguageModelModule
    nsp_head: Linear

    @staticmethod
    def init(*, vocab_size: int, segments: int, max_length: int,
             num_blocks: int, embed_dim: int, attention_heads: int,
             attention_hidden: Optional[int] = None,
             mlp_hidden: Optional[int] = None, dropout: float = 0.0, key,
             dtype=jnp.float32) -> "BertPretrainModule":
        k1, k2, k3 = jax.random.split(key, 3)
        return BertPretrainModule(
            encoder=BertEncoder.init(
                vocab_size=vocab_size, segments=segments, max_length=max_length,
                num_blocks=num_blocks, embed_dim=embed_dim,
                attention_heads=attention_heads,
                attention_hidden=attention_hidden, mlp_hidden=mlp_hidden,
                dropout=dropout, key=k1, dtype=dtype,
            ),
            mlm=MaskedLanguageModelModule.init(
                embed_dim=embed_dim, vocab_size=vocab_size, key=k2, dtype=dtype
            ),
            nsp_head=Linear.init(embed_dim, 1, key=k3, dtype=dtype),
        )

    def forward(self, inp: BertPretrainInput, *, key=None, train=False):
        k1, k2 = jax.random.split(key) if key is not None else (None, None)
        encoded, _ = self.encoder.forward(
            (inp.tokens, inp.segments, inp.max_length), key=k1, train=train
        )
        mlm_scores, _ = self.mlm.forward((encoded, inp.positions), key=k2,
                                         train=train)
        nsp_score = self.nsp_head(encoded[:, 0, :])[:, 0]
        return (encoded, mlm_scores, nsp_score), self


def bert_loss(mlm_log_probs, mlm_targets, nsp_score, nsp_target, *,
              ignore_index: int = -100, nsp_weight: float = 1.0):
    """MLM NLL + whole-sentence BCE (reference BertLoss bert.scala:42-146)."""
    mlm = nll_loss(
        mlm_log_probs.reshape(-1, mlm_log_probs.shape[-1]),
        mlm_targets.reshape(-1),
        ignore_index=ignore_index,
    )
    if nsp_target is None:
        return mlm
    nsp = bce_with_logits_loss(nsp_score, nsp_target.astype(jnp.float32))
    return mlm + nsp_weight * nsp
