"""BERT pretraining data: MLM masking and sentence-pair batch assembly.

Capability parity with the reference's bert data package
(lamp-data/src/main/scala/lamp/data/bert/package.scala): the 80/10/10 MLM
masking ``makeMaskForMaskedLanguageModel`` (:18-56) and sentence-pair +
segment + next-sentence batch assembly ``prepareParagraph`` /
``prepareFullDatasetFromTokenizedParagraphs`` (:58-230).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["make_mlm_mask", "prepare_sentence_pairs", "BertBatch"]


def make_mlm_mask(tokens: np.ndarray, *, mask_token: int, vocab_size: int,
                  num_prediction_positions: int,
                  rng: np.random.Generator,
                  special_tokens: Sequence[int] = ()) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """80/10/10 masked-language-model corruption of one sequence.

    Picks up to ``num_prediction_positions`` non-special positions; each is
    replaced by [MASK] with p=.8, a random token with p=.1, kept with p=.1
    (reference bert/package.scala:18-56). Returns
    (corrupted_tokens, positions, targets); unused position slots are 0 with
    target -100 (the loss ignore index).
    """
    tokens = np.asarray(tokens)
    candidates = np.array(
        [i for i, t in enumerate(tokens) if int(t) not in set(special_tokens)],
        dtype=np.int64,
    )
    k = min(num_prediction_positions, max(1, int(len(candidates) * 0.15)))
    chosen = rng.choice(candidates, size=min(k, len(candidates)), replace=False)
    out = tokens.copy()
    positions = np.zeros((num_prediction_positions,), np.int32)
    targets = np.full((num_prediction_positions,), -100, np.int32)
    for slot, pos in enumerate(sorted(chosen)):
        positions[slot] = pos
        targets[slot] = tokens[pos]
        r = rng.random()
        if r < 0.8:
            out[pos] = mask_token
        elif r < 0.9:
            out[pos] = rng.integers(0, vocab_size)
        # else keep original
    return out, positions, targets


class BertBatch(tuple):
    """(tokens, segments, positions, mlm_targets, nsp_targets, lengths)."""

    __slots__ = ()

    def __new__(cls, tokens, segments, positions, mlm_targets, nsp_targets,
                lengths):
        return super().__new__(cls, (tokens, segments, positions, mlm_targets,
                                     nsp_targets, lengths))

    tokens = property(lambda s: s[0])
    segments = property(lambda s: s[1])
    positions = property(lambda s: s[2])
    mlm_targets = property(lambda s: s[3])
    nsp_targets = property(lambda s: s[4])
    lengths = property(lambda s: s[5])


def prepare_sentence_pairs(paragraphs: List[List[List[int]]], *, rng,
                           max_length: int, cls_token: int, sep_token: int,
                           pad_token: int, mask_token: int, vocab_size: int,
                           num_prediction_positions: int = 20) -> Optional[BertBatch]:
    """Assemble next-sentence-prediction pairs with segments + MLM corruption.

    ``paragraphs`` is tokenized sentences grouped by paragraph (reference
    prepareFullDatasetFromTokenizedParagraphs, bert/package.scala:58-230):
    consecutive sentence pairs are positive examples; 50% get a random second
    sentence (negative). Layout: [CLS] sent_a [SEP] sent_b [SEP] padding.
    """
    all_sentences = [s for p in paragraphs for s in p]
    if len(all_sentences) < 2:
        return None
    examples = []
    for para in paragraphs:
        for a, b in zip(para, para[1:]):
            if rng.random() < 0.5:
                rnd = all_sentences[rng.integers(0, len(all_sentences))]
                examples.append((a, rnd, 0))
            else:
                examples.append((a, b, 1))
    if not examples:
        return None
    toks, segs, poss, mlmt, nspt, lens = [], [], [], [], [], []
    budget = max_length - 3
    for a, b, is_next in examples:
        half = budget // 2
        a = list(a)[:half]
        b = list(b)[:budget - len(a)]
        seq = [cls_token] + a + [sep_token] + b + [sep_token]
        seg = [0] * (len(a) + 2) + [1] * (len(b) + 1)
        length = len(seq)
        seq = seq + [pad_token] * (max_length - length)
        seg = seg + [0] * (max_length - length)
        corrupted, positions, targets = make_mlm_mask(
            np.asarray(seq[:length]), mask_token=mask_token,
            vocab_size=vocab_size,
            num_prediction_positions=num_prediction_positions, rng=rng,
            special_tokens=(cls_token, sep_token, pad_token),
        )
        full = np.concatenate([corrupted,
                               np.full((max_length - length,), pad_token,
                                       corrupted.dtype)])
        toks.append(full)
        segs.append(seg)
        poss.append(positions)
        mlmt.append(targets)
        nspt.append(is_next)
        lens.append(length)
    return BertBatch(
        np.stack(toks).astype(np.int32),
        np.asarray(segs, np.int32),
        np.stack(poss),
        np.stack(mlmt),
        np.asarray(nspt, np.int32),
        np.asarray(lens, np.int32),
    )
