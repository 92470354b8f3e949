"""Text utilities: vocab building, text minibatching, greedy/beam decoding.

Capability parity with the reference's Text utilities
(lamp-data/src/main/scala/lamp/data/Text.scala): ``charsToIntegers`` /
``wordsToIntegers`` (:160,175), RNN text minibatching ``minibatchesFromText``
(:226), greedy ``sequencePrediction`` (:18) and beam-search
``sequencePredictionBeam`` (:38).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .batchstream import BatchStream

__all__ = [
    "chars_to_integers",
    "words_to_integers",
    "minibatches_from_text",
    "sequence_prediction",
    "sequence_prediction_beam",
]


def chars_to_integers(text: str) -> Tuple[np.ndarray, Dict[str, int]]:
    """Build a char vocabulary and encode (reference Text.scala:160)."""
    vocab = {c: i for i, c in enumerate(sorted(set(text)))}
    return np.asarray([vocab[c] for c in text], np.int32), vocab


def words_to_integers(text: str, *, min_count: int = 1,
                      unknown: str = "<unk>") -> Tuple[np.ndarray, Dict[str, int]]:
    """Word vocabulary with rare-word cutoff (reference Text.scala:175)."""
    words = text.split()
    counts: Dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    kept = sorted(w for w, c in counts.items() if c >= min_count)
    vocab = {w: i for i, w in enumerate(kept)}
    vocab.setdefault(unknown, len(vocab))
    unk = vocab[unknown]
    return np.asarray([vocab.get(w, unk) for w in words], np.int32), vocab


def minibatches_from_text(tokens: np.ndarray, batch_size: int, seq_len: int, *,
                          rng: Optional[np.random.Generator] = None) -> BatchStream:
    """Contiguous (input, shifted-target) windows for RNN training
    (reference Text.scala:226)."""
    tokens = np.asarray(tokens)
    n_windows = (len(tokens) - 1) // seq_len

    def gen():
        order = np.arange(n_windows)
        if rng is not None:
            rng.shuffle(order)
        usable = n_windows - (n_windows % batch_size)
        for s in range(0, usable, batch_size):
            sel = order[s:s + batch_size]
            x = np.stack([tokens[i * seq_len:(i + 1) * seq_len] for i in sel])
            y = np.stack([tokens[i * seq_len + 1:(i + 1) * seq_len + 1] for i in sel])
            yield (x, y)

    return BatchStream(gen, n_windows // batch_size)


def sequence_prediction(forward: Callable, prefix: np.ndarray, steps: int):
    """Greedy decoding: repeatedly append argmax token (reference
    Text.scala:18). ``forward(tokens[B,T]) -> logits[B,T,V]``."""
    tokens = jnp.asarray(prefix)
    for _ in range(steps):
        logits = forward(tokens)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1)[:, None]
        tokens = jnp.concatenate([tokens, nxt.astype(tokens.dtype)], axis=1)
    return tokens


def sequence_prediction_beam(forward: Callable, prefix: np.ndarray, steps: int,
                             beam_width: int = 4):
    """Beam search over a single prefix (reference Text.scala:38). Returns
    [(tokens, log_prob)] sorted best-first."""
    prefix = np.asarray(prefix).reshape(1, -1)
    beams: List[Tuple[np.ndarray, float]] = [(prefix, 0.0)]
    for _ in range(steps):
        candidates: List[Tuple[np.ndarray, float]] = []
        for toks, lp in beams:
            logits = np.asarray(forward(jnp.asarray(toks)))[0, -1]
            logp = logits - _logsumexp(logits)
            top = np.argsort(-logp)[:beam_width]
            for t in top:
                candidates.append((
                    np.concatenate([toks, [[t]]], axis=1),
                    lp + float(logp[t]),
                ))
        candidates.sort(key=lambda c: -c[1])
        beams = candidates[:beam_width]
    return beams


def _logsumexp(x):
    m = np.max(x)
    return m + np.log(np.sum(np.exp(x - m)))
