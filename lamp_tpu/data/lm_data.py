"""Autoregressive LM data: corpus minibatching and sampling inference.

Capability parity with the reference's languagemodel data package
(lamp-data/src/main/scala/lamp/data/languagemodel/package.scala):
``autoregressiveMinibatchesFromCorpus`` random-crop causal batches (:128-205)
and the ``autoregressiveInference`` temperature sampling loop (:36-113).

TPU extension: the sampling loop jit-compiles one fixed-shape decode step
(full-context forward, as the reference does — no KV cache needed at ctx 384;
a KV-cached decode lives in lamp_tpu.models.generate for long contexts).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .batchstream import BatchStream

__all__ = ["autoregressive_minibatches_from_corpus", "autoregressive_inference"]


def autoregressive_minibatches_from_corpus(
        corpus: np.ndarray, batch_size: int, context_length: int, *,
        batches_per_epoch: Optional[int] = None,
        rng: Optional[np.random.Generator] = None) -> BatchStream:
    """Random-crop (tokens, shifted-target) batches (reference :128-205)."""
    corpus = np.asarray(corpus)
    n = len(corpus)
    rng = rng or np.random.default_rng(0)
    nb = batches_per_epoch or max(1, (n - context_length - 1) // (
        batch_size * context_length))

    def gen():
        for _ in range(nb):
            starts = rng.integers(0, n - context_length - 1, batch_size)
            x = np.stack([corpus[s:s + context_length] for s in starts])
            y = np.stack([corpus[s + 1:s + context_length + 1] for s in starts])
            yield (x.astype(np.int32), y.astype(np.int32))

    return BatchStream(gen, nb)


def autoregressive_inference(model, prefix: np.ndarray, *, length: int,
                             temperature: float = 1.0, key=None,
                             context_length: Optional[int] = None):
    """Temperature sampling loop (reference :36-113): one full forward per
    generated token over the (windowed) context.

    ``model`` is a LanguageModelModule-like module; ``prefix`` is [T] or [B,T]
    int tokens. Returns the generated continuation (without the prefix).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    prefix = np.asarray(prefix)
    if prefix.ndim == 1:
        prefix = prefix[None]
    b, t0 = prefix.shape
    ctx = context_length or getattr(model, "context_length", None) or (t0 + length)

    # fixed-shape decode: a [B, ctx] ring buffer + valid-length mask, so the
    # jitted step never retraces as the sequence grows
    @jax.jit
    def next_logits(model, buf, valid_len):
        lengths = jnp.full((buf.shape[0],), valid_len)
        logits, _ = model.forward((buf, lengths), train=False)
        return logits[jnp.arange(buf.shape[0]), valid_len - 1, :]

    buf = np.zeros((b, ctx), np.int32)
    fill = min(t0, ctx)
    buf[:, :fill] = prefix[:, -fill:]
    valid = fill

    generated = []
    for _ in range(length):
        logits = next_logits(model, jnp.asarray(buf), jnp.asarray(valid))
        key, sub = jax.random.split(key)
        if temperature <= 0:
            nxt = jnp.argmax(logits, axis=-1)
        else:
            nxt = jax.random.categorical(sub, logits / temperature, axis=-1)
        nxt = np.asarray(nxt).astype(np.int32)
        generated.append(nxt[:, None])
        if valid < ctx:
            buf[:, valid] = nxt
            valid += 1
        else:
            buf = np.concatenate([buf[:, 1:], nxt[:, None]], axis=1)
    return np.concatenate(generated, axis=1)
