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

__all__ = ["autoregressive_minibatches_from_corpus",
           "autoregressive_inference", "pack_documents"]


def pack_documents(docs, context_length: int, *, pad_id: int = 0,
                   ignore_index: int = -100):
    """Pack variable-length token sequences into fixed ``[N, ctx]`` rows for
    packed-document training (a TPU-first extension: the reference trains on
    random corpus crops only, package.scala:128-205 — packing keeps static
    shapes while wasting no FLOPs on padding and no attention across
    document boundaries).

    Documents are placed greedily in order, never split across rows;
    documents longer than ``context_length`` are truncated. Returns a dict
    of int32 numpy arrays, each ``[N, context_length]``:

    - ``tokens``: packed input ids (``pad_id`` in the unused tail)
    - ``targets``: next token WITHIN the same document; the last token of
      each document and all padding get ``ignore_index``
    - ``segment_ids``: 0, 1, … per document within a row (padding gets its
      own trailing id), for ``ModernLM(…, segment_ids=)`` attention masking
    - ``positions``: 0-based offsets restarting at each document, for
      per-document RoPE
    """
    rows = []          # list of list-of-docs
    room = []          # remaining space per row
    for doc in docs:
        doc = np.asarray(doc)[:context_length]
        if len(doc) == 0:
            continue
        for i in range(len(rows)):
            if room[i] >= len(doc):
                rows[i].append(doc)
                room[i] -= len(doc)
                break
        else:
            rows.append([doc])
            room.append(context_length - len(doc))

    n = len(rows)
    tokens = np.full((n, context_length), pad_id, np.int32)
    targets = np.full((n, context_length), ignore_index, np.int32)
    segment_ids = np.zeros((n, context_length), np.int32)
    positions = np.zeros((n, context_length), np.int32)
    for r, row_docs in enumerate(rows):
        at = 0
        for s, doc in enumerate(row_docs):
            ln = len(doc)
            tokens[r, at:at + ln] = doc
            targets[r, at:at + ln - 1] = doc[1:]
            segment_ids[r, at:at + ln] = s
            positions[r, at:at + ln] = np.arange(ln)
            at += ln
        # the padded tail: its own segment id and fresh positions, so pad
        # rows attend only to each other and never to document tokens
        if at < context_length:
            segment_ids[r, at:] = len(row_docs)
            positions[r, at:] = np.arange(context_length - at)
    return {"tokens": tokens, "targets": targets,
            "segment_ids": segment_ids, "positions": positions}


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
