"""Fused (chunked-vocab) linear + softmax-cross-entropy for LM heads.

The memory problem this solves: a language-model loss computed the naive way
materializes the full logits tensor ``[B*T, V]`` in f32 — at batch 8,
ctx 2048, vocab 32k that is 2 GB of HBM (and 4 GB counting the softmax
gradient), dwarfing the activations of the transformer stack itself. The
reference never hits this because its LM uses a byte-level vocab of 256
(reference example-autoregressivelm model.scala:23-27); a production-vocab LM
on a 16 GB v5e chip does.

TPU-native design: the final projection ``x @ W^T`` and the cross-entropy are
fused into one ``lax.scan`` over row chunks with a ``jax.custom_vjp``:

- forward: per chunk, compute chunk logits on the MXU (f32 accumulation),
  reduce them immediately to per-row ``logsumexp`` and the target logit, and
  discard the logits. Only ``[N]``-sized residuals survive.
- backward: re-compute each chunk's logits (one extra matmul — the classic
  flash-attention trade of FLOPs for HBM), form the softmax gradient
  ``p - onehot(t)`` in registers, and contract it immediately into
  ``dx = g @ W`` and a running ``dW += g^T @ x`` carried in f32.

Peak live memory drops from ``O(N*V)`` to ``O(chunk*V + V*D)``.

This mirrors the role of the reference's fused loss backward helpers
(lamp-sten STen.scala:480-616 exposes fused ``*_backward`` kernels precisely
because loss gradients are hot); here the fusion also removes the dominant
HBM tensor rather than just a kernel launch.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_linear_cross_entropy", "fused_lm_loss"]


def _acc_dtype(*xs):
    dt = functools.reduce(jnp.promote_types, [x.dtype for x in xs])
    return jnp.promote_types(dt, jnp.float32)


def _pick_chunk(n: int, v: int) -> int:
    # target ~16M f32 logit elements per chunk (64 MB): large enough to keep
    # the MXU busy on the [chunk, D] x [D, V] matmul, small enough that the
    # chunk logits never dominate HBM
    target = max(1, (16 * 1024 * 1024) // max(v, 1))
    chunk = 1
    while chunk * 2 <= target:
        chunk *= 2
    return max(128, min(chunk, 4096))


def _chunked(x, targets, rowscale, chunk):
    n = x.shape[0]
    nc = -(-n // chunk)
    pad = nc * chunk - n
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        targets = jnp.pad(targets, (0, pad))
        rowscale = jnp.pad(rowscale, (0, pad))
    return (
        x.reshape(nc, chunk, x.shape[1]),
        targets.reshape(nc, chunk),
        rowscale.reshape(nc, chunk),
        pad,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_ce_rows(x, weight, targets, ignore_index, chunk):
    """Per-row ``lse - logit[target]`` (0 for ignored rows), no logits tensor."""
    loss, _ = _fwd_rows(x, weight, targets, ignore_index, chunk)
    return loss


def _fwd_rows(x, weight, targets, ignore_index, chunk):
    n, d = x.shape
    acc = _acc_dtype(x, weight)
    xs, ts, _, pad = _chunked(x, targets, jnp.zeros((n,), jnp.float32), chunk)

    def body(_, xt):
        xc, tc = xt
        logits = jax.lax.dot_general(
            xc, weight, (((1,), (1,)), ((), ())), preferred_element_type=acc
        )  # [chunk, V]
        m = jnp.max(logits, axis=1)
        lse = m + jnp.log(jnp.sum(jnp.exp(logits - m[:, None]), axis=1))
        tgt = jnp.take_along_axis(
            logits, jnp.clip(tc, 0, weight.shape[0] - 1)[:, None], axis=1
        )[:, 0]
        return None, (lse, tgt)

    _, (lse, tgt) = jax.lax.scan(body, None, (xs, ts))
    lse = lse.reshape(-1)[:n]
    tgt = tgt.reshape(-1)[:n]
    keep = targets != ignore_index
    loss = jnp.where(keep, lse - tgt, 0.0).astype(acc)
    return loss, (x, weight, targets, lse)


def _bwd_rows(ignore_index, chunk, res, g):
    x, weight, targets, lse = res
    n, d = x.shape
    v = weight.shape[0]
    acc = _acc_dtype(x, weight)
    # per-row upstream gradient; ignored rows contribute nothing
    rowscale = jnp.where(targets != ignore_index, g.astype(jnp.float32), 0.0)
    xs, ts, rs, pad = _chunked(x, targets, rowscale, chunk)
    nc = xs.shape[0]
    lse_s = jnp.pad(lse, (0, pad)).reshape(nc, chunk)

    # the softmax gradient is contracted on the MXU in the inputs' dtype
    # (f32 accumulation), matching what XLA does for the unfused formulation
    mm_dt = jnp.promote_types(x.dtype, weight.dtype)

    def body(dw, xt):
        xc, tc, rc, lc = xt
        logits = jax.lax.dot_general(
            xc, weight, (((1,), (1,)), ((), ())), preferred_element_type=acc
        )
        p = jnp.exp(logits.astype(jnp.float32) - lc[:, None])
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) == tc[:, None]
        )
        gch = (p - jnp.where(onehot, 1.0, 0.0)) * rc[:, None]  # [chunk, V]
        gmm = gch.astype(mm_dt)
        dxc = jax.lax.dot_general(
            gmm, weight, (((1,), (0,)), ((), ())), preferred_element_type=acc
        )
        dw = dw + jax.lax.dot_general(
            gmm, xc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dw, dxc

    dw0 = jnp.zeros((v, d), jnp.float32)
    dw, dxs = jax.lax.scan(body, dw0, (xs, ts, rs, lse_s))
    dx = dxs.reshape(-1, d)[:n].astype(x.dtype)
    dt = np.zeros(targets.shape, jax.dtypes.float0)
    return dx, dw.astype(weight.dtype), dt


_fused_ce_rows.defvjp(lambda x, w, t, ii, ch: _fwd_rows(x, w, t, ii, ch),
                      _bwd_rows)


def fused_linear_cross_entropy(x, weight, targets, *,
                               ignore_index: int = -100,
                               reduction: str = "mean",
                               row_chunk: Optional[int] = None):
    """Cross-entropy of ``x @ weight.T`` against ``targets`` without ever
    materializing the ``[N, V]`` logits.

    Args:
      x: ``[N, D]`` final hidden states (rows = tokens).
      weight: ``[V, D]`` output projection — the tied embedding matrix
        (reference lm.scala:251) or an untied lm_head weight.
      targets: ``[N]`` int class ids; rows equal to ``ignore_index`` are
        excluded from the loss and the mean's denominator.
      reduction: ``"mean"`` (over non-ignored rows), ``"sum"`` or ``"none"``.
      row_chunk: rows per scan step (auto-tuned to ~64 MB of chunk logits).

    Numerics match :func:`lamp_tpu.nn.losses.cross_entropy_loss` on the same
    f32-accumulated logits.
    """
    x = jnp.asarray(x)
    weight = jnp.asarray(weight)
    targets = jnp.asarray(targets, jnp.int32)
    if x.ndim != 2:
        raise ValueError(f"x must be [N, D], got {x.shape}")
    chunk = row_chunk or _pick_chunk(x.shape[0], weight.shape[0])
    chunk = min(chunk, max(128, x.shape[0]))
    losses = _fused_ce_rows(x, weight, targets, ignore_index, chunk)
    if reduction == "none":
        return losses
    total = jnp.sum(losses)
    if reduction == "sum":
        return total
    if reduction == "mean":
        cnt = jnp.sum((targets != ignore_index).astype(losses.dtype))
        return total / jnp.maximum(cnt, 1.0)
    raise ValueError(f"unknown reduction {reduction!r}")


def fused_lm_loss(hidden, weight, targets, *, ignore_index: int = -100,
                  row_chunk: Optional[int] = None):
    """LM convenience wrapper: ``hidden`` ``[B, T, D]``, ``targets``
    ``[B, T]`` → mean CE over non-ignored tokens (the fused counterpart of
    :func:`lamp_tpu.nn.lm_loss`, which takes materialized logits)."""
    b, t, d = hidden.shape
    return fused_linear_cross_entropy(
        hidden.reshape(b * t, d), weight, targets.reshape(b * t),
        ignore_index=ignore_index, row_chunk=row_chunk,
    )
