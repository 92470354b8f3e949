"""Loss functions.

Capability parity with the reference's ``LossFunction`` set
(reference: lamp-core/src/main/scala/lamp/nn/LossFunctions.scala:13-109 and
the autograd loss ops ops.scala:1176-1368): NLL, MSE, SmoothL1,
BCE-with-logits, SequenceNLL, Identity. Each returns ``(loss, n_examples)``
like the reference (used by gradient accumulation / distributed weighting).

Reductions follow the reference's ``Reduction`` enum (ops.scala:1163):
"mean", "sum", "none".
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "nll_loss",
    "cross_entropy_loss",
    "mse_loss",
    "smooth_l1_loss",
    "bce_with_logits_loss",
    "sequence_nll",
    "identity_loss",
    "LossFn",
]


def _reduce(x, reduction: str):
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    return x


def nll_loss(log_probs, target, *, num_classes: Optional[int] = None,
             reduction: str = "mean", ignore_index: int = -100):
    """Negative log likelihood over log-probabilities (last axis = classes).

    Reference: NllLoss op ops.scala:1238.
    """
    target = target.astype(jnp.int32)
    valid = target != ignore_index
    safe_target = jnp.where(valid, target, 0)
    picked = jnp.take_along_axis(
        log_probs, safe_target[..., None], axis=-1
    ).squeeze(-1)
    losses = jnp.where(valid, -picked, 0.0)
    if reduction == "mean":
        n = jnp.maximum(jnp.sum(valid), 1)
        return jnp.sum(losses) / n
    return _reduce(losses, reduction)


def cross_entropy_loss(logits, target, *, reduction: str = "mean",
                       ignore_index: int = -100, label_smoothing: float = 0.0):
    """Softmax cross entropy from raw logits (fused log-softmax; XLA-friendly)."""
    logits = logits.astype(jnp.promote_types(logits.dtype, jnp.float32))
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    if label_smoothing > 0.0:
        n_classes = logits.shape[-1]
        target_i = target.astype(jnp.int32)
        valid = target_i != ignore_index
        safe = jnp.where(valid, target_i, 0)
        picked = jnp.take_along_axis(log_probs, safe[..., None], axis=-1).squeeze(-1)
        smooth = jnp.mean(log_probs, axis=-1)
        losses = -(1.0 - label_smoothing) * picked - label_smoothing * smooth
        losses = jnp.where(valid, losses, 0.0)
        if reduction == "mean":
            return jnp.sum(losses) / jnp.maximum(jnp.sum(valid), 1)
        return _reduce(losses, reduction)
    return nll_loss(log_probs, target, reduction=reduction, ignore_index=ignore_index)


def mse_loss(pred, target, *, reduction: str = "mean"):
    """Reference: MseLoss op ops.scala:1176."""
    acc = jnp.promote_types(pred.dtype, jnp.float32)
    return _reduce(jnp.square(pred.astype(acc) - target.astype(acc)), reduction)


def smooth_l1_loss(pred, target, *, beta: float = 1.0, reduction: str = "mean"):
    """Reference: SmoothL1Loss op ops.scala:1207."""
    acc = jnp.promote_types(pred.dtype, jnp.float32)
    d = jnp.abs(pred.astype(acc) - target.astype(acc))
    losses = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return _reduce(losses, reduction)


def bce_with_logits_loss(logits, target, *, pos_weight=None, reduction: str = "mean"):
    """Numerically-stable binary cross entropy from logits.

    Reference: BinaryCrossEntropyWithLogitsLoss op ops.scala:1303.
    """
    acc = jnp.promote_types(logits.dtype, jnp.float32)
    x = logits.astype(acc)
    t = target.astype(acc)
    # log(1 + exp(-|x|)) formulation
    neg_abs = -jnp.abs(x)
    log1p = jnp.log1p(jnp.exp(neg_abs))
    if pos_weight is not None:
        log_sigmoid = x - jnp.maximum(x, 0.0) - log1p
        log_one_minus_sigmoid = -jnp.maximum(x, 0.0) - log1p
        losses = -(pos_weight * t * log_sigmoid + (1 - t) * log_one_minus_sigmoid)
    else:
        losses = jnp.maximum(x, 0.0) - x * t + log1p
    return _reduce(losses, reduction)


def sequence_nll(logits, target, *, reduction: str = "mean", ignore_index: int = -100):
    """NLL over (batch, time, classes) logits — the reference's SequenceNLL
    (LossFunctions.scala:87) flattens time into batch."""
    b, t, c = logits.shape
    return cross_entropy_loss(
        logits.reshape(b * t, c), target.reshape(b * t),
        reduction=reduction, ignore_index=ignore_index,
    )


def identity_loss(pred, target=None, **_):
    """Reference LossFunctions.Identity — the model output *is* the loss."""
    return jnp.sum(pred)


class LossFn:
    """Named wrapper binding a loss callable with its config, mirroring the
    reference's LossFunction values for checkpoint descriptors."""

    def __init__(self, fn, name: str, **kwargs):
        self.fn = fn
        self.name = name
        self.kwargs = kwargs

    def __call__(self, pred, target):
        return self.fn(pred, target, **self.kwargs)
