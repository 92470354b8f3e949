"""Preference optimization (DPO/IPO) and knowledge distillation losses.

Post-training utilities over the ModernLM family (anything exposing
``hidden(tokens, ...) -> [B, T, D]`` and ``output_weight [V, D]``). Both
losses route their vocab-sized contractions through the chunked fused
linear+cross-entropy machinery (:mod:`lamp_tpu.ops.fused_ce`) or a chunked
row scan, so the ``[B, T, V]`` logits of the policy/teacher/reference are
NEVER materialized — on TPU that keeps HBM flat at large vocab, the same
reason :meth:`ModernLM.loss` is fused.

The reference framework has no preference-tuning stage (SURVEY.md §2 ends
at supervised training); this is a beyond-parity addition in the spirit of
its SupervisedModel loss-calculation variants (lamp/nn/SupervisedModel).

Factories return ``loss_fn(model, batch, key, train) -> (loss, n,
new_model)`` — the exact contract of :func:`make_train_step` /
:func:`epochs`, so DPO slots into the existing loop, schedules, EMA, SWA
and checkpointing unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.fused_ce import fused_linear_cross_entropy

__all__ = [
    "sequence_logprobs",
    "dpo_loss",
    "make_dpo_loss_fn",
    "make_distill_loss_fn",
]


def sequence_logprobs(model, tokens, targets, *, ignore_index: int = -100,
                      key=None, train: bool = False,
                      row_chunk: Optional[int] = None):
    """Per-sequence sum of target-token logprobs, ``[B]``.

    ``tokens``/``targets`` are ``[B, T]``; rows whose target equals
    ``ignore_index`` (prompt + padding positions) contribute 0. Fused: the
    per-row CE comes from :func:`fused_linear_cross_entropy` with
    ``reduction="none"``, so only chunk-sized logit slabs ever exist.
    """
    x = model.hidden(tokens, key=key, train=train)
    b, t, d = x.shape
    nll = fused_linear_cross_entropy(
        x.reshape(b * t, d), model.output_weight,
        jnp.asarray(targets, jnp.int32).reshape(b * t),
        ignore_index=ignore_index, reduction="none", row_chunk=row_chunk,
    )
    return -nll.reshape(b, t).sum(axis=1)


def dpo_loss(policy, reference, batch, *, beta: float = 0.1,
             label_smoothing: float = 0.0, loss_type: str = "sigmoid",
             ignore_index: int = -100, key=None, train: bool = False,
             row_chunk: Optional[int] = None):
    """Direct Preference Optimization loss (Rafailov et al. 2023).

    ``batch = (chosen_tokens, chosen_targets, rejected_tokens,
    rejected_targets)``, each ``[B, T]`` with prompt/pad targets set to
    ``ignore_index`` (only response tokens shape the preference).

    loss_type:
      - ``"sigmoid"``: -log σ(β·margin) with optional conservative-DPO
        label smoothing (Mitchell 2023),
      - ``"ipo"``: (margin - 1/(2β))² (Azar et al. 2023),
      - ``"hinge"``: max(0, 1 - β·margin) (SLiC-HF).

    Returns ``(loss, aux)`` where aux carries the implicit rewards
    ``chosen_rewards``/``rejected_rewards`` (β·(policy - reference) seq
    logprob) and ``accuracy`` (fraction with positive margin) — the
    standard DPO training diagnostics.
    """
    ct, cy, rt, ry = batch
    kc = kr = None
    if key is not None:
        kc, kr = jax.random.split(key)
    lp_c = sequence_logprobs(policy, ct, cy, ignore_index=ignore_index,
                             key=kc, train=train, row_chunk=row_chunk)
    lp_r = sequence_logprobs(policy, rt, ry, ignore_index=ignore_index,
                             key=kr, train=train, row_chunk=row_chunk)
    ref_c = jax.lax.stop_gradient(sequence_logprobs(
        reference, ct, cy, ignore_index=ignore_index, row_chunk=row_chunk))
    ref_r = jax.lax.stop_gradient(sequence_logprobs(
        reference, rt, ry, ignore_index=ignore_index, row_chunk=row_chunk))

    margin = (lp_c - ref_c) - (lp_r - ref_r)
    if loss_type == "sigmoid":
        ls = label_smoothing
        per = (-(1.0 - ls) * jax.nn.log_sigmoid(beta * margin)
               - ls * jax.nn.log_sigmoid(-beta * margin))
    elif loss_type == "ipo":
        per = (margin - 1.0 / (2.0 * beta)) ** 2
    elif loss_type == "hinge":
        per = jnp.maximum(0.0, 1.0 - beta * margin)
    else:
        raise ValueError(f"unknown loss_type {loss_type!r}")
    aux = {
        "chosen_rewards": beta * (lp_c - ref_c),
        "rejected_rewards": beta * (lp_r - ref_r),
        "accuracy": jnp.mean((margin > 0).astype(jnp.float32)),
    }
    return per.mean(), aux


def make_dpo_loss_fn(reference_model, *, beta: float = 0.1,
                     label_smoothing: float = 0.0,
                     loss_type: str = "sigmoid",
                     ignore_index: int = -100,
                     row_chunk: Optional[int] = None):
    """``loss_fn`` for :func:`make_train_step` / :func:`epochs` that trains
    the policy against a FROZEN reference model.

    The reference's params ride as a closure constant — under jit they are
    device-resident weights, not retraced inputs. Batches are
    ``(chosen_tokens, chosen_targets, rejected_tokens, rejected_targets)``.
    """

    def loss_fn(model, batch, key, train_mode):
        loss, _ = dpo_loss(model, reference_model, batch, beta=beta,
                           label_smoothing=label_smoothing,
                           loss_type=loss_type, ignore_index=ignore_index,
                           key=key, train=train_mode, row_chunk=row_chunk)
        n = jnp.asarray(batch[0].shape[0], jnp.float32)
        return loss, n, model

    return loss_fn


def make_distill_loss_fn(teacher_model, *, temperature: float = 2.0,
                         alpha: float = 0.5, ignore_index: int = -100,
                         row_chunk: int = 1024):
    """Knowledge distillation ``loss_fn``: ``alpha`` · KL(teacher‖student,
    temperature-scaled) + ``(1-alpha)`` · hard-target CE.

    The KL is computed in a ``lax.scan`` over row chunks — student and
    teacher logits exist only as ``[row_chunk, V]`` slabs (teacher under
    stop_gradient). Batches are ``(tokens, targets)`` as in ordinary LM
    training; ``ignore_index`` rows are excluded from both terms.
    """

    def loss_fn(model, batch, key, train_mode):
        tokens, targets = batch
        hs = model.hidden(tokens, key=key, train=train_mode)
        ht = jax.lax.stop_gradient(teacher_model.hidden(tokens))
        b, t, d = hs.shape
        hs2 = hs.reshape(b * t, d)
        ht2 = ht.reshape(b * t, ht.shape[-1])
        tg = jnp.asarray(targets, jnp.int32).reshape(b * t)
        ws = model.output_weight
        wt = teacher_model.output_weight
        n_rows = hs2.shape[0]
        chunk = min(row_chunk, n_rows)
        pad = (-n_rows) % chunk
        if pad:
            hs2 = jnp.pad(hs2, ((0, pad), (0, 0)))
            ht2 = jnp.pad(ht2, ((0, pad), (0, 0)))
            tg = jnp.pad(tg, (0, pad), constant_values=ignore_index)
        hs3 = hs2.reshape(-1, chunk, d)
        ht3 = ht2.reshape(-1, chunk, ht2.shape[-1])
        tg3 = tg.reshape(-1, chunk)
        tau = temperature
        # f32 accumulation; f64 stays f64 (CLAUDE.md matmul convention —
        # the CPU gradchecks run in float64)
        acc_t = jnp.promote_types(hs.dtype, jnp.float32)

        def body(acc, xs):
            h_s, h_t, y = xs
            acc_kl, acc_n = acc
            zs = jnp.dot(h_s, ws.T, preferred_element_type=acc_t) / tau
            zt = jnp.dot(h_t, wt.T, preferred_element_type=acc_t) / tau
            log_ps = jax.nn.log_softmax(zs.astype(acc_t), axis=-1)
            log_pt = jax.nn.log_softmax(zt.astype(acc_t), axis=-1)
            kl = jnp.sum(jnp.exp(log_pt) * (log_pt - log_ps), axis=-1)
            live = (y != ignore_index).astype(acc_t)
            return (acc_kl + jnp.sum(kl * live), acc_n + jnp.sum(live)), None

        (kl_sum, n_live), _ = jax.lax.scan(
            body, (jnp.zeros((), acc_t), jnp.zeros((), acc_t)),
            (hs3, ht3, tg3),
        )
        kl = tau * tau * kl_sum / jnp.maximum(n_live, 1.0)
        ce = fused_linear_cross_entropy(
            hs.reshape(b * t, d), ws, jnp.asarray(targets, jnp.int32).reshape(b * t),
            ignore_index=ignore_index,
        )
        loss = alpha * kl + (1.0 - alpha) * ce
        n = jnp.asarray(tokens.shape[0], jnp.float32)
        return loss, n, model

    return loss_fn
