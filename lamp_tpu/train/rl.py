"""On-policy RL fine-tuning: GRPO / PPO-clip policy-gradient losses and a
serving-engine rollout helper.

Completes the post-training stack next to the offline preference losses
(:mod:`lamp_tpu.train.preference`): DPO learns from a fixed preference
dataset; GRPO (Shao et al. 2024, DeepSeekMath) learns on-policy from
rewards on the model's OWN samples — the loop behind RLHF-style tuning
without a value network (advantages are group-relative: each prompt is
sampled ``group_size`` times and rewards are normalized within the group).

The reference framework has no RL stage at all (SURVEY.md §2 ends at
supervised training; its closest hook is the pluggable loss calculation in
lamp/nn/SupervisedModel.scala:84); this is a beyond-parity addition built
from parts the framework already has:

- rollouts come from :class:`~lamp_tpu.models.serving.ServingEngine`
  parallel sampling (``submit(n=group_size, logprobs=True)`` — the prompt's
  KV pages are shared across the group by the prefix cache), and
- the policy's per-token logprobs come through the chunked fused
  linear+CE machinery (:mod:`lamp_tpu.ops.fused_ce`), so ``[B, T, V]``
  logits are never materialized — same reason :meth:`ModernLM.loss` and
  the DPO path are fused.

Everything model-facing only needs ``hidden(tokens, ...) -> [B, T, D]``
and ``output_weight [V, D]`` (the ModernLM/LanguageModelModule contract).

``make_grpo_loss_fn`` returns the ``loss_fn(model, batch, key, train) ->
(loss, n, new_model)`` contract of :func:`make_train_step` / :func:`epochs`,
so GRPO slots into the existing jitted step, grad accumulation, schedules,
EMA and checkpointing unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fused_ce import fused_linear_cross_entropy

__all__ = [
    "token_logprobs",
    "grpo_advantages",
    "grpo_loss",
    "make_grpo_loss_fn",
    "grpo_rollout",
]


def token_logprobs(model, tokens, targets, *, ignore_index: int = -100,
                   key=None, train: bool = False,
                   row_chunk: Optional[int] = None):
    """Per-position target-token logprobs, ``[B, T]``.

    ``tokens``/``targets`` are ``[B, T]``; positions whose target equals
    ``ignore_index`` (prompt + padding) return 0. This is the per-token
    refinement of :func:`~lamp_tpu.train.preference.sequence_logprobs`
    (which sums over T) — PPO-style ratios need the token granularity.

    Models exposing the fused contract (``hidden``/``output_weight`` —
    ModernLM) go through the chunked fused CE, so ``[B*T, V]`` logits are
    never materialized; any other LM falls back to ``forward`` +
    log_softmax gather (fine at small vocab).
    """
    tg = jnp.asarray(targets, jnp.int32)
    if hasattr(model, "hidden"):
        x = model.hidden(tokens, key=key, train=train)
        b, t, d = x.shape
        nll = fused_linear_cross_entropy(
            x.reshape(b * t, d), model.output_weight, tg.reshape(b * t),
            ignore_index=ignore_index, reduction="none", row_chunk=row_chunk,
        )
        return -nll.reshape(b, t)
    logits, _ = model.forward(tokens, key=key, train=train)
    logp = jax.nn.log_softmax(
        logits.astype(jnp.promote_types(logits.dtype, jnp.float32)), axis=-1)
    picked = jnp.take_along_axis(
        logp, jnp.maximum(tg, 0)[..., None], axis=-1)[..., 0]
    return jnp.where(tg != ignore_index, picked, 0.0)


def grpo_advantages(rewards, group_size: int, *, eps: float = 1e-4,
                    scale: str = "std"):
    """Group-relative advantages from raw rewards.

    ``rewards`` is ``[B]`` with ``B = n_prompts * group_size`` and the
    ``group_size`` samples of each prompt CONSECUTIVE (the layout
    :func:`grpo_rollout` produces). Per group: ``A = r - mean(r)``, divided
    by ``std(r) + eps`` when ``scale="std"`` (GRPO) or left unscaled with
    ``scale="none"`` (Dr.GRPO, Liu et al. 2025 — removes the
    difficulty-dependent rescaling bias).
    """
    r = jnp.asarray(rewards, jnp.float32)
    if r.shape[0] % group_size:
        raise ValueError(
            f"rewards length {r.shape[0]} not divisible by group_size "
            f"{group_size}")
    g = r.reshape(-1, group_size)
    a = g - g.mean(axis=1, keepdims=True)
    if scale == "std":
        a = a / (g.std(axis=1, keepdims=True) + eps)
    elif scale != "none":
        raise ValueError(f"unknown scale {scale!r}")
    return a.reshape(-1)


def grpo_loss(policy_lp, old_lp, advantages, mask, *, ref_lp=None,
              clip_eps: float = 0.2, clip_eps_high: Optional[float] = None,
              kl_coef: float = 0.0, agg: str = "token"):
    """Clipped policy-gradient (PPO/GRPO) objective on token logprobs.

    Args:
      policy_lp: ``[B, T]`` current-policy logprobs of the sampled tokens
        (differentiable — from :func:`token_logprobs`).
      old_lp: ``[B, T]`` behaviour-policy logprobs of the same tokens
        (fixed; from the sampler or a pre-update recompute).
      advantages: ``[B]`` per-sequence advantages, broadcast over tokens
        (GRPO has no per-token critic).
      mask: ``[B, T]`` 1.0 on response tokens, 0.0 on prompt/padding.
      ref_lp: optional ``[B, T]`` frozen-reference logprobs; adds
        ``kl_coef`` times the k3 KL estimator ``exp(ref-pol) - (ref-pol)
        - 1`` (Schulman 2020 — unbiased, always >= 0), masked like the
        policy term. GRPO's KL-in-the-loss form, not a reward penalty.
      clip_eps / clip_eps_high: PPO ratio clip ``[1-eps, 1+eps_high]``;
        ``clip_eps_high`` defaults to ``clip_eps`` (set higher for DAPO's
        clip-higher, which keeps low-probability exploration tokens alive).
      agg: ``"token"`` — sum over all tokens / total mask (every token
        weighs the same, DAPO's token-mean); ``"sequence"`` — per-sequence
        mean then batch mean (original GRPO's length normalization).

    Returns ``(loss, aux)``; aux carries ``ratio_mean``, ``clip_frac``,
    ``approx_kl`` (vs old policy) and ``kl_ref`` (vs reference, 0 without
    one) — the standard PPO health diagnostics.
    """
    eps_hi = clip_eps if clip_eps_high is None else clip_eps_high
    m = jnp.asarray(mask, policy_lp.dtype)
    adv = jnp.asarray(advantages, policy_lp.dtype)[:, None]
    log_ratio = (policy_lp - jax.lax.stop_gradient(old_lp)) * m
    ratio = jnp.exp(log_ratio)
    unclipped = ratio * adv
    clipped = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + eps_hi) * adv
    per_tok = -jnp.minimum(unclipped, clipped) * m

    kl_ref = jnp.zeros((), policy_lp.dtype)
    if ref_lp is not None:
        d = (jax.lax.stop_gradient(ref_lp) - policy_lp) * m
        k3 = (jnp.exp(d) - d - 1.0) * m
        per_tok = per_tok + kl_coef * k3

    n_tok = jnp.maximum(m.sum(), 1.0)
    if agg == "token":
        loss = per_tok.sum() / n_tok
    elif agg == "sequence":
        per_seq = per_tok.sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
        loss = per_seq.mean()
    else:
        raise ValueError(f"unknown agg {agg!r}")

    if ref_lp is not None:
        kl_ref = (k3.sum() / n_tok).astype(policy_lp.dtype)
    aux = {
        "ratio_mean": (ratio * m).sum() / n_tok,
        "clip_frac": (((ratio < 1.0 - clip_eps) | (ratio > 1.0 + eps_hi))
                      & (m > 0)).sum() / n_tok,
        # k1 estimator of KL(pi || old) on the sampled tokens
        "approx_kl": -(log_ratio.sum() / n_tok),
        "kl_ref": kl_ref,
    }
    return loss, aux


def make_grpo_loss_fn(reference_model=None, *, clip_eps: float = 0.2,
                      clip_eps_high: Optional[float] = None,
                      kl_coef: float = 0.0, agg: str = "token",
                      ignore_index: int = -100,
                      row_chunk: Optional[int] = None):
    """``loss_fn`` for :func:`make_train_step` / :func:`epochs` computing
    the GRPO objective against (optionally) a FROZEN reference model.

    Batches are ``(tokens, targets, old_logps, advantages)``:

    - ``tokens``/``targets`` ``[B, T]`` with ``ignore_index`` targets on
      prompt and padding positions (same protocol as the DPO batches),
    - ``old_logps`` ``[B, T]`` behaviour logprobs (0 where ignored),
    - ``advantages`` ``[B]``.

    :func:`grpo_rollout` produces exactly this tuple. The reference's
    params ride as a closure constant — device-resident under jit, not
    retraced. Multiple optimizer epochs over one rollout batch are the
    standard PPO regime; the clip keeps the update trust-region bounded.
    """

    def loss_fn(model, batch, key, train_mode):
        tokens, targets, old_lp, adv = batch
        mask = (jnp.asarray(targets) != ignore_index)
        pol_lp = token_logprobs(model, tokens, targets,
                                ignore_index=ignore_index, key=key,
                                train=train_mode, row_chunk=row_chunk)
        ref_lp = None
        if reference_model is not None:
            ref_lp = jax.lax.stop_gradient(token_logprobs(
                reference_model, tokens, targets,
                ignore_index=ignore_index, row_chunk=row_chunk))
        loss, _ = grpo_loss(pol_lp, jnp.asarray(old_lp), adv,
                            mask.astype(pol_lp.dtype), ref_lp=ref_lp,
                            clip_eps=clip_eps, clip_eps_high=clip_eps_high,
                            kl_coef=kl_coef, agg=agg)
        n = jnp.asarray(tokens.shape[0], jnp.float32)
        return loss, n, model

    return loss_fn


def grpo_rollout(engine, prompts: Sequence[Sequence[int]],
                 reward_fn: Callable, *, group_size: int,
                 sampling=None, max_len: Optional[int] = None,
                 ignore_index: int = -100, pad_token: int = 0,
                 advantage_scale: str = "std"):
    """Sample ``group_size`` completions per prompt through a
    :class:`~lamp_tpu.models.serving.ServingEngine` and assemble one GRPO
    training batch.

    ``reward_fn(prompt_tokens, completion_tokens) -> float`` scores each
    completion (rule-based verifier, reward model, etc.). Sampling params
    default to temperature 1.0; ``logprobs`` is forced on — the sampler's
    chosen-token logprobs are the behaviour ``old_logps`` (the engine
    records them under the decode dtype; for strict PPO ratios at bf16
    serving vs f32 training, recompute old_logps with
    :func:`token_logprobs` on the frozen pre-update policy instead).

    Returns ``(batch, rewards)`` where ``batch = (tokens, targets,
    old_logps, advantages)`` is ready for :func:`make_grpo_loss_fn`'s
    loss_fn (rows grouped prompt-major, matching
    :func:`grpo_advantages`) and ``rewards`` is the raw ``[B]`` array.
    """
    from ..models.sampling import SamplingParams

    if sampling is None:
        sampling = SamplingParams(temperature=1.0)
    if sampling.temperature == 0.0:
        raise ValueError("GRPO rollouts need temperature > 0")
    sampling = dataclasses.replace(sampling, logprobs=True)

    rids = [engine.submit(list(p), sampling, n=group_size) for p in prompts]
    engine.run()

    rows = []   # (prompt, completion, logprobs)
    for p, rid in zip(prompts, rids):
        comps = engine.results[rid]
        lps = engine.result_logprobs[rid]
        if group_size == 1:   # engine returns plain lists for n == 1
            comps, lps = [comps], [lps]
        for c, lp in zip(comps, lps):
            rows.append((list(p), list(c), list(lp)))

    rewards = np.asarray(
        [float(reward_fn(p, c)) for p, c, _ in rows], np.float32)

    t_max = max(len(p) + len(c) for p, c, _ in rows)
    if max_len is not None:
        t_max = min(t_max, int(max_len))
    b = len(rows)
    tokens = np.full((b, t_max), pad_token, np.int32)
    targets = np.full((b, t_max), ignore_index, np.int32)
    old_lp = np.zeros((b, t_max), np.float32)
    for i, (p, c, lp) in enumerate(rows):
        seq = (p + c)[:t_max]
        tokens[i, :len(seq)] = seq
        # position t predicts token t+1; response region starts at the
        # last prompt position (which predicts the first completion token)
        for j, (tok, tok_lp) in enumerate(zip(c, lp)):
            t = len(p) - 1 + j
            if t >= t_max:
                break
            targets[i, t] = tok
            old_lp[i, t] = tok_lp

    adv = grpo_advantages(rewards, group_size, scale=advantage_scale)
    batch = (jnp.asarray(tokens), jnp.asarray(targets),
             jnp.asarray(old_lp), jnp.asarray(adv))
    return batch, rewards
