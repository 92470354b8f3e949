"""GRPO / PPO-clip on-policy RL: loss math, advantages, rollout, learning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lamp_tpu import nn, optim, train
from lamp_tpu.train.rl import (
    grpo_advantages,
    grpo_loss,
    grpo_rollout,
    make_grpo_loss_fn,
    token_logprobs,
)


def _lm(seed=0, vocab=17, ctx=16):
    return nn.ModernLM.init(
        vocab_size=vocab, context_length=ctx, num_blocks=2, embed_dim=32,
        num_heads=4, key=jax.random.PRNGKey(seed),
    )


def test_token_logprobs_oracle():
    model = _lm()
    rng = np.random.RandomState(0)
    toks = rng.randint(0, 17, (3, 10)).astype(np.int32)
    tgts = np.roll(toks, -1, axis=1)
    tgts[:, :2] = -100
    tgts[:, -1] = -100
    got = token_logprobs(model, jnp.asarray(toks), jnp.asarray(tgts))
    logits, _ = model.forward(jnp.asarray(toks))
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(
        logp, jnp.maximum(jnp.asarray(tgts), 0)[..., None], axis=-1
    )[..., 0]
    want = jnp.where(jnp.asarray(tgts) != -100, picked, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
    # masked positions contribute exactly zero
    assert float(jnp.abs(got[:, :2]).max()) == 0.0


def test_grpo_advantages_hand():
    r = np.array([1.0, 0.0, 1.0, 3.0], np.float32)  # 2 groups of 2
    a = np.asarray(grpo_advantages(r, 2, scale="none"))
    np.testing.assert_allclose(a, [0.5, -0.5, -1.0, 1.0], atol=1e-6)
    a_std = np.asarray(grpo_advantages(r, 2, scale="std", eps=0.0))
    np.testing.assert_allclose(a_std, [1.0, -1.0, -1.0, 1.0], atol=1e-5)
    # degenerate group (all equal): zero advantage, no blowup with eps
    z = np.asarray(grpo_advantages(np.ones(4, np.float32), 4))
    np.testing.assert_allclose(z, 0.0, atol=1e-6)
    with pytest.raises(ValueError):
        grpo_advantages(r, 3)


def test_grpo_loss_clip_hand_computed():
    """Single-token sequences with known ratios exercise both clip sides."""
    old = jnp.zeros((4, 1), jnp.float32)
    # ratios: 2.0 (>1+eps), 0.5 (<1-eps), 1.1 (inside), 1.0
    pol = jnp.log(jnp.asarray([[2.0], [0.5], [1.1], [1.0]], jnp.float32))
    mask = jnp.ones((4, 1), jnp.float32)

    # positive advantage: min(r*A, clip(r)*A) -> clip caps at 1.2
    loss_pos, aux = grpo_loss(pol, old, jnp.ones((4,)), mask, clip_eps=0.2)
    want = -np.mean([min(2.0, 1.2), min(0.5, 0.8), 1.1, 1.0])
    np.testing.assert_allclose(float(loss_pos), want, atol=1e-6)
    np.testing.assert_allclose(float(aux["clip_frac"]), 0.5, atol=1e-6)

    # negative advantage flips which side binds
    loss_neg, _ = grpo_loss(pol, old, -jnp.ones((4,)), mask, clip_eps=0.2)
    want = -np.mean([-max(2.0, 1.2), -max(0.5, 0.8), -1.1, -1.0])
    np.testing.assert_allclose(float(loss_neg), want, atol=1e-6)

    # asymmetric clip-higher (DAPO): upper bound moves to 1.5
    loss_hi, _ = grpo_loss(pol, old, jnp.ones((4,)), mask, clip_eps=0.2,
                           clip_eps_high=0.5)
    want = -np.mean([min(2.0, 1.5), min(0.5, 0.8), 1.1, 1.0])
    np.testing.assert_allclose(float(loss_hi), want, atol=1e-6)


def test_grpo_loss_kl_and_agg():
    pol = jnp.log(jnp.asarray([[0.5, 0.25], [0.5, 0.5]], jnp.float32))
    old = jnp.log(jnp.asarray([[0.5, 0.5], [0.5, 0.5]], jnp.float32))
    ref = jnp.log(jnp.asarray([[0.25, 0.25], [0.5, 0.5]], jnp.float32))
    mask = jnp.asarray([[1.0, 1.0], [1.0, 0.0]], jnp.float32)
    adv = jnp.zeros((2,))  # isolate the KL term

    loss, aux = grpo_loss(pol, old, adv, mask, ref_lp=ref, kl_coef=1.0)
    # k3 per live token: exp(d) - d - 1 with d = ref - pol
    d = np.log([[0.5, 1.0], [1.0, 1.0]])
    k3 = (np.exp(d) - d - 1.0) * np.asarray(mask)
    np.testing.assert_allclose(float(loss), k3.sum() / 3.0, atol=1e-6)
    np.testing.assert_allclose(float(aux["kl_ref"]), k3.sum() / 3.0,
                               atol=1e-6)
    assert float(aux["kl_ref"]) > 0.0

    # sequence aggregation divides per-row then averages rows
    loss_seq, _ = grpo_loss(pol, old, adv, mask, ref_lp=ref, kl_coef=1.0,
                            agg="sequence")
    want = np.mean([k3[0].sum() / 2.0, k3[1].sum() / 1.0])
    np.testing.assert_allclose(float(loss_seq), want, atol=1e-6)


def _sample_completions(model, prompts_np, gen_len, rng):
    """Autoregressive temperature-1 sampling via the plain forward (host
    categorical draw); returns tokens [B, P+L], per-token logprobs [B, L]."""
    b, p = prompts_np.shape
    toks = np.zeros((b, p + gen_len), np.int32)
    toks[:, :p] = prompts_np
    lps = np.zeros((b, gen_len), np.float32)
    fwd = jax.jit(lambda m, t: m.forward(t)[0])
    for j in range(gen_len):
        logits = np.asarray(fwd(model, jnp.asarray(toks)),
                            np.float32)[:, p + j - 1, :]
        logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True))
                               .sum(-1, keepdims=True)) \
            - logits.max(-1, keepdims=True)
        probs = np.exp(logp)
        probs /= probs.sum(-1, keepdims=True)
        for i in range(b):
            c = rng.choice(probs.shape[1], p=probs[i])
            toks[i, p + j] = c
            lps[i, j] = logp[i, c]
    return toks, lps


def test_grpo_learns_rewarded_token():
    """On-policy GRPO raises the sampling probability of the rewarded
    token: reward = fraction of generated tokens equal to id 7."""
    vocab, gen_len, group = 17, 5, 8
    model = _lm(seed=3, vocab=vocab)
    prompts = np.asarray([[1, 2, 3], [4, 5, 6]], np.int32)
    b = prompts.shape[0] * group
    p = prompts.shape[1]
    opt = optim.AdamW(2e-2)
    step = jax.jit(train.make_train_step(opt, make_grpo_loss_fn()),
                   donate_argnums=(0,))
    state = train.TrainState.init(model, opt)
    rng = np.random.RandomState(0)

    def rollout(model):
        rep = np.repeat(prompts, group, axis=0)
        toks, lps = _sample_completions(model, rep, gen_len, rng)
        rewards = (toks[:, p:] == 7).mean(axis=1).astype(np.float32)
        targets = np.full(toks.shape, -100, np.int32)
        old = np.zeros(toks.shape, np.float32)
        targets[:, p - 1:p - 1 + gen_len] = toks[:, p:]
        old[:, p - 1:p - 1 + gen_len] = lps
        return (jnp.asarray(toks), jnp.asarray(targets), jnp.asarray(old),
                grpo_advantages(rewards, group)), rewards

    first = None
    rkey = jax.random.PRNGKey(0)
    for it in range(12):
        batch, rewards = rollout(state.model)
        if first is None:
            first = rewards.mean()
        state, _ = step(state, batch, rkey)
    batch, rewards = rollout(state.model)
    assert rewards.mean() > max(3 * first, 0.35), (first, rewards.mean())


def test_grpo_rollout_via_serving_engine():
    """The documented rollout path: ServingEngine parallel sampling with
    shared prompt pages feeds a well-formed GRPO batch."""
    from lamp_tpu.models.sampling import SamplingParams
    from lamp_tpu.models.serving import BatchServer, ServingEngine

    model = nn.LanguageModelModule.init(
        vocab_size=23, context_length=32, num_blocks=2, embed_dim=32,
        attention_heads=4, key=jax.random.PRNGKey(0),
    )
    server = BatchServer(model, page_size=8, total_pages=32)
    engine = ServingEngine(server, decode_steps=4)

    prompts = [[1, 5, 2], [9, 8, 7, 6]]
    group = 2
    batch, rewards = grpo_rollout(
        engine, prompts, lambda p, c: float(sum(c)),
        group_size=group,
        sampling=SamplingParams(temperature=1.0, max_tokens=5),
    )
    toks, tgts, old, adv = batch
    assert toks.shape[0] == len(prompts) * group
    assert toks.shape == tgts.shape == old.shape
    assert adv.shape == (toks.shape[0],)
    # per-group advantages are centered
    np.testing.assert_allclose(
        np.asarray(adv).reshape(-1, group).sum(axis=1), 0.0, atol=1e-4)
    mask = np.asarray(tgts) != -100
    assert mask.any(axis=1).all()          # every row has response tokens
    assert (np.asarray(old)[~mask] == 0).all()
    # behaviour logprobs are genuine log-probabilities on live positions
    assert (np.asarray(old)[mask] <= 1e-6).all()
    # prompt region of row 0 survives verbatim
    np.testing.assert_array_equal(np.asarray(toks)[0, :3], prompts[0])

    # the batch drives a finite training step end to end
    loss_fn = make_grpo_loss_fn(reference_model=model, kl_coef=0.05)
    loss, n, _ = loss_fn(model, batch, None, False)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda m: loss_fn(m, batch, None, False)[0])(model)
    flat = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(x).max()) > 0 for x in flat if x is not None)
