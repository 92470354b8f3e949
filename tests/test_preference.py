"""DPO / IPO preference losses and knowledge distillation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lamp_tpu import nn, optim, train


def _lm(seed=0, vocab=31):
    return nn.ModernLM.init(
        vocab_size=vocab, context_length=16, num_blocks=2, embed_dim=32,
        num_heads=4, key=jax.random.PRNGKey(seed),
    )


def _pref_batch(seed=0, b=4, t=10, vocab=31):
    rng = np.random.RandomState(seed)
    ct = rng.randint(0, vocab, (b, t)).astype(np.int32)
    rt = rng.randint(0, vocab, (b, t)).astype(np.int32)
    cy = np.roll(ct, -1, axis=1)
    ry = np.roll(rt, -1, axis=1)
    # first 3 rows are "prompt": excluded from the preference signal
    cy[:, :3] = -100
    ry[:, :3] = -100
    cy[:, -1] = -100
    ry[:, -1] = -100
    return (jnp.asarray(ct), jnp.asarray(cy), jnp.asarray(rt),
            jnp.asarray(ry))


def test_sequence_logprobs_oracle():
    model = _lm()
    ct, cy, _, _ = _pref_batch()
    got = train.sequence_logprobs(model, ct, cy)
    logits, _ = model.forward(ct)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(
        logp, jnp.maximum(cy, 0)[..., None], axis=-1
    )[..., 0]
    want = jnp.sum(jnp.where(cy != -100, picked, 0.0), axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_dpo_loss_at_init_is_log2():
    """policy == reference -> margin 0 -> -log sigmoid(0) = log 2."""
    model = _lm()
    batch = _pref_batch()
    loss, aux = train.dpo_loss(model, model, batch, beta=0.1)
    np.testing.assert_allclose(float(loss), np.log(2.0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(aux["chosen_rewards"]), 0.0,
                               atol=1e-5)

    # label smoothing keeps it symmetric at init
    loss_ls, _ = train.dpo_loss(model, model, batch, beta=0.1,
                                label_smoothing=0.1)
    np.testing.assert_allclose(float(loss_ls), np.log(2.0), rtol=1e-5)

    # ipo at init: (0 - 1/(2 beta))^2
    loss_ipo, _ = train.dpo_loss(model, model, batch, beta=0.25,
                                 loss_type="ipo")
    np.testing.assert_allclose(float(loss_ipo), 4.0, rtol=1e-5)

    with pytest.raises(ValueError, match="loss_type"):
        train.dpo_loss(model, model, batch, loss_type="nope")


@pytest.mark.parametrize("loss_type", ["sigmoid", "ipo", "hinge"])
def test_dpo_training_separates_preferences(loss_type):
    """A few steps of DPO drive the margin positive (chosen preferred) and
    the loss below its init value, through the standard train-step path."""
    ref = _lm()
    batch = _pref_batch()
    loss_fn = train.make_dpo_loss_fn(ref, beta=0.5, loss_type=loss_type)
    opt = optim.AdamW(5e-3)
    state = train.TrainState.init(ref, opt)
    step = jax.jit(train.make_train_step(opt, loss_fn))
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(12):
        key, k = jax.random.split(key)
        state, (loss, _) = step(state, batch, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    _, aux = train.dpo_loss(state.model, ref, batch, beta=0.5,
                            loss_type=loss_type)
    assert float(aux["accuracy"]) == 1.0
    assert float(jnp.mean(aux["chosen_rewards"]
                          - aux["rejected_rewards"])) > 0


def test_distillation_kl_oracle_and_training():
    teacher = _lm(seed=1)
    student = _lm(seed=2)
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, 31, (4, 12)).astype(np.int32))
    targets = jnp.roll(tokens, -1, axis=1).at[:, -1].set(-100)

    # oracle: full-logits KL at alpha=1 matches the chunked scan
    loss_fn = train.make_distill_loss_fn(teacher, temperature=2.0,
                                         alpha=1.0, row_chunk=8)
    loss, _, _ = loss_fn(student, (tokens, targets), None, False)
    zs, _ = student.forward(tokens)
    zt, _ = teacher.forward(tokens)
    lps = jax.nn.log_softmax(zs.astype(jnp.float32) / 2.0, axis=-1)
    lpt = jax.nn.log_softmax(zt.astype(jnp.float32) / 2.0, axis=-1)
    kl = jnp.sum(jnp.exp(lpt) * (lpt - lps), axis=-1)
    live = (targets != -100)
    want = 4.0 * jnp.sum(jnp.where(live, kl, 0.0)) / jnp.sum(live)
    np.testing.assert_allclose(float(loss), float(want), rtol=2e-4)

    # training the student on the mixed loss reduces it
    loss_fn = train.make_distill_loss_fn(teacher, temperature=2.0,
                                         alpha=0.5, row_chunk=16)
    opt = optim.AdamW(3e-3)
    state = train.TrainState.init(student, opt)
    step = jax.jit(train.make_train_step(opt, loss_fn))
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(10):
        key, k = jax.random.split(key)
        state, (loss, _) = step(state, (tokens, targets), k)
        losses.append(float(loss))
    assert losses[-1] < 0.9 * losses[0]
