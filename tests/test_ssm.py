"""Mamba selective-SSM tests: scan correctness, step/forward equivalence,
gradients, training, generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lamp_tpu import nn, optim, train
from lamp_tpu.nn.ssm import MambaBlock, MambaLM, selective_scan
from .gradcheck import check_module_grads


def test_selective_scan_matches_sequential():
    """associative_scan solve == the sequential recurrence, any shape."""
    rng = np.random.RandomState(0)
    a = jnp.asarray(np.exp(-rng.rand(2, 17, 3, 5)))  # decay in (0, 1)
    b = jnp.asarray(rng.randn(2, 17, 3, 5))
    got = selective_scan(a, b)
    h = np.zeros((2, 3, 5))
    want = []
    for t in range(17):
        h = np.asarray(a[:, t]) * h + np.asarray(b[:, t])
        want.append(h.copy())
    np.testing.assert_allclose(np.asarray(got),
                               np.stack(want, axis=1), rtol=1e-6, atol=1e-6)


def test_mamba_block_step_matches_forward():
    """Recurrent step() replays forward() exactly, position by position
    (the O(1)-state decode contract)."""
    block = MambaBlock.init(16, key=jax.random.PRNGKey(0), d_state=8,
                            d_conv=4)
    rng = np.random.RandomState(1)
    u = jnp.asarray(rng.randn(2, 11, 16).astype(np.float32))
    full, _ = block.forward(u)
    state = block.init_state(2)
    outs = []
    for t in range(11):
        y, state = block.step(u[:, t], state)
        outs.append(y)
    np.testing.assert_allclose(np.asarray(jnp.stack(outs, axis=1)),
                               np.asarray(full), rtol=1e-5, atol=1e-5)


def test_mamba_lm_step_matches_forward():
    model = MambaLM.init(vocab_size=29, context_length=32, num_blocks=2,
                         embed_dim=16, d_state=8,
                         key=jax.random.PRNGKey(2))
    toks = jnp.asarray(np.random.RandomState(0).randint(0, 29, (2, 9)),
                       jnp.int32)
    full, _ = model.forward(toks)
    state = model.init_state(2)
    for t in range(9):
        logits, state = model.step(toks[:, t], state)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, -1]),
                               rtol=1e-5, atol=1e-5)


def test_mamba_block_grads():
    """Numeric gradcheck through conv, selective scan, gating."""
    block = MambaBlock.init(6, key=jax.random.PRNGKey(3), d_state=4,
                            d_conv=3, expand=2)
    rng = np.random.RandomState(2)
    u = jnp.asarray(rng.randn(2, 5, 6))

    def build_loss(m):
        y, _ = m.forward(u.astype(jnp.float64))
        return jnp.sum(y.astype(jnp.float64) ** 2)

    check_module_grads(build_loss, block, atol=2e-4, rtol=2e-4,
                       max_elems_per_leaf=8)


def test_mamba_lm_overfits_and_generates():
    """End-to-end: the LM memorizes a tiny corpus through the standard
    train-step path (fused-CE loss), then greedy-generates it back with the
    recurrent decoder."""
    vocab, t = 17, 12
    seq = np.arange(t * 4 + 1) % vocab
    x = jnp.asarray(seq[:-1].reshape(4, t), jnp.int32)
    y = jnp.asarray(seq[1:].reshape(4, t), jnp.int32)
    model = MambaLM.init(vocab_size=vocab, context_length=64, num_blocks=2,
                         embed_dim=32, d_state=8, key=jax.random.PRNGKey(4))

    def loss_fn(m, batch, key, train_mode):
        xx, yy = batch
        return (m.loss(xx, yy, key=key, train=train_mode),
                jnp.asarray(xx.shape[0], jnp.float32), m)

    opt = optim.AdamW(5e-3)
    state = train.TrainState.init(model, opt)
    step = jax.jit(train.make_train_step(opt, loss_fn))
    losses = []
    for i in range(60):
        state, (l, _) = step(state, (x, y), jax.random.PRNGKey(i))
        losses.append(float(l))
    assert losses[-1] < 0.2 * losses[0]

    trained = state.model
    prompt = x[0, :4]
    gen = trained.generate(prompt, max_tokens=6)
    want = np.asarray(seq[4:10])
    np.testing.assert_array_equal(np.asarray(gen[0]), want)


def test_mamba_remat_matches():
    model = MambaLM.init(vocab_size=13, context_length=16, num_blocks=2,
                         embed_dim=16, key=jax.random.PRNGKey(5))
    import dataclasses

    model_r = dataclasses.replace(model, remat=True)
    toks = jnp.asarray(np.random.RandomState(3).randint(0, 13, (2, 8)),
                       jnp.int32)
    y = jnp.asarray(np.random.RandomState(4).randint(0, 13, (2, 8)),
                    jnp.int32)

    def loss_of(m):
        params, rest = nn.partition_params(m)
        return jax.grad(
            lambda p: nn.combine(p, rest).loss(toks, y)
        )(params), m.loss(toks, y)

    g1, l1 = loss_of(model)
    g2, l2 = loss_of(model_r)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)
