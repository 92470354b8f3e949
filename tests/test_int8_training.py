"""Int8 quantized-training matmuls: accuracy, gradients, model training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lamp_tpu import nn, optim, train
from lamp_tpu.nn.layers import Linear
from lamp_tpu.ops.int8_training import (
    Int8Linear,
    dequantize_training,
    int8_dot,
    quantize_training,
)


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)


def test_int8_dot_close_to_exact():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (64, 256), jnp.float32)
    w = jax.random.normal(k2, (256, 128), jnp.float32) * 0.1
    y = int8_dot(x, w)
    exact = x @ w
    assert y.dtype == jnp.float32
    assert _rel(y, exact) < 0.015, _rel(y, exact)

    # scale outliers: per-row/per-col scales keep the error bounded even
    # when one row is 100x hotter than the rest
    x_hot = x.at[3].mul(100.0)
    assert _rel(int8_dot(x_hot, w), x_hot @ w) < 0.015


def test_int8_dot_batch_dims():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (2, 5, 32), jnp.bfloat16)
    w = jax.random.normal(k2, (32, 16), jnp.bfloat16)
    y = int8_dot(x, w)
    assert y.shape == (2, 5, 16)
    flat = int8_dot(x.reshape(10, 32), w).reshape(2, 5, 16)
    np.testing.assert_allclose(np.asarray(y), np.asarray(flat))


def test_int8_dot_grads_bf16_bwd_are_exact_ste():
    """With bwd="bf16" the VJP is the plain dense backward (straight
    through), so it matches jax.grad of the exact dot."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(k1, (16, 64), jnp.float32)
    w = jax.random.normal(k2, (64, 32), jnp.float32)
    c = jax.random.normal(k3, (16, 32), jnp.float32)

    gx, gw = jax.grad(lambda x, w: jnp.sum(int8_dot(x, w) * c),
                      argnums=(0, 1))(x, w)
    ex, ew = jax.grad(lambda x, w: jnp.sum((x @ w) * c),
                      argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ex),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(ew),
                               atol=1e-5, rtol=1e-5)


def test_int8_dot_grads_int8_bwd_close():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    x = jax.random.normal(k1, (32, 128), jnp.float32)
    w = jax.random.normal(k2, (128, 64), jnp.float32)
    c = jax.random.normal(k3, (32, 64), jnp.float32)
    gx, gw = jax.grad(lambda x, w: jnp.sum(int8_dot(x, w, bwd="int8") * c),
                      argnums=(0, 1))(x, w)
    ex, ew = jax.grad(lambda x, w: jnp.sum((x @ w) * c),
                      argnums=(0, 1))(x, w)
    assert _rel(gx, ex) < 0.02
    assert _rel(gw, ew) < 0.02
    with pytest.raises(ValueError):
        int8_dot(x, w, bwd="fp4")


def test_quantize_training_swaps_by_size():
    k = jax.random.PRNGKey(0)
    mlp = nn.MLP(512, 512, 8, key=k)
    q = quantize_training(mlp, min_features=256)
    kinds = [type(m).__name__ for m in jax.tree_util.tree_leaves(
        q, is_leaf=lambda n: isinstance(n, (Linear, Int8Linear)))
        if isinstance(m, (Linear, Int8Linear))]
    assert "Int8Linear" in kinds          # the 512x512 layer
    assert "Linear" in kinds              # the 512x8 head stays exact

    back = dequantize_training(q)
    leaves_a = jax.tree_util.tree_leaves(mlp)
    leaves_b = jax.tree_util.tree_leaves(back)
    assert all((np.asarray(a) == np.asarray(b)).all()
               for a, b in zip(leaves_a, leaves_b))


def test_int8_model_trains_to_near_bf16_loss():
    """A quantized ModernLM overfits a tiny corpus about as well as the
    exact one — quantization noise does not break optimization."""
    def make():
        return nn.ModernLM.init(
            vocab_size=64, context_length=16, num_blocks=2, embed_dim=256,
            num_heads=4, key=jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    toks = jnp.asarray(rng.randint(0, 64, (8, 16)), jnp.int32)
    tgts = jnp.roll(toks, -1, axis=1)

    def run(model, steps=30):
        opt = optim.AdamW(3e-3)
        state = train.TrainState.init(model, opt)

        def loss_fn(m, batch, key, tr):
            t, y = batch
            return m.loss(t, y), jnp.asarray(1.0), m

        step = jax.jit(train.make_train_step(opt, loss_fn),
                       donate_argnums=(0,))
        for _ in range(steps):
            state, (loss, _) = step(state, (toks, tgts), jax.random.PRNGKey(1))
        return float(loss), state.model

    exact_loss, _ = run(make())
    q_loss, q_model = run(quantize_training(make(), min_features=128))
    assert q_loss < exact_loss + 0.35, (q_loss, exact_loss)

    # quantized blocks really are Int8Linear (SwiGLU + attention projs)
    n_q = sum(isinstance(m, Int8Linear) for m in jax.tree_util.tree_leaves(
        q_model, is_leaf=lambda n: isinstance(n, Int8Linear))
        if isinstance(m, Int8Linear))
    assert n_q >= 2 * 7  # 4 attention + 3 SwiGLU per block
