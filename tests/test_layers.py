"""Layer forward/gradient tests.

Mirrors the reference's nn.test.scala: every layer's parameter gradients
checked against central differences (SURVEY.md §4.1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lamp_tpu import nn
from .gradcheck import check_module_grads

KEY = jax.random.PRNGKey(0)


def _loss_through(module, x, train=False, key=None):
    def build_loss(m):
        y, _ = m.forward(x, key=key, train=train)
        return jnp.sum(jnp.square(y.astype(jnp.float64)))

    return build_loss


def test_linear_forward_and_grad():
    m = nn.Linear.init(5, 3, key=KEY, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 5), jnp.float64)
    y = m(x)
    assert y.shape == (4, 3)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x) @ np.asarray(m.weight) + np.asarray(m.bias),
        rtol=1e-10,
    )
    check_module_grads(_loss_through(m, x), m)


def test_linear_no_bias():
    m = nn.Linear.init(5, 3, key=KEY, bias=False, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 5), jnp.float64)
    assert m.bias is None
    check_module_grads(_loss_through(m, x), m)


def test_embedding():
    m = nn.Embedding.init(10, 4, key=KEY, dtype=jnp.float64)
    idx = jnp.array([1, 3, 3, 7])
    y = m(idx)
    assert y.shape == (4, 4)
    check_module_grads(_loss_through(m, idx), m, max_elems_per_leaf=20)


def test_layernorm_grad():
    m = nn.LayerNorm.init(6, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 6), jnp.float64) * 2 + 1

    def build_loss(mm):
        y, _ = mm.forward(x)
        return jnp.sum(jnp.square(y))

    check_module_grads(build_loss, m)
    # normalized output has ~zero mean / unit variance pre-affine
    y = m(x)
    np.testing.assert_allclose(np.asarray(jnp.mean(y, axis=-1)), 0.0, atol=1e-6)


def test_batchnorm_train_eval():
    m = nn.BatchNorm.init(4, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 4), jnp.float64) * 3 + 2
    y, m2 = m.forward(x, train=True)
    # train-mode output normalized per feature
    np.testing.assert_allclose(np.asarray(jnp.mean(y, axis=0)), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jnp.std(y, axis=0)), 1.0, atol=1e-2)
    # running stats moved toward batch stats
    assert np.all(np.asarray(m2.running_mean) != np.asarray(m.running_mean))
    # eval mode uses running stats and does not update state
    y_eval, m3 = m2.forward(x, train=False)
    np.testing.assert_allclose(
        np.asarray(m3.running_mean), np.asarray(m2.running_mean)
    )
    check_module_grads(_loss_through(m, x, train=True), m)


def test_batchnorm2d():
    m = nn.BatchNorm2D.init(3, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 5, 5), jnp.float64)
    y, m2 = m.forward(x, train=True)
    assert y.shape == x.shape
    check_module_grads(_loss_through(m, x, train=True), m)


def test_weightnorm_linear():
    m = nn.WeightNormLinear.init(4, 3, key=KEY, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 4), jnp.float64)
    y = m(x)
    assert y.shape == (5, 3)
    check_module_grads(_loss_through(m, x), m, max_elems_per_leaf=10)


def test_dropout():
    m = nn.Dropout.init(0.5)
    x = jnp.ones((1000,))
    y_eval = m(x, train=False)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(x))
    y_train = m(x, key=jax.random.PRNGKey(3), train=True)
    kept = np.asarray(y_train != 0)
    assert 0.35 < kept.mean() < 0.65
    # inverted dropout preserves expectation
    assert abs(float(jnp.mean(y_train)) - 1.0) < 0.1


def test_sequential_threads_state_and_keys():
    m = nn.Sequential.init(
        nn.Linear.init(4, 8, key=KEY, dtype=jnp.float64),
        nn.BatchNorm.init(8, dtype=jnp.float64),
        nn.Fun.init(jax.nn.relu),
        nn.Dropout.init(0.2),
        nn.Linear.init(8, 2, key=jax.random.PRNGKey(9), dtype=jnp.float64),
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 4), jnp.float64)
    y, m2 = m.forward(x, key=jax.random.PRNGKey(2), train=True)
    assert y.shape == (6, 2)
    assert np.any(
        np.asarray(m2.layers[1].running_mean) != np.asarray(m.layers[1].running_mean)
    )


def test_residual():
    m = nn.Residual.init(nn.Linear.init(4, 4, key=KEY, dtype=jnp.float64))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4), jnp.float64)
    y = m(x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x + m.inner(x)), rtol=1e-12
    )


def test_mlp_overfits_tiny_problem():
    """Integration: MLP + AdamW drives loss to ~0 on a tiny regression."""
    from lamp_tpu import optim

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (32, 3), jnp.float32)
    w_true = jnp.array([[1.0], [-2.0], [0.5]])
    y = x @ w_true

    model = nn.MLP(3, 16, 1, key=key, norm=False, dropout=0.0)
    params, rest = nn.partition_params(model)
    opt = optim.AdamW(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            m = nn.combine(p, rest)
            pred, _ = m.forward(x, train=True)
            return jnp.mean(jnp.square(pred - y))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, state = opt.step(params, grads, state)
        return params, state, loss

    loss0 = None
    for i in range(200):
        params, state, loss = step(params, state)
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < 0.01 * loss0


def test_param_tags_and_partition():
    m = nn.MLP(3, 8, 2, key=KEY)
    tags = nn.param_tags(m)
    leaves = set(jax.tree_util.tree_leaves(tags))
    assert "Linear.weight" in leaves and "Linear.bias" in leaves
    params, rest = nn.partition_params(m)
    # buffers (running stats) are not trainable
    flat_p = [x for x in jax.tree_util.tree_leaves(params) if x is not None]
    assert all(jnp.issubdtype(x.dtype, jnp.inexact) for x in flat_p)
    recombined = nn.combine(params, rest)
    y1 = m(jnp.ones((1, 3)))
    y2 = recombined(jnp.ones((1, 3)))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_either_module():
    left = nn.Linear.init(4, 4, key=KEY, dtype=jnp.float64)
    m = nn.EitherModule.init(left=left)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4), jnp.float64)
    np.testing.assert_allclose(np.asarray(m(x)), np.asarray(left(x)))
    m2 = nn.EitherModule.init(right=nn.Fun.init(jax.nn.relu))
    np.testing.assert_allclose(
        np.asarray(m2(x)), np.asarray(jax.nn.relu(x))
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        nn.EitherModule.init()
