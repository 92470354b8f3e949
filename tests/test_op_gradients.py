"""Exhaustive numeric gradient checks over the op library.

The reference checks every autograd op against central differences
(autograd.test.scala, ~156 tests). Against jax these checks validate our op
*surface* (the functions PARITY.md maps to the reference op library) and
guard against dtype/branch regressions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lamp_tpu import nn, ops
from .gradcheck import check_grad

X = np.asarray([[0.3, -1.2, 2.1], [0.9, 0.2, -0.7]])
X_POS = np.abs(X) + 0.1

ELEMENTWISE = [
    ("exp", jnp.exp, X),
    ("log", jnp.log, X_POS),
    ("log1p", jnp.log1p, X_POS),
    ("sin", jnp.sin, X),
    ("cos", jnp.cos, X),
    ("tan", jnp.tan, X * 0.3),
    ("arctan", jnp.arctan, X),
    ("tanh", jnp.tanh, X),
    ("sigmoid", jax.nn.sigmoid, X),
    ("relu", jax.nn.relu, X + 0.011),  # keep away from the kink
    ("leaky_relu", lambda x: jax.nn.leaky_relu(x, 0.1), X + 0.011),
    ("gelu", jax.nn.gelu, X),
    ("softplus", jax.nn.softplus, X),
    ("hardswish", jax.nn.hard_swish, X + 0.011),
    ("swish", jax.nn.silu, X),
    ("elu", jax.nn.elu, X),
    ("sqrt", jnp.sqrt, X_POS),
    ("rsqrt", jax.lax.rsqrt, X_POS),
    ("square", jnp.square, X),
    ("pow3", lambda x: x ** 3, X),
    ("abs", jnp.abs, X),  # no zeros in X
    ("reciprocal", lambda x: 1.0 / x, X_POS),
    ("erf", jax.scipy.special.erf, X),
    ("log_softmax", lambda x: jax.nn.log_softmax(x, axis=-1), X),
    ("softmax", lambda x: jax.nn.softmax(x, axis=-1), X),
    ("logsumexp", lambda x: jax.scipy.special.logsumexp(x, axis=-1), X),
]


@pytest.mark.parametrize("name,fn,x", ELEMENTWISE, ids=[e[0] for e in ELEMENTWISE])
def test_elementwise_gradient(name, fn, x):
    check_grad(lambda a: jnp.sum(jnp.square(fn(a))), x)


REDUCTIONS = [
    ("sum", lambda x: jnp.sum(x)),
    ("mean", lambda x: jnp.mean(x)),
    ("var", lambda x: jnp.var(x)),
    ("std", lambda x: jnp.std(x)),
    ("norm2", lambda x: jnp.linalg.norm(x)),
    ("frobenius_sq", lambda x: jnp.sum(x * x)),
    ("max_smooth", lambda x: jax.scipy.special.logsumexp(10 * x) / 10),
    ("rowsum_sq", lambda x: jnp.sum(jnp.square(jnp.sum(x, axis=1)))),
]


@pytest.mark.parametrize("name,fn", REDUCTIONS, ids=[r[0] for r in REDUCTIONS])
def test_reduction_gradient(name, fn):
    check_grad(fn, X)


def test_matmul_family_gradients():
    a = np.asarray([[0.5, -1.0], [2.0, 0.3]])
    check_grad(lambda m: jnp.sum(jnp.square(m @ m)), a)
    check_grad(lambda m: jnp.sum(jnp.square(jnp.dot(m.T, m))), a)
    # batched matmul
    b = np.random.RandomState(0).randn(2, 3, 3) * 0.5
    check_grad(lambda m: jnp.sum(jnp.square(jnp.matmul(m, m))), b)


def test_linalg_gradients():
    a = np.asarray([[2.0, 0.3], [0.3, 1.5]])
    check_grad(lambda m: ops.logdet(m @ m.T + jnp.eye(2)), a)
    check_grad(lambda m: jnp.sum(jnp.linalg.inv(m @ m.T + 2 * jnp.eye(2))), a)
    check_grad(
        lambda m: jnp.sum(jnp.linalg.cholesky(m @ m.T + 2 * jnp.eye(2))), a
    )
    check_grad(
        lambda m: jnp.sum(jnp.linalg.solve(m @ m.T + 2 * jnp.eye(2),
                                           jnp.ones((2, 1)))), a
    )


def test_indexing_gradients():
    x = np.random.RandomState(1).randn(4, 3)
    idx = jnp.asarray([0, 2])
    check_grad(lambda m: jnp.sum(jnp.square(m[idx])), x)
    check_grad(lambda m: jnp.sum(jnp.square(jnp.take(m, idx, axis=0))), x)
    check_grad(
        lambda m: jnp.sum(jnp.square(ops.index_add(m, idx, jnp.ones((2, 3))))),
        x,
    )
    check_grad(
        lambda m: jnp.sum(jnp.square(
            ops.scatter_add(jnp.zeros((2, 3)), jnp.asarray([0, 0, 1, 1]), m)
        )),
        x,
    )
    check_grad(lambda m: jnp.sum(jnp.square(ops.mask_fill(m, m > 0.5, 0.0))), x)


def test_shape_op_gradients():
    x = np.random.RandomState(2).randn(2, 3, 4)
    check_grad(lambda m: jnp.sum(jnp.square(m.reshape(6, 4))), x)
    check_grad(lambda m: jnp.sum(jnp.square(jnp.transpose(m, (2, 0, 1)))), x)
    check_grad(lambda m: jnp.sum(jnp.square(jnp.concatenate([m, m], 1))), x)
    check_grad(lambda m: jnp.sum(jnp.square(jnp.stack([m, 2 * m], 0))), x)
    check_grad(lambda m: jnp.sum(jnp.square(m[:, 1:, :2])), x)
    check_grad(lambda m: jnp.sum(jnp.square(jnp.repeat(m, 2, axis=1))), x)
    check_grad(lambda m: jnp.sum(jnp.square(jnp.flip(m, 1))), x)
    check_grad(lambda m: jnp.sum(jnp.square(jnp.pad(m, ((0, 1), (1, 0), (0, 0))))), x)


def test_loss_gradients():
    logits = np.random.RandomState(3).randn(4, 5)
    target = jnp.asarray([1, 0, 4, 2])
    check_grad(lambda l: nn.losses.cross_entropy_loss(l, target), logits)
    check_grad(
        lambda l: nn.losses.nll_loss(jax.nn.log_softmax(l, -1), target), logits
    )
    pred = np.random.RandomState(4).randn(4, 3)
    tgt = np.random.RandomState(5).randn(4, 3)
    check_grad(lambda p: nn.losses.mse_loss(p, jnp.asarray(tgt)), pred)
    check_grad(
        lambda p: nn.losses.smooth_l1_loss(p, jnp.asarray(tgt)), pred
    )
    bt = jnp.asarray(np.random.RandomState(6).rand(4, 3) > 0.5, jnp.float64)
    check_grad(lambda p: nn.losses.bce_with_logits_loss(p, bt), pred)
    check_grad(
        lambda p: nn.losses.bce_with_logits_loss(p, bt, pos_weight=2.0), pred
    )


def test_special_op_gradients():
    x = np.asarray([[0.5, 1.5], [2.5, 0.1]])
    check_grad(
        lambda m: jnp.sum(ops.capped_shifted_negative_exponential(
            m, shift=0.5, cap=1e-3
        )), x,
    )
    a = np.random.RandomState(7).randn(3, 2)
    b = np.random.RandomState(8).randn(2, 2) + 3.0
    check_grad(
        lambda m: jnp.sum(ops.euclidean_distance(m, jnp.asarray(b))), a
    )
