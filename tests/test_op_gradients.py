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


def test_elementwise_pair_gradients():
    """ElementWiseMinimum/Maximum, Pow, Where (ops.scala:2287,2314,939,483)."""
    a = np.asarray([[0.5, -1.0], [2.0, 0.3]])
    b = jnp.asarray([[0.7, -2.0], [1.0, 0.9]])
    check_grad(lambda m: jnp.sum(jnp.square(jnp.minimum(m, b))), a)
    check_grad(lambda m: jnp.sum(jnp.square(jnp.maximum(m, b))), a)
    check_grad(lambda m: jnp.sum(jnp.power(jnp.abs(m) + 0.5, b)), a)
    check_grad(lambda m: jnp.sum(jnp.where(b > 0, m * 2.0, m * m)), a)


def test_more_indexing_gradients():
    """IndexFill, MaskSelect, OneHot-weighted select, take_along_axis
    (ops.scala:203,461,495)."""
    from lamp_tpu import ops as O

    x = np.random.RandomState(11).randn(4, 3)
    idx = jnp.asarray([1, 3])
    check_grad(
        lambda m: jnp.sum(jnp.square(O.index_fill(m, idx, 0.0))), x
    )
    mask = jnp.asarray(np.random.RandomState(12).rand(4, 3) > 0.4)
    check_grad(
        lambda m: jnp.sum(jnp.square(O.mask_select(m, mask, fill=0.0)[0])), x
    )
    oh = O.one_hot(jnp.asarray([0, 2, 1, 0]), 3).astype(jnp.float64)
    check_grad(lambda m: jnp.sum(jnp.square(m * oh)), x)
    ta = jnp.asarray([[0], [2], [1], [0]])
    check_grad(
        lambda m: jnp.sum(jnp.square(jnp.take_along_axis(m, ta, axis=1))), x
    )


def test_more_linalg_gradients():
    """PInv, CholeskySolve, Diag, tensordot, SVD/eigh values, lstsq-style
    (STen.scala:1815-1877, ops.scala:371,2234,333)."""
    a = np.asarray([[2.0, 0.3], [0.3, 1.5]])
    rect = np.random.RandomState(13).randn(4, 2)
    check_grad(lambda m: jnp.sum(jnp.square(jnp.linalg.pinv(m))), rect)
    check_grad(
        lambda m: jnp.sum(jax.scipy.linalg.cho_solve(
            (jnp.linalg.cholesky(m @ m.T + 2 * jnp.eye(2)), True),
            jnp.ones((2, 1)),
        )), a,
    )
    check_grad(lambda m: jnp.sum(jnp.square(jnp.diag(m))), a)
    check_grad(lambda m: jnp.sum(jnp.square(jnp.diagflat(jnp.diag(m)))), a)
    t = np.random.RandomState(14).randn(2, 3, 2)
    check_grad(
        lambda m: jnp.sum(jnp.square(jnp.tensordot(m, jnp.asarray(t), axes=([1, 2], [0, 1])))),
        np.random.RandomState(15).randn(3, 2, 3),
    )
    # singular values / symmetric eigenvalues (value-only, well-separated)
    check_grad(
        lambda m: jnp.sum(jnp.linalg.svd(m + jnp.diag(jnp.asarray([3.0, 1.0])),
                                         compute_uv=False)), a * 0.1,
    )
    check_grad(
        lambda m: jnp.sum(jnp.linalg.eigvalsh(
            (m + m.T) / 2 + jnp.diag(jnp.asarray([4.0, 0.0]))
        )), a * 0.1,
    )
    # least squares via solve of normal equations (linalg_lstsq parity)
    y = jnp.asarray(np.random.RandomState(16).randn(4, 1))
    check_grad(
        lambda m: jnp.sum(jnp.linalg.solve(
            m.T @ m + 0.1 * jnp.eye(2), m.T @ y
        )), rect,
    )


def test_sparse_and_scan_gradients():
    """Sparse COO value grads + cumulative/sorting ops
    (ops.scala:289,316; STen cumsum/sort)."""
    from lamp_tpu import ops as O

    vals = np.asarray([0.5, -1.2, 2.0])
    idx = jnp.asarray([[0, 1], [1, 0], [2, 2]])  # [nnz, ndim]

    def through_sparse(v):
        s = O.sparse_from_value_and_index(v, idx, (3, 3))
        return jnp.sum(jnp.square(O.sparse_to_dense(s)))

    check_grad(through_sparse, vals)

    x = np.random.RandomState(17).randn(3, 4)
    check_grad(lambda m: jnp.sum(jnp.square(jnp.cumsum(m, axis=1))), x)
    check_grad(lambda m: jnp.sum(jnp.square(jnp.cumprod(m * 0.5 + 1.5, axis=1))), x)
    check_grad(lambda m: jnp.sum(jnp.sort(m, axis=1) * jnp.asarray([1.0, 2.0, 3.0, 4.0])), x)
    check_grad(lambda m: jnp.sum(jax.lax.top_k(m, 2)[0] * jnp.asarray([1.0, 2.0])), x)


def test_embedding_and_cast_gradients():
    """Embedding gather (ops.scala:2141) and CastToPrecision (:260)."""
    w = np.random.RandomState(18).randn(5, 3)
    tok = jnp.asarray([1, 4, 1, 0])
    check_grad(lambda m: jnp.sum(jnp.square(m[tok])), w)
    # cast round trip f64->f32->f64 passes gradient through (large eps: the
    # f32 quantization floor swamps 1e-6 central-difference perturbations)
    check_grad(
        lambda m: jnp.sum(jnp.square(m.astype(jnp.float32).astype(jnp.float64))),
        w, eps=1e-3, atol=1e-2, rtol=1e-2,
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
