"""Misc op-library + image-helper + stream-combinator tests."""

import jax
import jax.numpy as jnp
import numpy as np

from lamp_tpu import data, ops
from .gradcheck import check_grad


def test_euclidean_distance():
    a = jnp.asarray([[0.0, 0.0], [3.0, 4.0]])
    b = jnp.asarray([[0.0, 0.0]])
    d = ops.euclidean_distance(a, b)
    np.testing.assert_allclose(np.asarray(d), [[0.0], [5.0]], atol=1e-6)
    check_grad(
        lambda x: jnp.sum(ops.euclidean_distance(x, b + 1.0)),
        np.asarray([[1.0, 2.0], [3.0, 4.0]]),
    )


def test_capped_shifted_negative_exponential():
    x = jnp.asarray([-1.0, 0.0, 10.0])
    y = ops.capped_shifted_negative_exponential(x, shift=0.0, cap=1e-3)
    np.testing.assert_allclose(
        np.asarray(y), [np.e, 1.0, 1e-3], rtol=1e-6
    )


def test_mask_ops():
    x = jnp.arange(6.0).reshape(2, 3)
    m = x > 2
    filled = ops.mask_fill(x, m, -1.0)
    assert float(filled[1, 2]) == -1.0
    vals, count = ops.mask_select(x, m)
    assert int(count) == 3
    np.testing.assert_array_equal(np.sort(np.asarray(vals[:3])), [3, 4, 5])


def test_index_and_scatter():
    x = jnp.zeros((4, 2))
    out = ops.index_add(x, jnp.asarray([0, 2]), jnp.ones((2, 2)))
    np.testing.assert_array_equal(np.asarray(out[0]), [1, 1])
    np.testing.assert_array_equal(np.asarray(out[1]), [0, 0])
    out2 = ops.index_fill(x, jnp.asarray([1]), 7.0)
    assert float(out2[1, 0]) == 7.0
    # scatter_add 1d index over axis 0
    out3 = ops.scatter_add(jnp.zeros((3, 2)), jnp.asarray([2, 2]),
                           jnp.ones((2, 2)))
    np.testing.assert_array_equal(np.asarray(out3[2]), [2, 2])


def test_sparse_roundtrip():
    vals = jnp.asarray([1.0, 2.0])
    idx = jnp.asarray([[0, 1], [2, 0]])
    sp = ops.sparse_from_value_and_index(vals, idx, (3, 3))
    dense = ops.sparse_to_dense(sp)
    assert float(dense[0, 1]) == 1.0 and float(dense[2, 0]) == 2.0
    prod = ops.sparse_dense_matmul(sp, jnp.eye(3))
    np.testing.assert_allclose(np.asarray(prod), np.asarray(dense), atol=1e-7)


def test_logdet():
    x = jnp.asarray([[2.0, 0.0], [0.0, 3.0]])
    assert abs(float(ops.logdet(x)) - np.log(6.0)) < 1e-6
    check_grad(lambda m: ops.logdet(m @ m.T + 2 * jnp.eye(2)),
               np.asarray([[1.0, 0.2], [0.1, 1.5]]))


def test_image_helpers():
    img = (np.random.RandomState(0).rand(8, 6, 3) * 255).astype(np.uint8)
    t = data.image_to_tensor(img)
    assert t.shape == (3, 8, 6) and t.max() <= 1.0
    back = data.tensor_to_image(t)
    np.testing.assert_array_equal(back, img)
    norm = data.normalize_image(t, [0.5, 0.5, 0.5], [0.25, 0.25, 0.25])
    denorm = data.denormalize_image(norm, [0.5] * 3, [0.25] * 3)
    np.testing.assert_allclose(denorm, t, atol=1e-6)


def test_without_empty():
    s = data.from_function(4, lambda i: (np.zeros((i % 2, 3)),))
    kept = s.without_empty().drain_to_list()
    assert len(kept) == 2
