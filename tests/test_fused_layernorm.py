"""Fused LayerNorm Pallas kernel: numerics + analytic-VJP checks
(interpret mode on CPU; the real-chip pass rides the `-m tpu` tier's
kernel sweeps).

The kernel is a library op for wide-model use; the flagship does NOT
dispatch to it — measured round 5 (scripts/exp_norm_knockout.json): norm
statistics cost ~4.2 ms on-path at 12L/768d, of which ~3.6 ms is the
irreducible standalone read/write traffic a custom kernel must also pay,
so the recoverable slice (~0.6 ms, <1%) did not justify replacing the
XLA lowering that fuses into neighboring ops on CPU/GPU-style shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lamp_tpu.ops.fused_layernorm import fused_layernorm


def _ref_ln(x, g, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * g.astype(jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_reference(dtype):
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (8, 48, 256), dtype) * 3 + 1
    g = jax.random.normal(jax.random.fold_in(k, 1), (256,), dtype) * 0.5 + 1
    b = jax.random.normal(jax.random.fold_in(k, 2), (256,), dtype) * 0.1
    y1 = fused_layernorm(x, g, b, 1e-5, True)
    y2 = _ref_ln(x, g, b)
    tol = 1e-5 if dtype == jnp.float32 else 0.05
    np.testing.assert_allclose(
        np.asarray(y1, np.float32), np.asarray(y2, np.float32), atol=tol)


def test_no_bias_variant():
    k = jax.random.PRNGKey(3)
    x = jax.random.normal(k, (16, 128), jnp.float32)
    g = jnp.ones((128,)) * 1.3
    y1 = fused_layernorm(x, g, None, 1e-5, True)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(_ref_ln(x, g, None)), atol=1e-5)


def test_gradients_match_autodiff_of_reference():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (4, 24, 256), jnp.float32) * 2
    g = jax.random.normal(jax.random.fold_in(k, 1), (256,)) * 0.5 + 1
    b = jax.random.normal(jax.random.fold_in(k, 2), (256,)) * 0.1

    def l1(x, g, b):
        return jnp.sum(jnp.sin(fused_layernorm(x, g, b, 1e-5, True)))

    def l2(x, g, b):
        return jnp.sum(jnp.sin(_ref_ln(x, g, b)))

    g1 = jax.grad(l1, argnums=(0, 1, 2))(x, g, b)
    g2 = jax.grad(l2, argnums=(0, 1, 2))(x, g, b)
    for a, bb in zip(g1, g2):
        scale = float(jnp.max(jnp.abs(bb))) or 1.0
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(bb) / scale, atol=1e-4)


def test_gradients_under_jit_and_row_blocking():
    # 40 rows -> block size 8 with 5 grid cells; accumulation across cells
    # must produce exact dgamma/dbeta sums
    k = jax.random.PRNGKey(7)
    x = jax.random.normal(k, (40, 128), jnp.float32)
    g = jnp.ones((128,)) * 0.7
    b = jnp.zeros((128,))

    f = jax.jit(jax.grad(
        lambda x, g, b: jnp.sum(fused_layernorm(x, g, b, 1e-5, True) ** 2),
        argnums=(0, 1, 2)))
    r = jax.jit(jax.grad(
        lambda x, g, b: jnp.sum(_ref_ln(x, g, b) ** 2), argnums=(0, 1, 2)))
    for a, bb in zip(f(x, g, b), r(x, g, b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=1e-4, rtol=1e-4)


def test_untileable_shapes_fall_back_to_jnp_path():
    """Shapes the kernel cannot tile (leading product not divisible by 8,
    or D % 128 != 0) must take the identical-math jnp path — not
    ZeroDivisionError (round-5 self-review finding)."""
    g = jnp.ones((256,)) * 1.3
    b = jnp.zeros((256,))
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 256))  # 15 rows
    np.testing.assert_allclose(
        np.asarray(fused_layernorm(x, g, b)),
        np.asarray(_ref_ln(x, g, b)), atol=1e-5)
    dx = jax.grad(lambda x: jnp.sum(fused_layernorm(x, g, b) ** 2))(x)
    dr = jax.grad(lambda x: jnp.sum(_ref_ln(x, g, b) ** 2))(x)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dr),
                               atol=1e-4, rtol=1e-4)

    x2 = jax.random.normal(jax.random.PRNGKey(1), (8, 100))  # D % 128 != 0
    g2 = jnp.ones((100,))
    np.testing.assert_allclose(
        np.asarray(fused_layernorm(x2, g2, None)),
        np.asarray(_ref_ln(x2, g2, None)), atol=1e-5)
