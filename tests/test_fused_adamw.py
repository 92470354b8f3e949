"""Fused-AdamW Pallas kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from lamp_tpu import optim
from lamp_tpu.ops.fused_adamw import AdamWStochastic, fused_adamw_update


def test_fused_matches_reference_f32():
    """For f32 params (no rounding) the kernel must match optim.AdamW."""
    rng = np.random.RandomState(0)
    p = {"w": jnp.asarray(rng.randn(33, 7), jnp.float32),
         "b": jnp.asarray(rng.randn(5), jnp.float32)}
    g = {"w": jnp.asarray(rng.randn(33, 7), jnp.float32),
         "b": jnp.asarray(rng.randn(5), jnp.float32)}
    ref = optim.AdamW(1e-2, weight_decay=0.01, mixed_precision=False)
    st_r = ref.init(p)
    opt = AdamWStochastic(1e-2, weight_decay=0.01)
    st_k = opt.init(p)
    pr, pk = p, p
    for _ in range(3):
        pr, st_r = ref.step(pr, g, st_r)
        pk, st_k = opt.step(pk, g, st_k)
    for k in p:
        np.testing.assert_allclose(
            np.asarray(pr[k]), np.asarray(pk[k]), atol=1e-5, rtol=1e-5
        )


def test_fused_converges():
    params = {"w": jnp.asarray([3.0, -2.0, 1.5], jnp.float32)}

    def loss_fn(p):
        return jnp.sum(jnp.square(p["w"]))

    opt = AdamWStochastic(0.1)
    state = opt.init(params)
    for _ in range(300):
        g = jax.grad(loss_fn)(params)
        params, state = opt.step(params, g, state)
    assert float(loss_fn(params)) < 1e-2


def test_fused_non_aligned_shapes():
    """Padding path: sizes not multiples of 128."""
    p = {"w": jnp.ones((13, 5), jnp.float32)}
    g = {"w": jnp.full((13, 5), 0.1, jnp.float32)}
    opt = AdamWStochastic(0.01)
    st = opt.init(p)
    p2, st = opt.step(p, g, st)
    assert p2["w"].shape == (13, 5)
    assert np.all(np.asarray(p2["w"]) < 1.0)
