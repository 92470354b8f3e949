"""ViT image classifier: shapes, patchify exactness, training integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lamp_tpu import nn, optim, train
from lamp_tpu.models import ViT


def _tiny(pool="cls", **kw):
    return ViT.init(image_size=8, patch_size=4, num_classes=5, embed_dim=32,
                    num_blocks=2, num_heads=2, key=jax.random.PRNGKey(0),
                    pool=pool, **kw)


def test_vit_forward_shapes():
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 8))
    for pool in ("cls", "mean"):
        logits, _ = _tiny(pool).forward(x)
        assert logits.shape == (3, 5)
    with pytest.raises(ValueError):
        ViT.init(image_size=9, patch_size=4, num_classes=5, embed_dim=32,
                 num_blocks=1, num_heads=2, key=jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        _tiny(pool="max")


def test_vit_patchify_matches_loops():
    """The reshape/transpose patch extraction equals the obvious slicing."""
    m = _tiny()
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 8, 8))
    got = np.asarray(m._patchify(x))
    p = 4
    for b in range(2):
        idx = 0
        for i in range(2):
            for j in range(2):
                patch = np.asarray(
                    x[b, :, i * p:(i + 1) * p, j * p:(j + 1) * p]).reshape(-1)
                np.testing.assert_allclose(got[b, idx], patch, rtol=1e-6)
                idx += 1


def test_vit_gradients_flow_everywhere():
    m = _tiny()
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 8, 8))

    def loss(model):
        logits, _ = model.forward(x)
        return jnp.sum(jnp.square(logits))

    grads = jax.grad(loss)(m)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)


def test_vit_overfits_tiny_classification():
    model = _tiny()
    rng = np.random.RandomState(0)
    # two linearly-separable-ish classes of images
    x = jnp.asarray(rng.randn(16, 3, 8, 8).astype(np.float32))
    y = jnp.asarray((np.asarray(x).mean(axis=(1, 2, 3)) > 0).astype(np.int32))

    opt = optim.AdamW(3e-3)
    state = train.TrainState.init(model, opt)

    def loss_fn(m, batch, key, tr):
        xb, yb = batch
        logits, m = m.forward(xb, key=key, train=tr)
        return nn.losses.cross_entropy_loss(logits, yb), jnp.asarray(1.0), m

    step = jax.jit(train.make_train_step(opt, loss_fn), donate_argnums=(0,))
    first = None
    for i in range(60):
        state, (loss, _) = step(state, (x, y), jax.random.PRNGKey(i))
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.5, (first, float(loss))


def test_vit_remat_matches_plain():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 8, 8))
    a, _ = _tiny().forward(x)
    b, _ = _tiny(remat=True).forward(x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
