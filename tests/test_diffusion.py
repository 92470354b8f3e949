"""DiT diffusion family: wiring, schedules, training, samplers, CFG."""

import jax
import jax.numpy as jnp
import numpy as np

from lamp_tpu import optim, train
from lamp_tpu.models.diffusion import (
    DiT,
    GaussianDiffusion,
    RectifiedFlow,
    timestep_embedding,
)


def _tiny(num_classes=0):
    return DiT.init(image_size=8, patch_size=4, channels=3, embed_dim=32,
                    num_blocks=2, num_heads=2, num_classes=num_classes,
                    key=jax.random.PRNGKey(0))


def test_forward_shape_and_adaln_zero_identity():
    m = _tiny()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8, 8))
    t = jnp.array([0, 5])
    eps, _ = m.forward((x, t, None))
    assert eps.shape == x.shape
    # adaLN-Zero: the output projection is zero-initialised, so an untrained
    # model predicts exactly zero — proves the gating/zero-init wiring
    np.testing.assert_array_equal(np.asarray(eps), 0.0)


def test_patchify_roundtrip():
    m = _tiny()
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 8, 8))
    np.testing.assert_allclose(np.asarray(m._unpatchify(m._patchify(x))),
                               np.asarray(x), rtol=1e-6)


def test_timestep_embedding_distinct_and_padded():
    e = timestep_embedding(jnp.array([0, 1, 500]), 17)
    assert e.shape == (3, 17)
    assert np.abs(np.asarray(e[0]) - np.asarray(e[2])).max() > 0.1


def test_schedules_monotone():
    for sched in ("linear", "cosine"):
        d = GaussianDiffusion(1000, schedule=sched)
        acp = np.asarray(d.alphas_cumprod)
        assert (np.diff(acp) < 0).all() and acp[0] > 0.9 and acp[-1] < 0.1
    # q_sample at t=0 is close to x0
    d = GaussianDiffusion(100)
    x0 = jnp.ones((1, 3, 8, 8))
    xt = d.q_sample(x0, jnp.array([0]), jnp.zeros_like(x0))
    assert float(jnp.abs(xt - x0).max()) < 0.05


def test_training_loss_decreases():
    m = _tiny(num_classes=4)
    d = GaussianDiffusion(50)
    opt = optim.AdamW(2e-3)
    x0 = jax.random.normal(jax.random.PRNGKey(3), (4, 3, 8, 8))
    labels = jnp.array([0, 1, 2, 3])
    state = train.TrainState.init(m, opt)

    def loss_fn(model, batch, key, tr):
        xb, yb = batch
        return (d.loss(model, xb, key=key, labels=yb, cfg_dropout=0.2),
                jnp.asarray(1.0), model)

    step = jax.jit(train.make_train_step(opt, loss_fn), donate_argnums=(0,))
    first = None
    for i in range(40):
        state, (loss, _) = step(state, (x0, labels), jax.random.PRNGKey(100 + i))
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.9, (first, float(loss))


def test_ddim_sampler_jits_and_is_deterministic():
    m = _tiny()
    d = GaussianDiffusion(20)
    sample = jax.jit(lambda k: d.ddim_sample(m, key=k, batch=2, num_steps=5))
    a = np.asarray(sample(jax.random.PRNGKey(7)))
    b = np.asarray(sample(jax.random.PRNGKey(7)))
    c = np.asarray(sample(jax.random.PRNGKey(8)))
    assert a.shape == (2, 3, 8, 8) and np.isfinite(a).all()
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-3


def test_png_grid_roundtrip(tmp_path):
    import struct
    import zlib

    from lamp_tpu.data.images import save_image_grid, write_png

    img = (np.arange(5 * 7 * 3) % 256).reshape(5, 7, 3).astype(np.uint8)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    raw = open(p, "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", raw[16:24])
    assert (w, h) == (7, 5)
    idat = raw[raw.index(b"IDAT") + 4:raw.index(b"IEND") - 8]
    rows = zlib.decompress(idat)
    got = np.frombuffer(rows, np.uint8).reshape(5, 7 * 3 + 1)[:, 1:]
    np.testing.assert_array_equal(got.reshape(5, 7, 3), img)

    save_image_grid(np.random.RandomState(0).rand(5, 3, 4, 4), str(tmp_path / "g.png"))
    assert (tmp_path / "g.png").stat().st_size > 100


def test_rectified_flow_trains_and_samples():
    m = _tiny(num_classes=4)
    rf = RectifiedFlow()
    x1 = jax.random.normal(jax.random.PRNGKey(11), (4, 3, 8, 8))
    labels = jnp.array([0, 1, 2, 3])

    loss0 = float(rf.loss(m, x1, key=jax.random.PRNGKey(0), labels=labels))
    opt = optim.AdamW(2e-3)
    state = train.TrainState.init(m, opt)

    def loss_fn(model, batch, key, tr):
        return (rf.loss(model, batch[0], key=key, labels=batch[1],
                        cfg_dropout=0.1), jnp.asarray(1.0), model)

    step = jax.jit(train.make_train_step(opt, loss_fn), donate_argnums=(0,))
    for i in range(40):
        state, (loss, _) = step(state, (x1, labels), jax.random.PRNGKey(i))
    assert float(loss) < loss0 * 0.9, (loss0, float(loss))

    x = rf.sample(state.model, key=jax.random.PRNGKey(5), batch=2,
                  num_steps=8, labels=jnp.array([1, 2]), guidance_scale=2.0)
    assert x.shape == (2, 3, 8, 8) and np.isfinite(np.asarray(x)).all()


def test_ddpm_sampler_and_cfg():
    m = _tiny(num_classes=4)
    d = GaussianDiffusion(10)
    labels = jnp.array([1, 2])
    x = d.ddpm_sample(m, key=jax.random.PRNGKey(9), batch=2, labels=labels,
                      guidance_scale=3.0)
    assert x.shape == (2, 3, 8, 8) and np.isfinite(np.asarray(x)).all()
    y = d.ddim_sample(m, key=jax.random.PRNGKey(9), batch=2, num_steps=4,
                      labels=labels, guidance_scale=2.0, eta=0.5)
    assert np.isfinite(np.asarray(y)).all()
