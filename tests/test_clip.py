"""CLIP / SigLIP contrastive family: losses, training, mesh sharding."""

import jax
import jax.numpy as jnp
import numpy as np

from lamp_tpu import models, nn, optim, train
from lamp_tpu.models import CLIP, clip_loss, siglip_loss


def _tiny_clip(siglip=False, key=jax.random.PRNGKey(0)):
    return CLIP.init(
        image_size=8, patch_size=4, vocab_size=17, context_length=6,
        embed_dim=16, image_blocks=1, image_heads=2, image_width=16,
        text_blocks=1, text_heads=2, text_width=16, key=key, siglip=siglip,
    )


def _batch(b=8, key=jax.random.PRNGKey(1)):
    k1, k2, k3 = jax.random.split(key, 3)
    images = jax.random.normal(k1, (b, 3, 8, 8))
    tokens = jax.random.randint(k2, (b, 6), 0, 17)
    lengths = jax.random.randint(k3, (b,), 2, 7)
    return images, tokens, lengths


def test_clip_embeddings_normalized_and_deterministic():
    m = _tiny_clip()
    images, tokens, lengths = _batch()
    (img, txt), _ = m.forward((images, tokens, lengths))
    assert img.shape == (8, 16) and txt.shape == (8, 16)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(img, axis=-1)), np.ones(8), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(txt, axis=-1)), np.ones(8), atol=1e-5
    )
    # text pooling respects lengths: padding beyond the length is ignored
    tokens2 = tokens.at[:, -1].set((tokens[:, -1] + 1) % 17)
    short = jnp.full((8,), 3)
    t1 = m.encode_text(tokens, short)
    t2 = m.encode_text(tokens2, short)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-6)


def test_clip_loss_values():
    # perfectly aligned pairs at high temperature -> loss below random
    e = jnp.eye(4, 8)
    rand = float(clip_loss(e, jnp.roll(e, 1, axis=0), jnp.asarray(0.0)))
    aligned = float(clip_loss(e, e, jnp.asarray(3.0)))
    assert aligned < 0.1 < rand

    # siglip: hand-computed on a 2x2 case
    img = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    txt = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    t, bias = jnp.asarray(0.0), jnp.asarray(-0.5)
    logits = img @ txt.T + bias
    signs = 2 * jnp.eye(2) - 1
    want = float(jnp.sum(jax.nn.softplus(-signs * logits)) / 2)
    got = float(siglip_loss(img, txt, t, bias))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_clip_trains_to_align_pairs():
    m = _tiny_clip(siglip=False)
    images, tokens, lengths = _batch(b=4)
    opt = optim.AdamW(3e-3)

    def loss_fn(model, batch, key, train_mode):
        (img, txt), new_m = model.forward(batch, key=key, train=train_mode)
        loss = clip_loss(img, txt, model.logit_scale)
        return loss, jnp.float32(batch[0].shape[0]), new_m

    state = train.TrainState.init(m, opt)
    step = jax.jit(train.make_train_step(opt, loss_fn))
    losses = []
    for i in range(30):
        state, (loss, _) = step(
            state, (images, tokens, lengths), jax.random.PRNGKey(i)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5
    # retrieval: each image's best text is its own pair
    (img, txt), _ = state.model.forward((images, tokens, lengths))
    sim = np.asarray(img @ txt.T)
    assert (sim.argmax(axis=1) == np.arange(4)).mean() >= 0.75


def test_clip_and_siglip_losses_match_sharded():
    """Mesh-sharded losses (all-gathered negatives, offset diagonals) must
    equal the single-device loss on the full batch."""
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lamp_tpu import parallel

    mesh = parallel.make_mesh({"dp": 8})
    b, e = 16, 8
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    img = jax.random.normal(k1, (b, e))
    txt = jax.random.normal(k2, (b, e))
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    scale, bias = jnp.asarray(1.3), jnp.asarray(-0.7)

    want_clip = float(clip_loss(img, txt, scale))
    want_sig = float(siglip_loss(img, txt, scale, bias))

    spec = P("dp", None)

    def sharded_clip(a, b_):
        loss = clip_loss(a, b_, scale, axis_name="dp")
        return jax.lax.pmean(loss, "dp")

    def sharded_sig(a, b_):
        loss = siglip_loss(a, b_, scale, bias, axis_name="dp")
        return jax.lax.pmean(loss, "dp")

    sh = NamedSharding(mesh, spec)
    img_s, txt_s = jax.device_put(img, sh), jax.device_put(txt, sh)
    got_clip = float(shard_map(
        sharded_clip, mesh=mesh, in_specs=(spec, spec), out_specs=P()
    )(img_s, txt_s))
    got_sig = float(shard_map(
        sharded_sig, mesh=mesh, in_specs=(spec, spec), out_specs=P()
    )(img_s, txt_s))
    np.testing.assert_allclose(got_clip, want_clip, rtol=1e-5)
    np.testing.assert_allclose(got_sig, want_sig, rtol=1e-5)
