"""Orbax checkpoint interop: template-directed round trips."""

import jax
import jax.numpy as jnp
import numpy as np

from lamp_tpu import io as lio, nn, optim, train


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a, is_leaf=lambda x: x is None)
    lb = jax.tree_util.tree_leaves(b, is_leaf=lambda x: x is None)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        if x is None:
            assert y is None
            continue
        assert np.asarray(x).dtype == np.asarray(y).dtype
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_orbax_roundtrip_train_state(tmp_path):
    """A full TrainState (ModernLM params in bf16 + AdamW f32 state incl.
    masters and the int step counter) survives save/restore exactly."""
    model = nn.ModernLM.init(
        vocab_size=32, context_length=16, num_blocks=1, embed_dim=32,
        num_heads=2, key=jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    opt = optim.AdamW(1e-3)
    state = train.TrainState.init(model, opt)

    # take one real step so the optimizer state is non-trivial
    def loss_fn(m, batch, key, tr):
        t, y = batch
        return m.loss(t, y), jnp.asarray(1.0), m

    toks = jnp.zeros((2, 16), jnp.int32)
    step = train.make_train_step(opt, loss_fn)
    state, _ = step(state, (toks, toks), jax.random.PRNGKey(1))

    path = str(tmp_path / "ck")
    lio.save_orbax(path, state)

    fresh = train.TrainState.init(
        nn.ModernLM.init(vocab_size=32, context_length=16, num_blocks=1,
                         embed_dim=32, num_heads=2,
                         key=jax.random.PRNGKey(9), dtype=jnp.bfloat16),
        opt)
    restored = lio.load_orbax(path, fresh)
    _trees_equal(restored, state)
    # behaves identically after restore
    a, _ = step(state, (toks, toks), jax.random.PRNGKey(2))
    b, _ = step(restored, (toks, toks), jax.random.PRNGKey(2))
    _trees_equal(a.model, b.model)


def test_orbax_scalars_none_and_numpy(tmp_path):
    tree = {"w": jnp.arange(4.0), "np": np.arange(3, dtype=np.int32),
            "none": None, "count": 7, "f": 2.5}
    path = str(tmp_path / "ck2")
    lio.save_orbax(path, tree)
    template = {"w": jnp.zeros(4), "np": np.zeros(3, np.int32),
                "none": None, "count": 0, "f": 0.0}
    r = lio.load_orbax(path, template)
    assert r["none"] is None
    assert isinstance(r["count"], int) and r["count"] == 7
    assert isinstance(r["f"], float) and r["f"] == 2.5
    assert isinstance(r["np"], np.ndarray)
    np.testing.assert_array_equal(np.asarray(r["w"]), np.arange(4.0))


def test_orbax_overwrite(tmp_path):
    path = str(tmp_path / "ck3")
    lio.save_orbax(path, {"a": jnp.ones(2)})
    lio.save_orbax(path, {"a": jnp.zeros(2)})  # force-replace
    r = lio.load_orbax(path, {"a": jnp.ones(2)})
    np.testing.assert_array_equal(np.asarray(r["a"]), np.zeros(2))
