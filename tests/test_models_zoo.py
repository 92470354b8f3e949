"""Vision zoo + KV-cache generation + profiling tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lamp_tpu import core, data, models, nn, optim, train


def test_resnet_cifar_shapes_and_train_step():
    model = models.resnet_cifar(10, key=jax.random.PRNGKey(0), dropout=0.1)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32))
    y = model(x)
    assert y.shape == (4, 10)
    # log-softmax output
    np.testing.assert_allclose(
        np.exp(np.asarray(y, np.float64)).sum(1), 1.0, rtol=1e-4
    )

    # one train step decreases loss on a tiny overfit problem
    labels = jnp.array([0, 1, 2, 3])

    def loss_fn(m, batch, key, train_mode):
        xx, yy = batch
        out, nm = m.forward(xx, key=key, train=train_mode)
        return nn.losses.nll_loss(out, yy), jnp.asarray(4.0), nm

    opt = optim.AdamW(1e-3)
    state = train.TrainState.init(model, opt)
    step = jax.jit(train.make_train_step(opt, loss_fn))
    losses = []
    for i in range(10):
        state, (loss, _) = step(state, (x, labels), jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_lenet():
    model = models.lenet(10, key=jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    assert model(x).shape == (2, 10)


def test_kv_cache_matches_full_forward_logits():
    """Teacher-forced: per-position logits from the KV-cached decode must
    match the full forward pass (up to f32 accumulation noise)."""
    model = nn.LanguageModelModule.init(
        vocab_size=19, context_length=24, num_blocks=2, embed_dim=16,
        attention_heads=2, key=jax.random.PRNGKey(0),
    )
    tokens = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
    logits_full, _ = model.forward(tokens, train=False)

    cache = models.init_cache(model, 1)
    stepwise = []
    for t in range(tokens.shape[1]):
        logits, cache = models.decode_step(model, cache, tokens[:, t])
        stepwise.append(np.asarray(logits))
    stepwise = np.stack(stepwise, axis=1)
    np.testing.assert_allclose(
        np.asarray(logits_full), stepwise, atol=5e-3, rtol=5e-3
    )


def test_kv_cache_greedy_generation_consistent():
    """Greedy cached generation is deterministic and in-vocab."""
    model = nn.LanguageModelModule.init(
        vocab_size=19, context_length=24, num_blocks=2, embed_dim=16,
        attention_heads=2, key=jax.random.PRNGKey(0),
    )
    prefix = np.array([[1, 2, 3, 4, 5]])
    a = models.generate(model, prefix, length=8, temperature=0.0)
    b = models.generate(model, prefix, length=8, temperature=0.0)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, 8) and a.min() >= 0 and a.max() < 19


def test_kv_cache_generation_batch():
    model = nn.LanguageModelModule.init(
        vocab_size=11, context_length=16, num_blocks=1, embed_dim=16,
        attention_heads=2, key=jax.random.PRNGKey(0),
    )
    prefix = np.array([[1, 2], [3, 4], [5, 6]])
    out = models.generate(model, prefix, length=5, temperature=1.0,
                          key=jax.random.PRNGKey(1))
    assert out.shape == (3, 5)
    assert out.min() >= 0 and out.max() < 11


def test_measure_time_and_memory_report():
    x = jnp.ones((128, 128))
    out, dt = core.measure_time(lambda a: a @ a, x)
    assert dt > 0 and out.shape == (128, 128)

    model = nn.MLP(8, 16, 2, key=jax.random.PRNGKey(0))
    rep = core.model_memory_report(model)
    assert rep["param_tensors"] > 0
    assert rep["buffer_tensors"] == 4  # 2 BatchNorms x (mean, var)

    live = core.live_buffer_report()
    assert live["total_bytes"] > 0


def test_tensor_lifetimes():
    """Per-tensor birth timestamps + creation stack traces (reference
    TensorLogger.scala:11-237 semantics)."""
    import time as _time

    tl = core.TensorLifetimes()
    tl.scan()
    marker = jnp.full((333, 7), 1.5)  # distinctive shape, born after scan
    _time.sleep(0.02)
    tl.scan()
    rep = tl.report(top=1000)
    assert rep["live_count"] > 0
    assert rep["live_bytes"] > 0
    assert sum(rep["age_histogram"].values()) == rep["live_count"]
    mine = [r for r in rep["top"] if r["shape"] == (333, 7)]
    assert mine, "marker tensor not in report"
    assert mine[0]["age_s"] >= 0.0
    # the creation site points at THIS test file, not jax internals
    site = core.creation_site(marker)
    assert "test_models_zoo.py" in site or site in ("<unknown>",), site
    del marker, mine, rep
    tl.scan()
    assert all(
        r["shape"] != (333, 7) for r in tl.report(top=1000)["top"]
    ), "dead tensor still reported"


def test_peek_passthrough():
    p = core.Peek.init("probe")
    x = jnp.ones((3,))
    y, _ = p.forward(x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    # works under jit
    z = jax.jit(lambda a: p.forward(a)[0])(x)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x))
