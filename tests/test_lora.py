"""LoRA adapter tests: freezing, training, merging."""

import jax
import jax.numpy as jnp
import numpy as np

from lamp_tpu import nn, optim, train


def test_lora_inject_preserves_forward_and_freezes_base():
    key = jax.random.PRNGKey(0)
    model = nn.MLP(6, 16, 3, key=key, norm=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 6))
    y0 = model(x)

    tuned = nn.lora_inject(model, rank=4, key=jax.random.PRNGKey(2))
    y1 = tuned(x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    # only the A/B factors are trainable
    params, rest = nn.partition_params(tuned)
    n_train = sum(
        p.size for p in jax.tree_util.tree_leaves(params) if p is not None
    )
    assert n_train == nn.lora_parameter_count(tuned)
    assert n_train < nn.parameter_count(model)


def test_lora_match_filter():
    model = nn.LanguageModelModule.init(
        vocab_size=17, context_length=8, num_blocks=2, embed_dim=16,
        attention_heads=2, key=jax.random.PRNGKey(0),
    )
    tuned = nn.lora_inject(
        model, rank=2, key=jax.random.PRNGKey(1),
        match=lambda p: p.endswith("w_q") or p.endswith("w_v"),
    )
    n_adapted = nn.lora_parameter_count(tuned)
    # 2 blocks x 2 projections x (16*2 + 2*16)
    assert n_adapted == 2 * 2 * (16 * 2 + 2 * 16)
    # everything else still a plain Linear
    assert type(tuned.encoder.blocks[0].attention.w_k) is nn.Linear
    assert type(tuned.encoder.blocks[0].attention.w_q) is nn.LoRALinear


def test_lora_training_updates_only_adapters_and_merges():
    key = jax.random.PRNGKey(0)
    model = nn.MLP(5, 32, 1, key=key, norm=False)
    tuned = nn.lora_inject(model, rank=4, key=jax.random.PRNGKey(1))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 5).astype(np.float32))
    w_true = jnp.asarray(rng.randn(5, 1).astype(np.float32))
    y = x @ w_true

    opt = optim.AdamW(1e-2)

    def loss_fn(m, batch, key, train_mode):
        bx, by = batch
        out, new_m = m.forward(bx, key=key, train=train_mode)
        return jnp.mean((out - by) ** 2), jnp.float32(bx.shape[0]), new_m

    state = train.TrainState.init(tuned, opt)
    step = jax.jit(train.make_train_step(opt, loss_fn))
    losses = []
    for i in range(60):
        state, (loss, _) = step(state, (x, y), jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5

    trained = state.model
    # base weights are bit-identical to the originals
    for blk_before, blk_after in zip(
        jax.tree_util.tree_leaves(nn.partition_params(tuned)[1]),
        jax.tree_util.tree_leaves(nn.partition_params(trained)[1]),
    ):
        np.testing.assert_array_equal(
            np.asarray(blk_before), np.asarray(blk_after)
        )
    # adapters moved
    assert float(jnp.abs(
        trained.layers[0].lora_b  # type: ignore[attr-defined]
    ).sum()) > 0

    merged = nn.lora_merge(trained)
    assert type(merged.layers[0]) is nn.Linear
    np.testing.assert_allclose(
        np.asarray(trained(x)), np.asarray(merged(x)), atol=2e-5, rtol=2e-5
    )


def test_qlora_inject_quantizes_base_and_trains_adapters():
    key = jax.random.PRNGKey(0)
    model = nn.MLP(8, 256, 1, key=key, norm=False)
    tuned = nn.qlora_inject(model, rank=4, key=jax.random.PRNGKey(1), bits=4)

    # base weights are now int4-packed buffers; adapters are the only params
    first = tuned.layers[0]
    assert type(first) is nn.QLoRALinear
    assert first.w_q.dtype == jnp.uint8 and first.bits == 4
    params, _ = nn.partition_params(tuned)
    n_train = sum(
        p.size for p in jax.tree_util.tree_leaves(params) if p is not None
    )
    assert n_train == nn.lora_parameter_count(tuned)

    # at init the adapter contributes zero: forward == quantized base alone
    x = jax.random.normal(jax.random.PRNGKey(2), (16, 8))
    y_q = tuned(x)
    # quantization error vs the bf16 base is bounded
    rel = float(jnp.linalg.norm(y_q - model(x)) / jnp.linalg.norm(model(x)))
    assert rel < 0.3  # int4 error compounds through two layers

    # training moves only the adapters and reduces the loss
    rng = np.random.RandomState(0)
    bx = jnp.asarray(rng.randn(64, 8).astype(np.float32))
    by = jnp.asarray(rng.randn(64, 1).astype(np.float32))
    opt = optim.AdamW(1e-2)

    def loss_fn(m, batch, key, train_mode):
        xx, yy = batch
        out, new_m = m.forward(xx, key=key, train=train_mode)
        return jnp.mean((out - yy) ** 2), jnp.float32(xx.shape[0]), new_m

    state = train.TrainState.init(tuned, opt)
    step = jax.jit(train.make_train_step(opt, loss_fn))
    losses = []
    for i in range(50):
        state, (loss, _) = step(state, (bx, by), jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7

    trained = state.model
    np.testing.assert_array_equal(
        np.asarray(trained.layers[0].w_q), np.asarray(first.w_q)
    )
    assert float(jnp.abs(trained.layers[0].lora_b).sum()) > 0

    # merge folds adapter into a dequantized plain Linear
    merged = nn.lora_merge(trained)
    assert type(merged.layers[0]) is nn.Linear
    np.testing.assert_allclose(
        np.asarray(trained(bx)), np.asarray(merged(bx)), atol=3e-3, rtol=3e-3
    )


def test_qlora_int8_and_odd_dim_fallback():
    key = jax.random.PRNGKey(0)
    lin = nn.Linear.init(7, 6, key=key)  # odd K: int4 falls back to int8
    q = nn.QLoRALinear.wrap(lin, 2, key=jax.random.PRNGKey(1), bits=4)
    assert q.bits == 8 and q.w_q.dtype == jnp.int8
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 7))
    rel = float(jnp.linalg.norm(q(x) - lin(x)) / jnp.linalg.norm(lin(x)))
    assert rel < 0.05  # int8 per-channel is near-lossless


def test_frozen_wrapper_excludes_leaves():
    key = jax.random.PRNGKey(0)
    lin = nn.Linear.init(4, 3, key=key)
    frozen = nn.Frozen(lin)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4))
    np.testing.assert_allclose(np.asarray(lin(x)), np.asarray(frozen(x)))
    params, rest = nn.partition_params(frozen)
    assert all(p is None for p in jax.tree_util.tree_leaves(params, is_leaf=lambda v: v is None))
    # attribute delegation
    assert frozen.weight.shape == (4, 3)


def test_recursive_combinator():
    lin = nn.Linear.init(4, 4, key=jax.random.PRNGKey(0))
    rec = nn.Recursive.init(lin, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4))
    y, _ = rec.forward(x)
    want = x
    for _ in range(3):
        want = lin(want)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-6)
