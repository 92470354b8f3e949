"""Training-loop integration tests.

Mirrors the reference's lamp-data suite (ioloop.test.scala, mlp.test.scala,
batchstream.test.scala): tiny models trained end-to-end with validation,
checkpointing round-trips, SWA, gradient accumulation, and batch-stream
combinator laws.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lamp_tpu import data, io as lio, nn, optim, train


def _toy_classification(n=256, d=8, classes=3, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).astype(np.float32)
    w = rng.randn(d, classes)
    y = np.argmax(x @ w + 0.1 * rng.randn(n, classes), axis=1).astype(np.int32)
    return x, y


def _mlp_loss(model, batch, key, train_mode):
    x, y = batch
    logits, new_model = model.forward(x, key=key, train=train_mode)
    loss = nn.losses.cross_entropy_loss(logits, y)
    return loss, jnp.asarray(x.shape[0], jnp.float32), new_model


def test_epochs_end_to_end_with_validation_and_min_snapshot():
    x, y = _toy_classification()
    xv, yv = x[:64], y[:64]
    xt, yt = x[64:], y[64:]
    model = nn.MLP(8, 32, 3, key=jax.random.PRNGKey(0), norm=True, dropout=0.1)
    rng = np.random.default_rng(0)

    result = train.epochs(
        model=model,
        optimizer=optim.AdamW(1e-2),
        loss_fn=_mlp_loss,
        train_batches=lambda e: data.minibatches_from_full(32, xt, yt, rng=rng),
        validation_batches=lambda e: data.minibatches_from_full(32, xv, yv),
        epochs=15,
        key=jax.random.PRNGKey(1),
        return_min_validation_loss_model=True,
        prefetch=False,
    )
    assert len(result.learning_curve) == 15
    first_train = result.learning_curve[0][1]
    last_train = result.learning_curve[-1][1]
    assert last_train < 0.5 * first_train
    assert result.min_validation_loss is not None
    assert result.min_validation_state is not None

    # best model achieves decent accuracy
    best = result.min_validation_state.model
    acc = float(jnp.mean(jnp.argmax(best(xv), -1) == yv))
    assert acc > 0.8, acc


def test_gradient_accumulation_matches_large_batch():
    """Accumulated gradients over k sub-batches == one big batch step for
    example-weighted losses (reference semantics, IOLoops.scala:638)."""
    x, y = _toy_classification(n=64)
    model = nn.MLP(8, 16, 3, key=jax.random.PRNGKey(0), norm=False)
    opt = optim.SGDW(learning_rate=0.1)

    state0 = train.TrainState.init(model, opt)
    step_full = jax.jit(train.make_train_step(opt, _mlp_loss))
    step_accum = jax.jit(train.make_train_step(opt, _mlp_loss,
                                               accumulation_steps=4))

    key = jax.random.PRNGKey(2)
    s1, (loss1, _) = step_full(state0, (x, y), key)
    stacked = (x.reshape(4, 16, 8), y.reshape(4, 16))
    s2, (loss2, _) = step_accum(state0, stacked, key)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_accumulation_unroll_matches_scan():
    """The unrolled accumulation program (default for small static counts)
    must produce the same loss and parameters as the lax.scan form it
    replaced — same per-micro-batch PRNG splits, same example weighting."""
    x, y = _toy_classification(n=64)
    model = nn.MLP(8, 16, 3, key=jax.random.PRNGKey(0), norm=False)
    opt = optim.SGDW(learning_rate=0.1)

    state0 = train.TrainState.init(model, opt)
    step_unroll = jax.jit(train.make_train_step(
        opt, _mlp_loss, accumulation_steps=4, accumulation_unroll=True))
    step_scan = jax.jit(train.make_train_step(
        opt, _mlp_loss, accumulation_steps=4, accumulation_unroll=False))

    stacked = (x.reshape(4, 16, 8), y.reshape(4, 16))
    key = jax.random.PRNGKey(2)
    s1, (loss1, n1) = step_unroll(state0, stacked, key)
    s2, (loss2, n2) = step_scan(state0, stacked, key)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    assert float(n1) == float(n2)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_chained_train_step_matches_sequential():
    """K optimizer steps fused into one lax.scan dispatch must equal K
    sequential make_train_step calls exactly."""
    x, y = _toy_classification(n=96)
    model = nn.MLP(8, 16, 3, key=jax.random.PRNGKey(0), norm=False)
    opt = optim.AdamW(1e-2)
    K, B = 3, 32
    batches = [(x[i * B:(i + 1) * B], y[i * B:(i + 1) * B]) for i in range(K)]

    step = jax.jit(train.make_train_step(opt, _mlp_loss))
    s1 = train.TrainState.init(model, opt)
    key = jax.random.PRNGKey(1)
    k = key
    losses = []
    for b in batches:
        k, sub = jax.random.split(k)
        s1, (l, n) = step(s1, b, sub)
        losses.append(float(l))

    chained = jax.jit(train.make_chained_train_step(opt, _mlp_loss))
    s2 = train.TrainState.init(model, opt)
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(v) for v in xs]), *batches
    )
    s2, (mean_loss, total) = chained(s2, stacked, key)

    assert float(total) == K * B
    np.testing.assert_allclose(float(mean_loss), np.mean(losses), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_epochs_steps_per_call():
    """epochs(steps_per_call=4) trains to the same kind of loss as plain."""
    x, y = _toy_classification()
    model = nn.MLP(8, 32, 3, key=jax.random.PRNGKey(0), norm=False)
    rng = np.random.default_rng(0)
    result = train.epochs(
        model=model,
        optimizer=optim.AdamW(1e-2),
        loss_fn=_mlp_loss,
        train_batches=lambda e: data.minibatches_from_full(32, x, y, rng=rng),
        epochs=6,
        steps_per_call=4,  # 8 batches/epoch -> two chained calls of 4
        key=jax.random.PRNGKey(1),
    )
    first = result.learning_curve[0][1]
    last = result.learning_curve[-1][1]
    assert last < first * 0.7, (first, last)


def test_adversarial_and_perturbed_loss_calculations():
    x, y = _toy_classification(n=64)
    model = nn.MLP(8, 16, 3, key=jax.random.PRNGKey(0), norm=False)
    opt = optim.SGDW(learning_rate=0.05)
    for mode in ["adversarial", "perturbed"]:
        step = jax.jit(train.make_train_step(opt, _mlp_loss, loss_calculation=mode))
        state = train.TrainState.init(model, opt)
        for i in range(30):
            state, (loss, _) = step(state, (x, y), jax.random.PRNGKey(i))
        assert float(loss) < 1.0, (mode, float(loss))


def test_checkpoint_roundtrip_and_resume():
    x, y = _toy_classification()
    model = nn.MLP(8, 16, 3, key=jax.random.PRNGKey(0))
    opt = optim.AdamW(1e-2)
    state = train.TrainState.init(model, opt)
    step = jax.jit(train.make_train_step(opt, _mlp_loss))
    for i in range(5):
        state, _ = step(state, (x, y), jax.random.PRNGKey(i))

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.json")
        lio.save_loop_state(
            path, model=state.model, optimizer_state=state.opt_state,
            epoch=5, learning_curve=[(0, 1.0, None, None)],
        )
        template = train.TrainState.init(model, opt)
        loaded, meta = lio.load_loop_state(
            path, model_template=template.model,
            optimizer_state_template=template.opt_state,
        )
        assert meta["epoch"] == 5
        for a, b in zip(
            jax.tree_util.tree_leaves(loaded["model"]),
            jax.tree_util.tree_leaves(state.model),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # resume continues identically
        params, rest = nn.partition_params(loaded["model"])
        resumed = train.TrainState(params, rest, loaded["optimizer_state"],
                                   state.step)
        s1, (l1, _) = step(state, (x, y), jax.random.PRNGKey(99))
        s2, (l2, _) = step(resumed, (x, y), jax.random.PRNGKey(99))
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_swa_improves_or_matches():
    x, y = _toy_classification()
    model = nn.MLP(8, 16, 3, key=jax.random.PRNGKey(0), norm=True)
    rng = np.random.default_rng(0)
    opt = optim.AdamW(5e-3)

    result = train.epochs(
        model=model, optimizer=opt, loss_fn=_mlp_loss,
        train_batches=lambda e: data.minibatches_from_full(32, x, y, rng=rng),
        epochs=8, key=jax.random.PRNGKey(1), prefetch=False,
    )
    swa_state, losses = train.swa_epochs(
        state=result.state, optimizer=opt, loss_fn=_mlp_loss,
        train_batches=lambda e: data.minibatches_from_full(32, x, y, rng=rng),
        epochs=4, key=jax.random.PRNGKey(2),
        swa_schedule=train.cyclic_swa_schedule(1.0, 0.1, 2),
        prefetch=False,
    )
    # recalibrate BN stats with the averaged weights
    def fwd_train(model, batch):
        _, new_model = model.forward(batch[0], key=jax.random.PRNGKey(0),
                                     train=True)
        return new_model

    swa_state = train.recalibrate_batchnorm(
        swa_state, data.minibatches_from_full(64, x, y), fwd_train
    )
    acc = float(jnp.mean(jnp.argmax(swa_state.model(x), -1) == y))
    assert acc > 0.8, acc


def test_batchstream_combinators():
    s = data.from_function(10, lambda i: i)
    assert s.drain_to_list() == list(range(10))
    assert s.take(3).drain_to_list() == [0, 1, 2]
    assert s.every_nth(2, 0).drain_to_list() == [0, 2, 4, 6, 8]
    assert s.every_nth(2, 1).drain_to_list() == [1, 3, 5, 7, 9]
    assert s.map(lambda x: x * 2).drain_to_list() == [0, 2, 4, 6, 8, 10, 12, 14, 16, 18]
    assert s.concat(s).drain_to_list() == list(range(10)) * 2
    assert s.repeat_or_take(13).drain_to_list() == list(range(10)) + [0, 1, 2]
    assert s.fold_left(0, lambda a, b: a + b) == 45
    # restartable: a second pass yields the same
    assert s.drain_to_list() == list(range(10))


def test_minibatches_shapes_and_droplast():
    x = np.arange(100).reshape(50, 2).astype(np.float32)
    y = np.arange(50).astype(np.int32)
    s = data.minibatches_from_full(16, x, y, drop_last=True)
    batches = s.drain_to_list()
    assert len(batches) == 3
    assert all(b[0].shape == (16, 2) for b in batches)
    s2 = data.minibatches_from_full(16, x, y, drop_last=False)
    assert len(s2.drain_to_list()) == 4


def test_staged_loader():
    full = np.arange(64).astype(np.float32)
    buckets = [list(range(0, 32)), list(range(32, 64))]

    s = data.staged_from_indices(
        buckets, batches_per_bucket=4,
        load_bucket=lambda idx: (full[idx],),
        slice_batch=lambda bucket, sel: bucket[0][sel],
    )
    batches = s.drain_to_list()
    assert len(batches) == 8
    seen = np.concatenate(batches)
    assert sorted(seen.tolist()) == list(range(64))


def test_prefetch_propagates_stream_errors():
    """An exception in the stream/worker thread must surface to the
    consumer, not masquerade as a clean end-of-stream."""

    def bad_stream():
        yield np.ones((2, 2), np.float32)
        raise RuntimeError("corrupt batch")

    it = data.prefetch_to_device(bad_stream())
    next(it)
    with pytest.raises(RuntimeError, match="corrupt batch"):
        next(it)


def test_recalibrate_batchnorm_resets_stats():
    """reset=True replaces the stale running stats with the pass's
    statistics (first batch momentum 1.0), not a ~10% nudge."""
    import jax

    bn = nn.BatchNorm.init(3, momentum=0.1)
    # poison the running stats far from the data distribution
    import dataclasses

    bn = dataclasses.replace(
        bn,
        running_mean=jnp.full((3,), 100.0),
        running_var=jnp.full((3,), 100.0),
    )
    state = train.TrainState.init(bn, optim.AdamW(1e-3))
    rng = np.random.RandomState(0)
    batches = [jnp.asarray(rng.randn(64, 3), jnp.float32) for _ in range(3)]

    def fwd(m, b):
        _, nm = m.forward(b, train=True)
        return nm

    new_state = train.recalibrate_batchnorm(state, batches, fwd, reset=True)
    mean = np.asarray(new_state.model.running_mean)
    assert np.all(np.abs(mean) < 1.0), mean  # ~N(0,1) data, stale 100 gone


def test_tokenizer_vocab_size_covers_unknown():
    codec = data.ByteSegmentCodec.train(b"aaabbbab", 0, 8)
    toks = codec.encode(b"axyz")  # x/y/z unseen
    assert int(np.max(toks)) < codec.vocab_size


def test_prefetch_to_device():
    s = data.from_function(5, lambda i: (np.full((2, 2), i, np.float32),))
    out = list(data.prefetch_to_device(s, size=2))
    assert len(out) == 5
    assert isinstance(out[0][0], jax.Array)
    np.testing.assert_array_equal(np.asarray(out[3][0]), np.full((2, 2), 3))


def test_safetensors_roundtrip():
    import tempfile

    tensors = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "b": jnp.ones((4,), jnp.bfloat16),
        "c": jnp.array([1, 2, 3], jnp.int32),
    }
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.safetensors")
        lio.write_safetensors(path, tensors, metadata={"format": "pt"})
        back = lio.read_safetensors(path)
        assert set(back) == {"a", "b", "c"}
        np.testing.assert_array_equal(np.asarray(back["a"]), np.asarray(tensors["a"]))
        assert back["b"].dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(back["b"], dtype=np.float32),
            np.asarray(tensors["b"], dtype=np.float32),
        )


def test_tensor_blob_bf16_and_alignment():
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "blob.bin")
        tensors = [
            jnp.ones((3,), jnp.bfloat16),   # 6 bytes -> padded to 8
            jnp.arange(4, dtype=jnp.float32),
        ]
        desc = lio.write_tensor_blob(path, tensors)
        assert desc[1]["offset"] % 8 == 0
        back = lio.read_tensor_blob(path, desc)
        np.testing.assert_array_equal(
            back[1], np.arange(4, dtype=np.float32)
        )


def test_async_checkpointer_survives_donation(tmp_path):
    """AsyncCheckpointer snapshots with device copies, so the checkpoint is
    intact even when the caller's buffers are donated away immediately
    after ``save`` (the train-step donation pattern)."""
    from lamp_tpu import io as lio2

    ck = lio2.AsyncCheckpointer()
    x = jnp.arange(16, dtype=jnp.float32)
    tree = {"w": x, "step": 7}
    path = str(tmp_path / "async_ckpt")
    ck.save(path, tree)
    # donate x away: after this dispatch the original buffer is invalid
    bump = jax.jit(lambda a: a + 1.0, donate_argnums=(0,))
    x2 = bump(x)
    ck.wait()
    loaded = lio2.load_pytree(path, {"w": x2, "step": 0})
    np.testing.assert_array_equal(
        np.asarray(loaded["w"]), np.arange(16, dtype=np.float32)
    )
    assert loaded["step"] == 7


def test_async_checkpointer_propagates_errors(tmp_path):
    from lamp_tpu import io as lio2

    ck = lio2.AsyncCheckpointer()

    def boom(path, tree):
        raise RuntimeError("disk full")

    ck.save(str(tmp_path / "x"), {"a": jnp.zeros(2)}, save_fn=boom)
    with pytest.raises(RuntimeError, match="disk full"):
        ck.wait()
    # the error is consumed; the checkpointer is reusable
    ck.save(str(tmp_path / "y"), {"a": jnp.zeros(2)})
    ck.wait()


def test_background_checkpoint(tmp_path):
    import time

    from lamp_tpu import io as lio2

    model = nn.MLP(4, 8, 2, key=jax.random.PRNGKey(0))
    opt = optim.AdamW(1e-3)
    state = train.TrainState.init(model, opt)
    path = str(tmp_path / "bg_ckpt")
    lio2.save_loop_state(
        path, model=state.model, optimizer_state=state.opt_state, epoch=1,
        background=True,
    )
    for _ in range(100):
        if os.path.exists(path + ".meta"):
            break
        time.sleep(0.1)
    loaded, meta = lio2.load_loop_state(
        path, model_template=state.model,
        optimizer_state_template=state.opt_state,
    )
    assert meta["epoch"] == 1


def test_chained_steps_handle_ragged_tail():
    """steps_per_call > 1 with drop_last=False: the short final batch can't
    stack with full ones — the buffer flushes instead of crashing."""
    x, y = _toy_classification(n=100)  # 100 = 3x32 + 4 with batch 32
    model = nn.MLP(8, 16, 3, key=jax.random.PRNGKey(0), norm=False)
    opt = optim.SGDW(learning_rate=0.05)
    state = train.TrainState.init(model, opt)
    chained = jax.jit(train.make_chained_train_step(opt, _mlp_loss))
    stream = lambda: data.minibatches_from_full(32, x, y, drop_last=False)
    state, loss, n, _ = train.one_epoch(
        state, stream(), chained, jax.random.PRNGKey(1), steps_per_call=2,
        prefetch=False,
    )
    assert n == 100.0
    assert np.isfinite(loss)


def test_ema_tracks_and_swaps():
    """EMA shadow: warmup correction averages fast early; converged params
    pull the shadow toward them; swap is reversible."""
    from lamp_tpu.train import ema_init, ema_params, ema_swap, ema_update

    params = {"w": jnp.full((4,), 2.0, jnp.bfloat16), "none": None}
    ema = ema_init(params)
    assert ema["w"].dtype == jnp.float32
    # constant params: shadow converges to them
    for t in range(1, 200):
        ema = ema_update(ema, params, decay=0.99, step=t)
    np.testing.assert_allclose(np.asarray(ema["w"]), 2.0, atol=1e-3)
    # warmup: after 1 step with step-correction, shadow moved substantially
    e2 = ema_update(ema_init({"w": jnp.zeros((4,))}),
                    {"w": jnp.ones((4,))}, decay=0.999, step=1)
    assert float(e2["w"][0]) > 0.5
    # swap returns params-dtype average and re-shadows the raw weights
    avg, shadow = ema_swap(ema, params)
    assert avg["w"].dtype == jnp.bfloat16
    assert shadow["w"].dtype == jnp.float32


def test_resumable_epochs_matches_uninterrupted(tmp_path):
    """Kill-and-resume produces the SAME training trajectory as an
    uninterrupted run: params, learning curve, schedule state and the
    min-validation snapshot all come back bitwise-identical (the per-epoch
    PRNG stream is replayed, the rest is checkpointed)."""
    x, y = _toy_classification()
    xv, yv = x[:64], y[:64]
    xt, yt = x[64:], y[64:]
    model = nn.MLP(8, 32, 3, key=jax.random.PRNGKey(0), norm=True,
                   dropout=0.1)

    def common():
        return dict(
            loss_fn=_mlp_loss,
            train_batches=lambda e: data.minibatches_from_full(
                32, xt, yt, rng=np.random.default_rng(e)
            ),
            validation_batches=lambda e: data.minibatches_from_full(
                32, xv, yv
            ),
            key=jax.random.PRNGKey(1),
            learning_rate_schedule=optim.schedules.reduce_lr_on_plateau(
                patience=1, factor=0.5
            ),
            return_min_validation_loss_model=True,
            prefetch=False,
        )

    ref = train.epochs(model=model, optimizer=optim.AdamW(1e-2), epochs=6,
                       **common())

    # "preempted" run: checkpoints through epoch 2, then a fresh process
    # resumes from the directory and finishes
    ckdir = str(tmp_path / "ck")
    train.resumable_epochs(checkpoint_dir=ckdir, model=model,
                           optimizer=optim.AdamW(1e-2), epochs=3, **common())
    assert train.latest_loop_checkpoint(ckdir) is not None
    res = train.resumable_epochs(checkpoint_dir=ckdir, model=model,
                                 optimizer=optim.AdamW(1e-2), epochs=6,
                                 **common())

    assert len(res.learning_curve) == 6
    assert [c[0] for c in res.learning_curve] == list(range(6))
    np.testing.assert_allclose(
        [c[1] for c in res.learning_curve],
        [c[1] for c in ref.learning_curve], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(res.state.params),
                    jax.tree_util.tree_leaves(ref.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert res.min_validation_loss == pytest.approx(ref.min_validation_loss)
    assert res.min_validation_epoch == ref.min_validation_epoch
    for a, b in zip(
        jax.tree_util.tree_leaves(res.min_validation_state.params),
        jax.tree_util.tree_leaves(ref.min_validation_state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # keep= pruning left only the newest two checkpoints
    epochs_on_disk = sorted(
        int(n.split("-")[1]) for n in os.listdir(ckdir)
        if n.startswith("epoch-") and n.split("-")[1].isdigit()
    )
    assert epochs_on_disk == [4, 5]

    # a completed run resumes to a no-op (returns the checkpointed result)
    res2 = train.resumable_epochs(checkpoint_dir=ckdir, model=model,
                                  optimizer=optim.AdamW(1e-2), epochs=6,
                                  **common())
    assert len(res2.learning_curve) == 6
