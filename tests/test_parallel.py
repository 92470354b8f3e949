"""Distributed/sharding tests on the virtual 8-device CPU mesh.

Mirrors the reference's cluster-free distributed testing strategy
(SURVEY.md §4.4-4.5): the multi-GPU/NCCL logic is exercised in one process.
Here the whole data/tensor/FSDP-parallel story runs on 8 virtual devices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from lamp_tpu import nn, optim, parallel, train


def _toy(n=256, d=8, classes=4, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).astype(np.float32)
    w = rng.randn(d, classes)
    y = np.argmax(x @ w, axis=1).astype(np.int32)
    return x, y


def _loss(model, batch, key, train_mode):
    x, y = batch
    logits, new_model = model.forward(x, key=key, train=train_mode)
    return (
        nn.losses.cross_entropy_loss(logits, y),
        jnp.asarray(x.shape[0], jnp.float32),
        new_model,
    )


def test_mesh_creation():
    mesh = parallel.make_mesh({"dp": 2, "tp": 4})
    assert mesh.shape == {"dp": 2, "tp": 4}
    mesh2 = parallel.make_mesh({"dp": -1})
    assert mesh2.shape == {"dp": 8}


def test_data_parallel_step_matches_single_device():
    """DP over 8 devices must produce the same update as single-device
    (the determinism property the reference asserts for its DP engines)."""
    x, y = _toy()
    model = nn.MLP(8, 16, 4, key=jax.random.PRNGKey(0), norm=False)
    opt = optim.SGDW(learning_rate=0.1)
    state = train.TrainState.init(model, opt)

    # single device
    step1 = jax.jit(train.make_train_step(opt, _loss))
    s1, (l1, _) = step1(state, (x, y), jax.random.PRNGKey(5))

    # 8-way DP
    mesh = parallel.make_mesh({"dp": 8})
    sstate = parallel.shard_train_state(state, mesh)
    step8 = parallel.make_sharded_train_step(opt, _loss, mesh, donate=False)
    batch = parallel.shard_batch((x, y), mesh)
    s8, (l8, _) = step8(sstate, batch, jax.random.PRNGKey(5))

    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s8.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_data_parallel_training_converges():
    x, y = _toy(n=512)
    model = nn.MLP(8, 32, 4, key=jax.random.PRNGKey(0), norm=False)
    opt = optim.AdamW(1e-2)
    mesh = parallel.make_mesh({"dp": 8})
    state = parallel.shard_train_state(train.TrainState.init(model, opt), mesh)
    step = parallel.make_sharded_train_step(opt, _loss, mesh)

    losses = []
    for i in range(40):
        batch = parallel.shard_batch((x, y), mesh)
        state, (loss, _) = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < 0.3 * losses[0]


def test_tensor_parallel_lm_step():
    """LM with megatron-style TP shardings trains on a dp×tp mesh."""
    mesh = parallel.make_mesh({"dp": 2, "tp": 4})
    model = nn.LanguageModelModule.init(
        vocab_size=32, context_length=16, num_blocks=2, embed_dim=32,
        attention_heads=4, key=jax.random.PRNGKey(0),
    )
    opt = optim.AdamW(1e-2)

    def lm_loss_fn(model, batch, key, train_mode):
        tokens, target = batch
        logits, new_model = model.forward(tokens, key=key, train=train_mode)
        return (
            nn.lm_loss(logits, target),
            jnp.asarray(tokens.shape[0], jnp.float32),
            new_model,
        )

    state = train.TrainState.init(model, opt)
    sstate = parallel.shard_train_state(
        state, mesh, parallel.lm_tensor_parallel_rules("tp")
    )
    # verify params actually sharded over tp
    w_q = sstate.params.encoder.blocks[0].attention.w_q.weight
    assert "tp" in str(w_q.sharding.spec)

    step = parallel.make_sharded_train_step(opt, lm_loss_fn, mesh, donate=False)
    tokens = np.random.RandomState(0).randint(0, 32, (16, 16)).astype(np.int32)
    target = np.roll(tokens, -1, axis=1)
    batch = parallel.shard_batch((tokens, target), mesh)
    losses = []
    for i in range(15):
        sstate, (loss, _) = step(sstate, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_fsdp_sharding():
    mesh = parallel.make_mesh({"fsdp": 8})
    model = nn.MLP(64, 128, 8, key=jax.random.PRNGKey(0), norm=False)
    opt = optim.AdamW(1e-2)
    state = train.TrainState.init(model, opt)
    sstate = parallel.shard_train_state(
        state, mesh, parallel.fsdp_rules(min_size=1024)
    )
    w0 = sstate.params.layers[0].weight
    # 64x128 weight sharded over fsdp on dim 0
    assert "fsdp" in str(w0.sharding.spec)
    # optimizer moments co-sharded with their parameter (ZeRO property)
    mt0 = sstate.opt_state["mt"].layers[0].weight
    assert "fsdp" in str(mt0.sharding.spec)

    x, y = _toy(n=64, d=64, classes=8)
    step = parallel.make_sharded_train_step(opt, _loss, mesh, donate=False)
    batch = parallel.shard_batch((x, y), mesh, "fsdp")
    s2, (loss, _) = step(sstate, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_fsdp_indivisible_dims():
    """VERDICT r1 item 9: a large parameter whose dim 0 is not divisible by
    the fsdp axis must be sharded on another divisible dim, and one with no
    divisible dim must warn (not silently replicate)."""
    import warnings

    mesh = parallel.make_mesh({"fsdp": 8})
    rules = parallel.fsdp_rules(min_size=1024)

    # dim 0 = 1001 (odd vocab) not divisible by 8, dim 1 = 64 is: shard dim 1
    tree = {"emb": jnp.zeros((1001, 64)), "odd": jnp.zeros((1001, 129))}
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        sh = rules.shardings_for(tree, mesh)
    assert sh["emb"].spec == jax.sharding.PartitionSpec(None, "fsdp")
    # no dim of (1001, 129) divides 8: replicated, with a warning naming it
    assert sh["odd"].spec == jax.sharding.PartitionSpec()
    msgs = [str(w.message) for w in caught]
    assert any("odd" in m and "replicating" in m for m in msgs), msgs

    with pytest.raises(ValueError, match="replicating"):
        parallel.fsdp_rules(min_size=1024, on_replicate="raise").shardings_for(
            {"odd": jnp.zeros((1001, 129))}, mesh
        )

    # small params replicate silently (below min_size)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        rules.shardings_for({"b": jnp.zeros((7, 3))}, mesh)
    assert not caught


def test_every_nth_rank_sharding_of_stream():
    """Host-level stream sharding across ranks (reference everyNth usage in
    DDP loaders)."""
    from lamp_tpu import data

    s = data.from_function(16, lambda i: i)
    shards = [s.every_nth(4, r).drain_to_list() for r in range(4)]
    assert sorted(sum(shards, [])) == list(range(16))
    assert all(len(sh) == 4 for sh in shards)


def test_ring_attention_matches_full():
    """Ring attention over an 8-device sequence-parallel mesh must equal
    single-device attention (causal and full)."""
    from lamp_tpu.ops.attention import mha_reference

    mesh = parallel.make_mesh({"sp": 8})
    B, H, S, D = 2, 4, 64, 16
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.float32) for kk in keys)
    for causal in [False, True]:
        ring = parallel.make_ring_attention(mesh, "sp", causal=causal)
        spec = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, None, "sp", None)
        )
        qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
        out = ring(qs, ks, vs)
        ref = mha_reference(q, k, v, causal=causal)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5,
            err_msg=f"causal={causal}",
        )


def test_ring_attention_q_chunked():
    """q_chunk bounds per-step score memory without changing the result,
    forward and backward."""
    from lamp_tpu.ops.attention import mha_reference

    mesh = parallel.make_mesh({"sp": 8})
    B, H, S, D = 1, 2, 128, 16
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.float32) for kk in keys)
    # q_chunk=6 does NOT divide the 16-token local shard: exercises padding
    ring = parallel.make_ring_attention(mesh, "sp", causal=True, q_chunk=6)
    spec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, None, "sp", None)
    )
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    out = ring(qs, ks, vs)
    ref = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)

    g1 = jax.grad(lambda a, b, c: jnp.sum(jnp.square(ring(a, b, c))),
                  argnums=(0, 1, 2))(qs, ks, vs)
    g2 = jax.grad(
        lambda a, b, c: jnp.sum(jnp.square(mha_reference(a, b, c, causal=True))),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4)


def test_ulysses_attention_matches_full():
    """Ulysses all-to-all sequence parallelism over 8 devices must equal
    single-device attention (causal and full), forward and backward."""
    from lamp_tpu.ops.attention import mha_reference

    mesh = parallel.make_mesh({"sp": 8})
    B, H, S, D = 2, 8, 64, 16  # H == axis size boundary case included
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.float32) for kk in keys)
    spec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, None, "sp", None)
    )
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    for causal in [False, True]:
        uly = parallel.make_ulysses_attention(mesh, "sp", causal=causal)
        out = uly(qs, ks, vs)
        ref = mha_reference(q, k, v, causal=causal)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5,
            err_msg=f"causal={causal}",
        )
    uly = parallel.make_ulysses_attention(mesh, "sp", causal=True)
    g1 = jax.grad(lambda a, b, c: jnp.sum(jnp.square(uly(a, b, c))),
                  argnums=(0, 1, 2))(qs, ks, vs)
    g2 = jax.grad(
        lambda a, b, c: jnp.sum(jnp.square(mha_reference(a, b, c, causal=True))),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4)


def test_ulysses_attention_rejects_indivisible_heads():
    import pytest as _pytest

    mesh = parallel.make_mesh({"sp": 8})
    B, H, S, D = 1, 4, 32, 8  # 4 heads on an 8-way axis
    q = jnp.zeros((B, H, S, D))
    uly = parallel.make_ulysses_attention(mesh, "sp")
    spec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, None, "sp", None)
    )
    qs = jax.device_put(q, spec)
    with _pytest.raises(ValueError, match="divisible"):
        uly(qs, qs, qs)


def test_ring_attention_differentiable():
    mesh = parallel.make_mesh({"sp": 8})
    B, H, S, D = 1, 2, 32, 8
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.float32) for kk in keys)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from lamp_tpu.parallel.context import ring_attention
    from lamp_tpu.ops.attention import mha_reference

    spec = P(None, None, "sp", None)

    def loss_ring(q, k, v):
        out = shard_map(
            lambda a, b, c: ring_attention(
                a, b, c, axis_name="sp", n_devices=8, causal=True
            ),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        )(q, k, v)
        return jnp.sum(jnp.square(out))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(mha_reference(q, k, v, causal=True)))

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4)


def test_parallel_run_batch_stream():
    from lamp_tpu import data

    mesh = parallel.make_mesh({"dp": 8})
    model = nn.MLP(4, 8, 2, key=jax.random.PRNGKey(0), norm=False)
    stream = data.from_function(
        3, lambda i: np.full((16, 4), i, np.float32)
    )
    outs = train.parallel_run_batch_stream(
        model, stream, lambda m, b: m(b), mesh=mesh
    )
    assert len(outs) == 3 and outs[0].shape == (16, 2)


@pytest.mark.parametrize("overlap", [False, True])
def test_pipeline_matches_sequential(overlap):
    """GPipe over 8 stages must equal sequential block application — with
    and without double-buffered (compute-overlapped) sends."""
    mesh = parallel.make_mesh({"pp": 8})
    L, M, B, D = 8, 4, 2, 16
    keys = jax.random.split(jax.random.PRNGKey(0), L)
    ws = jnp.stack([
        jax.random.normal(k, (D, D), jnp.float32) * 0.3 for k in keys
    ])  # [L, D, D]
    mbs = jax.random.normal(jax.random.PRNGKey(1), (M, B, D), jnp.float32)

    def stage_fn(w_stack, x):
        # apply this stage's local blocks in order
        def body(x, w):
            return jnp.tanh(x @ w), None
        y, _ = jax.lax.scan(body, x, w_stack)
        return y

    piped = parallel.make_pipelined_forward(mesh, stage_fn, axis="pp",
                                            overlap_sends=overlap)
    out = piped(ws, mbs)

    # sequential reference
    def seq(x):
        for l in range(L):
            x = jnp.tanh(x @ ws[l])
        return x

    ref = jnp.stack([seq(mbs[i]) for i in range(M)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_differentiable():
    mesh = parallel.make_mesh({"pp": 4}, devices=jax.devices()[:4])
    L, M, B, D = 4, 2, 2, 8
    keys = jax.random.split(jax.random.PRNGKey(0), L)
    ws = jnp.stack([
        jax.random.normal(k, (D, D), jnp.float32) * 0.3 for k in keys
    ])
    mbs = jax.random.normal(jax.random.PRNGKey(1), (M, B, D), jnp.float32)

    def stage_fn(w_stack, x):
        def body(x, w):
            return jnp.tanh(x @ w), None
        y, _ = jax.lax.scan(body, x, w_stack)
        return y

    piped = parallel.make_pipelined_forward(mesh, stage_fn, axis="pp")

    def loss_piped(ws):
        return jnp.sum(jnp.square(piped(ws, mbs)))

    def loss_seq(ws):
        x = mbs.reshape(M * B, D)
        # note: sequential over stacked blocks
        def body(x, w):
            return jnp.tanh(x @ w), None
        y, _ = jax.lax.scan(body, x, ws)
        return jnp.sum(jnp.square(y))

    g1 = jax.grad(loss_piped)(ws)
    g2 = jax.grad(loss_seq)(ws)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4,
                               rtol=1e-4)


@pytest.mark.parametrize("m,overlap", [(4, False), (6, False), (6, True),
                                       (9, True)])
def test_interleaved_pipeline_matches_sequential(m, overlap):
    """The interleaved (circular / 1F1B-style) schedule with v virtual
    chunks per stage must equal sequential block application, including for
    microbatch counts that are not a multiple of the stage count and with
    double-buffered (compute-overlapped) sends."""
    mesh = parallel.make_mesh({"pp": 4}, devices=jax.devices()[:4])
    L, B, D = 8, 2, 16  # 4 stages x 2 virtual chunks x 1 block per chunk
    keys = jax.random.split(jax.random.PRNGKey(0), L)
    ws = jnp.stack([
        jax.random.normal(k, (D, D), jnp.float32) * 0.3 for k in keys
    ])
    mbs = jax.random.normal(jax.random.PRNGKey(1), (m, B, D), jnp.float32)

    def chunk_fn(w_stack, x):
        def body(x, w):
            return jnp.tanh(x @ w), None
        y, _ = jax.lax.scan(body, x, w_stack)
        return y

    piped = parallel.make_interleaved_pipelined_forward(
        mesh, chunk_fn, axis="pp", n_virtual=2, overlap_sends=overlap
    )
    out = piped(ws, mbs)

    def seq(x):
        for l in range(L):
            x = jnp.tanh(x @ ws[l])
        return x

    ref = jnp.stack([seq(mbs[i]) for i in range(m)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("overlap", [False, True])
def test_interleaved_pipeline_differentiable(overlap):
    mesh = parallel.make_mesh({"pp": 4}, devices=jax.devices()[:4])
    L, M, B, D = 8, 4, 2, 8
    keys = jax.random.split(jax.random.PRNGKey(0), L)
    ws = jnp.stack([
        jax.random.normal(k, (D, D), jnp.float32) * 0.3 for k in keys
    ])
    mbs = jax.random.normal(jax.random.PRNGKey(1), (M, B, D), jnp.float32)

    def chunk_fn(w_stack, x):
        def body(x, w):
            return jnp.tanh(x @ w), None
        y, _ = jax.lax.scan(body, x, w_stack)
        return y

    piped = parallel.make_interleaved_pipelined_forward(
        mesh, chunk_fn, axis="pp", n_virtual=2, overlap_sends=overlap
    )

    def loss_piped(ws):
        return jnp.sum(jnp.square(piped(ws, mbs)))

    def loss_seq(ws):
        x = mbs.reshape(M * B, D)
        def body(x, w):
            return jnp.tanh(x @ w), None
        y, _ = jax.lax.scan(body, x, ws)
        return jnp.sum(jnp.square(y))

    g1 = jax.grad(loss_piped)(ws)
    g2 = jax.grad(loss_seq)(ws)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4,
                               rtol=1e-4)


def test_pipelined_lm_forward_matches_model():
    """The LM block-stack pipeline (interleaved, 2 stages x 2 virtual
    chunks) reproduces the plain forward's logits."""
    mesh = parallel.make_mesh({"pp": 2}, devices=jax.devices()[:2])
    lm = nn.LanguageModelModule.init(
        vocab_size=17, context_length=8, num_blocks=4, embed_dim=16,
        attention_heads=2, key=jax.random.PRNGKey(0),
    )
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 17)
    piped = parallel.make_pipelined_lm_forward(
        mesh, axis="pp", n_virtual=2, n_microbatches=2
    )
    got = piped(lm, tokens)
    ref, _ = lm.forward(tokens, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_sharded_checkpoint_roundtrip(tmp_path):
    """save_pytree_sharded writes per-shard blobs (no gather of the full
    array) and load_pytree_sharded reassembles + re-shards them."""
    from jax.sharding import NamedSharding

    from lamp_tpu.io.checkpoint import load_pytree_sharded, save_pytree_sharded

    mesh = parallel.make_mesh({"dp": 4, "tp": 2})
    x = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", "tp")))
    # partially replicated leaf + a bf16 leaf + python metadata
    y = jnp.arange(16, dtype=jnp.bfloat16).reshape(8, 2)
    ys = jax.device_put(y, NamedSharding(mesh, P("dp", None)))
    tree = {"x": xs, "y": ys, "step": 7, "none": None}

    path = str(tmp_path / "ck")
    save_pytree_sharded(path, tree)
    import os

    assert os.path.exists(path + ".data.shard0")
    assert os.path.exists(path + ".shard0.json")

    template = {"x": jnp.zeros_like(x), "y": jnp.zeros_like(y),
                "step": 0, "none": None}
    shardings = {"x": NamedSharding(mesh, P("dp", "tp")),
                 "y": NamedSharding(mesh, P("dp", None)),
                 "step": None, "none": None}
    got = load_pytree_sharded(path, template, shardings=shardings)
    np.testing.assert_array_equal(np.asarray(got["x"]), np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(got["y"], np.float32), np.asarray(y, np.float32)
    )
    assert got["step"] == 7 and got["none"] is None
    assert got["x"].sharding.spec == P("dp", "tp")


def test_pipelined_modern_lm_forward_matches_model():
    """RoPE/GQA llama-style blocks pipeline too (extras carry the RoPE
    tables)."""
    mesh = parallel.make_mesh({"pp": 2}, devices=jax.devices()[:2])
    lm = nn.ModernLM.init(
        vocab_size=19, context_length=8, num_blocks=4, embed_dim=16,
        num_heads=2, num_kv_heads=1, key=jax.random.PRNGKey(0),
    )
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 19)
    piped = parallel.make_pipelined_lm_forward(
        mesh, axis="pp", n_virtual=2, n_microbatches=2, modern=True
    )
    got = piped(lm, tokens)
    ref, _ = lm.forward(tokens, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_pipelined_lm_training_step():
    """End-to-end pipeline-parallel training: the pipelined loss_fn composes
    with make_train_step, and its gradients equal the plain (non-pipelined)
    training step's."""
    mesh = parallel.make_mesh({"pp": 2}, devices=jax.devices()[:2])
    lm = nn.LanguageModelModule.init(
        vocab_size=17, context_length=8, num_blocks=2, embed_dim=16,
        attention_heads=2, key=jax.random.PRNGKey(0),
    )
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 17)
    target = jnp.roll(tokens, -1, axis=1)
    # SGD so post-step params differ proportionally to the gradients
    # (AdamW's first-step g/|g| normalization amplifies numerical noise on
    # zero-gradient params into tolerance-breaking sign flips)
    opt = optim.SGDW(0.1, weight_decay=0.0)

    ploss = parallel.make_pipelined_lm_loss_fn(mesh, axis="pp",
                                               n_microbatches=2)
    pstep = jax.jit(train.make_train_step(opt, ploss))
    ps = train.TrainState.init(lm, opt)
    ps, (pl, _) = pstep(ps, (tokens, target), jax.random.PRNGKey(2))

    def plain_loss(model, batch, key, train_mode):
        toks, tgt = batch
        logits, nm = model.forward(toks, key=key, train=train_mode)
        return nn.lm_loss(logits, tgt), jnp.asarray(
            toks.shape[0], jnp.float32
        ), nm

    sstep = jax.jit(train.make_train_step(opt, plain_loss))
    ss = train.TrainState.init(lm, opt)
    ss, (sl, _) = sstep(ss, (tokens, target), jax.random.PRNGKey(2))

    np.testing.assert_allclose(float(pl), float(sl), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(ps.params), jax.tree_util.tree_leaves(ss.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-4)


def test_moe_expert_parallel():
    """MoE layer trains with experts sharded over the ep axis; dense-dispatch
    output matches the unsharded computation."""
    from jax.sharding import NamedSharding

    mesh = parallel.make_mesh({"ep": 8})
    moe = nn.MoEMLP.init(16, 32, num_experts=8, key=jax.random.PRNGKey(0),
                         top_k=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 16), jnp.float32)
    y_ref, _ = moe.forward(x)
    assert y_ref.shape == x.shape

    sharded = parallel.shard_tree(moe, mesh, nn.moe_sharding_rules("ep"))
    y_sh, _ = jax.jit(lambda m, x: m.forward(x))(sharded, x)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref), atol=2e-5,
                               rtol=2e-5)
    # aux loss finite and positive
    aux = moe.load_balancing_loss(x)
    assert float(aux) > 0


def test_allgather_matmul_matches_dense():
    """Ring all-gather-matmul == all_gather(x) @ w, bf16 and f32."""
    mesh = parallel.make_mesh({"tp": 8})
    m, k, p = 32, 16, 24
    x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, p), jnp.float32)
    fn = parallel.make_allgather_matmul(mesh, axis="tp")
    out = fn(x, w)
    ref = x @ w
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    out16 = fn(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
    assert out16.dtype == jnp.float32  # f32 accumulation
    np.testing.assert_allclose(np.asarray(out16), np.asarray(ref),
                               atol=0.15, rtol=0.05)


def test_matmul_reducescatter_matches_dense():
    """Ring matmul-reduce-scatter == psum_scatter of the sharded matmul."""
    mesh = parallel.make_mesh({"tp": 8})
    m, k, p = 32, 64, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, p), jnp.float32)
    fn = parallel.make_matmul_reducescatter(mesh, axis="tp")
    out = fn(x, w)
    ref = x @ w
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_collective_matmul_composed_mlp():
    """Column-parallel then row-parallel (the Megatron MLP pattern) through
    the two ring primitives reproduces the dense two-layer product."""
    mesh = parallel.make_mesh({"tp": 8})
    m, d, h = 16, 32, 64
    x = jax.random.normal(jax.random.PRNGKey(0), (m, d), jnp.float32)
    w1 = jax.random.normal(jax.random.PRNGKey(1), (d, h), jnp.float32) * 0.3
    w2 = jax.random.normal(jax.random.PRNGKey(2), (h, d), jnp.float32) * 0.3
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def mlp(xl, w1l, w2l):
        hcol = parallel.allgather_matmul(xl, w1l, axis_name="tp")
        hcol = jax.nn.relu(hcol)
        return parallel.matmul_reducescatter(hcol, w2l, axis_name="tp")

    fn = jax.jit(shard_map(
        mlp, mesh=mesh,
        in_specs=(P("tp", None), P(None, "tp"), P("tp", None)),
        out_specs=P("tp", None),
    ))
    out = fn(x, w1, w2)
    ref = jax.nn.relu(x @ w1) @ w2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_sharded_checkpoint_ignores_stale_shards(tmp_path):
    """A re-save with fewer processes must not pick up leftover shard files
    from an earlier wider save (the main doc records its shard set)."""
    import json
    import os
    import shutil

    from lamp_tpu.io.checkpoint import load_pytree_sharded, save_pytree_sharded

    path = str(tmp_path / "ck")
    x = jnp.arange(32, dtype=jnp.float32)
    save_pytree_sharded(path, {"x": x})
    # forge a stale shard file claiming to be process 5 with OLD values
    with open(path + ".shard0.json") as f:
        sd = json.load(f)
    sd["process"] = 5
    with open(path + ".shard5.json", "w") as f:
        json.dump(sd, f)
    stale = (np.arange(32, dtype=np.float32) + 1000.0).tobytes()
    with open(path + ".data.shard5", "wb") as f:
        f.write(stale)
    got = load_pytree_sharded(path, {"x": jnp.zeros_like(x)})
    np.testing.assert_array_equal(np.asarray(got["x"]), np.asarray(x))


def test_modern_lm_tensor_parallel_training():
    """ModernLM (GQA + SwiGLU + tied fused-CE loss) trains under
    megatron-style TP; the sharded loss matches the unsharded model."""
    mesh = parallel.make_mesh({"dp": 4, "tp": 2})
    model = nn.ModernLM.init(
        vocab_size=32, context_length=16, num_blocks=2, embed_dim=32,
        num_heads=4, num_kv_heads=2, key=jax.random.PRNGKey(0),
    )
    opt = optim.AdamW(1e-2)

    def loss_fn(model, batch, key, train_mode):
        tokens, target = batch
        loss = model.loss(tokens, target, key=key, train=train_mode)
        return loss, jnp.asarray(tokens.shape[0], jnp.float32), model

    state = train.TrainState.init(model, opt)
    sstate = parallel.shard_train_state(
        state, mesh, parallel.modern_lm_tensor_parallel_rules("tp")
    )
    w_q = sstate.params.blocks[0].w_q.weight
    assert "tp" in str(w_q.sharding.spec)
    w3 = sstate.params.blocks[0].mlp.w3.weight
    assert "tp" in str(w3.sharding.spec)
    emb = sstate.params.token_embedding.weight
    assert "tp" in str(emb.sharding.spec)

    tokens = np.random.RandomState(0).randint(0, 32, (8, 16)).astype(np.int32)
    target = np.roll(tokens, -1, axis=1)
    batch = parallel.shard_batch((tokens, target), mesh)

    step = parallel.make_sharded_train_step(opt, loss_fn, mesh, donate=False)
    # reference: unsharded single-device step
    ref_step = jax.jit(train.make_train_step(opt, loss_fn))
    rstate = train.TrainState.init(model, opt)

    losses, ref_losses = [], []
    for i in range(8):
        sstate, (loss, _) = step(sstate, batch, jax.random.PRNGKey(i))
        rstate, (rloss, _) = ref_step(
            rstate, (jnp.asarray(tokens), jnp.asarray(target)),
            jax.random.PRNGKey(i))
        losses.append(float(loss))
        ref_losses.append(float(rloss))
    np.testing.assert_allclose(losses, ref_losses, rtol=2e-4, atol=2e-4)
    assert losses[-1] < losses[0]


def test_moe_modern_lm_expert_parallel_training():
    """ModernLM(moe_experts=4) trains over a dp x ep mesh with the stacked
    expert weights sharded on ep; loss matches the unsharded model."""
    mesh = parallel.make_mesh({"dp": 2, "ep": 4})
    model = nn.ModernLM.init(
        vocab_size=32, context_length=16, num_blocks=2, embed_dim=32,
        num_heads=4, num_kv_heads=2, moe_experts=4, moe_top_k=2,
        key=jax.random.PRNGKey(0))
    opt = optim.AdamW(1e-2)

    def loss_fn(m, batch, key, train_mode):
        t, tg = batch
        return (m.loss(t, tg, key=key, train=train_mode, moe_aux_coef=0.01),
                jnp.asarray(t.shape[0], jnp.float32), m)

    state = train.TrainState.init(model, opt)
    sstate = parallel.shard_train_state(state, mesh,
                                        nn.moe_sharding_rules("ep"))
    w1 = sstate.params.blocks[0].mlp.w1
    assert "ep" in str(w1.sharding.spec)

    tokens = np.random.RandomState(0).randint(0, 32, (8, 16)).astype(np.int32)
    target = np.roll(tokens, -1, axis=1)
    batch = parallel.shard_batch((tokens, target), mesh)
    step = parallel.make_sharded_train_step(opt, loss_fn, mesh, donate=False)
    ref_step = jax.jit(train.make_train_step(opt, loss_fn))
    rstate = train.TrainState.init(model, opt)
    losses, ref_losses = [], []
    for i in range(6):
        sstate, (loss, _) = step(sstate, batch, jax.random.PRNGKey(i))
        rstate, (rloss, _) = ref_step(
            rstate, (jnp.asarray(tokens), jnp.asarray(target)),
            jax.random.PRNGKey(i))
        losses.append(float(loss))
        ref_losses.append(float(rloss))
    np.testing.assert_allclose(losses, ref_losses, rtol=3e-4, atol=3e-4)
    assert losses[-1] < losses[0]


def test_two_process_distributed(tmp_path):
    """VERDICT r1 item 5: actually run the multi-process path once. Two
    ``jax.distributed`` CPU processes (2 local devices each -> 4 global)
    rendez-vous through initialize_multihost, rank-shard one stream with
    every_nth, take one FSDP train step over the global mesh, and write +
    restore a sharded checkpoint across both processes. Mirrors the
    reference's 2-process test (lamp-akka test.scala:1-45)."""
    import json
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        # the worker script's sys.path[0] is tests/, not the repo root;
        # without this the subprocess cannot import lamp_tpu
        PYTHONPATH=repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    worker = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=os.path.dirname(os.path.dirname(worker)),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    r0, r1 = sorted(outs, key=lambda r: r["pid"])
    assert [r0["processes"], r1["processes"]] == [2, 2]
    assert [r0["global_devices"], r1["global_devices"]] == [4, 4]
    assert r0["local_microbatches"] == r1["local_microbatches"] == 4
    # replicated loss must agree bit-for-bit across processes
    assert r0["loss"] == r1["loss"]
    assert np.isfinite(r0["loss"])
    assert r0["restore_ok"] and r1["restore_ok"]
    # TP phase: the tp mesh axis pairs devices from BOTH processes, so the
    # Megatron w_o/w2 all-reduces crossed the process boundary; the
    # replicated loss must agree bit-for-bit and keep training
    assert r0["tp_loss"] == r1["tp_loss"]
    assert np.isfinite(r0["tp_loss"])
    assert r0["tp_loss_step2"] == r1["tp_loss_step2"]
    assert np.isfinite(r0["tp_loss_step2"])
