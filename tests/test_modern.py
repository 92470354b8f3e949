"""Modern LM component tests: RMSNorm, RoPE, SwiGLU, llama-style model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lamp_tpu import nn, optim, train
from .gradcheck import check_module_grads

KEY = jax.random.PRNGKey(0)


def test_rmsnorm():
    m = nn.RMSNorm.init(8, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 8), jnp.float64) * 4
    y = m(x)
    rms = np.sqrt(np.mean(np.square(np.asarray(y)), -1))
    np.testing.assert_allclose(rms, 1.0, rtol=1e-6)  # unit weights

    def build_loss(mm):
        out, _ = mm.forward(x)
        return jnp.sum(jnp.square(out))

    check_module_grads(build_loss, m)


def test_rope_properties():
    cos, sin = nn.rope_frequencies(16, 32, dtype=jnp.float64)
    q = jax.random.normal(KEY, (1, 2, 8, 16), jnp.float64)
    # norm preservation (rotation)
    rq = nn.apply_rope(q, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rq), axis=-1),
        np.linalg.norm(np.asarray(q), axis=-1), rtol=1e-9,
    )
    # relative property: <rope(q,i), rope(k,j)> depends only on i-j
    k = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 1, 16), jnp.float64)
    qv = jax.random.normal(jax.random.PRNGKey(4), (1, 1, 1, 16), jnp.float64)

    def dot_at(i, j):
        rq = nn.apply_rope(qv, cos, sin, positions=jnp.asarray([i]))
        rk = nn.apply_rope(k, cos, sin, positions=jnp.asarray([j]))
        return float(jnp.sum(rq * rk))

    np.testing.assert_allclose(dot_at(5, 3), dot_at(10, 8), rtol=1e-9)
    assert abs(dot_at(5, 3) - dot_at(10, 2)) > 1e-9


def test_swiglu_and_block():
    m = nn.SwiGLU.init(8, 16, key=KEY, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8), jnp.float64)
    assert m(x).shape == (2, 8)

    block = nn.LlamaBlock.init(16, 4, key=KEY, num_kv_heads=2,
                               dtype=jnp.float64)
    cos, sin = nn.rope_frequencies(4, 8)
    xb = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 16), jnp.float64)
    (y, _), _ = block.forward((xb, (cos.astype(jnp.float64),
                                    sin.astype(jnp.float64))))
    assert y.shape == xb.shape


def test_modern_lm_causal_and_overfit():
    model = nn.ModernLM.init(
        vocab_size=17, context_length=16, num_blocks=2, embed_dim=32,
        num_heads=4, num_kv_heads=2, key=KEY,
    )
    tokens = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]])
    logits, _ = model.forward(tokens)
    assert logits.shape == (1, 8, 17)
    # causality: changing the future leaves earlier logits unchanged
    tokens2 = tokens.at[0, 5:].set(9)
    logits2, _ = model.forward(tokens2)
    np.testing.assert_allclose(
        np.asarray(logits[:, :5]), np.asarray(logits2[:, :5]), atol=1e-5
    )

    # overfit
    def loss_fn(m, batch, key, train_mode):
        t, y = batch
        lg, nm = m.forward(t, key=key, train=train_mode)
        return nn.losses.sequence_nll(lg, y), jnp.asarray(1.0), nm

    opt = optim.AdamW(5e-3)
    state = train.TrainState.init(model, opt)
    step = jax.jit(train.make_train_step(opt, loss_fn))
    target = jnp.roll(tokens, -1, axis=1)
    for i in range(150):
        state, (loss, _) = step(state, (tokens, target), jax.random.PRNGKey(i))
    assert float(loss) < 0.1, float(loss)


def test_modern_lm_sliding_window():
    import numpy as np
    from lamp_tpu.ops.attention import mha_reference

    key = jax.random.PRNGKey(7)
    # per-block windows: full, sliding-4 alternation (Gemma-style)
    model = nn.ModernLM.init(vocab_size=19, context_length=12, num_blocks=2,
                             embed_dim=16, num_heads=2, window=[None, 4],
                             key=key)
    assert model.blocks[0].window is None
    assert model.blocks[1].window == 4
    tok = jax.random.randint(jax.random.PRNGKey(8), (2, 12), 0, 19)
    logits, _ = model.forward(tok)
    assert logits.shape == (2, 12, 19)
    # a window as wide as the context equals full causal attention
    wide = nn.ModernLM.init(vocab_size=19, context_length=12, num_blocks=2,
                            embed_dim=16, num_heads=2, window=12, key=key)
    full = nn.ModernLM.init(vocab_size=19, context_length=12, num_blocks=2,
                            embed_dim=16, num_heads=2, key=key)
    lw, _ = wide.forward(tok)
    lf, _ = full.forward(tok)
    np.testing.assert_allclose(np.asarray(lw), np.asarray(lf), atol=1e-5)


def test_modern_lm_remat_same_grads():
    key = jax.random.PRNGKey(11)
    kw = dict(vocab_size=13, context_length=8, num_blocks=2, embed_dim=16,
              num_heads=2, key=key)
    plain = nn.ModernLM.init(**kw)
    remat = nn.ModernLM.init(remat=True, **kw)
    tok = jax.random.randint(jax.random.PRNGKey(12), (2, 8), 0, 13)
    tgt = jnp.roll(tok, -1, axis=1)

    def loss(m):
        return m.loss(tok, tgt, row_chunk=8)

    lp, gp = jax.value_and_grad(loss)(plain)
    lr, gr = jax.value_and_grad(loss)(remat)
    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_modern_lm_packed_documents_match_separate():
    """Sequence packing: loss over packed rows (segment-masked attention +
    per-document RoPE positions) equals the token-weighted mean of each
    document's standalone loss."""
    from lamp_tpu.data import pack_documents

    model = nn.ModernLM.init(
        vocab_size=23, context_length=16, num_blocks=2, embed_dim=32,
        num_heads=4, num_kv_heads=2, key=KEY,
    )
    rng = np.random.RandomState(5)
    docs = [rng.randint(0, 23, ln).astype(np.int32) for ln in (6, 7, 3, 9, 5)]
    packed = pack_documents(docs, 16)
    assert packed["tokens"].shape[0] == 2  # 6+7+3 and 9+5

    packed_loss = model.loss(
        jnp.asarray(packed["tokens"]), jnp.asarray(packed["targets"]),
        segment_ids=jnp.asarray(packed["segment_ids"]),
        positions=jnp.asarray(packed["positions"]),
    )

    total, count = 0.0, 0
    for doc in docs:
        t = jnp.asarray(doc[None, :-1])
        y = jnp.asarray(doc[None, 1:])
        total += float(model.loss(t, y)) * (len(doc) - 1)
        count += len(doc) - 1
    np.testing.assert_allclose(float(packed_loss), total / count, rtol=2e-5)

    # cross-document isolation: mutating one document leaves the other
    # packed documents' hidden states unchanged
    h0 = model.hidden(jnp.asarray(packed["tokens"]),
                      segment_ids=jnp.asarray(packed["segment_ids"]),
                      positions=jnp.asarray(packed["positions"]))
    mutated = packed["tokens"].copy()
    mutated[0, :6] = (mutated[0, :6] + 1) % 23  # doc 0 occupies row 0, 0:6
    h1 = model.hidden(jnp.asarray(mutated),
                      segment_ids=jnp.asarray(packed["segment_ids"]),
                      positions=jnp.asarray(packed["positions"]))
    np.testing.assert_allclose(np.asarray(h0[0, 6:13]),
                               np.asarray(h1[0, 6:13]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h0[1]), np.asarray(h1[1]),
                               atol=1e-5)


def test_pack_documents_layout():
    from lamp_tpu.data import pack_documents

    docs = [np.arange(1, 5), np.arange(1, 4), np.arange(1, 12)]
    p = pack_documents(docs, 8)
    # doc0 (4) + doc1 (3) fit row 0; doc2 truncated to 8 fills row 1
    assert p["tokens"].shape == (2, 8)
    np.testing.assert_array_equal(p["tokens"][0], [1, 2, 3, 4, 1, 2, 3, 0])
    np.testing.assert_array_equal(p["segment_ids"][0],
                                  [0, 0, 0, 0, 1, 1, 1, 2])
    np.testing.assert_array_equal(p["positions"][0],
                                  [0, 1, 2, 3, 0, 1, 2, 0])
    np.testing.assert_array_equal(p["targets"][0],
                                  [2, 3, 4, -100, 2, 3, -100, -100])
    np.testing.assert_array_equal(p["tokens"][1], np.arange(1, 9))
    np.testing.assert_array_equal(p["targets"][1],
                                  list(range(2, 9)) + [-100])


def test_swiglu_moe_single_expert_equals_dense():
    """A 1-expert top-1 SwiGLUMoE with copied weights is exactly the dense
    SwiGLU (gate prob is 1 after renormalization)."""
    from lamp_tpu.nn.modern import SwiGLU
    from lamp_tpu.nn.moe import SwiGLUMoE

    dense = SwiGLU.init(16, 32, key=jax.random.PRNGKey(0))
    moe = SwiGLUMoE.init(16, 32, 1, key=jax.random.PRNGKey(1), top_k=1)
    moe = moe.replace(w1=dense.w1.weight[None], w3=dense.w3.weight[None],
                      w2=dense.w2.weight[None])
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 5, 16))
    y1, _ = dense.forward(x)
    y2, _ = moe.forward(x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5,
                               rtol=1e-5)


def test_moe_modern_lm_trains_with_aux():
    """ModernLM(moe_experts=4): trains (fused-CE + balancing aux), aux is
    positive for MoE and exactly 0 for dense; remat composes."""
    from lamp_tpu import optim, train

    model = nn.ModernLM.init(
        vocab_size=64, context_length=32, num_blocks=2, embed_dim=32,
        num_heads=4, num_kv_heads=2, moe_experts=4, moe_top_k=2,
        key=jax.random.PRNGKey(3))
    opt = optim.AdamW(1e-2)

    def loss_fn(m, batch, key, train_mode):
        t, tg = batch
        return (m.loss(t, tg, key=key, train=train_mode, moe_aux_coef=0.01),
                jnp.asarray(1.0), m)

    state = train.TrainState.init(model, opt)
    step = jax.jit(train.make_train_step(opt, loss_fn))
    rng = np.random.RandomState(0)
    toks = jnp.asarray(rng.randint(0, 64, (4, 32)).astype(np.int32))
    batch = (toks, jnp.roll(toks, -1, axis=1))
    losses = []
    for i in range(30):
        state, (l, _) = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.8

    _, aux = model.hidden(toks, with_aux=True)
    assert float(aux) > 0
    dense = nn.ModernLM.init(
        vocab_size=64, context_length=32, num_blocks=2, embed_dim=32,
        num_heads=4, key=jax.random.PRNGKey(4))
    _, aux0 = dense.hidden(toks, with_aux=True)
    assert float(aux0) == 0.0

    remat = nn.ModernLM.init(
        vocab_size=64, context_length=32, num_blocks=2, embed_dim=32,
        num_heads=4, moe_experts=2, remat=True, key=jax.random.PRNGKey(5))
    g = jax.grad(lambda m: m.loss(
        toks, jnp.roll(toks, -1, axis=1), moe_aux_coef=0.01
    ).astype(jnp.float32))(remat)
    assert all(np.isfinite(np.asarray(x, np.float32)).all()
               for x in jax.tree_util.tree_leaves(g))


def _moe_model():
    return nn.ModernLM.init(
        vocab_size=32, context_length=64, num_blocks=2, embed_dim=32,
        num_heads=4, num_kv_heads=2, moe_experts=4, moe_top_k=2,
        key=jax.random.PRNGKey(0))


def test_moe_paged_serving_matches_forward():
    """MoE ModernLM paged decode: logits match the full forward; the fused
    step_many scan matches step()."""
    from lamp_tpu.models.serving import ModernBatchServer

    model = _moe_model()
    prompt = [1, 4, 7, 2, 9, 3]
    srv = ModernBatchServer(model, page_size=8, total_pages=32)
    srv.add("a", prompt)
    logits = srv._advance(["a"], jnp.asarray([prompt[-1]], jnp.int32))
    full, _ = model.forward(jnp.asarray([prompt], jnp.int32), train=False)
    np.testing.assert_allclose(np.asarray(logits[0]), np.asarray(full[0, -1]),
                               atol=5e-3, rtol=5e-3)
    s1 = ModernBatchServer(model, page_size=8, total_pages=32)
    s1.add("x", prompt)
    expected = [s1.step()["x"] for _ in range(8)]
    s2 = ModernBatchServer(model, page_size=8, total_pages=32)
    s2.add("x", prompt)
    assert s2.step_many(8)["x"] == expected


def test_moe_serving_chunked_prefix_cache_path():
    """The m-token chunk decode path (exercised by prefix-cache suffix
    prefill) produces the same stream as cold prefill for MoE models."""
    from lamp_tpu.models.serving import ModernBatchServer

    model = _moe_model()
    prompt = [1, 4, 7, 2, 9, 3, 8, 5, 11, 6, 2, 4]  # > one 8-token page
    cold = ModernBatchServer(model, page_size=8, total_pages=64)
    cold.add("a", prompt)
    expected = [cold.step()["a"] for _ in range(6)]
    warm = ModernBatchServer(model, page_size=8, total_pages=64,
                             enable_prefix_cache=True)
    warm.add("a", prompt)
    warm.remove("a")
    warm.add("b", prompt)   # cached prefix -> chunked suffix prefill
    assert warm.cache_hit_tokens > 0
    got = [warm.step()["b"] for _ in range(6)]
    assert got == expected


def test_moe_serving_unsupported_combos():
    import pytest

    from lamp_tpu.models.serving import ModernBatchServer
    from lamp_tpu.nn.lora import lora_inject

    model = _moe_model()
    with pytest.raises(NotImplementedError, match="int4"):
        ModernBatchServer(model, page_size=8, total_pages=16,
                          quantize_bits=4)
    srv = ModernBatchServer(model, page_size=8, total_pages=16)
    with pytest.raises(NotImplementedError, match="MoE"):
        srv.register_adapter("x", model)


# -- RoPE scaling (long-context extension) -----------------------------------

def test_rope_scaling_linear_is_position_interpolation():
    from lamp_tpu.nn.modern import rope_frequencies

    cos0, sin0 = rope_frequencies(32, 64)
    cos2, sin2 = rope_frequencies(32, 128, scaling={"type": "linear",
                                                    "factor": 2})
    # scaled position 2p rotates exactly like unscaled position p
    np.testing.assert_allclose(np.asarray(cos2[::2]), np.asarray(cos0),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin2[::2]), np.asarray(sin0),
                               atol=1e-6)


def test_rope_scaling_ntk_stretches_base():
    from lamp_tpu.nn.modern import rope_frequencies

    d, f = 32, 8.0
    cos, sin = rope_frequencies(d, 16, scaling={"type": "ntk", "factor": f})
    want_base = 10000.0 * f ** (d / (d - 2))
    inv = 1.0 / (want_base ** (np.arange(0, d, 2) / d))
    t = np.arange(16)
    np.testing.assert_allclose(np.asarray(cos), np.cos(np.outer(t, inv)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin), np.sin(np.outer(t, inv)),
                               atol=1e-5)


def test_rope_scaling_yarn_ramp_and_temperature():
    from lamp_tpu.nn.modern import rope_frequencies

    d, f, orig = 64, 4.0, 256
    cos, sin = rope_frequencies(d, 32, scaling={
        "type": "yarn", "factor": f, "original_max_len": orig,
    })
    m = 0.1 * np.log(f) + 1.0
    inv = 1.0 / (10000.0 ** (np.arange(0, d, 2) / d))
    rotations = orig * inv / (2 * np.pi)
    t = np.arange(32)
    # dim 0 spins fastest: >= 32 rotations -> pure extrapolation
    assert rotations[0] >= 32
    np.testing.assert_allclose(np.asarray(cos[:, 0]),
                               m * np.cos(t * inv[0]), atol=1e-5)
    # slowest dim: <= 1 rotation -> pure interpolation (angles / factor)
    assert rotations[-1] <= 1
    np.testing.assert_allclose(np.asarray(sin[:, -1]),
                               m * np.sin(t * inv[-1] / f), atol=1e-5)
    # magnitude carries the YaRN attention temperature
    np.testing.assert_allclose(
        np.asarray(cos[:, 0] ** 2 + sin[:, 0] ** 2)[0], m * m, rtol=1e-5)


def test_rope_scaling_llama3_bands():
    from lamp_tpu.nn.modern import rope_frequencies

    d, f, orig = 64, 8.0, 8192
    cos, sin = rope_frequencies(d, 16, scaling={
        "type": "llama3", "factor": f, "original_max_len": orig,
        "low_freq_factor": 1.0, "high_freq_factor": 4.0,
    })
    inv = 1.0 / (10000.0 ** (np.arange(0, d, 2) / d))
    wavelen = 2 * np.pi / inv
    t = np.arange(16)
    hi_dims = wavelen < orig / 4.0   # short wavelengths: untouched
    lo_dims = wavelen > orig / 1.0   # long wavelengths: full interpolation
    assert hi_dims.any() and lo_dims.any()
    np.testing.assert_allclose(np.asarray(cos[:, hi_dims]),
                               np.cos(np.outer(t, inv[hi_dims])), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cos[:, lo_dims]),
                               np.cos(np.outer(t, inv[lo_dims] / f)),
                               atol=1e-5)

    with pytest.raises(ValueError, match="scaling type"):
        rope_frequencies(16, 8, scaling={"type": "wat", "factor": 2})


def test_extend_context_preserves_short_range_behavior():
    """extend_context without scaling reproduces the original logits on
    prompts inside the old window; with YaRN it runs at 4x the window."""
    model = nn.ModernLM.init(
        vocab_size=29, context_length=32, num_blocks=2, embed_dim=32,
        num_heads=4, key=jax.random.PRNGKey(3),
    )
    toks = jnp.asarray(np.random.RandomState(0).randint(0, 29, (2, 16)),
                       jnp.int32)
    base_logits, _ = model.forward(toks)

    wide = model.extend_context(128)
    assert wide.context_length == 128
    wide_logits, _ = wide.forward(toks)
    np.testing.assert_allclose(np.asarray(base_logits),
                               np.asarray(wide_logits), atol=1e-5)

    yarn = model.extend_context(128, rope_scaling={
        "type": "yarn", "factor": 4, "original_max_len": 32,
    })
    long_toks = jnp.asarray(np.random.RandomState(1).randint(0, 29, (1, 128)),
                            jnp.int32)
    out, _ = yarn.forward(long_toks)
    assert out.shape == (1, 128, 29)
    assert np.isfinite(np.asarray(out)).all()


def test_moe_sorted_dispatch_matches_dense():
    """dispatch="sorted" (ragged_dot grouped GEMMs over exactly T*top_k
    rows) computes the same routing math as dense dispatch — outputs and
    parameter gradients match to accumulation order, for both SwiGLUMoE
    and the biased/gelu MoEMLP."""
    from lamp_tpu.nn.moe import MoEMLP, SwiGLUMoE

    x = jax.random.normal(jax.random.PRNGKey(2), (3, 17, 16))

    for cls, kw in ((SwiGLUMoE, {}), (MoEMLP, {})):
        dense = cls.init(16, 32, 4, key=jax.random.PRNGKey(0), top_k=2, **kw)
        srt = dense.replace(dispatch="sorted")
        y1, _ = dense.forward(x)
        y2, _ = srt.forward(x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   atol=1e-5, rtol=1e-5)

        def loss(m):
            y, _ = m.forward(x)
            return jnp.sum(y * y)

        g1 = jax.grad(loss)(dense)
        g2 = jax.grad(loss)(srt)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-4)


def test_moe_sorted_modern_lm_trains():
    """ModernLM(moe_dispatch="sorted") jits, matches the dense-dispatch
    loss on identical weights, and trains."""
    from lamp_tpu import optim, train

    kw = dict(vocab_size=64, context_length=32, num_blocks=2, embed_dim=32,
              num_heads=4, num_kv_heads=2, moe_experts=4, moe_top_k=2,
              key=jax.random.PRNGKey(3))
    dense = nn.ModernLM.init(**kw)
    srt = nn.ModernLM.init(moe_dispatch="sorted", **kw)
    assert srt.blocks[0].mlp.dispatch == "sorted"

    rng = np.random.RandomState(0)
    toks = jnp.asarray(rng.randint(0, 64, (4, 32)).astype(np.int32))
    tgt = jnp.roll(toks, -1, axis=1)
    l_dense = float(dense.loss(toks, tgt))
    l_sorted = float(srt.loss(toks, tgt))
    assert abs(l_dense - l_sorted) < 1e-4

    opt = optim.AdamW(1e-2)

    def loss_fn(m, batch, key, train_mode):
        t, tg = batch
        return (m.loss(t, tg, key=key, train=train_mode, moe_aux_coef=0.01),
                jnp.asarray(1.0), m)

    state = train.TrainState.init(srt, opt)
    step = jax.jit(train.make_train_step(opt, loss_fn))
    losses = []
    for i in range(30):
        state, (l, _) = step(state, (toks, tgt), jax.random.PRNGKey(i))
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.8


def test_moe_capacity_dispatch_matches_dense_when_undropped():
    """dispatch="capacity" (GShard one-hot dispatch/combine einsums) equals
    dense dispatch exactly when capacity covers every routed token —
    including with token grouping and a non-multiple trailing group."""
    from lamp_tpu.nn.moe import MoEMLP, SwiGLUMoE

    x = jax.random.normal(jax.random.PRNGKey(2), (3, 17, 16))
    for cls in (SwiGLUMoE, MoEMLP):
        dense = cls.init(16, 32, 4, key=jax.random.PRNGKey(0), top_k=2)
        for gs in (0, 16):  # one group; 17-token rows pad the last group
            cap = dense.replace(dispatch="capacity", capacity_factor=4.0,
                                group_size=gs)
            y1, _ = dense.forward(x)
            y2, _ = cap.forward(x)
            np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                       atol=1e-5, rtol=1e-5)

        def loss(m):
            y, _ = m.forward(x)
            return jnp.sum(y * y)

        g1 = jax.grad(loss)(dense)
        g2 = jax.grad(loss)(dense.replace(dispatch="capacity",
                                          capacity_factor=4.0))
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-4)


def test_moe_capacity_dispatch_drops_over_capacity():
    """With capacity_factor so small each expert takes ~1 token, over-
    capacity tokens contribute 0 from that expert (first choices claim
    capacity before second choices); output stays finite and differs from
    the dropless computation."""
    from lamp_tpu.nn.moe import SwiGLUMoE

    moe = SwiGLUMoE.init(8, 16, 2, key=jax.random.PRNGKey(0), top_k=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (12, 8))
    tight = moe.replace(dispatch="capacity", capacity_factor=0.2)
    y_drop, _ = tight.forward(x)
    y_full, _ = moe.forward(x)
    assert np.all(np.isfinite(np.asarray(y_drop)))
    # dropped token rows are exactly zero (top-1: the only route is gone)
    diffs = np.abs(np.asarray(y_drop) - np.asarray(y_full)).max(axis=1)
    zero_rows = np.abs(np.asarray(y_drop)).max(axis=1) < 1e-7
    assert zero_rows.sum() > 0 and (diffs > 1e-4).sum() == zero_rows.sum()


def test_moe_capacity_expert_parallel_sharded():
    """capacity dispatch under an 8-way ep mesh: the dispatched-token
    einsum output shards on E (XLA inserts the all-to-alls), and the
    sharded result equals the unsharded one."""
    from lamp_tpu import parallel
    from lamp_tpu.nn.moe import SwiGLUMoE, moe_sharding_rules

    mesh = parallel.make_mesh({"ep": 8})
    moe = SwiGLUMoE.init(16, 32, 8, key=jax.random.PRNGKey(0), top_k=2,
                         dispatch="capacity", capacity_factor=8.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 16))
    y_ref, _ = moe.forward(x)
    sharded = parallel.shard_tree(moe, mesh, moe_sharding_rules("ep"))
    y_sh, _ = jax.jit(lambda m, v: m.forward(v))(sharded, x)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               atol=2e-5, rtol=2e-5)
