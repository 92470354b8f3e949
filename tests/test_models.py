"""Model-family tests: conv, recurrent, transformer, LM, BERT, GNN.

Mirrors the reference's per-module gradient + overfit tests (nn.test.scala,
transformer.test.scala, gcn.test.scala, textgeneration.test.scala).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lamp_tpu import nn, optim
from .gradcheck import check_module_grads

KEY = jax.random.PRNGKey(0)


# ---------------------------------------------------------------- conv


def test_conv1d_matches_manual():
    m = nn.Conv1D.init(2, 3, 3, key=KEY, padding=1, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 8), jnp.float64)
    y = m(x)
    assert y.shape == (2, 3, 8)

    def build_loss(mm):
        out, _ = mm.forward(x)
        return jnp.sum(jnp.square(out))

    check_module_grads(build_loss, m, max_elems_per_leaf=8)


def test_conv2d_shapes_and_grad():
    m = nn.Conv2D.init(2, 4, 3, key=KEY, stride=2, padding=1, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8), jnp.float64)
    y = m(x)
    assert y.shape == (1, 4, 4, 4)

    def build_loss(mm):
        out, _ = mm.forward(x)
        return jnp.sum(jnp.square(out))

    check_module_grads(build_loss, m, max_elems_per_leaf=8)


def test_conv2d_matches_torch_semantics():
    """Cross-check against torch (CPU) to pin layout/padding conventions."""
    import torch

    m = nn.Conv2D.init(3, 5, 3, key=KEY, stride=1, padding=1, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 7, 7), jnp.float64)
    y = np.asarray(m(x))
    tw = torch.tensor(np.asarray(m.weight))
    tb = torch.tensor(np.asarray(m.bias))
    tx = torch.tensor(np.asarray(x))
    ty = torch.nn.functional.conv2d(tx, tw, tb, stride=1, padding=1).numpy()
    np.testing.assert_allclose(y, ty, atol=1e-10)


def test_conv2d_transposed_matches_torch():
    import torch

    m = nn.Conv2DTransposed.init(3, 2, 3, key=KEY, stride=2, padding=1,
                                 dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 5, 5), jnp.float64)
    y = np.asarray(m(x))
    tw = torch.tensor(np.asarray(m.weight))
    tb = torch.tensor(np.asarray(m.bias))
    tx = torch.tensor(np.asarray(x))
    ty = torch.nn.functional.conv_transpose2d(
        tx, tw, tb, stride=2, padding=1
    ).numpy()
    np.testing.assert_allclose(y, ty, atol=1e-10)


def test_pools_match_torch():
    import torch

    x = jax.random.normal(KEY, (2, 3, 8, 8), jnp.float64)
    tx = torch.tensor(np.asarray(x))
    np.testing.assert_allclose(
        np.asarray(nn.max_pool_2d(x, 2)),
        torch.nn.functional.max_pool2d(tx, 2).numpy(),
    )
    np.testing.assert_allclose(
        np.asarray(nn.avg_pool_2d(x, 2)),
        torch.nn.functional.avg_pool2d(tx, 2).numpy(),
        atol=1e-12,
    )


# ---------------------------------------------------------------- recurrent


@pytest.mark.parametrize("cls", [nn.RNN, nn.GRU, nn.LSTM])
def test_recurrent_shapes_and_grads(cls):
    m = cls.init(4, 8, key=KEY, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 4), jnp.float64)
    (y, state), _ = m.forward((x, None))
    assert y.shape == (2, 5, 8)

    def build_loss(mm):
        (out, _), _ = mm.forward((x, None))
        return jnp.sum(jnp.square(out))

    check_module_grads(build_loss, m, max_elems_per_leaf=6)


def test_lstm_matches_torch():
    import torch

    m = nn.LSTM.init(3, 4, key=KEY, dtype=jnp.float64, forget_bias=0.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 3), jnp.float64)
    (y, (h, c)), _ = m.forward((x, None))

    t = torch.nn.LSTM(3, 4, batch_first=True).double()
    sd = t.state_dict()
    sd["weight_ih_l0"] = torch.tensor(np.asarray(m.w_ih).T)
    sd["weight_hh_l0"] = torch.tensor(np.asarray(m.w_hh).T)
    sd["bias_ih_l0"] = torch.tensor(np.asarray(m.b_ih))
    sd["bias_hh_l0"] = torch.tensor(np.asarray(m.b_hh))
    t.load_state_dict(sd)
    with torch.no_grad():
        ty, (th, tc) = t(torch.tensor(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), ty.numpy(), atol=1e-10)
    np.testing.assert_allclose(np.asarray(h), th[0].numpy(), atol=1e-10)


def test_lstm_overfits_sequence():
    """Char-LSTM style overfit (mirrors textgeneration.test.scala)."""
    key = jax.random.PRNGKey(0)
    vocab, hidden, T = 10, 32, 12
    seq = jnp.array([[i % vocab for i in range(T + 1)]] * 4)
    x_tok, y_tok = seq[:, :-1], seq[:, 1:]

    class CharRNN(nn.Module):
        emb: nn.Embedding
        lstm: nn.LSTM
        head: nn.Linear

        def forward(self, tokens, *, key=None, train=False):
            e = self.emb(tokens)
            (h, _), _ = self.lstm.forward((e, None))
            return self.head(h), self

    k1, k2, k3 = jax.random.split(key, 3)
    model = CharRNN(
        emb=nn.Embedding.init(vocab, 16, key=k1),
        lstm=nn.LSTM.init(16, hidden, key=k2),
        head=nn.Linear.init(hidden, vocab, key=k3),
    )
    params, rest = nn.partition_params(model)
    opt = optim.AdamW(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            m = nn.combine(p, rest)
            logits, _ = m.forward(x_tok)
            return nn.losses.sequence_nll(logits, y_tok)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, state = opt.step(params, grads, state)
        return params, state, loss

    for i in range(150):
        params, state, loss = step(params, state)
    assert float(loss) < 0.1, float(loss)


# ---------------------------------------------------------------- transformer


def test_transformer_encoder_forward_and_grad():
    m = nn.TransformerEncoder.init(2, 16, 16, 4, key=KEY, dtype=jnp.float64,
                                   causal=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16), jnp.float64)
    (y, _), _ = m.forward((x, None))
    assert y.shape == (2, 6, 16)

    def build_loss(mm):
        (out, _), _ = mm.forward((x, None))
        return jnp.sum(jnp.square(out))

    check_module_grads(build_loss, m, max_elems_per_leaf=3)


def test_attention_length_masking():
    """Masked-out keys must not influence the output (reference sequenceMask
    semantics, Transformer.scala:663-750)."""
    m = nn.MultiheadAttention.init(8, 8, 8, 2, key=KEY, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 8), jnp.float64)
    lengths = jnp.array([4])
    y1, _ = m.forward((x, x, lengths))
    # perturb the masked-out tail of the keys/values
    x2 = x.at[:, 4:, :].set(99.0)
    y2, _ = m.forward((x2, x2, lengths))
    np.testing.assert_allclose(
        np.asarray(y1[:, :4]), np.asarray(y2[:, :4]), atol=1e-10
    )


def test_causal_masking_is_autoregressive():
    m = nn.TransformerEncoder.init(1, 8, 8, 2, key=KEY, dtype=jnp.float64,
                                   causal=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 8), jnp.float64)
    (y1, _), _ = m.forward((x, None))
    x2 = x.at[:, 3:, :].add(5.0)  # change the future
    (y2, _), _ = m.forward((x2, None))
    np.testing.assert_allclose(
        np.asarray(y1[:, :3]), np.asarray(y2[:, :3]), atol=1e-10
    )


def test_linearized_attention_shapes():
    m = nn.MultiheadAttention.init(8, 8, 8, 2, key=KEY, linearized=True,
                                   dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8), jnp.float64)
    y, _ = m.forward(x)
    assert y.shape == (2, 5, 8)


def test_full_transformer_encdec():
    m = nn.Transformer.init(1, 8, 8, 2, key=KEY, dtype=jnp.float64)
    src = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8), jnp.float64)
    tgt = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8), jnp.float64)
    y, _ = m.forward((src, jnp.array([5, 3]), tgt))
    assert y.shape == (2, 4, 8)


# ---------------------------------------------------------------- LM / BERT


def test_lm_forward_and_overfit():
    model = nn.LanguageModelModule.init(
        vocab_size=17, context_length=8, num_blocks=1, embed_dim=16,
        attention_heads=2, key=KEY,
    )
    tokens = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]] * 2)
    logits, _ = model.forward(tokens)
    assert logits.shape == (2, 8, 17)

    # tied embeddings: logits weight IS the embedding table
    params, rest = nn.partition_params(model)
    opt = optim.AdamW(1e-2)
    state = opt.init(params)
    target = jnp.array([[2, 3, 4, 5, 6, 7, 8, 9]] * 2)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            m = nn.combine(p, rest)
            lg, _ = m.forward(tokens)
            return nn.lm_loss(lg, target)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return *opt.step(params, grads, state), loss

    for _ in range(120):
        params, state, loss = step(params, state)
    assert float(loss) < 0.1, float(loss)


def test_bert_pretrain_forward():
    model = nn.BertPretrainModule.init(
        vocab_size=30, segments=2, max_length=16, num_blocks=1, embed_dim=16,
        attention_heads=2, key=KEY,
    )
    inp = nn.BertPretrainInput(
        tokens=jnp.ones((2, 10), jnp.int32),
        segments=jnp.zeros((2, 10), jnp.int32),
        positions=jnp.array([[1, 3], [2, 5]]),
        max_length=jnp.array([10, 8]),
    )
    (encoded, mlm_scores, nsp), _ = model.forward(inp)
    assert encoded.shape == (2, 10, 16)
    assert mlm_scores.shape == (2, 2, 30)
    assert nsp.shape == (2,)
    loss = nn.bert_loss(mlm_scores, jnp.array([[5, 7], [2, 9]]), nsp,
                        jnp.array([1, 0]))
    assert np.isfinite(float(loss))


# ---------------------------------------------------------------- graph


def _toy_graph(dtype=jnp.float64):
    nodes = jax.random.normal(KEY, (5, 4), dtype)
    edge_i = jnp.array([0, 1, 2, 3])
    edge_j = jnp.array([1, 2, 3, 4])
    edge_feat = jax.random.normal(jax.random.PRNGKey(5), (4, 3), dtype)
    pool = jnp.array([0, 0, 0, 1, 1])
    return nn.Graph(nodes, edge_feat, edge_i, edge_j, pool)


def test_gcn_forward_and_grad():
    g = _toy_graph()
    m = nn.GCN.init(nn.Linear.init(4, 4, key=KEY, dtype=jnp.float64))
    out, _ = m.forward(g)
    assert out.node_features.shape == (5, 4)

    def build_loss(mm):
        o, _ = mm.forward(g)
        return jnp.sum(jnp.square(o.node_features))

    check_module_grads(build_loss, m)


def test_gcn_aggregation_normalization():
    """Row of isolated node = its own feature (self loop, degree 1)."""
    nodes = jnp.eye(3, dtype=jnp.float64)
    # only edge 0->1; node 2 isolated
    agg = nn.gcn_aggregation(nodes, jnp.array([0]), jnp.array([1]))
    np.testing.assert_allclose(np.asarray(agg[2]), np.asarray(nodes[2]))


def test_graph_attention_and_mpnn():
    g = _toy_graph()
    gat = nn.GraphAttention.init(4, 3, 4, 4, 2, key=KEY, dtype=jnp.float64)
    out, _ = gat.forward(g)
    assert out.node_features.shape == (5, 4)

    mpnn = nn.MPNN.init(
        message=nn.Linear.init(11, 6, key=KEY, dtype=jnp.float64),
        update=nn.Linear.init(10, 4, key=jax.random.PRNGKey(7), dtype=jnp.float64),
    )
    out2, _ = mpnn.forward(g)
    assert out2.node_features.shape == (5, 4)


def test_vertex_pooling():
    g = _toy_graph()
    for mode in ["sum", "mean", "max"]:
        pooled = nn.vertex_pooling(g, mode, num_graphs=2)
        assert pooled.shape == (2, 4)
    s = np.asarray(nn.vertex_pooling(g, "sum", num_graphs=2))
    np.testing.assert_allclose(
        s[0], np.asarray(g.node_features[:3].sum(0)), atol=1e-12
    )


def test_gqa_attention():
    """Grouped-query attention: fewer KV heads, same output shape; with
    num_kv_heads == num_heads it must match standard MHA exactly."""
    m = nn.MultiheadAttention.init(8, 8, 8, 4, num_kv_heads=2, key=KEY,
                                   dtype=jnp.float64)
    assert m.w_k.weight.shape == (8, 4)  # 2 kv heads x head_dim 2
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 8), jnp.float64)
    y, _ = m.forward(x)
    assert y.shape == (2, 6, 8)

    full = nn.MultiheadAttention.init(8, 8, 8, 4, num_kv_heads=4, key=KEY,
                                      dtype=jnp.float64)
    base = nn.MultiheadAttention.init(8, 8, 8, 4, key=KEY, dtype=jnp.float64)
    y1, _ = full.forward(x)
    y2, _ = base.forward(x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-12)


def test_transformer_remat_matches():
    """remat=True must not change values or gradients (only memory)."""
    m1 = nn.TransformerEncoder.init(2, 16, 16, 2, key=KEY, causal=True,
                                    dtype=jnp.float64)
    m2 = m1.replace(remat=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16), jnp.float64)

    def loss(m):
        (y, _), _ = m.forward((x, None))
        return jnp.sum(jnp.square(y))

    np.testing.assert_allclose(float(loss(m1)), float(loss(m2)), rtol=1e-12)
    g1 = jax.grad(loss)(m1)
    g2 = jax.grad(loss)(m2)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
