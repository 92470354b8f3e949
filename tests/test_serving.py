"""Batch-serving engine tests: paged decode matches full forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lamp_tpu import nn
from lamp_tpu.models.serving import BatchServer


def _model():
    return nn.LanguageModelModule.init(
        vocab_size=23, context_length=32, num_blocks=2, embed_dim=32,
        attention_heads=4, key=jax.random.PRNGKey(0),
    )


def test_serving_logits_match_full_forward():
    model = _model()
    prompt = [1, 5, 2, 9, 11, 3]
    server = BatchServer(model, page_size=8, total_pages=32)
    server.add("a", prompt)
    logits = server._advance(["a"], jnp.asarray([prompt[-1]], jnp.int32))

    full, _ = model.forward(jnp.asarray([prompt], jnp.int32), train=False)
    np.testing.assert_allclose(
        np.asarray(logits[0]), np.asarray(full[0, -1]), atol=5e-3, rtol=5e-3
    )


def test_serving_batch_matches_single():
    """Two interleaved requests decode the same greedy tokens as each run
    alone (no cross-request leakage through the shared pool)."""
    model = _model()
    p1 = [1, 2, 3, 4]
    p2 = [9, 8, 7]

    def run_single(prompt, steps=5):
        s = BatchServer(model, page_size=8, total_pages=32)
        s.add("x", prompt)
        return [s.step()["x"] for _ in range(steps)]

    t1 = run_single(p1)
    t2 = run_single(p2)

    s = BatchServer(model, page_size=8, total_pages=32)
    s.add("a", p1)
    s.add("b", p2)
    both = [s.step() for _ in range(5)]
    assert [b["a"] for b in both] == t1
    assert [b["b"] for b in both] == t2


def test_serving_join_leave_and_page_reuse():
    model = _model()
    s = BatchServer(model, page_size=8, total_pages=8)
    s.add("a", [1, 2, 3])
    for _ in range(3):
        s.step()
    pages_used = len(s.seq_pages["a"])
    free_before = len(s.free_pages)
    s.remove("a")
    assert len(s.free_pages) == free_before + pages_used
    # pool reusable by a new request mid-flight
    s.add("b", [4, 5])
    out = s.step()
    assert "b" in out and 0 <= out["b"] < 23


def test_modern_serving_matches_full_forward():
    """ModernLM (RoPE + GQA) batch serving matches the dense forward."""
    from lamp_tpu.models.serving import ModernBatchServer

    model = nn.ModernLM.init(
        vocab_size=19, context_length=32, num_blocks=2, embed_dim=32,
        num_heads=4, num_kv_heads=2, key=jax.random.PRNGKey(0),
    )
    prompt = [1, 4, 7, 2, 9]
    server = ModernBatchServer(model, page_size=8, total_pages=32)
    server.add("a", prompt)
    logits = server._advance(["a"], jnp.asarray([prompt[-1]], jnp.int32))
    full, _ = model.forward(jnp.asarray([prompt], jnp.int32))
    np.testing.assert_allclose(
        np.asarray(logits[0]), np.asarray(full[0, -1]), atol=5e-3, rtol=5e-3
    )


def test_modern_serving_decodes():
    from lamp_tpu.models.serving import ModernBatchServer

    model = nn.ModernLM.init(
        vocab_size=19, context_length=32, num_blocks=1, embed_dim=32,
        num_heads=4, num_kv_heads=2, key=jax.random.PRNGKey(0),
    )
    s = ModernBatchServer(model, page_size=8, total_pages=32)
    s.add("a", [1, 2, 3])
    s.add("b", [4])
    toks = [s.step() for _ in range(4)]
    assert all(set(t) == {"a", "b"} for t in toks)
    assert all(0 <= v < 19 for t in toks for v in t.values())


def test_chunked_decode_matches_sequential():
    """advance_chunk over M tokens equals M sequential single-token
    advances (logits and KV state)."""
    import jax

    model = _model()
    prompt = [1, 5, 2, 9]
    extra = [11, 3, 7]

    seq_server = BatchServer(model, page_size=8, total_pages=32)
    seq_server.add("a", prompt)
    seq_logits = [
        np.asarray(seq_server._advance(["a"], jnp.asarray([t], jnp.int32))[0])
        for t in [prompt[-1]] + extra[:-1]
    ]

    chunk_server = BatchServer(model, page_size=8, total_pages=32)
    chunk_server.add("a", prompt)
    chunk = np.asarray([[prompt[-1]] + extra[:-1]], np.int32)  # [1, 3]
    clogits = np.asarray(chunk_server.advance_chunk(["a"], chunk)[0])
    for j in range(chunk.shape[1]):
        np.testing.assert_allclose(
            clogits[j], seq_logits[j], atol=5e-3, rtol=5e-3,
            err_msg=f"chunk position {j}",
        )
    assert chunk_server.seq_len["a"] == seq_server.seq_len["a"]


def test_chunked_decode_crosses_page_boundary():
    """Chunks that open new pages mid-chunk attend correctly."""
    model = _model()
    prompt = list(range(1, 8))  # 7 tokens, page_size 8 -> chunk crosses
    s1 = BatchServer(model, page_size=8, total_pages=32)
    s1.add("a", prompt)
    chunk = np.asarray([[prompt[-1], 9, 10, 11, 12]], np.int32)
    clogits = np.asarray(s1.advance_chunk(["a"], chunk)[0])

    s2 = BatchServer(model, page_size=8, total_pages=32)
    s2.add("a", prompt)
    for j, t in enumerate(chunk[0]):
        ref = np.asarray(s2._advance(["a"], jnp.asarray([t], jnp.int32))[0])
        np.testing.assert_allclose(clogits[j], ref, atol=5e-3, rtol=5e-3,
                                   err_msg=f"position {j}")


def test_rewind_reuses_slots():
    model = _model()
    s = BatchServer(model, page_size=8, total_pages=32)
    s.add("a", [1, 2, 3])
    base_len = s.seq_len["a"]
    s.advance_chunk(["a"], np.asarray([[3, 4, 5, 6]], np.int32))
    s.rewind("a", 3)
    assert s.seq_len["a"] == base_len + 1
    # decoding continues from the rewound state
    out = s.step()
    assert isinstance(out["a"], int)


def test_speculative_sampling_mode():
    """temperature > 0 rejection-sampling path: emits 1..k tokens per round
    with consistent KV bookkeeping across both servers."""
    from lamp_tpu.models.serving import SpeculativeDecoder

    target = _model()
    draft = nn.LanguageModelModule.init(
        vocab_size=23, context_length=32, num_blocks=1, embed_dim=16,
        attention_heads=2, key=jax.random.PRNGKey(7),
    )
    spec = SpeculativeDecoder(target, draft, k=3, page_size=8,
                              total_pages=64, temperature=0.8, seed=1)
    spec.add("x", [1, 5, 2, 9])
    total = 0
    for _ in range(4):
        before_t = spec.target.seq_len["x"]
        before_d = spec.draft.seq_len["x"]
        assert before_t == before_d
        toks = spec.step()["x"]
        assert 1 <= len(toks) <= 3
        assert all(0 <= t < 23 for t in toks)
        assert spec.target.seq_len["x"] == before_t + len(toks)
        assert spec.draft.seq_len["x"] == before_d + len(toks)
        total += len(toks)
    assert total >= 4


def test_speculative_matches_plain_greedy():
    """Speculative decoding emits exactly the target-only greedy stream —
    with a disagreeing draft (rejections + corrections) and with a perfect
    draft (the all-accepted fast path)."""
    from lamp_tpu.models.serving import SpeculativeDecoder

    target = _model()
    draft = nn.LanguageModelModule.init(
        vocab_size=23, context_length=32, num_blocks=1, embed_dim=16,
        attention_heads=2, key=jax.random.PRNGKey(7),
    )
    prompt = [1, 5, 2, 9]
    n_tokens = 10

    plain = BatchServer(target, page_size=8, total_pages=64)
    plain.add("x", prompt)
    expected = [plain.step()["x"] for _ in range(n_tokens)]

    for d in (draft, target):
        spec = SpeculativeDecoder(d and target, d, k=3, page_size=8,
                                  total_pages=64)
        spec.add("x", prompt)
        got = []
        while len(got) < n_tokens:
            got.extend(spec.step()["x"])
        assert got[:n_tokens] == expected, (d is target, got, expected)


def test_modern_serving_quantized_decode():
    """int4/int8 weight-only decode: logits stay close to the float server
    (cosine), tokens valid; base server rejects the flag."""
    from lamp_tpu.models.serving import BatchServer, ModernBatchServer

    model = nn.ModernLM.init(
        vocab_size=19, context_length=32, num_blocks=2, embed_dim=32,
        num_heads=4, num_kv_heads=2, key=jax.random.PRNGKey(0),
    )
    prompt = [1, 4, 7, 2, 9]
    ref = ModernBatchServer(model, page_size=8, total_pages=32)
    ref.add("a", prompt)
    ref_logits = np.asarray(
        ref._advance(["a"], jnp.asarray([prompt[-1]], jnp.int32))[0]
    )
    qs = ModernBatchServer(model, page_size=8, total_pages=32,
                           quantize_bits=8)
    qs.add("a", prompt)
    ql = np.asarray(
        qs._advance(["a"], jnp.asarray([prompt[-1]], jnp.int32))[0]
    )
    cos = float(
        (ql * ref_logits).sum()
        / (np.linalg.norm(ql) * np.linalg.norm(ref_logits) + 1e-9)
    )
    assert cos > 0.98, cos
    toks = qs.step()
    assert 0 <= toks["a"] < 19

    with pytest.raises(ValueError):
        BatchServer(_model(), page_size=8, total_pages=32, quantize_bits=4)


def test_modern_serving_int4_matches_dequantized_reference():
    """The packed int4 decode must equal a float server whose weights are
    the dequantized int4 values — isolates the packed-path correctness from
    inherent 4-bit quantization noise (~10% weight RMS on a Gaussian)."""
    import dataclasses

    from lamp_tpu import ops
    from lamp_tpu.models.serving import ModernBatchServer

    model = nn.ModernLM.init(
        vocab_size=19, context_length=32, num_blocks=2, embed_dim=32,
        num_heads=4, num_kv_heads=2, key=jax.random.PRNGKey(0), tied=False,
    )

    def deq(w):
        g = ops.int4_group_size(w.shape[0])
        p, s = ops.quantize_int4(w, group_size=g)
        return ops.dequantize_int4(p, s, dtype=w.dtype)

    def deq_lin(lin):
        return dataclasses.replace(lin, weight=deq(lin.weight))

    blocks = tuple(
        dataclasses.replace(
            b, w_q=deq_lin(b.w_q), w_k=deq_lin(b.w_k), w_v=deq_lin(b.w_v),
            w_o=deq_lin(b.w_o),
            mlp=dataclasses.replace(
                b.mlp, w1=deq_lin(b.mlp.w1), w3=deq_lin(b.mlp.w3),
                w2=deq_lin(b.mlp.w2),
            ),
        )
        for b in model.blocks
    )
    deq_model = dataclasses.replace(
        model, blocks=blocks, lm_head=deq_lin(model.lm_head)
    )

    # single-token prompt: no prefill, so BOTH servers build their KV purely
    # through the (quantized vs dequantized-float) decode path
    ref = ModernBatchServer(deq_model, page_size=8, total_pages=32)
    ref.add("a", [1])
    qs = ModernBatchServer(model, page_size=8, total_pages=32,
                           quantize_bits=4)
    qs.add("a", [1])
    for t in (1, 5, 7, 2):
        tok = jnp.asarray([t], jnp.int32)
        rl = np.asarray(ref._advance(["a"], tok)[0])
        ql = np.asarray(qs._advance(["a"], tok)[0])
        np.testing.assert_allclose(ql, rl, atol=2e-3, rtol=2e-3)


def test_step_many_matches_sequential_steps():
    """step_many(n) (n fused greedy decode steps in one program, on-device
    argmax feeding the next step) emits exactly the same tokens as n
    sequential step() calls."""
    from lamp_tpu.models.serving import BatchServer, ModernBatchServer

    model = _model()
    a = BatchServer(model, page_size=8, total_pages=32)
    b = BatchServer(model, page_size=8, total_pages=32)
    for s in (a, b):
        s.add("x", [1, 5, 2])
        s.add("y", [9, 4])
    seq = [a.step() for _ in range(4)]
    many = b.step_many(4)
    for sid in ("x", "y"):
        assert [st[sid] for st in seq] == many[sid], sid
    # lengths advanced identically; further decoding still agrees
    assert a.seq_len == b.seq_len
    assert a.step() == {k: v[0] for k, v in b.step_many(1).items()}

    mm = nn.ModernLM.init(
        vocab_size=19, context_length=32, num_blocks=1, embed_dim=32,
        num_heads=4, num_kv_heads=2, key=jax.random.PRNGKey(0),
    )
    ma = ModernBatchServer(mm, page_size=8, total_pages=32)
    mb = ModernBatchServer(mm, page_size=8, total_pages=32)
    ma.add("x", [1, 5]); mb.add("x", [1, 5])
    seq = [ma.step() for _ in range(3)]
    many = mb.step_many(3)
    assert [st["x"] for st in seq] == many["x"]


def test_step_many_sampling_mode():
    """temperature>0 step_many: on-device categorical sampling, tokens in
    range, lengths bumped by n."""
    model = _model()
    s = BatchServer(model, page_size=8, total_pages=32, temperature=0.8,
                    seed=3)
    s.add("x", [1, 5, 2])
    before = s.seq_len["x"]
    out = s.step_many(3)
    assert len(out["x"]) == 3
    assert all(0 <= t < 23 for t in out["x"])
    assert s.seq_len["x"] == before + 3
