"""Batch-serving engine tests: paged decode matches full forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lamp_tpu import nn
from lamp_tpu.models.sampling import SamplingParams
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


def test_moe_serving_quantized_decode():
    """int8 weight-only MoE decode: stacked expert tensors quantize per
    expert per channel; logits stay close to the float MoE server (cosine)
    on decode AND chunked decode; int4 is rejected."""
    from lamp_tpu.models.serving import ModernBatchServer

    model = nn.ModernLM.init(
        vocab_size=19, context_length=32, num_blocks=2, embed_dim=32,
        num_heads=4, num_kv_heads=2, moe_experts=4, moe_top_k=2,
        key=jax.random.PRNGKey(7),
    )
    prompt = [1, 4, 7, 2, 9]
    ref = ModernBatchServer(model, page_size=8, total_pages=32)
    qs = ModernBatchServer(model, page_size=8, total_pages=32,
                           quantize_bits=8)
    ref.add("a", prompt)
    qs.add("a", prompt)

    def cosine(x, y):
        return float((x * y).sum()
                     / (np.linalg.norm(x) * np.linalg.norm(y) + 1e-9))

    tok = jnp.asarray([prompt[-1]], jnp.int32)
    rl = np.asarray(ref._advance(["a"], tok)[0])
    ql = np.asarray(qs._advance(["a"], tok)[0])
    assert cosine(ql, rl) > 0.98, cosine(ql, rl)

    chunk = np.asarray([[2, 9, 5]], np.int32)
    rc = np.asarray(ref.advance_chunk(["a"], chunk))[0, -1]
    qc = np.asarray(qs.advance_chunk(["a"], chunk))[0, -1]
    assert cosine(qc, rc) > 0.98, cosine(qc, rc)

    toks = qs.step()
    assert 0 <= toks["a"] < 19

    with pytest.raises(NotImplementedError):
        ModernBatchServer(model, page_size=8, total_pages=32,
                          quantize_bits=4)


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


# -- per-request sampling + continuous-batching engine -----------------------

def test_sample_tokens_semantics():
    """Batched per-row sampler: greedy rows, top-k=1 == greedy, tiny top-p
    == greedy, filters restrict support."""
    from lamp_tpu.models.sampling import sample_tokens

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(6, 40).astype(np.float32) * 3)
    key = jax.random.PRNGKey(7)
    greedy = np.asarray(jnp.argmax(logits, -1))

    # temperature 0 rows are greedy even alongside hot rows
    temps = jnp.asarray([0.0, 1.0, 0.0, 2.0, 0.0, 1.0], jnp.float32)
    out = np.asarray(sample_tokens(logits, key, temps))
    assert out[0] == greedy[0] and out[2] == greedy[2] and out[4] == greedy[4]

    # top_k=1 forces the argmax whatever the temperature
    out = np.asarray(sample_tokens(
        logits, key, jnp.full((6,), 5.0),
        top_k=jnp.full((6,), 1, jnp.int32),
    ))
    np.testing.assert_array_equal(out, greedy)

    # tiny top_p keeps only the head of the distribution
    out = np.asarray(sample_tokens(
        logits, key, jnp.full((6,), 5.0),
        top_p=jnp.full((6,), 1e-6, jnp.float32),
    ))
    np.testing.assert_array_equal(out, greedy)

    # top_k=3 restricts the support to each row's 3 best tokens
    top3 = np.argsort(-np.asarray(logits), axis=-1)[:, :3]
    for trial in range(20):
        out = np.asarray(sample_tokens(
            logits, jax.random.PRNGKey(trial), jnp.full((6,), 3.0),
            top_k=jnp.full((6,), 3, jnp.int32),
        ))
        for i in range(6):
            assert out[i] in top3[i]

    # per-row mix: row0 top_k=1 (greedy), row1 unrestricted hot sampling
    l2 = jnp.asarray(rng.randn(2, 40).astype(np.float32))
    seen = set()
    for trial in range(25):
        out = np.asarray(sample_tokens(
            l2, jax.random.PRNGKey(trial), jnp.asarray([1.0, 3.0]),
            top_k=jnp.asarray([1, 0], jnp.int32),
        ))
        assert out[0] == int(jnp.argmax(l2[0]))
        seen.add(int(out[1]))
    assert len(seen) > 3  # hot row actually samples


def test_per_request_sampling_params():
    """Requests with different SamplingParams decode independently: a greedy
    request inside a hot batch emits exactly the solo-greedy stream."""
    from lamp_tpu.models.serving import SamplingParams

    model = _model()
    solo = BatchServer(model, page_size=8, total_pages=32)
    solo.add("g", [1, 2, 3])
    want = [solo.step()["g"] for _ in range(4)]

    s = BatchServer(model, page_size=8, total_pages=64, seed=5)
    s.add("g", [1, 2, 3], SamplingParams(temperature=0.0))
    s.add("h", [9, 8, 7], SamplingParams(temperature=1.5, top_k=10))
    got = [s.step() for _ in range(4)]
    assert [st["g"] for st in got] == want
    assert all(0 <= st["h"] < 23 for st in got)

    # same through the fused multi-step path
    s2 = BatchServer(model, page_size=8, total_pages=64, seed=5)
    s2.add("g", [1, 2, 3], SamplingParams(temperature=0.0))
    s2.add("h", [9, 8, 7], SamplingParams(temperature=1.5, top_p=0.9))
    many = s2.step_many(4)
    assert many["g"] == want


def test_serving_engine_continuous_batching():
    """Engine drains a queue bigger than the page pool allows concurrently:
    admission waits for pages, stop tokens and max_tokens terminate, results
    match direct greedy decoding."""
    from lamp_tpu.models.serving import SamplingParams, ServingEngine

    model = _model()

    # direct greedy reference for one prompt
    direct = BatchServer(model, page_size=8, total_pages=32)
    direct.add("r", [1, 2, 3])
    want = [direct.step()["r"] for _ in range(6)]

    server = BatchServer(model, page_size=8, total_pages=16)
    engine = ServingEngine(server, decode_steps=3)
    rids = []
    for i in range(5):
        rids.append(engine.submit(
            [1, 2, 3], SamplingParams(max_tokens=6), request_id=f"q{i}"
        ))
    results = engine.run()
    assert set(results) == set(rids)
    for rid in rids:
        assert results[rid] == want

    # stop token terminates early and is not emitted: output must be the
    # greedy stream truncated at the FIRST occurrence of the stop token
    # (the untrained toy model may emit repeats, so index it rather than
    # assuming want[2] is novel)
    stop_tok = want[2]
    server2 = BatchServer(model, page_size=8, total_pages=16)
    engine2 = ServingEngine(server2, decode_steps=4)
    rid = engine2.submit([1, 2, 3], SamplingParams(
        max_tokens=6, stop_tokens=(stop_tok,)
    ))
    results2 = engine2.run()
    assert results2[rid] == want[:want.index(stop_tok)]

    # pages freed: the pool is fully returned after run()
    assert len(server.free_pages) == server.total_pages - 1
    assert not server.seq_pages


def test_serving_engine_oversized_request_stalls():
    from lamp_tpu.models.serving import SamplingParams, ServingEngine

    model = _model()
    server = BatchServer(model, page_size=8, total_pages=2)
    engine = ServingEngine(server)
    engine.submit(list(range(1, 20)), SamplingParams(max_tokens=30))
    with pytest.raises(RuntimeError, match="stalled"):
        engine.run()


# -- prefix caching ----------------------------------------------------------

def test_prefix_cache_full_hit_and_partial_hit():
    """Shared prompt prefixes reuse physical pages; decode is identical to
    an uncached server, including after a partial hit (suffix prefill)."""
    model = _model()
    prompt = list(range(1, 18))  # 16 KV rows = 2 full pages at page_size 8

    def reference_stream(p, steps=4):
        b = BatchServer(model, page_size=8, total_pages=32)
        b.add("r", p)
        return [b.step()["r"] for _ in range(steps)]

    s = BatchServer(model, page_size=8, total_pages=64,
                    enable_prefix_cache=True)
    s.add("a", prompt)
    assert s.cache_hit_tokens == 0
    s.add("b", prompt[:-1] + [9])       # same 16 KV rows, different pending
    assert s.cache_hit_tokens == 16     # full-page hit
    assert s.seq_pages["a"][:2] == s.seq_pages["b"][:2]
    assert s._page_refs[s.seq_pages["a"][0]] == 2

    prompt_c = prompt[:16] + [4, 7, 6]  # 18 KV rows: 2 cached + 2 fresh
    s.add("c", prompt_c)
    assert s.cache_hit_tokens == 32
    assert s.cache_miss_tokens == 16 + 2  # a's cold prefill + c's suffix

    want_a = reference_stream(prompt)
    want_b = reference_stream(prompt[:-1] + [9])
    want_c = reference_stream(prompt_c)
    out = [s.step() for _ in range(4)]
    assert [o["a"] for o in out] == want_a
    assert [o["b"] for o in out] == want_b
    assert [o["c"] for o in out] == want_c


def test_prefix_cache_survives_removal_and_evicts_under_pressure():
    model = _model()
    prompt = list(range(1, 18))
    s = BatchServer(model, page_size=8, total_pages=8,
                    enable_prefix_cache=True)
    s.add("a", prompt)
    s.step()
    s.remove("a")
    # pages retained in the reclaimable cache, not freed outright
    assert len(s._lru) == 2
    s.add("b", prompt)  # hit straight from the LRU
    assert s.cache_hit_tokens == 16
    assert not s._lru
    s.remove("b")
    # allocation pressure reclaims cached pages: distinct prompts that
    # together exceed the pool still decode fine
    s.add("c", list(range(30, 47)))
    s.add("d", [2] * 9)
    s.step()
    s.remove("c")
    s.remove("d")
    # pool fully recoverable: free + cached-reclaimable == all usable pages
    assert s.available_pages == s.total_pages - 1


def test_prefix_cache_copy_on_write_on_rewind():
    """Rewinding into a shared page then advancing must not corrupt the
    other sequence's cached KV (copy-on-write)."""
    model = _model()
    prompt = list(range(1, 18))  # 16 KV rows, exactly 2 pages
    ref = BatchServer(model, page_size=8, total_pages=32)
    ref.add("r", prompt)
    want = [ref.step()["r"] for _ in range(4)]

    s = BatchServer(model, page_size=8, total_pages=32,
                    enable_prefix_cache=True)
    s.add("a", prompt)
    s.add("b", prompt)
    shared = s.seq_pages["b"][1]
    # rewind b one token INTO the shared second page, then advance with a
    # different token -> must trigger COW, leaving a's page untouched
    s.rewind("b", 1)
    s.last_token["b"] = 3
    s._advance(["b"], jnp.asarray([3], jnp.int32))
    assert s.seq_pages["b"][1] != shared          # b got its own copy
    assert s.seq_pages["a"][1] == shared
    assert s._page_refs[shared] == 1
    # a still decodes the reference stream
    out = [s.step()["a"] for _ in range(4)]
    assert out == want


# -- tensor-parallel serving -------------------------------------------------

def test_tensor_parallel_modern_server_matches_single():
    """ModernBatchServer(mesh=) shards heads/MLP/KV pools over a tp axis;
    decode and chunked-decode logits match the single-device server."""
    from lamp_tpu import parallel
    from lamp_tpu.models.serving import ModernBatchServer

    mm = nn.ModernLM.init(
        vocab_size=19, context_length=32, num_blocks=2, embed_dim=32,
        num_heads=4, num_kv_heads=2, key=jax.random.PRNGKey(0),
    )
    single = ModernBatchServer(mm, page_size=8, total_pages=32)
    mesh = parallel.make_mesh({"tp": 2}, devices=jax.devices()[:2])
    tp = ModernBatchServer(mm, mesh=mesh, page_size=8, total_pages=32)

    prompt = [1, 5, 2, 9, 11, 3, 7, 4, 6]
    single.add("x", prompt)
    tp.add("x", prompt)
    assert single.seq_len["x"] == tp.seq_len["x"] == len(prompt) - 1

    # same forced token sequence through both; logits must agree step-wise
    for tok in (3, 8, 1, 12):
        la = single._advance(["x"], jnp.asarray([tok], jnp.int32))
        lb = tp._advance(["x"], jnp.asarray([tok], jnp.int32))
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), atol=2e-3, rtol=2e-3
        )

    # chunked multi-token path agrees too (speculative verification path)
    chunk = np.asarray([[2, 9, 5]], np.int32)
    ca = single.advance_chunk(["x"], chunk)
    cb = tp.advance_chunk(["x"], chunk)
    np.testing.assert_allclose(
        np.asarray(ca), np.asarray(cb), atol=2e-3, rtol=2e-3
    )

    # a second concurrent request exercises batched TP decode
    single.add("y", [4, 4, 2])
    tp.add("y", [4, 4, 2])
    la = single._advance(["x", "y"], jnp.asarray([5, 2], jnp.int32))
    lb = tp._advance(["x", "y"], jnp.asarray([5, 2], jnp.int32))
    np.testing.assert_allclose(
        np.asarray(la), np.asarray(lb), atol=2e-3, rtol=2e-3
    )


def test_expert_parallel_moe_server_matches_single():
    """ModernBatchServer(mesh=) on a MoE model shards the stacked expert
    tensors over the tp axis (expert parallelism); decode / chunked decode /
    prefill logits match the single-device MoE server."""
    from lamp_tpu import parallel
    from lamp_tpu.models.serving import ModernBatchServer

    mm = nn.ModernLM.init(
        vocab_size=19, context_length=32, num_blocks=2, embed_dim=32,
        num_heads=4, num_kv_heads=2, moe_experts=4, moe_top_k=2,
        key=jax.random.PRNGKey(3),
    )
    single = ModernBatchServer(mm, page_size=8, total_pages=32)
    mesh = parallel.make_mesh({"tp": 2}, devices=jax.devices()[:2])
    ep = ModernBatchServer(mm, mesh=mesh, page_size=8, total_pages=32)

    prompt = [1, 5, 2, 9, 11, 3, 7, 4, 6]
    single.add("x", prompt)
    ep.add("x", prompt)  # TP prompts prefill through the chunked MoE path
    assert single.seq_len["x"] == ep.seq_len["x"] == len(prompt) - 1

    for tok in (3, 8, 1, 12):
        la = single._advance(["x"], jnp.asarray([tok], jnp.int32))
        lb = ep._advance(["x"], jnp.asarray([tok], jnp.int32))
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), atol=2e-3, rtol=2e-3
        )

    chunk = np.asarray([[2, 9, 5]], np.int32)
    ca = single.advance_chunk(["x"], chunk)
    cb = ep.advance_chunk(["x"], chunk)
    np.testing.assert_allclose(
        np.asarray(ca), np.asarray(cb), atol=2e-3, rtol=2e-3
    )

    # batched EP decode with a second request
    single.add("y", [4, 4, 2])
    ep.add("y", [4, 4, 2])
    la = single._advance(["x", "y"], jnp.asarray([5, 2], jnp.int32))
    lb = ep._advance(["x", "y"], jnp.asarray([5, 2], jnp.int32))
    np.testing.assert_allclose(
        np.asarray(la), np.asarray(lb), atol=2e-3, rtol=2e-3
    )


def test_expert_parallel_requires_divisible_experts():
    from lamp_tpu import parallel
    from lamp_tpu.models.serving import ModernBatchServer

    mm = nn.ModernLM.init(
        vocab_size=19, context_length=32, num_blocks=1, embed_dim=32,
        num_heads=4, num_kv_heads=2, moe_experts=3, moe_top_k=1,
        key=jax.random.PRNGKey(4),
    )
    mesh = parallel.make_mesh({"tp": 2}, devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="num_experts"):
        ModernBatchServer(mm, mesh=mesh, page_size=8, total_pages=32)


def test_tensor_parallel_server_step_many_and_engine():
    from lamp_tpu import parallel
    from lamp_tpu.models.serving import (
        ModernBatchServer, SamplingParams, ServingEngine,
    )

    mm = nn.ModernLM.init(
        vocab_size=19, context_length=32, num_blocks=1, embed_dim=32,
        num_heads=4, num_kv_heads=2, key=jax.random.PRNGKey(1),
    )
    mesh = parallel.make_mesh({"tp": 2}, devices=jax.devices()[:2])
    tp = ModernBatchServer(mm, mesh=mesh, page_size=8, total_pages=32)
    engine = ServingEngine(tp, decode_steps=3)
    engine.submit([1, 5, 2], SamplingParams(max_tokens=6), request_id="a")
    engine.submit([9, 8], SamplingParams(temperature=0.9, top_k=5,
                                         max_tokens=6), request_id="b")
    res = engine.run()
    assert set(res) == {"a", "b"}
    assert all(len(v) == 6 for v in res.values())
    assert all(0 <= t < 19 for v in res.values() for t in v)


# -- multi-LoRA serving ------------------------------------------------------

def _modern_base(key=0):
    return nn.ModernLM.init(
        vocab_size=19, context_length=32, num_blocks=2, embed_dim=32,
        num_heads=4, num_kv_heads=2, key=jax.random.PRNGKey(key),
    )


def _random_adapter(base, rank, seed, match=None):
    """lora_inject + randomize B so the adapter actually changes outputs."""
    from lamp_tpu.nn.lora import LoRALinear, _map_linears

    tuned = nn.lora_inject(base, rank=rank, key=jax.random.PRNGKey(seed),
                           match=match)
    keys = iter(jax.random.split(jax.random.PRNGKey(seed + 100), 256))

    def visit(path, node):
        if type(node) is LoRALinear:
            b = 0.3 * jax.random.normal(next(keys), node.lora_b.shape,
                                        node.lora_b.dtype)
            return node.replace(lora_b=b)
        return None

    return _map_linears(tuned, visit, ())


def test_multi_lora_serving_matches_merged_models():
    """One batch mixing base + two adapters (different ranks): each row's
    logits match a dedicated server running that adapter's merged model."""
    from lamp_tpu.models.serving import ModernBatchServer

    base = _modern_base()
    ad1 = _random_adapter(base, rank=3, seed=1,
                          match=lambda p: p.endswith(("w_q", "w_v")))
    ad2 = _random_adapter(base, rank=5, seed=2,
                          match=lambda p: "mlp" in p or p.endswith("w_o"))

    server = ModernBatchServer(base, page_size=8, total_pages=64)
    server.register_adapter("a1", ad1)
    server.register_adapter("a2", ad2)

    prompt = [1, 5, 2, 9, 11]
    server.add("rb", prompt)
    server.add("r1", prompt, adapter="a1")
    server.add("r2", prompt, adapter="a2")

    refs = {}
    for rid, model in (("rb", base), ("r1", nn.lora_merge(ad1)),
                       ("r2", nn.lora_merge(ad2))):
        s = ModernBatchServer(model, page_size=8, total_pages=32)
        s.add("x", prompt)
        refs[rid] = s._advance(["x"], jnp.asarray([7], jnp.int32))

    got = server._advance(["rb", "r1", "r2"],
                          jnp.asarray([7, 7, 7], jnp.int32))
    for i, rid in enumerate(("rb", "r1", "r2")):
        np.testing.assert_allclose(
            np.asarray(got[i]), np.asarray(refs[rid][0]),
            atol=2e-3, rtol=2e-3, err_msg=rid,
        )

    # chunked path (speculative verification) agrees per adapter too
    chunk = np.asarray([[3, 8], [3, 8], [3, 8]], np.int32)
    got_c = server.advance_chunk(["rb", "r1", "r2"], chunk)
    for rid, model in (("r1", nn.lora_merge(ad1)),):
        s = ModernBatchServer(model, page_size=8, total_pages=32)
        s.add("x", prompt)
        s._advance(["x"], jnp.asarray([7], jnp.int32))
        ref_c = s.advance_chunk(["x"], chunk[:1])
        np.testing.assert_allclose(
            np.asarray(got_c[1]), np.asarray(ref_c[0]),
            atol=2e-3, rtol=2e-3,
        )


def test_multi_lora_prefix_cache_partitioned_by_adapter():
    """The same prompt under different adapters must NOT share cached
    pages (their K/V differ); same adapter still hits."""
    from lamp_tpu.models.serving import ModernBatchServer

    base = _modern_base()
    ad1 = _random_adapter(base, rank=2, seed=3,
                          match=lambda p: p.endswith("w_k"))
    server = ModernBatchServer(base, page_size=8, total_pages=64,
                               enable_prefix_cache=True)
    server.register_adapter("a1", ad1)
    prompt = list(range(1, 18))  # 16 KV rows = 2 full pages
    server.add("b0", prompt)
    server.add("b1", prompt, adapter="a1")
    assert server.cache_hit_tokens == 0          # no cross-adapter hit
    assert server.seq_pages["b0"][:2] != server.seq_pages["b1"][:2]
    server.add("b2", prompt, adapter="a1")       # same adapter: hits
    assert server.cache_hit_tokens == 16
    assert server.seq_pages["b2"][:2] == server.seq_pages["b1"][:2]


def test_multi_lora_engine_and_unknown_adapter():
    from lamp_tpu.models.serving import (
        ModernBatchServer, SamplingParams, ServingEngine,
    )

    base = _modern_base()
    ad1 = _random_adapter(base, rank=2, seed=4,
                          match=lambda p: p.endswith("w_q"))
    server = ModernBatchServer(base, page_size=8, total_pages=64)
    server.register_adapter("fr", ad1)
    engine = ServingEngine(server, decode_steps=3)
    engine.submit([1, 2, 3], SamplingParams(max_tokens=6), request_id="x",
                  adapter="fr")
    engine.submit([1, 2, 3], SamplingParams(max_tokens=6), request_id="y")
    res = engine.run()
    assert len(res["x"]) == 6 and len(res["y"]) == 6

    # adapter-selected greedy stream == merged-model greedy stream
    merged_srv = ModernBatchServer(nn.lora_merge(ad1), page_size=8,
                                   total_pages=32)
    merged_srv.add("m", [1, 2, 3])
    want = [merged_srv.step()["m"] for _ in range(6)]
    assert res["x"] == want

    with pytest.raises(ValueError, match="unknown adapter"):
        engine.submit([1, 2], adapter="nope")


# -- repetition / presence / frequency penalties -----------------------------

def test_apply_penalties_semantics():
    from lamp_tpu.models.sampling import apply_penalties

    logits = jnp.asarray([[2.0, -1.0, 0.5, 3.0]])
    counts = jnp.asarray([[2, 0, 1, 0]], jnp.int32)   # generated: t0 x2, t2 x1
    pmask = jnp.asarray([[False, True, False, False]])  # prompt: t1
    out = np.asarray(apply_penalties(
        logits, counts, pmask,
        jnp.asarray([0.5]), jnp.asarray([0.25]), jnp.asarray([2.0]),
    ))[0]
    # t0: rep 2/2=1.0, freq -0.25*2, presence -0.5 -> 0.0
    # t1: prompt-only: rep -1*2=-2 (negative multiplied), no freq/presence
    # t2: rep 0.5/2=0.25, freq -0.25, presence -0.5 -> -0.5
    # t3: untouched
    np.testing.assert_allclose(out, [0.0, -2.0, -0.5, 3.0], atol=1e-6)


def test_presence_penalty_forces_distinct_tokens():
    """A huge presence penalty makes greedy decode emit all-distinct
    tokens, identically through step() and the fused step_many()."""
    from lamp_tpu.models.serving import SamplingParams

    model = _model()  # vocab 23
    params = SamplingParams(presence_penalty=1000.0)

    s1 = BatchServer(model, page_size=8, total_pages=32)
    s1.add("a", [1, 2, 3], params)
    stream1 = [s1.step()["a"] for _ in range(8)]
    assert len(set(stream1)) == 8  # no repeats possible

    s2 = BatchServer(model, page_size=8, total_pages=32)
    s2.add("a", [1, 2, 3], params)
    stream2 = s2.step_many(8)["a"]
    assert stream2 == stream1

    # sanity: without the penalty the greedy stream repeats within 8 tokens
    s3 = BatchServer(model, page_size=8, total_pages=32)
    s3.add("a", [1, 2, 3])
    plain = [s3.step()["a"] for _ in range(8)]
    assert plain != stream1


def test_nucleus_candidate_cap_matches_exact_reference():
    """With NUCLEUS_CAND shrunk below the vocab, the filter still matches
    the exact sequential top-k -> top-p semantics whenever the nucleus fits
    the candidate set — including top_k equal to the cap."""
    import lamp_tpu.models.sampling as S
    from lamp_tpu.models.sampling import _NEG_INF, _apply_filters

    def seq_ref(scaled, top_k, top_p):
        out = np.asarray(scaled).copy()
        for i in range(out.shape[0]):
            row = out[i]
            k = int(top_k[i]) or row.size
            kth = np.sort(row)[::-1][min(k, row.size) - 1]
            row[row < kth] = -np.inf
            order = np.argsort(-row)
            p = np.exp(row[order] - np.nanmax(row[order]))
            p[~np.isfinite(p)] = 0
            p = p / p.sum()
            cs = np.cumsum(p)
            keep_sorted = (cs - p) < float(top_p[i])
            row[row < row[order][keep_sorted].min()] = -np.inf
        return out

    rng = np.random.RandomState(5)
    # peaked logits: the nucleus always fits in the top-8 candidates
    scaled = jnp.asarray(
        np.sort(rng.randn(8, 64).astype(np.float32), axis=-1)[:, ::-1]
        * np.linspace(3.0, 0.1, 64)[None, :]
    )
    perm = rng.permutation(64)
    scaled = scaled[:, perm]
    # includes top_k == cap (8) — the z-normalizer must use top-k mass
    top_k = jnp.asarray([0, 3, 8, 5, 8, 2, 0, 4], jnp.int32)
    top_p = jnp.asarray(
        [0.6, 0.5, 0.6, 1.0, 0.9, 0.8, 0.3, 0.7], jnp.float32
    )
    saved = S.NUCLEUS_CAND
    S.NUCLEUS_CAND = 8
    try:
        got = np.asarray(_apply_filters(scaled, top_k, top_p,
                                        max_top_k=8))
    finally:
        S.NUCLEUS_CAND = saved
    want = seq_ref(scaled, top_k, top_p)
    mg, mw = got > _NEG_INF / 2, np.isfinite(want)
    np.testing.assert_array_equal(mg, mw)


def test_register_adapter_rejects_unservable_projections():
    from lamp_tpu.models.serving import ModernBatchServer

    base = nn.ModernLM.init(
        vocab_size=19, context_length=32, num_blocks=1, embed_dim=32,
        num_heads=4, num_kv_heads=2, key=jax.random.PRNGKey(0), tied=False,
    )
    tuned = nn.lora_inject(base, rank=2, key=jax.random.PRNGKey(1))
    server = ModernBatchServer(base, page_size=8, total_pages=32)
    with pytest.raises(ValueError, match="not servable"):
        server.register_adapter("bad", tuned)


def test_modern_serving_windowed_matches_full_forward():
    """A windowed ModernLM (per-block sliding windows, incl. a window
    smaller than the prompt) serves logits matching the dense forward —
    prefill AND several decode steps."""
    from lamp_tpu.models.serving import ModernBatchServer

    model = nn.ModernLM.init(
        vocab_size=19, context_length=32, num_blocks=2, embed_dim=32,
        num_heads=4, num_kv_heads=2, window=[None, 4],
        key=jax.random.PRNGKey(0),
    )
    prompt = [1, 4, 7, 2, 9, 3, 6, 8, 5, 1, 2]  # longer than the window
    server = ModernBatchServer(model, page_size=8, total_pages=32)
    server.add("a", prompt)
    seq = list(prompt)
    for _ in range(3):
        logits = server._advance(["a"], jnp.asarray([seq[-1]], jnp.int32))
        full, _ = model.forward(jnp.asarray([seq], jnp.int32))
        np.testing.assert_allclose(
            np.asarray(logits[0]), np.asarray(full[0, -1]),
            atol=5e-3, rtol=5e-3,
        )
        seq.append(int(np.argmax(np.asarray(logits[0]))))


def test_windowed_kv_release_bounds_pages_and_matches_unreleased():
    """All-windowed ModernLM: pages fully below every layer's band are
    released mid-generation (KV memory O(window), the Mistral rolling
    cache), and the emitted tokens are identical to a server with release
    disabled (released pages can never be attended)."""
    from lamp_tpu.models.serving import ModernBatchServer

    model = nn.ModernLM.init(
        vocab_size=19, context_length=64, num_blocks=2, embed_dim=32,
        num_heads=4, num_kv_heads=2, window=6, key=jax.random.PRNGKey(0),
    )
    prompt = [1, 4, 7, 2, 9]
    a = ModernBatchServer(model, page_size=4, total_pages=32)
    b = ModernBatchServer(model, page_size=4, total_pages=32)
    b._release_pages = lambda seq_id: None  # keep every page
    a.add("x", prompt)
    b.add("x", prompt)
    ta = [a.step()["x"] for _ in range(40)]
    tb = [b.step()["x"] for _ in range(40)]
    assert ta == tb
    held_a = sum(p >= 0 for p in a.seq_pages["x"])
    held_b = sum(p >= 0 for p in b.seq_pages["x"])
    bound = a.kv_bound_for(None)
    assert bound == 6
    assert held_b == len(b.seq_pages["x"])      # nothing released
    assert held_a <= -(-(bound + 4) // 4) + 1   # band + slack pages only
    assert len(a.free_pages) > len(b.free_pages)


def test_per_request_window_matches_model_window():
    """A per-request window on a windowless model emits the same greedy
    stream as the same weights built with a static model window; an
    unwindowed request in the same batch is unaffected."""
    from lamp_tpu.models.serving import ModernBatchServer

    kw = dict(vocab_size=19, context_length=48, num_blocks=2, embed_dim=32,
              num_heads=4, num_kv_heads=2)
    base = nn.ModernLM.init(key=jax.random.PRNGKey(3), **kw)
    winm = nn.ModernLM.init(key=jax.random.PRNGKey(3), window=5, **kw)
    prompt = [1, 4, 7, 2, 9, 3, 6, 8]  # longer than the window

    sw = ModernBatchServer(winm, page_size=8, total_pages=32)
    sw.add("m", prompt)
    want = [sw.step()["m"] for _ in range(12)]

    sb = ModernBatchServer(base, page_size=8, total_pages=32)
    sb.add("full", prompt)
    full_alone = [sb.step()["full"] for _ in range(12)]

    s = ModernBatchServer(base, page_size=8, total_pages=32)
    s.add("r", prompt, window=5)
    s.add("full", prompt)
    got = [s.step() for _ in range(12)]
    assert [g["r"] for g in got] == want
    assert [g["full"] for g in got] == full_alone
    # bounded KV applies to the windowed request only
    assert s.seq_released["r"] > 0
    assert s.seq_released["full"] == 0


def test_engine_windowed_admission_bounded_pool():
    """A pool too small for an unbounded generation stalls, but the same
    request with a per-request window fits (O(window) reservation)."""
    from lamp_tpu.models.serving import ModernBatchServer, ServingEngine
    from lamp_tpu.models.sampling import SamplingParams

    model = nn.ModernLM.init(
        vocab_size=19, context_length=64, num_blocks=1, embed_dim=32,
        num_heads=4, num_kv_heads=2, key=jax.random.PRNGKey(1),
    )

    def make_engine():
        server = ModernBatchServer(model, page_size=4, total_pages=8)
        return ServingEngine(server, decode_steps=4, max_batch=4)

    eng = make_engine()
    eng.submit([1, 4, 7, 2, 9], SamplingParams(max_tokens=30),
               request_id="u")
    with pytest.raises(RuntimeError, match="stalled"):
        eng.run()

    eng = make_engine()
    eng.submit([1, 4, 7, 2, 9], SamplingParams(max_tokens=30),
               request_id="w", window=6)
    out = eng.run()
    assert len(out["w"]) == 30


def test_lora_draft_speculative_matches_target_greedy():
    """LoRA-draft speculation (early-exit draft sharing the target's
    weights + a LoRA adapter): the emitted greedy stream is identical to
    target-only decoding even with a randomized (untrained) adapter."""
    from lamp_tpu.models.serving import (
        LoRADraftSpeculativeDecoder, ModernBatchServer, draft_view,
    )
    from lamp_tpu.nn.lora import LoRALinear, _map_linears, lora_inject

    model = nn.ModernLM.init(
        vocab_size=19, context_length=64, num_blocks=3, embed_dim=32,
        num_heads=4, num_kv_heads=2, key=jax.random.PRNGKey(0),
    )
    lora = lora_inject(draft_view(model, 1), rank=2,
                       key=jax.random.PRNGKey(1))
    # randomize lora_b (wrap inits it to zero) so the adapter actually
    # perturbs the draft's predictions
    box = [jax.random.PRNGKey(2)]

    def visit(path, node):
        if type(node) is LoRALinear:
            box[0], sub = jax.random.split(box[0])
            return node.replace(lora_b=0.3 * jax.random.normal(
                sub, node.lora_b.shape, node.lora_b.dtype))
        return None

    lora = _map_linears(lora, visit, ())

    prompt = [1, 4, 7, 2, 9]
    n_tokens = 12
    plain = ModernBatchServer(model, page_size=8, total_pages=64)
    plain.add("x", prompt)
    expected = [plain.step()["x"] for _ in range(n_tokens)]

    spec = LoRADraftSpeculativeDecoder(model, lora, k=3, page_size=8,
                                       total_pages=64)
    spec.add("x", prompt)
    got = []
    while len(got) < n_tokens:
        got.extend(spec.step()["x"])
    assert got[:n_tokens] == expected


def test_lora_draft_shares_weight_buffers():
    """The draft server's projection/LM-head extras are the SAME arrays as
    the target server's (no re-materialized fused weights); a full-depth
    zero-delta adapter accepts every proposal."""
    from lamp_tpu.models.serving import LoRADraftSpeculativeDecoder, draft_view
    from lamp_tpu.nn.lora import lora_inject

    model = nn.ModernLM.init(
        vocab_size=19, context_length=64, num_blocks=2, embed_dim=32,
        num_heads=4, num_kv_heads=2, key=jax.random.PRNGKey(3),
    )
    # full depth, lora_b = 0 (wrap default) => draft == target exactly
    lora = lora_inject(draft_view(model, 2), rank=2,
                       key=jax.random.PRNGKey(4))
    spec = LoRADraftSpeculativeDecoder(model, lora, k=4, page_size=8,
                                       total_pages=64)
    te, de = spec.target._extras, spec.draft._extras
    for t_group, d_group in zip(te[:-1], de[:-1]):
        for t_w, d_w in zip(t_group, d_group):
            assert t_w is d_w
    assert te[-1] is de[-1]  # lm head

    spec.add("x", [1, 4, 7, 2, 9])
    for _ in range(3):
        assert len(spec.step()["x"]) == 4  # all k accepted every round


def test_lora_draft_depth_and_family_validation():
    from lamp_tpu.models.serving import LoRADraftSpeculativeDecoder, draft_view
    from lamp_tpu.nn.lora import lora_inject

    model = nn.ModernLM.init(
        vocab_size=19, context_length=32, num_blocks=2, embed_dim=32,
        num_heads=4, num_kv_heads=2, key=jax.random.PRNGKey(5),
    )
    with pytest.raises(ValueError):
        draft_view(model, 3)
    with pytest.raises(ValueError):
        draft_view(model, 0)
    lm = _model()  # LanguageModelModule family
    lora = lora_inject(draft_view(model, 1), rank=2,
                       key=jax.random.PRNGKey(6))
    with pytest.raises(NotImplementedError):
        LoRADraftSpeculativeDecoder(lm, lora)


def test_modern_serving_fp8_kv_cache():
    """kv_dtype=float8_e4m3fn: pools store fp8 (half the KV HBM), decode
    logits track the bf16-cache server (cosine), streams stay valid."""
    from lamp_tpu.models.serving import ModernBatchServer

    model = nn.ModernLM.init(
        vocab_size=19, context_length=64, num_blocks=2, embed_dim=32,
        num_heads=4, num_kv_heads=2, key=jax.random.PRNGKey(0),
    )
    prompt = [1, 4, 7, 2, 9, 3]
    ref = ModernBatchServer(model, page_size=8, total_pages=32)
    s8 = ModernBatchServer(model, page_size=8, total_pages=32,
                           kv_dtype=jnp.float8_e4m3fn)
    assert s8.kv_pages.dtype == jnp.float8_e4m3fn
    assert s8.kv_pages.nbytes * 4 == ref.kv_pages.nbytes  # f32 model
    ref.add("a", prompt)
    s8.add("a", prompt)
    for _ in range(8):
        ref.step()
        t8 = s8.step()["a"]
        assert 0 <= t8 < 19
    # compare the next-step logits directly (cosine over vocab)
    import numpy as _np

    def logits_of(server):
        idx, lens = server._views(["a"])
        tp, ts = server._alloc_slot("a")
        logits, server.kv_pages = server._step_fn(
            server.model, server.kv_pages,
            jnp.asarray([server.last_token["a"]], jnp.int32), idx, lens,
            jnp.asarray([tp], jnp.int32), jnp.asarray([ts], jnp.int32),
            server._extras, None, None,
        )
        server.seq_len["a"] += 1
        return _np.asarray(logits[0], _np.float64)

    la, lb = logits_of(ref), logits_of(s8)
    cos = la @ lb / (_np.linalg.norm(la) * _np.linalg.norm(lb))
    assert cos > 0.98, cos


def test_fp8_kv_speculative_and_chunked_paths():
    """fp8 cache works through chunked decode + rewind (the speculative
    verification path)."""
    from lamp_tpu.models.serving import ModernBatchServer

    model = nn.ModernLM.init(
        vocab_size=19, context_length=64, num_blocks=2, embed_dim=32,
        num_heads=4, num_kv_heads=2, key=jax.random.PRNGKey(2),
    )
    s = ModernBatchServer(model, page_size=8, total_pages=32,
                          kv_dtype=jnp.float8_e4m3fn)
    s.add("a", [1, 4, 7, 2, 9])
    base_len = s.seq_len["a"]
    logits = s.advance_chunk(["a"], np.asarray([[3, 4, 5]], np.int32))
    assert logits.shape[1] == 3
    s.rewind("a", 2)
    assert s.seq_len["a"] == base_len + 1
    out = s.step()
    assert 0 <= out["a"] < 19


def _modern_model():
    return nn.ModernLM.init(
        vocab_size=23, context_length=64, num_blocks=2, embed_dim=32,
        num_heads=4, num_kv_heads=2, key=jax.random.PRNGKey(0),
    )


def test_min_p_filters_unlikely_tokens():
    """min-p: tokens below min_p * max-prob are never sampled; min_p=0 rows
    are unaffected."""
    from lamp_tpu.models.sampling import sample_tokens

    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05],
                                  [0.5, 0.3, 0.15, 0.05]], jnp.float32))
    temps = jnp.ones(2, jnp.float32)
    min_p = jnp.asarray([0.5, 0.0], jnp.float32)  # row0 keeps probs >= 0.25
    seen0, seen1 = set(), set()
    for i in range(200):
        t = sample_tokens(logits, jax.random.PRNGKey(i), temps,
                          min_p=min_p)
        seen0.add(int(t[0]))
        seen1.add(int(t[1]))
    assert seen0 <= {0, 1}, seen0           # 0.15/0.05 < 0.5*0.5
    assert seen1 == {0, 1, 2, 3}, seen1     # unfiltered row samples all


def test_sample_tokens_logprobs():
    """Returned logprob is log_softmax at the chosen token (model
    distribution, pre-temperature)."""
    from lamp_tpu.models.sampling import sample_tokens

    logits = jax.random.normal(jax.random.PRNGKey(0), (3, 16))
    # greedy (temperature None)
    toks, lps = sample_tokens(logits, jax.random.PRNGKey(1), None,
                              return_logprobs=True)
    want = jax.nn.log_softmax(logits, axis=-1)
    np.testing.assert_allclose(
        np.asarray(lps),
        np.asarray(jnp.take_along_axis(want, toks[:, None], 1)[:, 0]),
        rtol=1e-5)
    # sampled path
    temps = jnp.asarray([1.0, 0.7, 0.0], jnp.float32)
    toks2, lps2 = sample_tokens(logits, jax.random.PRNGKey(2), temps,
                                return_logprobs=True)
    np.testing.assert_allclose(
        np.asarray(lps2),
        np.asarray(jnp.take_along_axis(want, toks2[:, None], 1)[:, 0]),
        rtol=1e-5)


def test_serving_logprobs_step_and_step_many():
    """Server accumulates per-token logprobs; step_many matches step;
    values equal log_softmax of the step's logits at the emitted token."""
    model = _modern_model()
    from lamp_tpu.models.serving import ModernBatchServer

    prompt = [1, 4, 7, 2]
    s1 = ModernBatchServer(model, page_size=8, total_pages=32)
    s1.add("a", prompt, SamplingParams(temperature=0.0, logprobs=True))
    toks1 = [s1.step()["a"] for _ in range(6)]
    lps1 = list(s1.seq_logprobs["a"])
    assert len(lps1) == 6 and all(l <= 0.0 for l in lps1)

    s2 = ModernBatchServer(model, page_size=8, total_pages=32)
    s2.add("a", prompt, SamplingParams(temperature=0.0, logprobs=True))
    out = s2.step_many(6)
    assert out["a"] == toks1
    np.testing.assert_allclose(np.asarray(s2.seq_logprobs["a"]),
                               np.asarray(lps1), rtol=1e-4, atol=1e-5)

    # oracle: recompute the first step's logits on a fresh server
    s3 = ModernBatchServer(model, page_size=8, total_pages=32)
    s3.add("a", prompt)
    logits = s3._advance(["a"], jnp.asarray([prompt[-1]], jnp.int32))
    want = float(jax.nn.log_softmax(
        logits.astype(jnp.float32), axis=-1)[0, toks1[0]])
    np.testing.assert_allclose(lps1[0], want, rtol=1e-3, atol=1e-4)


def test_engine_returns_logprobs():
    model = _modern_model()
    from lamp_tpu.models.serving import ModernBatchServer, ServingEngine

    srv = ModernBatchServer(model, page_size=8, total_pages=64)
    eng = ServingEngine(srv, decode_steps=4)
    eng.submit([1, 2, 3], SamplingParams(max_tokens=7, logprobs=True),
               request_id="a")
    eng.submit([4, 5], SamplingParams(max_tokens=5), request_id="b")
    res = eng.run()
    assert len(eng.result_logprobs["a"]) == len(res["a"]) == 7
    assert "b" not in eng.result_logprobs


def test_engine_on_token_streaming():
    """on_token fires once per emitted token, in order, matching results."""
    from lamp_tpu.models.serving import ModernBatchServer, ServingEngine

    model = _modern_model()
    srv = ModernBatchServer(model, page_size=8, total_pages=64)
    streamed = []
    eng = ServingEngine(srv, decode_steps=4,
                        on_token=lambda rid, t: streamed.append((rid, t)))
    eng.submit([1, 2, 3], SamplingParams(max_tokens=6), request_id="a")
    eng.submit([4, 5], SamplingParams(max_tokens=5), request_id="b")
    res = eng.run()
    for rid in ("a", "b"):
        assert [t for r, t in streamed if r == rid] == res[rid]


# -- parallel sampling (n= / best_of=) ---------------------------------------

def test_engine_parallel_sampling_n():
    """n>1 fans into independently-sampled branches; the result is a list
    of n token lists, streamed under (rid, branch) ids, and the page pool
    is fully returned."""
    model = _modern_model()
    from lamp_tpu.models.serving import ModernBatchServer, ServingEngine

    srv = ModernBatchServer(model, page_size=8, total_pages=64)
    streamed = []
    eng = ServingEngine(srv, decode_steps=4,
                        on_token=lambda rid, t: streamed.append((rid, t)))
    eng.submit([1, 2, 3], SamplingParams(max_tokens=8, temperature=3.0),
               request_id="a", n=3)
    eng.submit([4, 5], SamplingParams(max_tokens=4), request_id="b")
    res = eng.run()
    assert len(res["a"]) == 3
    assert all(1 <= len(branch) <= 8 for branch in res["a"])
    # temperature 3.0 over vocab 23: identical 8-token branches would be
    # astronomically unlikely
    assert len({tuple(branch) for branch in res["a"]}) > 1
    # plain request unaffected, streaming uses (rid, i) child ids
    assert len(res["b"]) == 4
    for i in range(3):
        assert [t for r, t in streamed if r == ("a", i)] == res["a"][i]
    assert "a" not in eng.result_logprobs
    assert not srv.seq_pages
    assert len(srv.free_pages) == srv.total_pages - 1  # minus prefix cache


def test_engine_parallel_sampling_small_pool():
    """Fan-out drains even when the pool only fits a subset of the branches
    at a time (no false stall while siblings wait in the queue)."""
    model = _modern_model()
    from lamp_tpu.models.serving import ModernBatchServer, ServingEngine

    srv = ModernBatchServer(model, page_size=8, total_pages=6)
    eng = ServingEngine(srv, decode_steps=4)
    eng.submit([1, 2, 3, 4], SamplingParams(max_tokens=6, temperature=1.0),
               request_id="a", n=4)
    res = eng.run()
    assert len(res["a"]) == 4


def test_engine_best_of_ranks_by_logprob():
    """best_of samples k branches and keeps the top n by cumulative
    logprob, best first; n=1 returns a plain token list."""
    model = _modern_model()
    from lamp_tpu.models.serving import ModernBatchServer, ServingEngine

    srv = ModernBatchServer(model, page_size=8, total_pages=64)
    eng = ServingEngine(srv, decode_steps=4)
    eng.submit([1, 2, 3], SamplingParams(max_tokens=6, temperature=2.0,
                                         logprobs=True),
               request_id="a", n=3, best_of=3)
    res = eng.run()
    assert len(res["a"]) == 3
    lps = eng.result_logprobs["a"]
    assert [len(l) for l in lps] == [len(b) for b in res["a"]]
    sums = [sum(l) for l in lps]
    assert sums == sorted(sums, reverse=True)

    # n=1 best_of=4: plain list; logprobs not exposed unless requested
    srv2 = ModernBatchServer(model, page_size=8, total_pages=64)
    eng2 = ServingEngine(srv2, decode_steps=4)
    eng2.submit([1, 2, 3], SamplingParams(max_tokens=6, temperature=2.0),
                request_id="a", n=1, best_of=4)
    res2 = eng2.run()
    assert res2["a"] and isinstance(res2["a"][0], int)
    assert "a" not in eng2.result_logprobs


def test_engine_fanout_validation():
    model = _modern_model()
    from lamp_tpu.models.serving import ModernBatchServer, ServingEngine

    srv = ModernBatchServer(model, page_size=8, total_pages=64)
    eng = ServingEngine(srv)
    with pytest.raises(ValueError, match="temperature"):
        eng.submit([1, 2], SamplingParams(max_tokens=4), n=2)
    with pytest.raises(ValueError, match="best_of"):
        eng.submit([1, 2], SamplingParams(max_tokens=4, temperature=1.0),
                   n=3, best_of=2)
    with pytest.raises(ValueError, match="n must"):
        eng.submit([1, 2], SamplingParams(max_tokens=4), n=0)


# -- sequence fork + beam search ---------------------------------------------

def test_fork_shares_pages_and_cow_diverges():
    """A forked sequence decodes as if its history had been prefilled
    fresh; parent and child diverge after the fork without corrupting each
    other (COW on the shared tail page)."""
    model = _modern_model()
    from lamp_tpu.models.serving import ModernBatchServer

    srv = ModernBatchServer(model, page_size=8, total_pages=64,
                            enable_prefix_cache=True)
    prompt = [1, 4, 7, 2, 9]
    srv.add("a", prompt)
    # one greedy step, then fork; KV now holds prompt, last fed token = t0
    t0 = srv.step()["a"]
    free_before = len(srv.free_pages) + len(srv._lru)
    srv.fork("a", "b")
    assert len(srv.free_pages) + len(srv._lru) == free_before  # no copy
    # diverge: feed different tokens, then a second round each
    la = srv._advance(["a"], jnp.asarray([11], jnp.int32))
    lb = srv._advance(["b"], jnp.asarray([13], jnp.int32))
    la2 = srv._advance(["a"], jnp.asarray([17], jnp.int32))
    lb2 = srv._advance(["b"], jnp.asarray([19], jnp.int32))

    # oracle: fresh prefills of the full diverged histories (feeding 11
    # overrode the un-fed pending greedy token t0, so histories are
    # prompt + 11/13 + 17/19)
    del t0
    ref = ModernBatchServer(model, page_size=8, total_pages=64)
    ref.add("x", prompt + [11])
    ref.add("y", prompt + [13])
    lx = ref._advance(["x"], jnp.asarray([11], jnp.int32))
    ly = ref._advance(["y"], jnp.asarray([13], jnp.int32))
    lx2 = ref._advance(["x"], jnp.asarray([17], jnp.int32))
    ly2 = ref._advance(["y"], jnp.asarray([19], jnp.int32))
    for got, want in [(la, lx), (lb, ly), (la2, lx2), (lb2, ly2)]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    srv.remove("a")
    srv.remove("b")
    assert not srv.seq_pages


def test_fork_requires_prefix_cache():
    model = _modern_model()
    from lamp_tpu.models.serving import ModernBatchServer

    srv = ModernBatchServer(model, page_size=8, total_pages=32)
    srv.add("a", [1, 2, 3])
    with pytest.raises(RuntimeError, match="prefix_cache"):
        srv.fork("a", "b")


def test_beam_search_width1_is_greedy():
    model = _modern_model()
    from lamp_tpu.models.serving import BeamSearchDecoder, ModernBatchServer

    prompt = [1, 4, 7, 2]
    ref = ModernBatchServer(model, page_size=8, total_pages=64)
    ref.add("g", prompt)
    greedy = [ref.step()["g"] for _ in range(6)]

    srv = ModernBatchServer(model, page_size=8, total_pages=64,
                            enable_prefix_cache=True)
    dec = BeamSearchDecoder(srv, beams=1, length_penalty=0.0)
    hyps = dec.decode(prompt, max_tokens=6)
    assert len(hyps) == 1
    assert hyps[0][0] == greedy
    # pool drained (modulo LRU-cached reclaimable pages)
    assert not srv.seq_pages
    assert srv.available_pages == srv.total_pages - 1


def test_beam_search_finds_better_than_greedy_and_sorts():
    """Width-4 beam search: hypotheses sorted best-first, distinct, and the
    best cumulative logprob >= greedy's (beam can only improve on the
    sum-logprob objective)."""
    model = _modern_model()
    from lamp_tpu.models.serving import BeamSearchDecoder, ModernBatchServer

    prompt = [3, 11, 5]
    steps = 5

    def seq_logprob(tokens):
        srv = ModernBatchServer(model, page_size=8, total_pages=64)
        srv.add("s", prompt)
        total, feed = 0.0, prompt[-1]
        hist = list(prompt)
        for t in tokens:
            logits = srv._advance(["s"], jnp.asarray([feed], jnp.int32))
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            total += float(lp[0, t])
            feed = t
        return total

    srv = ModernBatchServer(model, page_size=8, total_pages=128,
                            enable_prefix_cache=True)
    dec = BeamSearchDecoder(srv, beams=4, length_penalty=0.0)
    hyps = dec.decode(prompt, max_tokens=steps)
    assert len(hyps) == 4
    scores = [sc for _, sc in hyps]
    assert scores == sorted(scores, reverse=True)
    assert len({tuple(t) for t, _ in hyps}) == 4
    # reported scores are the true model logprobs of the hypotheses
    for tokens, score in hyps:
        np.testing.assert_allclose(score, seq_logprob(tokens), rtol=1e-4,
                                   atol=1e-4)

    g = ModernBatchServer(model, page_size=8, total_pages=64)
    g.add("g", prompt)
    greedy = [g.step()["g"] for _ in range(steps)]
    assert hyps[0][1] >= seq_logprob(greedy) - 1e-5


def test_beam_search_stop_tokens_and_early_stopping():
    model = _modern_model()
    from lamp_tpu.models.serving import BeamSearchDecoder, ModernBatchServer

    prompt = [1, 4, 7, 2]
    # find greedy's second token and use it as a stop token
    g = ModernBatchServer(model, page_size=8, total_pages=64)
    g.add("g", prompt)
    t0 = g.step()["g"]
    t1 = g.step()["g"]

    srv = ModernBatchServer(model, page_size=8, total_pages=128,
                            enable_prefix_cache=True)
    dec = BeamSearchDecoder(srv, beams=3)
    hyps = dec.decode(prompt, max_tokens=10, stop_tokens=(t1,))
    assert len(hyps) <= 3
    for tokens, _ in hyps:
        assert t1 not in tokens
    assert not srv.seq_pages


def test_kv_write_scatter_preserves_inplace_aliasing():
    """The engine's per-token cache write must compile to IN-PLACE
    scatters on the donated fused pool. A write that mixes two advanced
    indices around a slice (``pool.at[tp, :, ts].set(rows)``) silently
    defeats XLA's donation aliasing and copies the whole pool every step
    — measured as a 2.7x decode regression the first time the fused
    [P, 2, page, fused] layout was tried (docs/serving_headroom.md).
    This pins the HLO-level property for the engine's actual write
    (serving._kv_write: two statically-indexed scatters) and keeps the
    combined-scatter form recognized as the copying regression."""
    P, page, F = 16, 8, 64
    B = 4
    tp = jnp.arange(B, dtype=jnp.int32)
    ts = jnp.zeros((B,), jnp.int32)
    k = jnp.ones((B, F), jnp.bfloat16)
    v = jnp.ones((B, F), jnp.bfloat16)

    def big_copies(fn, *args):
        txt = jax.jit(fn, donate_argnums=(0,)).lower(*args).compile().as_text()
        pool_dims = (f"{P},2,{page},{F}", f"{P},{page},{F}")
        return sum(1 for l in txt.splitlines()
                   if " copy(" in l and any(d in l for d in pool_dims))

    fused_pool = jnp.zeros((P, 2, page, F), jnp.bfloat16)

    # the engine's write (serving._kv_write, two static-index scatters):
    # in place on the donated fused pool
    from lamp_tpu.models.serving import _kv_write
    assert big_copies(_kv_write, fused_pool, tp, ts, k, v) == 0

    # ... and for the [B, M] chunked-decode index shape too
    tp2 = jnp.zeros((B, 3), jnp.int32)
    ts2 = jnp.tile(jnp.arange(3, dtype=jnp.int32), (B, 1))
    k2 = jnp.ones((B, 3, F), jnp.bfloat16)
    assert big_copies(_kv_write, fused_pool, tp2, ts2, k2, k2) == 0

    # slice-mixing combined scatter: copies the pool (the regression)
    def w_combined(pool, tp, ts, k, v):
        return pool.at[tp, :, ts].set(jnp.stack([k, v], axis=-2))

    assert big_copies(w_combined, fused_pool, tp, ts, k, v) >= 1

    # the ALL-ADVANCED combined form (serving._kv_write_combined: one
    # scatter writes K and V rows; no slice between advanced indices) must
    # stay in place — it is what the deferred-write decode path uses
    from lamp_tpu.models.serving import _kv_write_combined
    assert big_copies(_kv_write_combined, fused_pool, tp, ts, k, v) == 0

    # ... and the LAYER-STACKED form (serving._kv_write_stacked: ONE
    # scatter writes every layer's K and V rows into the [L*P, ...] pool),
    # which is what the engine's decode/prefill paths actually emit
    from lamp_tpu.models.serving import _kv_write_stacked
    L = 3
    stacked_pool = jnp.zeros((L * P, 2, page, F), jnp.bfloat16)

    def w_stacked(pool, tp, ts, k, v):
        return _kv_write_stacked(pool, P, tp, ts,
                                 [(k, v) for _ in range(L)])

    def big_copies_stacked(fn, *args):
        txt = jax.jit(fn, donate_argnums=(0,)).lower(*args).compile(
        ).as_text()
        dim = f"{L * P},2,{page},{F}"
        return sum(1 for l in txt.splitlines()
                   if " copy(" in l and dim in l)

    assert big_copies_stacked(w_stacked, stacked_pool, tp, ts, k, v) == 0


def test_context_edge_raises_clear_error():
    """BatchServer is the low-level engine: driving a sequence past
    context_length must fail with an instructive RuntimeError (lifecycle —
    max_tokens / stop / retirement — belongs to ServingEngine), not a
    page-table shape error (the pre-guard failure mode was a numpy
    broadcast ValueError from _views)."""
    from lamp_tpu.models.serving import ModernBatchServer

    model = nn.ModernLM.init(
        vocab_size=19, context_length=16, num_blocks=1, embed_dim=32,
        num_heads=4, num_kv_heads=2, key=jax.random.PRNGKey(0))
    s = ModernBatchServer(model, page_size=8, total_pages=16)
    s.add("a", [1, 2, 3])
    with pytest.raises(RuntimeError, match="context_length"):
        for _ in range(20):
            s.step()


def test_context_edge_prescan_leaves_no_partial_mutation():
    """EVERY multi-token entry point (step_many, advance_chunk) must
    pre-scan capacity BEFORE releasing pages / allocating slots / bumping
    lengths — the error may not leave the batch half-mutated (round-5
    self-review: the original guard lived only in _advance, so
    step_many(8) three tokens from the edge bumped seq_len for slots
    whose KV was never written)."""
    from lamp_tpu.models.serving import ModernBatchServer

    model = nn.ModernLM.init(
        vocab_size=19, context_length=16, num_blocks=1, embed_dim=32,
        num_heads=4, num_kv_heads=2, key=jax.random.PRNGKey(0))

    s = ModernBatchServer(model, page_size=8, total_pages=16)
    s.add("a", [1, 2, 3, 4, 5, 6])  # seq_len 5 after prefill, 11 left
    before = s.seq_len["a"]
    with pytest.raises(RuntimeError, match="context_length"):
        s.step_many(12)
    assert s.seq_len["a"] == before  # nothing half-allocated
    assert len(s.step_many(11)["a"]) == 11  # exactly-fitting run works

    s2 = ModernBatchServer(model, page_size=8, total_pages=16)
    s2.add("b", [1, 2, 3])
    b4 = s2.seq_len["b"]
    with pytest.raises(RuntimeError, match="context_length"):
        s2.advance_chunk(["b"], [[1] * 15])
    assert s2.seq_len["b"] == b4
    s2.advance_chunk(["b"], [[1] * (16 - b4)])  # exact fit still works
