"""Batch-serving engine tests: paged decode matches full forward."""

import jax
import jax.numpy as jnp
import numpy as np

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
