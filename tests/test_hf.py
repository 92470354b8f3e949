"""HF Llama checkpoint interop: load transformers checkpoints into ModernLM
and export back, verifying logits parity against torch (the analogue of the
reference's safetensors import test, SafeTensorReader round-trips)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from lamp_tpu.models import (  # noqa: E402
    modernlm_from_hf_llama,
    modernlm_to_hf_llama,
)


def _tiny_config(**over):
    kw = dict(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attention_bias=False,
    )
    kw.update(over)
    return transformers.LlamaConfig(**kw)


def _logits_match(model, tm, toks, atol=3e-4):
    with torch.no_grad():
        ref = tm(torch.tensor(toks)).logits.float().numpy()
    ours, _ = model.forward(jnp.asarray(toks))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=atol, rtol=1e-3)


@pytest.mark.parametrize("tied", [False, True])
def test_hf_llama_import_logits_parity(tmp_path, tied):
    torch.manual_seed(0)
    cfg = _tiny_config(tie_word_embeddings=tied)
    tm = transformers.LlamaForCausalLM(cfg).eval()
    tm.save_pretrained(tmp_path, safe_serialization=True)

    model = modernlm_from_hf_llama(str(tmp_path))
    assert (model.lm_head is None) == tied
    toks = np.array([[3, 14, 9, 55, 2, 7, 96, 0, 31, 44]], np.int32)
    _logits_match(model, tm, toks)


def test_hf_llama_gqa_and_rope_base(tmp_path):
    torch.manual_seed(1)
    cfg = _tiny_config(num_key_value_heads=1, rope_theta=50000.0,
                       rms_norm_eps=1e-5)
    tm = transformers.LlamaForCausalLM(cfg).eval()
    tm.save_pretrained(tmp_path, safe_serialization=True)
    model = modernlm_from_hf_llama(str(tmp_path))
    assert model.final_norm.eps == pytest.approx(1e-5)
    toks = np.array([[5, 1, 88, 12, 63, 9, 9, 2]], np.int32)
    _logits_match(model, tm, toks)


def test_hf_llama_export_roundtrip(tmp_path):
    """Export ModernLM -> HF dir -> transformers loads it -> logits match."""
    import jax

    from lamp_tpu import nn

    model = nn.ModernLM.init(
        vocab_size=53, context_length=32, num_blocks=2, embed_dim=64,
        num_heads=4, num_kv_heads=2, mlp_hidden=96, tied=False,
        rope_base=12345.0, key=jax.random.PRNGKey(3),
    )
    out = os.path.join(tmp_path, "export")
    modernlm_to_hf_llama(model, out)
    with open(os.path.join(out, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["rope_theta"] == pytest.approx(12345.0, rel=1e-3)

    tm = transformers.LlamaForCausalLM.from_pretrained(out).eval()
    toks = np.array([[7, 2, 9, 44, 1, 0, 52, 13]], np.int32)
    _logits_match(model, tm, toks)


def test_hf_mistral_sliding_window_import(tmp_path):
    """A Mistral config's sliding_window becomes per-block window."""
    torch.manual_seed(2)
    cfg = transformers.MistralConfig(
        vocab_size=61, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, sliding_window=4, rms_norm_eps=1e-6,
    )
    tm = transformers.MistralForCausalLM(cfg).eval()
    tm.save_pretrained(tmp_path, safe_serialization=True)
    model = modernlm_from_hf_llama(str(tmp_path))
    assert all(b.window == 4 for b in model.blocks)
    toks = np.array([[3, 14, 9, 55, 2, 7, 1, 0, 31, 44]], np.int32)
    _logits_match(model, tm, toks)


def _tiny_mixtral_config(**over):
    kw = dict(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, num_local_experts=4,
        num_experts_per_tok=2, sliding_window=None,
    )
    kw.update(over)
    return transformers.MixtralConfig(**kw)


def test_hf_mixtral_import_logits_parity(tmp_path):
    torch.manual_seed(0)
    cfg = _tiny_mixtral_config()
    tm = transformers.MixtralForCausalLM(cfg).eval()
    tm.save_pretrained(tmp_path, safe_serialization=True)

    model = modernlm_from_hf_llama(str(tmp_path))
    from lamp_tpu.nn.moe import SwiGLUMoE

    assert type(model.blocks[0].mlp) is SwiGLUMoE
    assert model.blocks[0].mlp.num_experts == 4
    assert model.blocks[0].mlp.top_k == 2
    toks = np.array([[3, 14, 9, 55, 2, 7, 96, 0, 31, 44]], np.int32)
    _logits_match(model, tm, toks, atol=5e-4)


def test_hf_mixtral_export_roundtrip(tmp_path):
    """ModernLM(moe_experts=) -> Mixtral dir -> transformers -> logits."""
    import lamp_tpu.nn as nn
    from lamp_tpu.models import modernlm_to_hf_llama

    model = nn.ModernLM.init(
        vocab_size=61, context_length=32, num_blocks=2, embed_dim=32,
        num_heads=4, num_kv_heads=2, mlp_hidden=48, tied=False,
        moe_experts=3, moe_top_k=2, key=jax.random.PRNGKey(7))
    out = str(tmp_path / "export")
    modernlm_to_hf_llama(model, out)
    tm = transformers.MixtralForCausalLM.from_pretrained(out).eval()
    toks = np.array([[5, 1, 33, 60, 2, 9]], np.int32)
    _logits_match(model, tm, toks, atol=5e-4)
    # and the re-import matches too
    back = modernlm_from_hf_llama(out)
    a, _ = model.forward(jnp.asarray(toks))
    b, _ = back.forward(jnp.asarray(toks))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("rs", [
    {"rope_type": "linear", "factor": 2.0},
    {"rope_type": "yarn", "factor": 4.0,
     "original_max_position_embeddings": 16},
    {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
     "high_freq_factor": 4.0, "original_max_position_embeddings": 16},
])
def test_hf_llama_rope_scaling_import(tmp_path, rs):
    """rope_scaling configs (linear/YaRN/llama3) import with logits parity
    against transformers' implementations."""
    torch.manual_seed(2)
    cfg = _tiny_config(rope_scaling=dict(rs), max_position_embeddings=64)
    tm = transformers.LlamaForCausalLM(cfg).eval()
    tm.save_pretrained(tmp_path, safe_serialization=True)
    model = modernlm_from_hf_llama(str(tmp_path))
    toks = np.array([[5, 1, 88, 12, 63, 9, 42, 2, 17, 30, 8, 77]], np.int32)
    _logits_match(model, tm, toks)


def test_hf_export_scaled_rope_requires_config(tmp_path):
    from lamp_tpu import nn

    model = nn.ModernLM.init(
        vocab_size=31, context_length=32, num_blocks=1, embed_dim=32,
        num_heads=4, key=jax.random.PRNGKey(0),
        rope_scaling={"type": "linear", "factor": 2},
    )
    with pytest.raises(NotImplementedError, match="scaled RoPE"):
        modernlm_to_hf_llama(model, str(tmp_path / "x"))
