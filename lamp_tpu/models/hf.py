"""HuggingFace Llama-family checkpoint interop for :class:`ModernLM`.

The reference's interchange surfaces are lamp-safetensors (import;
SafeTensorReader.scala:15-139) and lamp-onnx (export). This module extends
the same role to the de-facto LLM checkpoint layout: a directory holding
``config.json`` plus one or more ``*.safetensors`` shards as written by
``transformers`` ``LlamaForCausalLM.save_pretrained``. Weights map onto
:class:`lamp_tpu.nn.ModernLM` (same RMSNorm / rotate-half RoPE / SwiGLU
conventions; our :class:`Linear` stores ``[in, out]`` so every HF
``[out, in]`` projection is transposed). Loading is pure numpy/jax — no
torch involvement — so an exported or downloaded checkpoint can be served
directly by :class:`lamp_tpu.models.serving.ModernBatchServer`.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..io.checkpoint import read_safetensors, write_safetensors
from ..nn.modern import ModernLM

__all__ = ["modernlm_from_hf_llama", "modernlm_to_hf_llama",
           "modernlm_from_hf_state"]


_SUPPORTED_ARCHS = {"LlamaForCausalLM", "MistralForCausalLM",
                    "Qwen2ForCausalLM", "MixtralForCausalLM"}


def _load_dir(path: str):
    with open(os.path.join(path, "config.json")) as f:
        config = json.load(f)
    state: Dict[str, Any] = {}
    shards = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not shards:
        raise FileNotFoundError(f"no *.safetensors under {path}")
    for shard in shards:
        state.update(read_safetensors(shard))
    return config, state


def modernlm_from_hf_llama(path: str, *, dtype=None,
                           context_length: Optional[int] = None) -> ModernLM:
    """Load a HF Llama/Mistral/Qwen2 checkpoint directory into a ModernLM.

    ``dtype`` (default: the checkpoint's own dtype) casts every parameter;
    ``context_length`` overrides ``max_position_embeddings`` (it only sizes
    the RoPE tables).
    """
    config, state = _load_dir(path)
    archs = config.get("architectures") or []
    if archs and not any(a in _SUPPORTED_ARCHS for a in archs):
        raise ValueError(f"unsupported architectures {archs}; expected one "
                         f"of {sorted(_SUPPORTED_ARCHS)}")
    return modernlm_from_hf_state(state, config, dtype=dtype,
                                  context_length=context_length)


def _rope_scaling_of(rs: Optional[Dict[str, Any]],
                     ctx: int) -> Optional[Dict[str, Any]]:
    """Translate HF ``config.rope_scaling`` to
    :func:`lamp_tpu.nn.modern.rope_frequencies`'s schema."""
    if not rs:
        return None
    kind = rs.get("rope_type") or rs.get("type")
    if kind in (None, "default"):
        return None
    factor = float(rs.get("factor", 1.0))
    orig = int(rs.get("original_max_position_embeddings", ctx))
    if kind == "linear":
        return {"type": "linear", "factor": factor}
    if kind == "dynamic":
        # dynamic NTK at full window == static NTK stretch (the decode-time
        # per-length rescale collapses once the table is precomputed)
        return {"type": "ntk", "factor": factor}
    if kind == "yarn":
        return {"type": "yarn", "factor": factor, "original_max_len": orig,
                "beta_fast": float(rs.get("beta_fast", 32.0)),
                "beta_slow": float(rs.get("beta_slow", 1.0))}
    if kind == "llama3":
        return {"type": "llama3", "factor": factor,
                "original_max_len": orig,
                "low_freq_factor": float(rs.get("low_freq_factor", 1.0)),
                "high_freq_factor": float(rs.get("high_freq_factor", 4.0))}
    raise NotImplementedError(f"rope_scaling type {kind!r}")


def modernlm_from_hf_state(state: Dict[str, Any], config: Dict[str, Any], *,
                           dtype=None,
                           context_length: Optional[int] = None) -> ModernLM:
    """Build a ModernLM from a HF-named state dict + config dict."""
    import jax

    dim = config["hidden_size"]
    heads = config["num_attention_heads"]
    kv_heads = config.get("num_key_value_heads") or heads
    n_layers = config["num_hidden_layers"]
    head_dim = config.get("head_dim") or dim // heads
    if head_dim != dim // heads:
        raise NotImplementedError(
            f"head_dim {head_dim} != hidden_size/num_heads {dim // heads}")
    tied = bool(config.get("tie_word_embeddings", False))
    moe_experts = config.get("num_local_experts")  # Mixtral
    moe_top_k = config.get("num_experts_per_tok", 2)
    ctx = context_length or config.get("max_position_embeddings", 2048)
    rope_scaling = _rope_scaling_of(config.get("rope_scaling"), ctx)
    window = config.get("sliding_window")  # Mistral/Qwen2; None for Llama
    if window is not None and config.get("use_sliding_window", True) is False:
        window = None

    if dtype is None:
        dtype = state["model.embed_tokens.weight"].dtype

    def get(name, transpose=False):
        t = jnp.asarray(state[name], dtype)
        return t.T if transpose else t

    model = ModernLM.init(
        vocab_size=config["vocab_size"], context_length=ctx,
        num_blocks=n_layers, embed_dim=dim, num_heads=heads,
        num_kv_heads=kv_heads, mlp_hidden=config["intermediate_size"],
        tied=tied, key=jax.random.PRNGKey(0),
        rope_base=float(config.get("rope_theta", 10000.0)),
        rope_scaling=rope_scaling, window=window,
        norm_eps=float(config.get("rms_norm_eps", 1e-6)),
        moe_experts=moe_experts, moe_top_k=moe_top_k, dtype=dtype,
    )

    def linear(lin, name):
        w = get(name + ".weight", transpose=True)
        bias = lin.bias
        if name + ".bias" in state:  # Qwen2-style attention biases
            bias = get(name + ".bias")
        return lin.replace(weight=w, bias=bias)

    blocks = []
    for i, blk in enumerate(model.blocks):
        p = f"model.layers.{i}"
        blocks.append(blk.replace(
            norm1=blk.norm1.replace(weight=get(f"{p}.input_layernorm.weight")),
            norm2=blk.norm2.replace(
                weight=get(f"{p}.post_attention_layernorm.weight")),
            w_q=linear(blk.w_q, f"{p}.self_attn.q_proj"),
            w_k=linear(blk.w_k, f"{p}.self_attn.k_proj"),
            w_v=linear(blk.w_v, f"{p}.self_attn.v_proj"),
            w_o=linear(blk.w_o, f"{p}.self_attn.o_proj"),
            mlp=(blk.mlp.replace(
                w1=linear(blk.mlp.w1, f"{p}.mlp.gate_proj"),
                w3=linear(blk.mlp.w3, f"{p}.mlp.up_proj"),
                w2=linear(blk.mlp.w2, f"{p}.mlp.down_proj"),
            ) if moe_experts is None else blk.mlp.replace(
                # Mixtral block_sparse_moe: gate [E, D] -> [D, E]; per-expert
                # w1/w3 [H, D] -> stacked [E, D, H], w2 [D, H] -> [E, H, D]
                w_gate=get(f"{p}.block_sparse_moe.gate.weight",
                           transpose=True),
                w1=jnp.stack([
                    get(f"{p}.block_sparse_moe.experts.{e}.w1.weight",
                        transpose=True) for e in range(moe_experts)]),
                w3=jnp.stack([
                    get(f"{p}.block_sparse_moe.experts.{e}.w3.weight",
                        transpose=True) for e in range(moe_experts)]),
                w2=jnp.stack([
                    get(f"{p}.block_sparse_moe.experts.{e}.w2.weight",
                        transpose=True) for e in range(moe_experts)]),
            )),
        ))

    lm_head = model.lm_head
    if not tied:
        lm_head = model.lm_head.replace(
            weight=get("lm_head.weight", transpose=True))
    return model.replace(
        token_embedding=model.token_embedding.replace(
            weight=get("model.embed_tokens.weight")),
        blocks=tuple(blocks),
        final_norm=model.final_norm.replace(weight=get("model.norm.weight")),
        lm_head=lm_head,
    )


def modernlm_to_hf_llama(model: ModernLM, path: str, *,
                         config_extra: Optional[Dict[str, Any]] = None) -> None:
    """Export a ModernLM as a HF Llama checkpoint directory
    (``config.json`` + ``model.safetensors``), loadable by
    ``transformers.LlamaForCausalLM.from_pretrained``."""
    os.makedirs(path, exist_ok=True)
    blk0 = model.blocks[0]
    dim = blk0.w_q.weight.shape[0]
    heads = blk0.num_heads
    moe = not hasattr(blk0.mlp, "w1") or not hasattr(blk0.mlp.w1, "weight")
    windows = {b.window for b in model.blocks}
    if len(windows) > 1:
        raise NotImplementedError(
            "HF Llama export needs a uniform per-block window")
    (window,) = windows
    # recover rope_theta from the precomputed table: the angle at position 1,
    # frequency index 1 is base^(-2/hd)
    hd = dim // heads
    if hd > 2 and model.rope_cos.shape[0] > 1:
        angle = float(jnp.arctan2(model.rope_sin[1, 1], model.rope_cos[1, 1]))
        base = (1.0 / angle) ** (hd / 2.0)
        # the recovery only holds for an UNSCALED base table; a rope-scaled
        # model (rope_scaling= / extend_context) must ship its config via
        # config_extra={"rope_theta": ..., "rope_scaling": {...}}
        import numpy as _np

        inv = base ** -(_np.arange(0, hd, 2) / hd)
        row1 = _np.asarray(model.rope_cos[1], _np.float64)
        if not _np.allclose(row1, _np.cos(inv), atol=1e-3):
            if not (config_extra and "rope_theta" in config_extra):
                raise NotImplementedError(
                    "model uses scaled RoPE tables; pass config_extra with "
                    "rope_theta and rope_scaling for HF export"
                )
            base = config_extra["rope_theta"]
    else:
        base = 10000.0
    if moe:
        arch, mtype = ["MixtralForCausalLM"], "mixtral"
    elif window is not None:
        arch, mtype = ["MistralForCausalLM"], "mistral"
    else:
        arch, mtype = ["LlamaForCausalLM"], "llama"
    config = {
        "architectures": arch,
        "model_type": mtype,
        "hidden_size": dim,
        "intermediate_size": (blk0.mlp.w1.shape[2] if moe
                              else blk0.mlp.w1.weight.shape[1]),
        "num_attention_heads": heads,
        "num_key_value_heads": blk0.num_kv_heads,
        "num_hidden_layers": len(model.blocks),
        "vocab_size": model.token_embedding.weight.shape[0],
        "max_position_embeddings": model.context_length,
        "rope_theta": round(base, 4),
        "rms_norm_eps": model.final_norm.eps,
        "tie_word_embeddings": model.lm_head is None,
        "hidden_act": "silu",
        "torch_dtype": ("bfloat16" if model.token_embedding.weight.dtype
                        == jnp.bfloat16 else "float32"),
    }
    if window is not None:
        config["sliding_window"] = window
    if moe:
        config["num_local_experts"] = int(blk0.mlp.num_experts)
        config["num_experts_per_tok"] = int(blk0.mlp.top_k)
    config.update(config_extra or {})
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f, indent=2)

    tensors: Dict[str, Any] = {
        "model.embed_tokens.weight": model.token_embedding.weight,
        "model.norm.weight": model.final_norm.weight,
    }
    if model.lm_head is not None:
        tensors["lm_head.weight"] = model.lm_head.weight.T
    for i, blk in enumerate(model.blocks):
        p = f"model.layers.{i}"
        tensors[f"{p}.input_layernorm.weight"] = blk.norm1.weight
        tensors[f"{p}.post_attention_layernorm.weight"] = blk.norm2.weight
        proj = [("self_attn.q_proj", blk.w_q),
                ("self_attn.k_proj", blk.w_k),
                ("self_attn.v_proj", blk.w_v),
                ("self_attn.o_proj", blk.w_o)]
        if not moe:
            proj += [("mlp.gate_proj", blk.mlp.w1),
                     ("mlp.up_proj", blk.mlp.w3),
                     ("mlp.down_proj", blk.mlp.w2)]
        for hf_name, lin in proj:
            tensors[f"{p}.{hf_name}.weight"] = lin.weight.T
            if lin.bias is not None:
                tensors[f"{p}.{hf_name}.bias"] = lin.bias
        if moe:
            bs = f"{p}.block_sparse_moe"
            tensors[f"{bs}.gate.weight"] = blk.mlp.w_gate.T
            for e in range(int(blk.mlp.num_experts)):
                tensors[f"{bs}.experts.{e}.w1.weight"] = blk.mlp.w1[e].T
                tensors[f"{bs}.experts.{e}.w3.weight"] = blk.mlp.w3[e].T
                tensors[f"{bs}.experts.{e}.w2.weight"] = blk.mlp.w2[e].T
    write_safetensors(os.path.join(path, "model.safetensors"), tensors,
                      metadata={"format": "pt"})
