"""Model zoo: vision nets, KV-cached generation."""

from .clip import CLIP, clip_loss, siglip_loss
from .diffusion import DiT, GaussianDiffusion, RectifiedFlow, timestep_embedding
from .constrained import TokenDFA, byte_vocab, json_value_regex
from .hf import modernlm_from_hf_llama, modernlm_from_hf_state, modernlm_to_hf_llama
from .generate import KVCache, decode_step, generate, init_cache, prefill
from .sampling import SamplingParams, sample_tokens
from .serving import (
    BatchServer,
    BeamSearchDecoder,
    LoRADraftSpeculativeDecoder,
    ModernBatchServer,
    ServingEngine,
    SpeculativeDecoder,
)
from .vision import ResidualBlock, lenet, resnet_cifar
from .vit import ViT

__all__ = [
    "resnet_cifar",
    "lenet",
    "ResidualBlock",
    "ViT",
    "DiT",
    "GaussianDiffusion",
    "RectifiedFlow",
    "timestep_embedding",
    "CLIP",
    "clip_loss",
    "siglip_loss",
    "generate",
    "KVCache",
    "init_cache",
    "decode_step",
    "prefill",
    "BatchServer",
    "BeamSearchDecoder",
    "ModernBatchServer",
    "ServingEngine",
    "SpeculativeDecoder",
    "LoRADraftSpeculativeDecoder",
    "TokenDFA",
    "byte_vocab",
    "json_value_regex",
    "SamplingParams",
    "sample_tokens",
    "modernlm_from_hf_llama",
    "modernlm_from_hf_state",
    "modernlm_to_hf_llama",
]
