"""Module system, layers, losses."""

from .module import (
    Frozen,
    Module,
    buffer_field,
    combine,
    filter_grad_mask,
    param_tags,
    parameter_count,
    partition_params,
    static_field,
    tree_replace,
)
from .layers import (
    MLP,
    EitherModule,
    BatchNorm,
    BatchNorm2D,
    Dropout,
    Embedding,
    Fun,
    LayerNorm,
    Linear,
    Recursive,
    Residual,
    Sequential,
    WeightNormLinear,
)
from .conv import (
    AvgPool2D,
    Conv1D,
    Conv2D,
    Conv2DTransposed,
    MaxPool1D,
    MaxPool2D,
    avg_pool_2d,
    max_pool_2d,
)
from .recurrent import GRU, LSTM, RNN, FreeRunningRNN, Seq2Seq, WithInit
from .transformer import (
    MultiheadAttention,
    Transformer,
    TransformerDecoder,
    TransformerDecoderBlock,
    TransformerEmbedding,
    TransformerEncoder,
    TransformerEncoderBlock,
    lengths_to_mask,
    linearized_attention,
    positional_embedding_vaswani,
)
from .lm import LanguageModelInput, LanguageModelLoss, LanguageModelModule, lm_loss
from ..ops.fused_ce import fused_linear_cross_entropy, fused_lm_loss
from .lora import (
    LoRALinear,
    QLoRALinear,
    lora_inject,
    lora_merge,
    lora_parameter_count,
    qlora_inject,
)
from .bert import (
    BertEncoder,
    BertPretrainInput,
    BertPretrainModule,
    MaskedLanguageModelModule,
    bert_loss,
)
from .graph import (
    GCN,
    MPNN,
    Graph,
    GraphAttention,
    VertexPooling,
    gcn_aggregation,
    vertex_pooling,
)
from .moe import MoEMLP, SwiGLUMoE, moe_sharding_rules
from .modern import (
    LlamaBlock,
    ModernLM,
    RMSNorm,
    SwiGLU,
    apply_rope,
    rope_frequencies,
)
from .ssm import MambaBlock, MambaLM, selective_scan
from . import init, losses

__all__ = [
    "Frozen",
    "Recursive",
    "LoRALinear",
    "lora_inject",
    "lora_merge",
    "lora_parameter_count",
    "Module",
    "static_field",
    "buffer_field",
    "partition_params",
    "combine",
    "param_tags",
    "parameter_count",
    "filter_grad_mask",
    "tree_replace",
    "Linear",
    "Embedding",
    "Dropout",
    "LayerNorm",
    "BatchNorm",
    "BatchNorm2D",
    "WeightNormLinear",
    "MLP",
    "Sequential",
    "Fun",
    "Residual",
    "EitherModule",
    "init",
    "losses",
    "MoEMLP",
    "SwiGLUMoE",
    "moe_sharding_rules",
    "RMSNorm",
    "SwiGLU",
    "LlamaBlock",
    "ModernLM",
    "MambaBlock",
    "MambaLM",
    "selective_scan",
    "fused_linear_cross_entropy",
    "fused_lm_loss",
    "apply_rope",
    "rope_frequencies",
]
