"""Custom ops: fused attention kernels and misc tensor functions."""

from .attention import dot_product_attention, flash_attention, mha_reference
from .fused_adamw import AdamWStochastic, fused_adamw_update
from .fused_ce import fused_linear_cross_entropy, fused_lm_loss
from .int8_training import (
    Int8Linear,
    dequantize_training,
    int8_dot,
    quantize_training,
)
from .paged_attention import PagedKVCache, paged_attention, paged_attention_reference
from .quantization import (
    QuantizedLinear,
    QuantizedLinearInt4,
    dequantize_int4,
    dequantize_int8,
    int4_matmul,
    int8_matmul,
    int4_group_size,
    quantize_int4,
    quantize_int8,
    quantize_int8_stochastic,
    quantize_model,
)
from .functions import (
    capped_shifted_negative_exponential,
    euclidean_distance,
    index_add,
    index_fill,
    logdet,
    mask_fill,
    mask_select,
    one_hot,
    scatter_add,
    sparse_dense_matmul,
    sparse_from_value_and_index,
    sparse_to_dense,
)

__all__ = [
    "dot_product_attention",
    "flash_attention",
    "mha_reference",
    "fused_adamw_update",
    "AdamWStochastic",
    "fused_linear_cross_entropy",
    "fused_lm_loss",
    "quantize_int8",
    "dequantize_int8",
    "int8_matmul",
    "QuantizedLinear",
    "quantize_model",
    "quantize_int8_stochastic",
    "quantize_int4",
    "int4_group_size",
    "dequantize_int4",
    "int4_matmul",
    "QuantizedLinearInt4",
    "paged_attention",
    "paged_attention_reference",
    "PagedKVCache",
    "euclidean_distance",
    "capped_shifted_negative_exponential",
    "mask_fill",
    "mask_select",
    "index_add",
    "index_fill",
    "scatter_add",
    "one_hot",
    "sparse_from_value_and_index",
    "sparse_to_dense",
    "sparse_dense_matmul",
    "logdet",
]
