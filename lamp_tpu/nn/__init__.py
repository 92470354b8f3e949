"""Module system, layers, losses."""

from .module import (
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
    BatchNorm,
    BatchNorm2D,
    Dropout,
    Embedding,
    Fun,
    LayerNorm,
    Linear,
    Residual,
    Sequential,
    WeightNormLinear,
)
from . import init, losses

__all__ = [
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
    "init",
    "losses",
]
