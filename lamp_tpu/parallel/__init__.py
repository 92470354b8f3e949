"""SPMD parallelism: meshes, sharding rules, distributed training."""

from .mesh import (
    ShardingRules,
    batch_sharding,
    fsdp_rules,
    initialize_multihost,
    lm_tensor_parallel_rules,
    modern_lm_tensor_parallel_rules,
    make_mesh,
    replicate,
    shard_tree,
)
from .collective_matmul import (
    allgather_matmul,
    make_allgather_matmul,
    make_matmul_reducescatter,
    matmul_reducescatter,
)
from .context import (make_ring_attention, make_ulysses_attention,
                      ring_attention, ulysses_attention)
from .pipeline import (
    make_interleaved_pipelined_forward,
    make_pipelined_forward,
    make_pipelined_lm_forward,
    make_pipelined_lm_loss_fn,
    pipeline_apply,
    pipeline_apply_interleaved,
    stack_lm_blocks,
)
from .train import make_sharded_train_step, shard_batch, shard_train_state

__all__ = [
    "make_mesh",
    "ShardingRules",
    "shard_tree",
    "replicate",
    "batch_sharding",
    "lm_tensor_parallel_rules",
    "modern_lm_tensor_parallel_rules",
    "fsdp_rules",
    "initialize_multihost",
    "shard_train_state",
    "shard_batch",
    "make_sharded_train_step",
    "ring_attention",
    "make_ring_attention",
    "ulysses_attention",
    "make_ulysses_attention",
    "pipeline_apply",
    "pipeline_apply_interleaved",
    "make_pipelined_forward",
    "make_interleaved_pipelined_forward",
    "make_pipelined_lm_forward",
    "make_pipelined_lm_loss_fn",
    "stack_lm_blocks",
    "allgather_matmul",
    "matmul_reducescatter",
    "make_allgather_matmul",
    "make_matmul_reducescatter",
]
