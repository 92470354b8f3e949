"""Sharded training: the SPMD train step over a device mesh.

This is the capability superset of BOTH reference distributed engines
(DataParallel.scala single-process DP and lamp.data.distributed NCCL DDP):
one jitted train step whose inputs carry shardings; XLA's SPMD partitioner
inserts the ICI collectives (gradient all-reduce for DP, all-gathers /
reduce-scatters for FSDP, per-layer all-reduces for TP).

Usage:
    mesh = make_mesh({"dp": 8})
    sstate, step = shard_train_state(state, mesh, optimizer, loss_fn)
    batch = jax.device_put(batch, batch_sharding(mesh))
    sstate, (loss, n) = step(sstate, batch, key, 1.0)
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.loops import TrainState, make_train_step
from .mesh import ShardingRules, batch_sharding, shard_tree

__all__ = ["shard_train_state", "make_sharded_train_step", "shard_batch"]


def shard_train_state(state: TrainState, mesh: Mesh,
                      param_rules: Optional[ShardingRules] = None) -> TrainState:
    """Place a TrainState on the mesh: params/buffers under ``param_rules``
    (replicated by default), optimizer state following the params' shardings
    where shapes match (master weights / moments co-sharded with their
    parameter — the ZeRO property when param_rules shard)."""
    rules = param_rules or ShardingRules([])
    params = shard_tree(state.params, mesh, rules)
    rest = shard_tree(state.rest, mesh, ShardingRules([]))

    param_shardings = rules.shardings_for(state.params, mesh)
    flat_params, _ = jax.tree_util.tree_flatten(
        state.params, is_leaf=lambda x: x is None
    )

    shape_to_sharding = {}
    for p, s in zip(
        flat_params,
        jax.tree_util.tree_leaves(param_shardings, is_leaf=lambda x: x is None),
    ):
        if p is not None and s is not None:
            shape_to_sharding.setdefault(p.shape, s)

    def place_opt(x):
        if x is None:
            return None
        s = shape_to_sharding.get(getattr(x, "shape", None))
        if s is None:
            s = NamedSharding(mesh, P())
        return jax.device_put(x, s)

    opt_state = jax.tree_util.tree_map(
        place_opt, state.opt_state, is_leaf=lambda x: x is None
    )
    step = jax.device_put(state.step, NamedSharding(mesh, P()))
    return TrainState(params, rest, opt_state, step)


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Split a host batch over the data-parallel axis."""
    return jax.device_put(batch, batch_sharding(mesh, axis))


def make_sharded_train_step(optimizer, loss_fn: Callable, mesh: Mesh, *,
                            accumulation_steps: int = 1,
                            donate: bool = True) -> Callable:
    """Jit the train step for mesh execution. Input/output shardings are
    inferred from the (already-placed) TrainState and batch; XLA handles the
    collectives. ``donate`` reuses the input state's buffers for the output
    (in-place update on HBM — the optimizer update is bandwidth-bound)."""
    base = make_train_step(optimizer, loss_fn,
                           accumulation_steps=accumulation_steps)
    return jax.jit(base, donate_argnums=(0,) if donate else ())
