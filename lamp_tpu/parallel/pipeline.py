"""Pipeline parallelism: GPipe microbatch schedule over a mesh axis.

Beyond reference parity (SURVEY.md §2.7: the reference has no PP): layers are
stacked along a leading axis and sharded over the "pp" mesh axis, so each
device holds a contiguous stage of blocks. Microbatches flow through the ring
of stages with ``ppermute``; the scan-based schedule has the standard GPipe
bubble of (n_stages - 1) ticks. Everything is differentiable — jax reverses
the ppermute/scan automatically, giving the backward pipeline for free.

Works for homogeneous block stacks (the transformer-LM case: every block has
identical parameter shapes).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["pipeline_apply", "make_pipelined_forward"]


def pipeline_apply(stage_params, microbatches, stage_fn: Callable, *,
                   axis_name: str, n_stages: int):
    """Run inside shard_map. ``stage_params``: this stage's local stack of
    block params [L_local, ...] (pytree). ``microbatches``: [M, ...] — the
    same array on every device (only stage 0's injections matter).
    ``stage_fn(stage_params, x) -> y`` applies the local blocks.

    Returns [M, ...] outputs, valid on every device (masked psum broadcast).
    """
    idx = jax.lax.axis_index(axis_name)
    m = microbatches.shape[0]
    ticks = m + n_stages - 1
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    outputs0 = jnp.zeros(microbatches.shape, microbatches.dtype)
    recv0 = jnp.zeros(microbatches.shape[1:], microbatches.dtype)
    # the carries become device-varying after the first tick (ppermute /
    # per-stage writes); mark the initial values as varying to match
    try:
        outputs0 = jax.lax.pvary(outputs0, (axis_name,))
        recv0 = jax.lax.pvary(recv0, (axis_name,))
    except AttributeError:
        outputs0 = jax.lax.pcast(outputs0, (axis_name,), to="varying")
        recv0 = jax.lax.pcast(recv0, (axis_name,), to="varying")

    def tick(carry, t):
        outputs, recv = carry
        inject = microbatches[jnp.clip(t, 0, m - 1)]
        x_in = jnp.where(idx == 0, inject, recv)
        y = stage_fn(stage_params, x_in)
        nxt = jax.lax.ppermute(y, axis_name, perm)
        out_t = t - (n_stages - 1)
        updated = outputs.at[jnp.clip(out_t, 0, m - 1)].set(y)
        write = (out_t >= 0) & (idx == n_stages - 1)
        outputs = jnp.where(write, updated, outputs)
        return (outputs, nxt), None

    (outputs, _), _ = jax.lax.scan(tick, (outputs0, recv0), jnp.arange(ticks))
    # broadcast the last stage's outputs to every device
    mask = (idx == n_stages - 1).astype(outputs.dtype)
    return jax.lax.psum(outputs * mask, axis_name)


def make_pipelined_forward(mesh: Mesh, stage_fn: Callable, *,
                           axis: str = "pp"):
    """Wrap :func:`pipeline_apply` in shard_map over ``mesh``.

    Takes GLOBAL stacked block params [L, ...] (L divisible by the pp axis
    size; sharded on the leading axis) and microbatches [M, ...] (replicated);
    returns [M, ...] outputs (replicated).
    """
    from jax.experimental.shard_map import shard_map

    n = mesh.shape[axis]

    def fn(stacked_params, microbatches):
        param_specs = jax.tree_util.tree_map(
            lambda _: P(axis), stacked_params
        )
        return shard_map(
            functools.partial(
                pipeline_apply, stage_fn=stage_fn, axis_name=axis, n_stages=n
            ),
            mesh=mesh,
            in_specs=(param_specs, P()),
            out_specs=P(),
        )(stacked_params, microbatches)

    return jax.jit(fn)
