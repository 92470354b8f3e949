"""Collective matmul: overlap tensor-parallel collectives with MXU work.

Beyond reference parity (SURVEY.md §2.7: the reference has no tensor
parallelism at all). GSPMD's automatic sharding inserts an all-gather
BEFORE a column-parallel matmul and an all-reduce/reduce-scatter AFTER a
row-parallel one; at small per-chip sizes those collectives serialize with
the matmul and the ICI latency shows up on the critical path. These
primitives decompose the matmul into one chunk per shard and walk the ring
with ``ppermute``, double-buffered so the transfer of chunk t+1 has no data
dependence on chunk t's matmul — XLA's latency-hiding scheduler then runs
DMA and MXU concurrently (the "collective matmul" of Wang et al. 2023,
https://dl.acm.org/doi/10.1145/3567955.3567959).

Both functions run INSIDE ``shard_map``. The ``make_*`` wrappers below bind
them to a mesh axis for standalone use/testing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "allgather_matmul",
    "matmul_reducescatter",
    "make_allgather_matmul",
    "make_matmul_reducescatter",
]


def _acc_type(a, b):
    return jnp.promote_types(jnp.promote_types(a.dtype, b.dtype), jnp.float32)


from ._varying import pvary_tree as _vary


def allgather_matmul(x_local, w_local, *, axis_name: str):
    """``all_gather(x, axis) @ w_local`` without materializing the gather.

    ``x_local``: [m_loc, k] — this device's row shard of X (X is sharded
    over ``axis_name``; m = n · m_loc). ``w_local``: [k, p_loc] — this
    device's column shard of W (the Megatron column-parallel weight).
    Returns [m, p_loc]: every X row times the local W columns.

    Ring schedule: at step t the device matmuls the chunk it holds while
    ppermuting that same chunk onward for step t+1 — the send has no
    dependence on the matmul output, so compute hides the transfer.
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    m_loc = x_local.shape[0]
    acc_t = _acc_type(x_local, w_local)
    out0 = _vary(jnp.zeros((n * m_loc, w_local.shape[1]), acc_t), axis_name)
    x_local = _vary(x_local, axis_name)
    # send towards lower indices so that at step t device d holds chunk
    # (d + t) mod n
    perm = [(i, (i - 1) % n) for i in range(n)]

    def write(out, y, t):
        row = ((idx + t) % n) * m_loc
        return jax.lax.dynamic_update_slice(
            out, y, (row, jnp.zeros((), row.dtype))
        )

    def step(carry, t):
        chunk, out = carry
        nxt = jax.lax.ppermute(chunk, axis_name, perm)  # overlaps the matmul
        y = jnp.dot(chunk, w_local, preferred_element_type=acc_t)
        return (nxt, write(out, y, t)), None

    (last, out), _ = jax.lax.scan(
        step, (x_local, out0), jnp.arange(n - 1)
    )
    y = jnp.dot(last, w_local, preferred_element_type=acc_t)
    return write(out, y, n - 1)


def matmul_reducescatter(x_local, w_local, *, axis_name: str):
    """``reduce_scatter(x_local @ w_local, axis)`` with the partial-sum ring
    hidden behind the chunk matmuls.

    ``x_local``: [m, k_loc] — this device's column shard of X (the Megatron
    row-parallel activation). ``w_local``: [k_loc, p] — the matching row
    shard of W. Returns [m_loc, p] (m = n · m_loc): this device's row block
    of Y = Σ_d x_d @ w_d, i.e. ``jax.lax.psum_scatter`` of the local matmul
    along rows.

    The accumulator travels the ring (a serial dependence), but each step's
    chunk matmul is independent of the in-flight accumulator, so the
    transfer hides behind the next chunk's MXU work.
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    m = x_local.shape[0]
    m_loc = m // n
    acc_t = _acc_type(x_local, w_local)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def partial(t):
        # contribution to row block b = (idx - 1 - t) mod n: after the
        # remaining (n-1-t) hops the accumulated block lands on device b
        b = (idx - 1 - t) % n
        start = b * m_loc
        rows = jax.lax.dynamic_slice(
            x_local, (start, jnp.zeros((), start.dtype)),
            (m_loc, x_local.shape[1]),
        )
        return jnp.dot(rows, w_local, preferred_element_type=acc_t)

    def step(carry, t):
        recv, part = carry
        acc = recv + part
        nxt = jax.lax.ppermute(acc, axis_name, perm)
        part_next = partial(t + 1)  # independent of the permute — overlaps
        return (nxt, part_next), None

    carry0 = (
        _vary(jnp.zeros((m_loc, w_local.shape[1]), acc_t), axis_name),
        _vary(partial(0), axis_name),
    )
    (recv, part), _ = jax.lax.scan(step, carry0, jnp.arange(n - 1))
    return recv + part


def make_allgather_matmul(mesh: Mesh, axis: str = "tp"):
    """shard_map-bound :func:`allgather_matmul`: takes global X [m, k]
    (row-sharded over ``axis``) and global W [k, p] (column-sharded);
    returns global [m, p] (column-sharded)."""
    from jax import shard_map

    fn = shard_map(
        functools.partial(allgather_matmul, axis_name=axis),
        mesh=mesh,
        in_specs=(P(axis, None), P(None, axis)),
        out_specs=P(None, axis),
    )
    return jax.jit(fn)


def make_matmul_reducescatter(mesh: Mesh, axis: str = "tp"):
    """shard_map-bound :func:`matmul_reducescatter`: takes global X [m, k]
    (column-sharded over ``axis``) and global W [k, p] (row-sharded);
    returns global [m, p] (row-sharded)."""
    from jax import shard_map

    fn = shard_map(
        functools.partial(matmul_reducescatter, axis_name=axis),
        mesh=mesh,
        in_specs=(P(None, axis), P(axis, None)),
        out_specs=P(axis, None),
    )
    return jax.jit(fn)
