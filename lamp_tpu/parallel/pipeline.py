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

__all__ = [
    "pipeline_apply",
    "make_pipelined_forward",
    "pipeline_apply_interleaved",
    "make_interleaved_pipelined_forward",
]


from ._varying import pvary_tree as _pvary


def pipeline_apply(stage_params, microbatches, stage_fn: Callable, *,
                   axis_name: str, n_stages: int,
                   overlap_sends: bool = False):
    """Run inside shard_map. ``stage_params``: this stage's local stack of
    block params [L_local, ...] (pytree). ``microbatches``: [M, ...] — the
    same array on every device (only stage 0's injections matter).
    ``stage_fn(stage_params, x) -> y`` applies the local blocks.

    ``overlap_sends=True`` double-buffers the inter-stage transfer: each tick
    ppermutes the PREVIOUS tick's output while computing the current one, so
    the collective-permute has no data dependence on the tick's compute and
    XLA's latency-hiding scheduler runs it concurrently over ICI. A hop then
    takes two ticks (fill/drain bubble 2(S-1) instead of S-1 ticks) but each
    tick costs max(T_compute, T_comm) instead of T_compute + T_comm — the
    right trade whenever M >> S.

    Returns [M, ...] outputs, valid on every device (masked psum broadcast).
    """
    idx = jax.lax.axis_index(axis_name)
    m = microbatches.shape[0]
    hop = 2 if overlap_sends else 1
    ticks = m + hop * (n_stages - 1)
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    outputs0 = jnp.zeros(microbatches.shape, microbatches.dtype)
    recv0 = jnp.zeros(microbatches.shape[1:], microbatches.dtype)
    # the carries become device-varying after the first tick (ppermute /
    # per-stage writes); mark the initial values as varying to match
    outputs0, recv0 = _pvary((outputs0, recv0), axis_name)

    def write_out(outputs, y, t):
        out_t = t - hop * (n_stages - 1)
        updated = outputs.at[jnp.clip(out_t, 0, m - 1)].set(y)
        write = (out_t >= 0) & (idx == n_stages - 1)
        return jnp.where(write, updated, outputs)

    if overlap_sends:
        def tick(carry, t):
            outputs, recv, pending = carry
            # send last tick's output first — independent of this tick's
            # stage_fn, so the permute overlaps the compute
            nxt = jax.lax.ppermute(pending, axis_name, perm)
            inject = microbatches[jnp.clip(t, 0, m - 1)]
            x_in = jnp.where(idx == 0, inject, recv)
            y = stage_fn(stage_params, x_in)
            outputs = write_out(outputs, y, t)
            return (outputs, nxt, y), None

        pending0 = _pvary(jnp.zeros_like(recv0), axis_name)
        (outputs, _, _), _ = jax.lax.scan(
            tick, (outputs0, recv0, pending0), jnp.arange(ticks)
        )
    else:
        def tick(carry, t):
            outputs, recv = carry
            inject = microbatches[jnp.clip(t, 0, m - 1)]
            x_in = jnp.where(idx == 0, inject, recv)
            y = stage_fn(stage_params, x_in)
            nxt = jax.lax.ppermute(y, axis_name, perm)
            outputs = write_out(outputs, y, t)
            return (outputs, nxt), None

        (outputs, _), _ = jax.lax.scan(
            tick, (outputs0, recv0), jnp.arange(ticks)
        )
    # broadcast the last stage's outputs to every device
    mask = (idx == n_stages - 1).astype(outputs.dtype)
    return jax.lax.psum(outputs * mask, axis_name)


def pipeline_apply_interleaved(chunk_params, microbatches, chunk_fn: Callable,
                               *, axis_name: str, n_stages: int,
                               n_virtual: int, extras=None,
                               overlap_sends: bool = False):
    """Interleaved (circular) pipeline schedule — the Megatron "virtual
    stages" idea, expressed differentiably.

    Each device holds ``n_virtual`` NON-contiguous chunks of the block stack
    (device d owns global chunks d, S+d, 2S+d, …), and activations circulate
    the device ring ``n_virtual`` times. A tick applies one chunk (1/v of a
    device's blocks), so the pipeline fill/drain bubble costs
    (S-1) · T_device/v instead of GPipe's (S-1) · T_device — v× smaller.
    jax reverses the scan + ppermutes for the backward pipeline, which
    inherits the same bubble shrink (so fwd+bwd bubble ≈ 2(S-1)/v chunk
    times vs the GPipe schedule's 2(S-1) stage times).

    Runs inside shard_map. ``chunk_params``: this device's chunks stacked on
    a leading axis [v, ...] (entry j = global chunk j·S + d).
    ``chunk_fn(one_chunk_params, x) -> y`` applies one chunk's blocks.
    ``microbatches``: [M, ...], replicated. Returns [M, ...], replicated.
    """
    import numpy as np

    idx = jax.lax.axis_index(axis_name)
    m = microbatches.shape[0]
    s, v = n_stages, n_virtual
    total_age = s * v
    # with overlapped sends a hop takes 2 ticks; injection groups widen to
    # 2S microbatches (the two tick-parity streams keep every device busy)
    hop = 2 if overlap_sends else 1

    # static injection schedule: groups of hop·S microbatches; group g's
    # injections occupy device-0 ticks g·hop·S·v + j (device 0 is busy with
    # the circulating passes of group g until then)
    gsz = hop * s
    enter = np.array([(i // gsz) * gsz * v + (i % gsz) for i in range(m)])
    ticks = int(enter[-1]) + hop * total_age + 1
    inject_sched = np.full((ticks,), -1, np.int32)
    inject_sched[enter] = np.arange(m)
    inject_sched = jnp.asarray(inject_sched)

    perm = [(i, (i + 1) % s) for i in range(s)]

    outputs0 = jnp.zeros(microbatches.shape, microbatches.dtype)
    h0 = jnp.zeros(microbatches.shape[1:], microbatches.dtype)
    age0 = jnp.full((), -1, jnp.int32)
    mb0 = jnp.zeros((), jnp.int32)
    outputs0, h0, age0, mb0 = _pvary((outputs0, h0, age0, mb0), axis_name)

    def compute(outputs, h, age, mb, t):
        # 1. capture finished activations (only device 0 can receive
        #    age == S·v: the last chunk lives on device S-1)
        done = (age == total_age) & (idx == 0)
        captured = outputs.at[jnp.clip(mb, 0, m - 1)].set(h)
        outputs = jnp.where(done, captured, outputs)
        # 2. inject on device 0 per the static schedule
        inj = inject_sched[t]
        use_inject = (idx == 0) & (inj >= 0)
        x_in = jnp.where(use_inject, microbatches[jnp.clip(inj, 0, m - 1)], h)
        age_in = jnp.where(use_inject, 0, jnp.where(done, -1, age))
        mb_in = jnp.where(use_inject, inj, mb)
        # 3. apply this device's chunk age_in // S (valid slots satisfy
        #    age_in % S == idx by construction of the ring)
        valid = (age_in >= 0) & (age_in < total_age)
        ci = jnp.clip(age_in // s, 0, v - 1)
        p_c = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, ci, 0, keepdims=False),
            chunk_params,
        )
        y = chunk_fn(p_c, x_in) if extras is None \
            else chunk_fn(p_c, x_in, extras)
        y = jnp.where(valid, y, jnp.zeros_like(y))
        age_out = jnp.where(valid, age_in + 1, -1)
        return outputs, (y, age_out, mb_in)

    if overlap_sends:
        def tick(carry, t):
            outputs, recv, pending = carry
            # send last tick's output first — no data dependence on this
            # tick's chunk_fn, so the permute overlaps the compute
            nxt = jax.lax.ppermute(pending, axis_name, perm)
            outputs, out_msg = compute(outputs, *recv, t)
            return (outputs, nxt, out_msg), None

        pending0 = (_pvary(jnp.zeros_like(h0), axis_name), age0, mb0)
        (outputs, _, _), _ = jax.lax.scan(
            tick, (outputs0, (h0, age0, mb0), pending0), jnp.arange(ticks)
        )
    else:
        def tick(carry, t):
            outputs, h, age, mb = carry
            outputs, out_msg = compute(outputs, h, age, mb, t)
            # 4. pass along the ring (device S-1 wraps to device 0)
            h_n, age_n, mb_n = jax.lax.ppermute(out_msg, axis_name, perm)
            return (outputs, h_n, age_n, mb_n), None

        (outputs, _, _, _), _ = jax.lax.scan(
            tick, (outputs0, h0, age0, mb0), jnp.arange(ticks)
        )
    # captures all happened on device 0; broadcast
    mask = (idx == 0).astype(outputs.dtype)
    return jax.lax.psum(outputs * mask, axis_name)


def make_interleaved_pipelined_forward(mesh: Mesh, chunk_fn: Callable, *,
                                       axis: str = "pp", n_virtual: int = 2,
                                       has_extras: bool = False,
                                       overlap_sends: bool = False):
    """Wrap :func:`pipeline_apply_interleaved` in shard_map over ``mesh``.

    Takes GLOBAL stacked block params [L, ...] (L divisible by S·n_virtual)
    and microbatches [M, ...]; returns [M, ...]. ``chunk_fn(params, x)``
    applies one chunk of L / (S·n_virtual) blocks. With ``has_extras`` the
    returned fn takes a third replicated pytree forwarded to
    ``chunk_fn(params, x, extras)`` (e.g. RoPE tables). ``overlap_sends``
    double-buffers the ring transfer so the ICI permute overlaps chunk
    compute (see :func:`pipeline_apply`).
    """
    from jax import shard_map

    s = mesh.shape[axis]
    v = n_virtual

    def fn(stacked_params, microbatches, extras=None):
        # [L, ...] -> [v, S, Lc, ...]: element [j, d] is global chunk j·S+d,
        # sharding axis 1 puts chunk j·S+d on device d
        def to_chunks(a):
            lc = a.shape[0] // (s * v)
            return a.reshape(v, s, lc, *a.shape[1:])

        chunked = jax.tree_util.tree_map(to_chunks, stacked_params)
        param_specs = jax.tree_util.tree_map(
            lambda _: P(None, axis), chunked
        )
        extras_specs = jax.tree_util.tree_map(lambda _: P(), extras)

        def inner(chunked_local, mbs, ext):
            local = jax.tree_util.tree_map(
                lambda a: a.squeeze(1), chunked_local
            )
            return pipeline_apply_interleaved(
                local, mbs, chunk_fn, axis_name=axis, n_stages=s,
                n_virtual=v, extras=ext, overlap_sends=overlap_sends,
            )

        return shard_map(
            inner, mesh=mesh,
            in_specs=(param_specs, P(), extras_specs), out_specs=P(),
        )(chunked, microbatches, extras)

    if has_extras:
        return jax.jit(fn)
    return jax.jit(lambda stacked, mbs: fn(stacked, mbs, None))


def stack_lm_blocks(lm):
    """Stack an LM's homogeneous blocks into one pytree with a leading [L]
    axis (scannable / pipeline-shardable). Works for LanguageModelModule
    (``lm.encoder.blocks``) and ModernLM (``lm.blocks``)."""
    blocks = lm.encoder.blocks if hasattr(lm, "encoder") else lm.blocks
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def make_pipelined_lm_forward(mesh: Mesh, *, axis: str = "pp",
                              n_virtual: int = 1, n_microbatches: int = 1,
                              modern: bool = False,
                              overlap_sends: bool = False):
    """Pipeline an LM's block stack over the ``axis`` mesh dimension:
    embeddings, final norm and logits run replicated (cheap); the L blocks
    are split into S·n_virtual chunks flowing through the interleaved
    schedule.

    ``modern=False``: LanguageModelModule (learned positions, GPT blocks).
    ``modern=True``: ModernLM (RoPE + GQA llama blocks; the RoPE tables ride
    along as replicated extras).

    Returns ``fn(lm, tokens) -> logits`` (jitted). Deterministic forward
    (no dropout keys are threaded through the pipeline).
    """
    v = n_virtual

    if modern:
        def chunk_fn(chunk_blocks, x, rope):
            def body(x, block):
                (y, _), _ = block.forward((x, rope), train=False)
                return y, None

            y, _ = jax.lax.scan(body, x, chunk_blocks)
            return y
    else:
        def chunk_fn(chunk_blocks, x):
            def body(x, block):
                (y, _), _ = block.forward((x, None), train=False)
                return y, None

            y, _ = jax.lax.scan(body, x, chunk_blocks)
            return y

    piped = make_interleaved_pipelined_forward(
        mesh, chunk_fn, axis=axis, n_virtual=v, has_extras=modern,
        overlap_sends=overlap_sends,
    )

    def fn(lm, tokens):
        b, t = tokens.shape
        if modern:
            x = lm.token_embedding(tokens)
        else:
            pos = jnp.arange(t)[None, :]
            x = lm.token_embedding(tokens) + lm.position_embedding(pos)
        mbs = x.reshape(
            n_microbatches, b // n_microbatches, t, x.shape[-1]
        )
        stacked = stack_lm_blocks(lm)
        if modern:
            y = piped(stacked, mbs, (lm.rope_cos, lm.rope_sin))
        else:
            y = piped(stacked, mbs)
        y = lm.final_norm(y.reshape(b, t, -1))
        acc = jnp.promote_types(y.dtype, jnp.float32)
        if getattr(lm, "lm_head", None) is not None:
            return lm.lm_head(y).astype(acc)
        w = lm.token_embedding.weight
        return jnp.einsum("btd,vd->btv", y, w, preferred_element_type=acc)

    return jax.jit(fn)


def make_pipelined_lm_loss_fn(mesh: Mesh, *, axis: str = "pp",
                              n_virtual: int = 1, n_microbatches: int = 1,
                              modern: bool = False,
                              ignore_index: int = -100,
                              overlap_sends: bool = False):
    """Loss function for PIPELINE-PARALLEL LM TRAINING, composable with
    ``train.make_train_step`` / ``train.epochs``: the forward runs through
    the interleaved pipeline (jax reverses it for the backward pipeline),
    the sequence-NLL loss and optimizer step run replicated.

    ``loss_fn(model, (tokens, targets), key, train) -> (loss, n, model)``.
    """
    piped = make_pipelined_lm_forward(
        mesh, axis=axis, n_virtual=n_virtual, n_microbatches=n_microbatches,
        modern=modern, overlap_sends=overlap_sends,
    )

    def loss_fn(model, batch, key, train_mode):
        tokens, target = batch
        logits = piped(model, tokens)
        from ..nn.losses import sequence_nll

        return (
            sequence_nll(logits, target, ignore_index=ignore_index),
            jnp.asarray(tokens.shape[0], jnp.float32),
            model,
        )

    return loss_fn


def make_pipelined_forward(mesh: Mesh, stage_fn: Callable, *,
                           axis: str = "pp", overlap_sends: bool = False):
    """Wrap :func:`pipeline_apply` in shard_map over ``mesh``.

    Takes GLOBAL stacked block params [L, ...] (L divisible by the pp axis
    size; sharded on the leading axis) and microbatches [M, ...] (replicated);
    returns [M, ...] outputs (replicated).
    """
    from jax import shard_map

    n = mesh.shape[axis]

    def fn(stacked_params, microbatches):
        param_specs = jax.tree_util.tree_map(
            lambda _: P(axis), stacked_params
        )
        return shard_map(
            functools.partial(
                pipeline_apply, stage_fn=stage_fn, axis_name=axis,
                n_stages=n, overlap_sends=overlap_sends,
            ),
            mesh=mesh,
            in_specs=(param_specs, P()),
            out_specs=P(),
        )(stacked_params, microbatches)

    return jax.jit(fn)
