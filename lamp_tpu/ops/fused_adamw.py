"""Fused AdamW update as a Pallas TPU kernel, with stochastic rounding.

The standard bf16 recipe keeps f32 master weights (optim.AdamW). This kernel
implements the alternative that removes them: the update is computed in f32
and written back to bf16 with *stochastic rounding* (pltpu.stochastic_round),
which keeps the tiny updates unbiased instead of losing them to
round-to-nearest — saving 4 bytes/param of optimizer state.

One kernel pass fuses: moment updates, bias correction, weight decay, the
parameter update, and the rounding — a single read and write of each buffer
(the XLA version is also fused by the compiler; the win here is the
stochastic rounding primitive, which XLA does not expose, plus a guaranteed
single-pass schedule).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_adamw_update", "AdamWStochastic"]

_BLOCK = 1024 * 128  # elements per grid step (flattened)


def _kernel(scalar_ref, p_ref, g_ref, m_ref, v_ref,
            p_out, m_out, v_out,
            *, beta1, beta2, eps, weight_decay, stochastic):
    # scalar_ref (SMEM f32[3]): [lr, step, seed]
    if stochastic:
        # fold the step counter in so rounding decisions decorrelate across
        # steps (a fixed seed would round the same elements every step)
        pltpu.prng_seed(
            scalar_ref[2].astype(jnp.int32)
            + scalar_ref[1].astype(jnp.int32) * 1000003
            + pl.program_id(0)
        )
    lr = scalar_ref[0]
    g = g_ref[...].astype(jnp.float32)
    m = beta1 * m_ref[...] + (1.0 - beta1) * g
    v = beta2 * v_ref[...] + (1.0 - beta2) * g * g
    t = scalar_ref[1]
    # beta**t as exp(t*log(beta)) — Mosaic has no runtime-exponent powf
    import math

    bc1 = 1.0 - jnp.exp(t * math.log(beta1))
    bc2 = 1.0 - jnp.exp(t * math.log(beta2))
    p = p_ref[...].astype(jnp.float32)
    upd = lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps) + lr * weight_decay * p
    new_p = p - upd
    m_out[...] = m
    v_out[...] = v
    if stochastic and p_ref.dtype == jnp.bfloat16:
        bits = pltpu.bitcast(pltpu.prng_random_bits(new_p.shape), jnp.uint32)
        p_out[...] = pltpu.stochastic_round(
            new_p, bits, target_dtype=jnp.bfloat16
        )
    else:
        p_out[...] = new_p.astype(p_out.dtype)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def fused_adamw_update(param, grad, m, v, step, *, lr: float,
                       beta1: float = 0.9, beta2: float = 0.999,
                       eps: float = 1e-8, weight_decay: float = 0.0,
                       stochastic: bool = True, seed: int = 0,
                       interpret: bool | None = None):
    """Update ONE parameter tensor; returns (new_param, new_m, new_v).

    m/v are f32 with param's shape; ``step`` is the 1-based step counter
    (int32 scalar array).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = param.shape
    n = param.size
    # flatten to [rows, 128] lanes
    lanes = 128
    rows = _round_up(n, lanes) // lanes
    pad = rows * lanes - n

    def flat(x, dtype=None):
        y = x.reshape(-1)
        if pad:
            y = jnp.pad(y, (0, pad))
        return y.reshape(rows, lanes)

    p2, g2 = flat(param), flat(grad)
    m2, v2 = flat(m), flat(v)
    # 1024 rows x 128 lanes x (4 in + 3 out buffers, mostly f32) ~ 3 MB of
    # VMEM per grid step (6 MB double-buffered). 4096-row blocks compiled in
    # isolation but blew the 16 MB scoped-VMEM stack once the surrounding
    # program (unrolled-accumulation train step) gave the scheduler more
    # concurrently-live buffers; the kernel is HBM-bound so block size does
    # not affect throughput.
    block_rows = min(rows, 1024)
    grid = (pl.cdiv(rows, block_rows),)

    kernel = functools.partial(
        _kernel, beta1=beta1, beta2=beta2, eps=eps,
        weight_decay=weight_decay,
        stochastic=stochastic and param.dtype == jnp.bfloat16,
    )
    scalars = jnp.stack([
        jnp.asarray(lr, jnp.float32),
        jnp.asarray(step, jnp.float32),
        jnp.asarray(seed, jnp.float32),
    ])

    new_p, new_m, new_v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, lanes), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, lanes), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, lanes), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, lanes), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, lanes), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, lanes), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, lanes), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(p2.shape, param.dtype),
            jax.ShapeDtypeStruct(m2.shape, jnp.float32),
            jax.ShapeDtypeStruct(v2.shape, jnp.float32),
        ),
        interpret=interpret,
    )(scalars, p2, g2, m2, v2)

    def unflat(x):
        y = x.reshape(-1)
        if pad:
            y = y[:n]
        return y.reshape(shape)

    return unflat(new_p), unflat(new_m), unflat(new_v)


class AdamWStochastic:
    """AdamW without master weights: bf16 params updated with stochastic
    rounding via the fused Pallas kernel. State = f32 m/v only (saves the
    4-bytes/param master copy of the standard mixed-precision recipe)."""

    def __init__(self, learning_rate: float = 1e-3, beta1: float = 0.9,
                 beta2: float = 0.999, eps: float = 1e-8,
                 weight_decay: float = 0.0, seed: int = 0):
        self.learning_rate = learning_rate
        self.beta1, self.beta2, self.eps = beta1, beta2, eps
        self.weight_decay = weight_decay
        self.seed = seed

    def init(self, params):
        def zeros(p):
            return None if p is None else jnp.zeros(p.shape, jnp.float32)

        z = jax.tree_util.tree_map(zeros, params, is_leaf=lambda x: x is None)
        return {
            "step": jnp.zeros((), jnp.int32),
            "mt": z,
            "vt": jax.tree_util.tree_map(
                zeros, params, is_leaf=lambda x: x is None
            ),
        }

    def step(self, params, grads, state, lr_factor=1.0):
        t = state["step"] + 1
        leaves, treedef = jax.tree_util.tree_flatten(
            params, is_leaf=lambda x: x is None
        )
        g_l = treedef.flatten_up_to(grads)
        m_l = treedef.flatten_up_to(state["mt"])
        v_l = treedef.flatten_up_to(state["vt"])
        new_p, new_m, new_v = [], [], []
        for i, (p, g, m, v) in enumerate(zip(leaves, g_l, m_l, v_l)):
            if p is None:
                new_p.append(None)
                new_m.append(None)
                new_v.append(None)
                continue
            np_, nm_, nv_ = fused_adamw_update(
                p, g, m, v, t,
                lr=self.learning_rate * lr_factor, beta1=self.beta1,
                beta2=self.beta2, eps=self.eps,
                weight_decay=self.weight_decay, seed=self.seed + i,
            )
            new_p.append(np_)
            new_m.append(nm_)
            new_v.append(nv_)
        return treedef.unflatten(new_p), {
            "step": t,
            "mt": treedef.unflatten(new_m),
            "vt": treedef.unflatten(new_v),
        }
