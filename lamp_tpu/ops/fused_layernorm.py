"""Fused LayerNorm (forward + backward) Pallas TPU kernels.

Motivation (measured, scripts/exp_lm_step_scan.py round 5): the flagship
train step's 25-LayerNorm stack costs 10.2 ms/step isolated — the ONE
component multiples above its ~3 ms HBM byte floor (the XLA lowering makes
several passes over the activation per norm: stats, normalize, then the
backward's recompute + three reduction passes). One fused pass per
direction bounds the traffic at read x + write y (+ tiny stats) forward
and read x/dy + write dx (+ [D] partials) backward.

Semantics match :class:`lamp_tpu.nn.layers.LayerNorm` exactly for the
norm_ndims=1 elementwise case (reference LayerNorm.scala:8, ops.scala:1956
LayerNormOp): stats in f32, ``rsqrt(var + eps)``, y cast back to x.dtype.

The backward uses the standard analytic LayerNorm gradient
  dx = rs * (dyg - mean(dyg) - yhat * mean(dyg * yhat)),  dyg = dy * gamma
and accumulates dgamma/dbeta across row blocks through a revisited output
block (sequential grid), so the whole backward is one pass over x and dy.

A library op for wide-model use: nn.LayerNorm keeps the XLA lowering
(the flagship-shape knockout measured <1% recoverable — see
tests/test_fused_layernorm.py docstring); callers opt in directly.
Untileable shapes fall back to the identical-math jnp path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_layernorm"]


def _block_rows(n: int) -> int:
    for bm in (512, 256, 128, 64, 32, 16, 8):
        if n % bm == 0:
            return bm
    return 0  # caller falls back


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, mu_ref, rs_ref, *, eps,
                has_bias):
    x = x_ref[...].astype(jnp.float32)              # [bm, D]
    mu = jnp.mean(x, axis=1, keepdims=True)         # [bm, 1]
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rs = jax.lax.rsqrt(var + eps)
    y = xc * rs * g_ref[...].astype(jnp.float32)
    if has_bias:
        y = y + b_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)
    mu_ref[...] = mu[:, 0][None, :]                 # [1, bm]
    rs_ref[...] = rs[:, 0][None, :]


def _bwd_kernel(x_ref, dy_ref, g_ref, mu_ref, rs_ref, dx_ref, dg_ref,
                db_ref, *, inv_d):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    x = x_ref[...].astype(jnp.float32)              # [bm, D]
    dy = dy_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)              # [1, D]
    mu = mu_ref[...][0][:, None]                    # [bm, 1]
    rs = rs_ref[...][0][:, None]
    yhat = (x - mu) * rs
    dyg = dy * g
    m1 = jnp.sum(dyg, axis=1, keepdims=True) * inv_d
    m2 = jnp.sum(dyg * yhat, axis=1, keepdims=True) * inv_d
    dx_ref[...] = (rs * (dyg - m1 - yhat * m2)).astype(dx_ref.dtype)
    dg_ref[...] += jnp.sum(dy * yhat, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(dy, axis=0, keepdims=True)


def _fwd_call(x2, g, b, eps, interpret):
    n, d = x2.shape
    bm = _block_rows(n)
    has_bias = b is not None
    kernel = functools.partial(_fwd_kernel, eps=eps, has_bias=has_bias)
    if not has_bias:
        def kernel(x_ref, g_ref, y_ref, mu_ref, rs_ref):
            _fwd_kernel(x_ref, g_ref, None, y_ref, mu_ref, rs_ref,
                        eps=eps, has_bias=False)
    in_specs = [
        pl.BlockSpec((bm, d), lambda i: (i, 0)),
        pl.BlockSpec((1, d), lambda i: (0, 0)),
    ]
    args = [x2, g.reshape(1, d)]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, d), lambda i: (0, 0)))
        args.append(b.reshape(1, d))
    y, mu, rs = pl.pallas_call(
        kernel,
        grid=(n // bm,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0)),
            pl.BlockSpec((1, bm), lambda i: (i, 0)),
            pl.BlockSpec((1, bm), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), x2.dtype),
            jax.ShapeDtypeStruct((n // bm, bm), jnp.float32),
            jax.ShapeDtypeStruct((n // bm, bm), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return y, mu.reshape(n), rs.reshape(n)


def _bwd_call(x2, dy2, g, mu, rs, interpret):
    n, d = x2.shape
    bm = _block_rows(n)
    kernel = functools.partial(_bwd_kernel, inv_d=1.0 / d)
    dx, dg, db = pl.pallas_call(
        kernel,
        grid=(n // bm,),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0)),
            pl.BlockSpec((bm, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, bm), lambda i: (i, 0)),
            pl.BlockSpec((1, bm), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),   # revisited: accumulate
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), x2.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: accumulation
        ),
        interpret=interpret,
    )(x2, dy2, g.reshape(1, d),
      mu.reshape(-1, bm), rs.reshape(-1, bm))
    return dx, dg.reshape(d), db.reshape(d)


def _jnp_layernorm(x, weight, bias, eps):
    """Reference path (identical math) for shapes the kernel cannot tile."""
    xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * weight.astype(xf.dtype)
    if bias is not None:
        y = y + bias.astype(xf.dtype)
    return y.astype(x.dtype)


def fused_layernorm(x, weight, bias, eps: float = 1e-5,
                    interpret: Optional[bool] = None):
    """LayerNorm over the last dim with learned scale (+ optional bias).

    ``x: [..., D]``, ``weight: [D]``, ``bias: [D] | None``. Returns y in
    x.dtype. Stats in f32; forward and backward are each ONE fused pass
    over the activation (see module docstring for the measured
    motivation). Shapes the kernel cannot tile (D not a multiple of 128,
    or leading-dims product not divisible by 8) take the identical-math
    jnp path instead of erroring.
    """
    n = 1
    for s in x.shape[:-1]:
        n *= s
    if x.shape[-1] % 128 or _block_rows(n) == 0:
        return _jnp_layernorm(x, weight, bias, eps)
    return _fused(x, weight, bias, eps, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused(x, weight, bias, eps: float = 1e-5,
           interpret: Optional[bool] = None):
    return _primal(x, weight, bias, eps, interpret)


def _primal(x, weight, bias, eps, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    y, _, _ = _fwd_call(x2, weight, bias, eps, interpret)
    return y.reshape(x.shape)


def _fused_ln_fwd(x, weight, bias, eps, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    y, mu, rs = _fwd_call(x2, weight, bias, eps, interpret)
    return y.reshape(x.shape), (x2, weight, bias, mu, rs, x.shape)


def _fused_ln_bwd(eps, interpret, res, dy):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x2, weight, bias, mu, rs, xshape = res
    d = x2.shape[-1]
    dy2 = dy.reshape(-1, d)
    dx, dg, db = _bwd_call(x2, dy2, weight, mu, rs, interpret)
    dg = dg.astype(weight.dtype)
    dbias = None if bias is None else db.astype(bias.dtype)
    return dx.reshape(xshape), dg, dbias


_fused.defvjp(_fused_ln_fwd, _fused_ln_bwd)
