"""Int8 quantized-training matmuls (AQT-style dynamic quantization).

TPU v5e's MXU runs s8 x s8 -> s32 at twice the bf16 rate (measured on
this chip: ~260 TOPS int8 vs ~151 TFLOPS bf16 on 4096³ chains). This
module exploits that for TRAINING, not just weight-only serving
(:mod:`lamp_tpu.ops.quantization` covers the latter): both operands of a
matmul are dynamically quantized to int8 along their contraction axes,
the product accumulates in int32 on the MXU, and the two scale vectors
are applied to the int32 result — the "AQT" recipe (Abdolrashidi et al.
2021; google/aqt). Quantization error acts like a small noise source on
activations and gradients; networks train through it (tests overfit the
same task to near-bf16 loss).

The reference framework has nothing comparable (its lowest training
precision is f16/bf16 with f32 masters, AdamW.scala:35-120); this is a
beyond-parity TPU-performance feature.

Gradient treatment (``custom_vjp``): the forward is quantized; the
backward is the straight-through estimator evaluated either in the
operands' own dtype (``bwd="bf16"``, default — safest) or with int8
quantized gradient matmuls as well (``bwd="int8"`` — fastest; both
backward products use per-contraction-axis scales like the forward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["int8_dot", "Int8Linear", "quantize_training"]


def _rowwise_q(x, axis):
    """absmax int8 quantization with one scale per slice along ``axis``
    (the contraction axis). Returns (q int8, scale f32 with that axis
    reduced to 1)."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.maximum(absmax, 1e-30) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _qdot(a, b):
    """[M, K] x [K, N] through the int8 MXU with per-row/per-col scales."""
    qa, sa = _rowwise_q(a, axis=1)           # sa [M, 1]
    qb, sb = _rowwise_q(b, axis=0)           # sb [1, N]
    y = jax.lax.dot_general(qa, qb, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * sa * sb


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _int8_dot2(x, w, bwd):
    return _qdot(x, w)


def _fwd(x, w, bwd):
    return _qdot(x, w), (x, w)


def _bwd(bwd, res, g):
    x, w = res
    if bwd == "int8":
        dx = _qdot(g, w.T)
        dw = _qdot(x.T, g)
    else:
        acc = jnp.promote_types(x.dtype, jnp.float32)
        dx = jnp.dot(g.astype(x.dtype), w.T, preferred_element_type=acc)
        dw = jnp.dot(x.T, g.astype(x.dtype), preferred_element_type=acc)
    return dx.astype(x.dtype), dw.astype(w.dtype)


_int8_dot2.defvjp(_fwd, _bwd)


def int8_dot(x, w, *, bwd: str = "bf16"):
    """``x @ w`` on the int8 MXU path, differentiable.

    ``x`` is ``[..., K]`` (leading dims flattened internally), ``w`` is
    ``[K, N]``. Per-row scales on ``x``, per-column on ``w`` — both over
    the contraction axis, so the rescale is exact rank-1. Result is f32
    (int32 accumulation + f32 scales), matching the framework's
    f32-accumulate matmul convention; cast at the call site if needed.

    ``bwd``: ``"bf16"`` runs both VJP matmuls in the operands' dtype
    (straight-through); ``"int8"`` quantizes them too (~1.7x on the
    backward matmuls, slightly noisier gradients).
    """
    if bwd not in ("bf16", "int8"):
        raise ValueError(f"unknown bwd {bwd!r}")
    if w.ndim != 2:
        raise ValueError(f"w must be [K, N], got {w.shape}")
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    y = _int8_dot2(x2, w, bwd)
    return y.reshape(*lead, w.shape[1])


from typing import Optional  # noqa: E402

from ..nn.module import Module, static_field  # noqa: E402  (no cycle: nn
from ..nn.layers import Linear  # noqa: E402   does not import ops)


class Int8Linear(Module):
    """Drop-in :class:`~lamp_tpu.nn.layers.Linear` that trains through the
    int8 MXU. Holds the SAME full-precision parameters (quantization is
    dynamic, per step) — checkpoints interchange with Linear, and
    :func:`quantize_training` / :func:`dequantize_training` convert a
    whole model in place."""

    weight: jax.Array
    bias: Optional[jax.Array]
    bwd: str = static_field(default="bf16")
    __tags__ = {"weight": "Linear.weight", "bias": "Linear.bias"}

    def forward(self, x, *, key=None, train=False):
        y = int8_dot(x, self.weight, bwd=self.bwd)
        if self.bias is not None:
            y = y + self.bias
        return y.astype(x.dtype), self


def quantize_training(model, *, bwd: str = "bf16", min_features: int = 256):
    """Swap every :class:`Linear` in a module tree for :class:`Int8Linear`
    (same parameters, dynamic int8 matmuls). Layers with fewer than
    ``min_features`` input OR output features stay in bf16/f32 — tiny
    matmuls are latency-bound and gain nothing from the int8 MXU."""

    def swap(node):
        if isinstance(node, Linear):
            k, n = node.weight.shape
            if min(k, n) >= min_features:
                return Int8Linear(weight=node.weight, bias=node.bias, bwd=bwd)
        return node

    return jax.tree_util.tree_map(
        swap, model, is_leaf=lambda n: isinstance(n, Linear))


def dequantize_training(model):
    """Inverse of :func:`quantize_training` (e.g. before export)."""

    def swap(node):
        if isinstance(node, Int8Linear):
            return Linear(weight=node.weight, bias=node.bias)
        return node

    return jax.tree_util.tree_map(
        swap, model, is_leaf=lambda n: isinstance(n, Int8Linear))


__all__.append("dequantize_training")
