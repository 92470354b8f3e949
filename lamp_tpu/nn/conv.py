"""Convolution and pooling layers.

Capability parity with the reference's Conv1D/Conv2D/Conv2DTransposed layers
(lamp-core/src/main/scala/lamp/nn/{Conv1D,Conv2D,Conv2DTransposed}.scala) and
the pooling autograd ops (ops.scala:1658-1826 MaxPool1D/MaxPool2D/AvgPool2D).

TPU-first: all convs lower to ``lax.conv_general_dilated`` which XLA maps to
the MXU (an NCHW conv becomes an implicit GEMM). Layout is NCHW / NCW to match
the reference's tensor contract; XLA:TPU transposes internally as needed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import init as initializers
from .module import Module, static_field

__all__ = [
    "Conv1D",
    "Conv2D",
    "Conv2DTransposed",
    "MaxPool1D",
    "MaxPool2D",
    "AvgPool2D",
    "max_pool_2d",
    "avg_pool_2d",
]


def _pair(x):
    return (x, x) if isinstance(x, int) else tuple(x)


def _accum_dtype(x):
    return jnp.float32 if x.dtype in (jnp.bfloat16, jnp.float16) else x.dtype


class Conv1D(Module):
    """1D convolution over [N, C, W].

    Reference: lamp-core/src/main/scala/lamp/nn/Conv1D.scala:9 (weights
    [out, in/groups, kW], kaiming-uniform style init).
    """

    weight: jax.Array
    bias: Optional[jax.Array]
    stride: int = static_field()
    padding: int = static_field()
    dilation: int = static_field()
    groups: int = static_field()
    __tags__ = {"weight": "Conv1D.weight", "bias": "Conv1D.bias"}

    @staticmethod
    def init(in_channels: int, out_channels: int, kernel_size: int, *, key,
             stride: int = 1, padding: int = 0, dilation: int = 1,
             groups: int = 1, bias: bool = True, dtype=jnp.float32) -> "Conv1D":
        fan_in = in_channels // groups * kernel_size
        w = initializers.kaiming_normal(
            key, (out_channels, in_channels // groups, kernel_size), dtype,
            fan_in=fan_in,
        )
        b = jnp.zeros((out_channels,), dtype) if bias else None
        return Conv1D(weight=w, bias=b, stride=stride, padding=padding,
                      dilation=dilation, groups=groups)

    def forward(self, x, *, key=None, train=False):
        y = jax.lax.conv_general_dilated(
            x, self.weight.astype(x.dtype),
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=self.groups,
            preferred_element_type=_accum_dtype(x),
        )
        if self.bias is not None:
            y = y + self.bias[None, :, None]
        return y.astype(x.dtype), self


class Conv2D(Module):
    """2D convolution over [N, C, H, W].

    Reference: lamp-core/src/main/scala/lamp/nn/Conv2D.scala:8 and the
    Convolution autograd op ops.scala:1547 (forward ATen.convolution).
    """

    weight: jax.Array
    bias: Optional[jax.Array]
    stride: Tuple[int, int] = static_field()
    padding: Tuple[int, int] = static_field()
    dilation: Tuple[int, int] = static_field()
    groups: int = static_field()
    __tags__ = {"weight": "Conv2D.weight", "bias": "Conv2D.bias"}

    @staticmethod
    def init(in_channels: int, out_channels: int, kernel_size, *, key,
             stride=1, padding=0, dilation=1, groups: int = 1,
             bias: bool = True, dtype=jnp.float32) -> "Conv2D":
        kh, kw = _pair(kernel_size)
        fan_in = in_channels // groups * kh * kw
        w = initializers.kaiming_normal(
            key, (out_channels, in_channels // groups, kh, kw), dtype,
            fan_in=fan_in,
        )
        b = jnp.zeros((out_channels,), dtype) if bias else None
        return Conv2D(weight=w, bias=b, stride=_pair(stride),
                      padding=_pair(padding), dilation=_pair(dilation),
                      groups=groups)

    def forward(self, x, *, key=None, train=False):
        ph, pw = self.padding
        y = jax.lax.conv_general_dilated(
            x, self.weight.astype(x.dtype),
            window_strides=self.stride,
            padding=[(ph, ph), (pw, pw)],
            rhs_dilation=self.dilation,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=self.groups,
            preferred_element_type=_accum_dtype(x),
        )
        if self.bias is not None:
            y = y + self.bias[None, :, None, None]
        return y.astype(x.dtype), self


class Conv2DTransposed(Module):
    """Transposed 2D convolution (deconvolution) over [N, C, H, W].

    Reference: lamp-core/src/main/scala/lamp/nn/Conv2DTransposed.scala.
    Implemented as ``conv_general_dilated`` with lhs dilation (the gradient-of-
    conv formulation XLA optimizes natively).
    """

    weight: jax.Array  # [in, out, kh, kw] (torch transposed-conv layout)
    bias: Optional[jax.Array]
    stride: Tuple[int, int] = static_field()
    padding: Tuple[int, int] = static_field()
    __tags__ = {"weight": "Conv2DTransposed.weight", "bias": "Conv2DTransposed.bias"}

    @staticmethod
    def init(in_channels: int, out_channels: int, kernel_size, *, key,
             stride=1, padding=0, bias: bool = True,
             dtype=jnp.float32) -> "Conv2DTransposed":
        kh, kw = _pair(kernel_size)
        fan_in = out_channels * kh * kw
        w = initializers.kaiming_normal(
            key, (in_channels, out_channels, kh, kw), dtype, fan_in=fan_in
        )
        b = jnp.zeros((out_channels,), dtype) if bias else None
        return Conv2DTransposed(weight=w, bias=b, stride=_pair(stride),
                                padding=_pair(padding))

    def forward(self, x, *, key=None, train=False):
        kh, kw = self.weight.shape[2], self.weight.shape[3]
        sh, sw = self.stride
        ph, pw = self.padding
        # transposed conv = conv with lhs dilation, flipped kernel, swapped I/O
        w = jnp.flip(self.weight, (2, 3)).astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x, w,
            window_strides=(1, 1),
            padding=[(kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)],
            lhs_dilation=(sh, sw),
            dimension_numbers=("NCHW", "IOHW", "NCHW"),
            preferred_element_type=_accum_dtype(x),
        )
        if self.bias is not None:
            y = y + self.bias[None, :, None, None]
        return y.astype(x.dtype), self


def max_pool_2d(x, kernel_size, stride=None, padding=0):
    """Max pool over [N, C, H, W]. Reference: MaxPool2D op ops.scala:1721."""
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride) if stride is not None else (kh, kw)
    ph, pw = _pair(padding)
    neg = (
        jnp.finfo(x.dtype).min
        if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min
    )
    return jax.lax.reduce_window(
        x, neg, jax.lax.max,
        window_dimensions=(1, 1, kh, kw),
        window_strides=(1, 1, sh, sw),
        padding=((0, 0), (0, 0), (ph, ph), (pw, pw)),
    )


def avg_pool_2d(x, kernel_size, stride=None, padding=0,
                count_include_pad: bool = True):
    """Average pool over [N, C, H, W]. Reference: AvgPool2D op ops.scala:1775.

    Implemented as a depthwise conv with a constant mean kernel — fully
    differentiable and lowered onto the MXU by XLA.
    """
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride) if stride is not None else (kh, kw)
    ph, pw = _pair(padding)
    c = x.shape[1]
    kernel = jnp.full((c, 1, kh, kw), 1.0 / (kh * kw), x.dtype)
    pooled = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(sh, sw),
        padding=[(ph, ph), (pw, pw)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )
    if count_include_pad or (ph == 0 and pw == 0):
        return pooled
    ones = jnp.ones((1, 1) + x.shape[2:], x.dtype)
    counts = jax.lax.conv_general_dilated(
        ones, jnp.full((1, 1, kh, kw), 1.0 / (kh * kw), x.dtype),
        window_strides=(sh, sw),
        padding=[(ph, ph), (pw, pw)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return pooled / counts


def max_pool_1d(x, kernel_size, stride=None, padding=0):
    """Max pool over [N, C, W]. Reference: MaxPool1D op ops.scala:1658."""
    k = kernel_size
    s = stride if stride is not None else k
    neg = jnp.finfo(x.dtype).min
    return jax.lax.reduce_window(
        x, neg, jax.lax.max,
        window_dimensions=(1, 1, k),
        window_strides=(1, 1, s),
        padding=((0, 0), (0, 0), (padding, padding)),
    )


class MaxPool1D(Module):
    kernel_size: int = static_field()
    stride: Optional[int] = static_field()
    padding: int = static_field()

    @staticmethod
    def init(kernel_size, stride=None, padding=0) -> "MaxPool1D":
        return MaxPool1D(kernel_size=kernel_size, stride=stride, padding=padding)

    def forward(self, x, *, key=None, train=False):
        return max_pool_1d(x, self.kernel_size, self.stride, self.padding), self


class MaxPool2D(Module):
    kernel_size: Tuple[int, int] = static_field()
    stride: Optional[Tuple[int, int]] = static_field()
    padding: Tuple[int, int] = static_field()

    @staticmethod
    def init(kernel_size, stride=None, padding=0) -> "MaxPool2D":
        return MaxPool2D(
            kernel_size=_pair(kernel_size),
            stride=_pair(stride) if stride is not None else None,
            padding=_pair(padding),
        )

    def forward(self, x, *, key=None, train=False):
        return max_pool_2d(x, self.kernel_size, self.stride, self.padding), self


class AvgPool2D(Module):
    kernel_size: Tuple[int, int] = static_field()
    stride: Optional[Tuple[int, int]] = static_field()
    padding: Tuple[int, int] = static_field()

    @staticmethod
    def init(kernel_size, stride=None, padding=0) -> "AvgPool2D":
        return AvgPool2D(
            kernel_size=_pair(kernel_size),
            stride=_pair(stride) if stride is not None else None,
            padding=_pair(padding),
        )

    def forward(self, x, *, key=None, train=False):
        return avg_pool_2d(x, self.kernel_size, self.stride, self.padding), self
