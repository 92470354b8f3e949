"""LoRA: low-rank adaptation of frozen linear layers (Hu et al. 2021).

Parameter-efficient fine-tuning for the model zoo — beyond reference parity
(pityka/lamp has no adapter mechanism; its closest knob is per-tag optimizer
hyperparameters, reference lamp-core/src/main/scala/lamp/nn/Optimizer.scala:15-24).

Design: :class:`LoRALinear` stores the base weight/bias as BUFFER fields, so
they are frozen automatically — ``partition_params`` puts them in the
non-trainable tree, ``make_train_step`` differentiates only the adapters, and
every optimizer allocates state solely for the A/B factors. No trainable-mask
plumbing anywhere.

    model   = nn.LanguageModelModule.init(...)
    tuned   = nn.lora_inject(model, rank=8, key=key)     # Linears -> LoRALinear
    ...train tuned with the normal loops (only A/B receive updates)...
    merged  = nn.lora_merge(tuned)                       # back to plain Linears

``lora_inject(match=...)`` restricts injection by dotted path, e.g.
``lambda p: "attention" in p`` adapts only attention projections.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from . import init as initializers
from .layers import Linear, _accum_dtype
from .module import Module, buffer_field, static_field

__all__ = ["LoRALinear", "lora_inject", "lora_merge", "lora_parameter_count",
           "QLoRALinear", "qlora_inject"]


class LoRALinear(Module):
    """y = x @ W (+ b) + (x @ A) @ B * (alpha / rank), with W, b frozen.

    A is gaussian-initialised, B zero — the wrapped layer starts exactly
    equal to the base layer.
    """

    weight: jax.Array = buffer_field()
    bias: Optional[jax.Array] = buffer_field()
    lora_a: jax.Array = dataclasses.field()
    lora_b: jax.Array = dataclasses.field()
    scale: float = static_field()
    __tags__ = {
        "weight": "Linear.weight", "bias": "Linear.bias",
        "lora_a": "LoRA.a", "lora_b": "LoRA.b",
    }

    @staticmethod
    def wrap(linear: Linear, rank: int, *, key,
             alpha: Optional[float] = None) -> "LoRALinear":
        d_in, d_out = linear.weight.shape
        dt = linear.weight.dtype
        a = initializers.kaiming_normal(key, (d_in, rank), dt)
        b = jnp.zeros((rank, d_out), dt)
        return LoRALinear(
            weight=linear.weight, bias=linear.bias, lora_a=a, lora_b=b,
            scale=float(alpha if alpha is not None else rank) / rank,
        )

    def merge(self) -> Linear:
        """Fold the adapter into a plain Linear (serving/export path)."""
        acc = jnp.promote_types(self.weight.dtype, jnp.float32)
        delta = jnp.matmul(
            self.lora_a, self.lora_b, preferred_element_type=acc
        ) * self.scale
        return Linear(
            weight=(self.weight.astype(acc) + delta).astype(self.weight.dtype),
            bias=self.bias,
        )

    def forward(self, x, *, key=None, train=False):
        acc = _accum_dtype(x)
        y = jnp.dot(x, self.weight, preferred_element_type=acc)
        if self.bias is not None:
            y = y + self.bias
        lo = jnp.dot(
            jnp.dot(x, self.lora_a, preferred_element_type=acc),
            self.lora_b, preferred_element_type=acc,
        )
        return (y + self.scale * lo).astype(x.dtype), self


class QLoRALinear(Module):
    """QLoRA: LoRA adapters over a QUANTIZED frozen base (Dettmers et al.
    2023). The base weight is stored int4 (nibble-packed, group-wise scales)
    or int8 (per-channel scales) as buffers — 4-8x less HBM at rest than the
    bf16 base of :class:`LoRALinear` — while the A/B factors train in full
    precision.

    The forward dequantizes the base INSIDE the matmul's operand (XLA fuses
    the int->bf16 upcast + scale into the MXU feed, so no [K, N] bf16 copy
    is materialized in HBM) and computes ``x @ W_deq`` in bf16: gradients
    flow to ``x`` exactly as through a plain Linear, matching the QLoRA
    recipe. ``stop_gradient`` pins the base; only A/B receive updates.
    """

    w_q: jax.Array = buffer_field()        # int8 [K,N] or packed int4 [K/2,N]
    w_scale: jax.Array = buffer_field()    # int8: [1,N]; int4: [G,N] f32
    bias: Optional[jax.Array] = buffer_field()
    lora_a: jax.Array = dataclasses.field()
    lora_b: jax.Array = dataclasses.field()
    scale: float = static_field()
    bits: int = static_field()
    out_dtype: str = static_field()
    __tags__ = {
        "w_q": "Linear.weight", "bias": "Linear.bias",
        "lora_a": "LoRA.a", "lora_b": "LoRA.b",
    }

    @staticmethod
    def wrap(linear: Linear, rank: int, *, key, bits: int = 4,
             group_size: int = 128,
             alpha: Optional[float] = None) -> "QLoRALinear":
        from ..ops import quantization as q

        if bits not in (4, 8):
            raise ValueError("bits must be 4 or 8")
        d_in, d_out = linear.weight.shape
        dt = linear.weight.dtype
        if bits == 4 and d_in % 2:
            bits = 8  # odd input dim cannot be nibble-packed
        if bits == 4:
            w_q, w_scale = q.quantize_int4(
                linear.weight, group_size=q.int4_group_size(d_in, group_size)
            )
        else:
            w_q, w_scale = q.quantize_int8(linear.weight, axis=0)
        # adapters in f32: QLoRA trains adapters in higher precision than
        # the (quantized) base
        a = initializers.kaiming_normal(key, (d_in, rank), jnp.float32)
        b = jnp.zeros((rank, d_out), jnp.float32)
        return QLoRALinear(
            w_q=w_q, w_scale=w_scale, bias=linear.bias, lora_a=a, lora_b=b,
            scale=float(alpha if alpha is not None else rank) / rank,
            bits=bits, out_dtype=jnp.dtype(dt).name,
        )

    def _dequant(self):
        from ..ops import quantization as q

        dt = jnp.dtype(self.out_dtype)
        if self.bits == 4:
            w = q.dequantize_int4(self.w_q, self.w_scale, dtype=dt)
        else:
            w = q.dequantize_int8(self.w_q, self.w_scale, dtype=dt)
        return jax.lax.stop_gradient(w)

    def merge(self) -> Linear:
        """Dequantize the base, fold in the adapter -> plain Linear."""
        w = self._dequant()
        acc = jnp.promote_types(w.dtype, jnp.float32)
        delta = jnp.matmul(
            self.lora_a, self.lora_b, preferred_element_type=acc
        ) * self.scale
        return Linear(
            weight=(w.astype(acc) + delta).astype(w.dtype), bias=self.bias
        )

    def forward(self, x, *, key=None, train=False):
        acc = _accum_dtype(x)
        y = jnp.dot(x, self._dequant().astype(x.dtype),
                    preferred_element_type=acc)
        if self.bias is not None:
            y = y + self.bias
        lo = jnp.dot(
            jnp.dot(x, self.lora_a.astype(x.dtype),
                    preferred_element_type=acc),
            self.lora_b.astype(x.dtype), preferred_element_type=acc,
        )
        return (y + self.scale * lo).astype(x.dtype), self


def _map_linears(node, fn: Callable, path: tuple):
    """Rebuild ``node`` with ``fn(path, linear)`` applied to every Linear /
    LoRALinear (fn decides what to do per class)."""
    hit = fn(path, node)
    if hit is not None:
        return hit
    if isinstance(node, Module):
        changes = {}
        for f in dataclasses.fields(node):
            if f.metadata.get("static", False):
                continue
            sub = getattr(node, f.name)
            new = _map_linears(sub, fn, path + (f.name,))
            if new is not sub:
                changes[f.name] = new
        return node.replace(**changes) if changes else node
    if isinstance(node, tuple):
        out = tuple(
            _map_linears(s, fn, path + (i,)) for i, s in enumerate(node)
        )
        return out if any(a is not b for a, b in zip(out, node)) else node
    if isinstance(node, list):
        out = [_map_linears(s, fn, path + (i,)) for i, s in enumerate(node)]
        return out if any(a is not b for a, b in zip(out, node)) else node
    if isinstance(node, dict):
        out = {k: _map_linears(s, fn, path + (k,)) for k, s in node.items()}
        return (
            out if any(out[k] is not node[k] for k in node) else node
        )
    return node


def lora_inject(model, rank: int, *, key,
                alpha: Optional[float] = None,
                match: Optional[Callable[[str], bool]] = None):
    """Replace Linear layers with :class:`LoRALinear` adapters.

    ``match`` filters by dotted path (e.g. ``lambda p: "w_q" in p or
    "w_v" in p``); default adapts every Linear. Base weights become frozen
    buffers; only the new A/B factors are trainable.
    """
    key_box = [key]

    def next_key():
        key_box[0], sub = jax.random.split(key_box[0])
        return sub

    def visit(path, node):
        if type(node) is Linear:
            dotted = ".".join(str(p) for p in path)
            if match is None or match(dotted):
                return LoRALinear.wrap(node, rank, key=next_key(), alpha=alpha)
        return None

    return _map_linears(model, visit, ())


def qlora_inject(model, rank: int, *, key, bits: int = 4,
                 group_size: int = 128, alpha: Optional[float] = None,
                 match: Optional[Callable[[str], bool]] = None):
    """Replace Linear layers with :class:`QLoRALinear`: the base weights are
    quantized to ``bits`` (4 or 8) frozen buffers, adapters train in f32.

    The memory-constrained fine-tuning path: a bf16 model that does not fit
    with optimizer state does as int4 + rank-r adapters. ``match`` filters
    by dotted path as in :func:`lora_inject`.
    """
    key_box = [key]

    def next_key():
        key_box[0], sub = jax.random.split(key_box[0])
        return sub

    def visit(path, node):
        if type(node) is Linear:
            dotted = ".".join(str(p) for p in path)
            if match is None or match(dotted):
                return QLoRALinear.wrap(
                    node, rank, key=next_key(), bits=bits,
                    group_size=group_size, alpha=alpha,
                )
        return None

    return _map_linears(model, visit, ())


def lora_merge(model):
    """Fold every :class:`LoRALinear` / :class:`QLoRALinear` back into a
    plain Linear (QLoRA bases are dequantized)."""

    def visit(path, node):
        if type(node) in (LoRALinear, QLoRALinear):
            return node.merge()
        return None

    return _map_linears(model, visit, ())


def lora_parameter_count(model) -> int:
    """Trainable adapter parameters (the A/B factors only)."""
    total = 0

    def visit(path, node):
        nonlocal total
        if type(node) in (LoRALinear, QLoRALinear):
            total += node.lora_a.size + node.lora_b.size
        return None

    _map_linears(model, visit, ())
    return total
