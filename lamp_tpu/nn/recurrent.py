"""Recurrent layers: RNN, GRU, LSTM, FreeRunningRNN, Seq2Seq.

Capability parity with the reference's stateful recurrent modules
(lamp-core/src/main/scala/lamp/nn/{RNN,GRU,LSTM,FreeRunningRNN,Seq2Seq}.scala
and the ``StatefulModule``/``InitState`` type classes, Module.scala:603).

TPU-first: the time loop is a single ``lax.scan`` — one compiled program per
sequence regardless of length; the per-step math is batched matmuls on the
MXU. Layout is batch-first [B, T, D] (the TPU-friendly layout; the reference
uses time-first — a documented design delta).

Stateful protocol: ``forward`` takes ``(x, carry_or_None)`` and returns
``((y, carry), module)``; ``initial_state(batch)`` builds the zero carry —
the analogue of the reference's ``InitState`` typeclass.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import init as initializers
from .module import Module, static_field

__all__ = ["RNN", "GRU", "LSTM", "FreeRunningRNN", "Seq2Seq", "WithInit"]


def _uniform(key, shape, dtype, scale):
    return jax.random.uniform(key, shape, dtype, -scale, scale)


class RNN(Module):
    """Elman RNN with tanh. Reference: lamp-core/.../nn/RNN.scala:12."""

    w_ih: jax.Array
    w_hh: jax.Array
    b: jax.Array
    __tags__ = {"w_ih": "RNN.weightXh", "w_hh": "RNN.weightHh", "b": "RNN.biasH"}

    @staticmethod
    def init(in_features: int, hidden: int, *, key, dtype=jnp.float32) -> "RNN":
        k1, k2 = jax.random.split(key)
        scale = 1.0 / math.sqrt(hidden)
        return RNN(
            w_ih=_uniform(k1, (in_features, hidden), dtype, scale),
            w_hh=_uniform(k2, (hidden, hidden), dtype, scale),
            b=jnp.zeros((hidden,), dtype),
        )

    @property
    def hidden_size(self):
        return self.w_hh.shape[0]

    def initial_state(self, batch: int, dtype=None):
        return jnp.zeros((batch, self.hidden_size), dtype or self.w_hh.dtype)

    def forward(self, x_and_state, *, key=None, train=False):
        x, h = x_and_state if isinstance(x_and_state, tuple) else (x_and_state, None)
        if h is None:
            h = self.initial_state(x.shape[0], x.dtype)
        xw = jnp.einsum("btd,dh->bth", x, self.w_ih.astype(x.dtype),
                       preferred_element_type=jnp.promote_types(
                           x.dtype, jnp.float32
                       )).astype(x.dtype) + self.b

        def step(h, xt):
            h_new = jnp.tanh(xt + jnp.dot(h, self.w_hh.astype(h.dtype),
                         preferred_element_type=jnp.promote_types(
                             h.dtype, jnp.float32
                         )).astype(h.dtype))
            return h_new, h_new

        h_final, ys = jax.lax.scan(step, h, jnp.swapaxes(xw, 0, 1))
        return (jnp.swapaxes(ys, 0, 1), h_final), self


class GRU(Module):
    """Gated recurrent unit. Reference: lamp-core/.../nn/GRU.scala:12."""

    w_ih: jax.Array  # [in, 3*hidden]  (r, z, n)
    w_hh: jax.Array  # [hidden, 3*hidden]
    b_ih: jax.Array
    b_hh: jax.Array
    __tags__ = {"w_ih": "GRU.weightXh", "w_hh": "GRU.weightHh",
                "b_ih": "GRU.biasX", "b_hh": "GRU.biasH"}

    @staticmethod
    def init(in_features: int, hidden: int, *, key, dtype=jnp.float32) -> "GRU":
        k1, k2 = jax.random.split(key)
        scale = 1.0 / math.sqrt(hidden)
        return GRU(
            w_ih=_uniform(k1, (in_features, 3 * hidden), dtype, scale),
            w_hh=_uniform(k2, (hidden, 3 * hidden), dtype, scale),
            b_ih=jnp.zeros((3 * hidden,), dtype),
            b_hh=jnp.zeros((3 * hidden,), dtype),
        )

    @property
    def hidden_size(self):
        return self.w_hh.shape[0]

    def initial_state(self, batch: int, dtype=None):
        return jnp.zeros((batch, self.hidden_size), dtype or self.w_hh.dtype)

    def forward(self, x_and_state, *, key=None, train=False):
        x, h = x_and_state if isinstance(x_and_state, tuple) else (x_and_state, None)
        if h is None:
            h = self.initial_state(x.shape[0], x.dtype)
        H = self.hidden_size
        xw = jnp.einsum("btd,dh->bth", x, self.w_ih.astype(x.dtype),
                       preferred_element_type=jnp.promote_types(
                           x.dtype, jnp.float32
                       )).astype(x.dtype) + self.b_ih

        def step(h, xt):
            hw = jnp.dot(h, self.w_hh.astype(h.dtype),
                         preferred_element_type=jnp.promote_types(
                             h.dtype, jnp.float32
                         )).astype(h.dtype) + self.b_hh
            xr, xz, xn = xt[:, :H], xt[:, H:2 * H], xt[:, 2 * H:]
            hr, hz, hn = hw[:, :H], hw[:, H:2 * H], hw[:, 2 * H:]
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1 - z) * n + z * h
            return h_new, h_new

        h_final, ys = jax.lax.scan(step, h, jnp.swapaxes(xw, 0, 1))
        return (jnp.swapaxes(ys, 0, 1), h_final), self


class LSTM(Module):
    """Long short-term memory. Reference: lamp-core/.../nn/LSTM.scala:12."""

    w_ih: jax.Array  # [in, 4*hidden]  (i, f, g, o)
    w_hh: jax.Array  # [hidden, 4*hidden]
    b_ih: jax.Array
    b_hh: jax.Array
    __tags__ = {"w_ih": "LSTM.weightXh", "w_hh": "LSTM.weightHh",
                "b_ih": "LSTM.biasX", "b_hh": "LSTM.biasH"}

    @staticmethod
    def init(in_features: int, hidden: int, *, key, dtype=jnp.float32,
             forget_bias: float = 1.0) -> "LSTM":
        k1, k2 = jax.random.split(key)
        scale = 1.0 / math.sqrt(hidden)
        b_ih = jnp.zeros((4 * hidden,), dtype)
        # initialize forget-gate bias to 1 (standard practice)
        b_ih = b_ih.at[hidden:2 * hidden].set(forget_bias)
        return LSTM(
            w_ih=_uniform(k1, (in_features, 4 * hidden), dtype, scale),
            w_hh=_uniform(k2, (hidden, 4 * hidden), dtype, scale),
            b_ih=b_ih,
            b_hh=jnp.zeros((4 * hidden,), dtype),
        )

    @property
    def hidden_size(self):
        return self.w_hh.shape[0]

    def initial_state(self, batch: int, dtype=None):
        dt = dtype or self.w_hh.dtype
        return (
            jnp.zeros((batch, self.hidden_size), dt),
            jnp.zeros((batch, self.hidden_size), dt),
        )

    def forward(self, x_and_state, *, key=None, train=False):
        if isinstance(x_and_state, tuple):
            x, state = x_and_state
        else:
            x, state = x_and_state, None
        if state is None:
            state = self.initial_state(x.shape[0], x.dtype)
        h, c = state
        H = self.hidden_size
        xw = jnp.einsum("btd,dh->bth", x, self.w_ih.astype(x.dtype),
                       preferred_element_type=jnp.promote_types(
                           x.dtype, jnp.float32
                       )).astype(x.dtype) + self.b_ih

        def step(carry, xt):
            h, c = carry
            hw = jnp.dot(h, self.w_hh.astype(h.dtype),
                         preferred_element_type=jnp.promote_types(
                             h.dtype, jnp.float32
                         )).astype(h.dtype) + self.b_hh
            g = xt + hw
            i = jax.nn.sigmoid(g[:, :H])
            f = jax.nn.sigmoid(g[:, H:2 * H])
            gg = jnp.tanh(g[:, 2 * H:3 * H])
            o = jax.nn.sigmoid(g[:, 3 * H:])
            c_new = f * c + i * gg
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        (h_f, c_f), ys = jax.lax.scan(step, (h, c), jnp.swapaxes(xw, 0, 1))
        return (jnp.swapaxes(ys, 0, 1), (h_f, c_f)), self


class FreeRunningRNN(Module):
    """Feed the RNN its own (argmax) output autoregressively for ``steps``.

    Reference: lamp-core/src/main/scala/lamp/nn/FreeRunningRNN.scala:9 — used
    for text generation with char RNNs.
    """

    cell: Module          # stateful module consuming [B, 1, V]-ish tokens
    head: Module          # maps hidden -> logits
    embedding: Module     # maps token ids -> vectors
    steps: int = static_field()

    @staticmethod
    def init(cell, head, embedding, steps: int) -> "FreeRunningRNN":
        return FreeRunningRNN(cell=cell, head=head, embedding=embedding,
                              steps=steps)

    def forward(self, x_and_state, *, key=None, train=False):
        tokens, state = x_and_state  # tokens: [B, T] prompt
        emb = self.embedding(tokens)
        (ys, state), _ = self.cell.forward((emb, state), key=key, train=train)
        last = jnp.argmax(self.head(ys[:, -1:, :]), axis=-1)  # [B, 1]
        outs = [last]

        def step(carry, _):
            tok, st = carry
            e = self.embedding(tok)
            (y, st2), _ = self.cell.forward((e, st), key=None, train=False)
            nxt = jnp.argmax(self.head(y[:, -1:, :]), axis=-1)
            return (nxt, st2), nxt[:, 0]

        (last, state), rest = jax.lax.scan(
            step, (last, state), None, length=self.steps - 1
        )
        seq = jnp.concatenate([outs[0], jnp.swapaxes(rest, 0, 1)], axis=1)
        return (seq, state), self


class WithInit(Module):
    """Wrap a stateful module with a *learned* initial state.

    Reference: lamp-core/src/main/scala/lamp/nn/Seq2Seq.scala:75 (WithInit).
    """

    inner: Module
    init_state: jax.Array  # [num_states, hidden] learned

    @staticmethod
    def init(inner, hidden: int, num_states: int = 1, dtype=jnp.float32) -> "WithInit":
        return WithInit(inner=inner, init_state=jnp.zeros((num_states, hidden), dtype))

    def forward(self, x_and_state, *, key=None, train=False):
        x, state = x_and_state
        if state is None:
            b = x.shape[0]
            states = [
                jnp.broadcast_to(self.init_state[i], (b, self.init_state.shape[1]))
                for i in range(self.init_state.shape[0])
            ]
            state = states[0] if len(states) == 1 else tuple(states)
        (y, state), inner = self.inner.forward((x, state), key=key, train=train)
        return (y, state), self.replace(inner=inner)


class Seq2Seq(Module):
    """Encoder-decoder over stateful modules: encoder's final state seeds the
    decoder. Reference: lamp-core/src/main/scala/lamp/nn/Seq2Seq.scala:6.
    """

    encoder: Module
    decoder: Module

    @staticmethod
    def init(encoder, decoder) -> "Seq2Seq":
        return Seq2Seq(encoder=encoder, decoder=decoder)

    def forward(self, xs_and_state, *, key=None, train=False):
        (src, tgt), state = xs_and_state
        k1, k2 = jax.random.split(key) if key is not None else (None, None)
        (_, enc_state), enc = self.encoder.forward((src, state), key=k1, train=train)
        (y, dec_state), dec = self.decoder.forward((tgt, enc_state), key=k2,
                                                   train=train)
        return (y, dec_state), self.replace(encoder=enc, decoder=dec)
