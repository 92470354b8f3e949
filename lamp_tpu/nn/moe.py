"""Mixture-of-experts feed-forward block with expert parallelism.

Beyond reference parity (the reference has no MoE — SURVEY.md §2.7 lists EP
as absent): a top-k gated expert MLP designed for TPU meshes. Experts are
stacked along a leading axis ([E, d, h] weights) so they shard naturally over
an "ep" mesh axis; token dispatch picks between two exact (dropless),
static-shaped strategies:

- ``dispatch="dense"`` — every expert computes every token, outputs combined
  with the sparse gate weights. All-to-all-free batched matmuls; the right
  regime under expert parallelism (each chip computes only its local
  experts) and for tiny token counts.
- ``dispatch="sorted"`` — tokens are sorted by routed expert and the three
  expert matmuls run as grouped GEMMs via ``lax.ragged_dot`` (one MXU pass
  over exactly T*top_k rows). FLOPs drop by num_experts/top_k versus dense
  (4x for 8 experts / top-2), at the cost of a gather+sort+scatter that is
  linear in T. The fast path for replicated-expert training (single device
  or pure DP/FSDP). Not for "ep"-sharded weights: ragged_dot has no
  all-to-all dispatch, so XLA would all-gather the expert stacks.
- ``dispatch="capacity"`` — GShard-style static-capacity dispatch: each
  expert takes at most C = ceil(top_k * T_group * capacity_factor / E)
  tokens per group, routed through one-hot dispatch/combine einsums.
  Everything is a batched MXU matmul with static shapes, and because the
  dispatched activations are einsum outputs sharded on the expert axis,
  XLA SPMD inserts the token all-to-alls automatically — the canonical
  pjit-native expert-parallel MoE (per-chip expert FLOPs drop from
  T*E_local to T*top_k*capacity_factor/ep). Over-capacity tokens are
  DROPPED (their k-th choice contributes zero; first choices claim
  capacity before second choices), the standard GShard/Switch trade.

"dense" and "sorted" are exact (dropless) top-k routing and match each
other to accumulation order; "capacity" equals them whenever no token
exceeds capacity.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

from . import init as initializers
from .module import Module, static_field

__all__ = ["MoEMLP", "SwiGLUMoE", "moe_sharding_rules"]


def _sorted_expert_dispatch(flat, top_idx, top_vals, acc, num_experts,
                            expert_fn):
    """Dropless sorted dispatch: route each (token, k) slot to its expert's
    contiguous row block and run the experts as grouped GEMMs.

    ``expert_fn(xs, group_sizes, slot_expert_ids) -> [S, d]`` computes the
    expert MLP over the sorted slot rows ``xs`` [S=T*top_k, d] where rows of
    expert e are contiguous (``lax.ragged_dot`` shape); the result is gate-
    weighted and scatter-added back to token order.
    """
    t, k = top_idx.shape
    ids = top_idx.reshape(-1)                      # [S] expert per slot
    order = jnp.argsort(ids)                       # stable: ties in token order
    tok = order // k                               # token per sorted slot
    xs = jnp.take(flat, tok, axis=0)               # [S, d]
    group_sizes = jnp.bincount(ids, length=num_experts).astype(jnp.int32)
    out = expert_fn(xs, group_sizes, ids[order])   # [S, d]
    gates = top_vals.reshape(-1)[order].astype(acc)
    return jnp.zeros((t, flat.shape[1]), acc).at[tok].add(
        out.astype(acc) * gates[:, None]
    )


def _capacity_masks(top_vals, top_idx, num_experts, capacity, acc):
    """GShard dispatch/combine tensors for one token group.

    top_vals/top_idx: [T, k]. Returns (dispatch [T, E, C] 0/1 in ``acc``,
    combine [T, E, C] gate weights). Capacity positions are claimed in
    k-major order — every token's first choice before any second choice —
    and slots past capacity are dropped (their one-hot row is all zero).
    """
    t, k = top_idx.shape
    ids = top_idx.T.reshape(-1)                          # [k*T], k-major
    oh = jax.nn.one_hot(ids, num_experts, dtype=jnp.int32)
    pos = jnp.sum((jnp.cumsum(oh, axis=0) - oh) * oh, axis=1)  # rank in expert
    keep = pos < capacity
    pos = pos.reshape(k, t).T                             # [T, k]
    keep = keep.reshape(k, t).T
    disp = (
        jax.nn.one_hot(top_idx, num_experts, dtype=acc)[..., None]
        * jax.nn.one_hot(pos, capacity, dtype=acc)[:, :, None, :]
        * keep[..., None, None].astype(acc)
    )                                                     # [T, k, E, C]
    combine = jnp.sum(disp * top_vals[..., None, None].astype(acc), axis=1)
    return jnp.sum(disp, axis=1), combine


def _capacity_dispatch(flat, top_vals, top_idx, acc, num_experts,
                       capacity_factor, group_size, expert_fn):
    """Capacity-based dispatch driver: group the tokens, build dispatch/
    combine one-hots, run ``expert_fn(xs [G, E, C, d]) -> [G, E, C, d]`` on
    the gathered capacity buckets, and combine back to token order."""
    t, d = flat.shape
    k = top_idx.shape[1]
    g = max(1, -(-t // group_size)) if group_size else 1
    tg = -(-t // g)
    if g * tg != t:  # pad the trailing group; padded slots route nowhere
        pad = g * tg - t
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
        top_idx = jnp.pad(top_idx, ((0, pad), (0, 0)))
        top_vals = jnp.pad(top_vals, ((0, pad), (0, 0)))
        # padded rows claim capacity AFTER real rows in the k-major cumsum
        # only if they sort later; zero their gates so they contribute 0
        # regardless, and give them an out-of-range pseudo-expert so they
        # never claim real capacity
        pad_ids = jnp.full((pad, k), num_experts, top_idx.dtype)
        top_idx = top_idx.at[t:].set(pad_ids)
    cap = int(max(1, math.ceil(k * tg * capacity_factor / num_experts)))
    cap = min(cap, k * tg)
    xg = flat.reshape(g, tg, d)
    vg = top_vals.reshape(g, tg, k)
    ig = top_idx.reshape(g, tg, k)
    disp, combine = jax.vmap(
        lambda v, i: _capacity_masks(v, i, num_experts + 1, cap, acc)
    )(vg, ig)
    disp = disp[:, :, :num_experts]        # drop the padding pseudo-expert
    combine = combine[:, :, :num_experts]
    xs = jnp.einsum("gtd,gtec->gecd", xg, disp.astype(xg.dtype),
                    preferred_element_type=acc).astype(xg.dtype)
    out = expert_fn(xs)                    # [G, E, C, d]
    y = jnp.einsum("gecd,gtec->gtd", out.astype(acc), combine,
                   preferred_element_type=acc)
    return y.reshape(g * tg, d)[:t]


class MoEMLP(Module):
    """Top-k gated expert MLP: y = sum_k gate_k * Expert_k(x).

    Dense dispatch: every expert processes every token, outputs are combined
    with the (sparse) gate weights. At large scale swap for capacity-based
    all-to-all dispatch; dense dispatch is exact (no token dropping) and maps
    perfectly onto batched MXU matmuls with experts sharded over "ep".
    """

    w_gate: jax.Array   # [d, E]
    w1: jax.Array       # [E, d, h]
    b1: jax.Array       # [E, h]
    w2: jax.Array       # [E, h, d]
    b2: jax.Array       # [E, d]
    top_k: int = static_field()
    activation: Callable = static_field()
    dispatch: str = static_field(default="dense")
    capacity_factor: float = static_field(default=1.25)
    group_size: int = static_field(default=0)
    __tags__ = {"w_gate": "MoEMLP.gate", "w1": "MoEMLP.w1", "w2": "MoEMLP.w2",
                "b1": "MoEMLP.bias", "b2": "MoEMLP.bias"}

    @staticmethod
    def init(dim: int, hidden: int, num_experts: int, *, key, top_k: int = 2,
             activation: Callable = jax.nn.gelu, dispatch: str = "dense",
             capacity_factor: float = 1.25, group_size: int = 0,
             dtype=jnp.float32) -> "MoEMLP":
        if dispatch not in ("dense", "sorted", "capacity"):
            raise ValueError("dispatch must be 'dense', 'sorted' or "
                             "'capacity'")
        k1, k2, k3 = jax.random.split(key, 3)
        return MoEMLP(
            w_gate=initializers.normal(0.02)(k1, (dim, num_experts), dtype),
            w1=initializers.kaiming_normal(k2, (num_experts, dim, hidden),
                                           dtype, fan_in=dim),
            b1=jnp.zeros((num_experts, hidden), dtype),
            w2=initializers.kaiming_normal(k3, (num_experts, hidden, dim),
                                           dtype, fan_in=hidden),
            b2=jnp.zeros((num_experts, dim), dtype),
            top_k=top_k,
            activation=activation,
            dispatch=dispatch,
            capacity_factor=capacity_factor,
            group_size=group_size,
        )

    @property
    def num_experts(self):
        return self.w_gate.shape[1]

    def forward(self, x, *, key=None, train=False):
        """x: [..., d] -> same shape. For the auxiliary balancing objective
        call :meth:`load_balancing_loss` separately in the training loss."""
        orig_shape = x.shape
        d = x.shape[-1]
        flat = x.reshape(-1, d)
        acc = jnp.promote_types(x.dtype, jnp.float32)

        logits = jnp.dot(flat, self.w_gate, preferred_element_type=acc)
        probs = jax.nn.softmax(logits, axis=-1)                  # [T, E]
        top_vals, top_idx = jax.lax.top_k(probs, self.top_k)     # [T, k]
        # renormalize the selected gates
        top_vals = top_vals / jnp.maximum(
            jnp.sum(top_vals, axis=-1, keepdims=True), 1e-9
        )
        if self.dispatch == "sorted":
            def experts(xs, group_sizes, slot_ids):
                h = jax.lax.ragged_dot(
                    xs, self.w1.astype(xs.dtype), group_sizes,
                    preferred_element_type=acc,
                ) + jnp.take(self.b1, slot_ids, axis=0).astype(acc)
                h = self.activation(h).astype(xs.dtype)
                return jax.lax.ragged_dot(
                    h, self.w2.astype(xs.dtype), group_sizes,
                    preferred_element_type=acc,
                ) + jnp.take(self.b2, slot_ids, axis=0).astype(acc)

            y = _sorted_expert_dispatch(flat, top_idx, top_vals, acc,
                                        self.num_experts, experts)
            return y.reshape(orig_shape).astype(x.dtype), self
        if self.dispatch == "capacity":
            def experts(xs):  # [G, E, C, d]
                h = jnp.einsum(
                    "gecd,edh->gech", xs, self.w1.astype(xs.dtype),
                    preferred_element_type=acc,
                ) + self.b1[None, :, None, :].astype(acc)
                h = self.activation(h).astype(xs.dtype)
                return jnp.einsum(
                    "gech,ehd->gecd", h, self.w2.astype(xs.dtype),
                    preferred_element_type=acc,
                ) + self.b2[None, :, None, :].astype(acc)

            y = _capacity_dispatch(flat, top_vals, top_idx, acc,
                                   self.num_experts, self.capacity_factor,
                                   self.group_size, experts)
            return y.reshape(orig_shape).astype(x.dtype), self

        combine = jnp.zeros(probs.shape, acc).at[
            jnp.arange(flat.shape[0])[:, None], top_idx
        ].set(top_vals.astype(acc))                              # [T, E]

        # every expert computes every token (dense dispatch); experts shard
        # over "ep" so each device computes its local experts only and the
        # combine einsum reduces over E (XLA inserts the psum over ep)
        h = jnp.einsum(
            "td,edh->eth", flat, self.w1.astype(flat.dtype),
            preferred_element_type=acc,
        ) + self.b1[:, None, :].astype(acc)
        h = self.activation(h).astype(flat.dtype)
        out = jnp.einsum(
            "eth,ehd->etd", h, self.w2.astype(flat.dtype),
            preferred_element_type=acc,
        ) + self.b2[:, None, :].astype(acc)                       # [E, T, d]
        y = jnp.einsum("te,etd->td", combine, out)
        return y.reshape(orig_shape).astype(x.dtype), self

    def load_balancing_loss(self, x):
        """Auxiliary loss: mean_e (fraction routed to e) * (mean gate prob e)
        * E (Switch-style). Add to the training objective scaled by ~1e-2."""
        flat = x.reshape(-1, x.shape[-1])
        acc = jnp.promote_types(x.dtype, jnp.float32)
        logits = jnp.dot(flat, self.w_gate, preferred_element_type=acc)
        probs = jax.nn.softmax(logits, axis=-1)
        top_idx = jnp.argmax(probs, axis=-1)
        frac = jnp.mean(
            jax.nn.one_hot(top_idx, self.num_experts, dtype=acc), axis=0
        )
        mean_prob = jnp.mean(probs, axis=0)
        return jnp.sum(frac * mean_prob) * self.num_experts


def moe_sharding_rules(axis: str = "ep"):
    """Sharding rules placing the stacked expert weights over the ep axis."""
    from ..parallel.mesh import ShardingRules
    from jax.sharding import PartitionSpec as P

    return ShardingRules([
        (r"/w1$", P(axis, None, None)),
        (r"/w2$", P(axis, None, None)),
        (r"/w3$", P(axis, None, None)),
        (r"/b1$", P(axis, None)),
        (r"/b2$", P(axis, None)),
    ])


class SwiGLUMoE(Module):
    """Mixtral-style sparse MLP: top-k gated SwiGLU experts.

    Drop-in replacement for :class:`~lamp_tpu.nn.modern.SwiGLU` inside
    :class:`~lamp_tpu.nn.modern.LlamaBlock` (``ModernLM.init(moe_experts=E,
    moe_top_k=k)``). Experts are stacked along a leading axis
    (w1/w3 [E, d, h], w2 [E, h, d]) so they shard over an "ep" mesh axis
    with :func:`moe_sharding_rules`; dispatch is dense (every expert
    computes every token, combined with the sparse gate weights) — exact,
    static-shaped, and the right regime for moderate expert counts; see
    :class:`MoEMLP` for the tradeoff discussion.
    """

    w_gate: jax.Array          # [d, E]
    w1: jax.Array              # [E, d, h]
    w3: jax.Array              # [E, d, h]
    w2: jax.Array              # [E, h, d]
    top_k: int = static_field()
    dispatch: str = static_field(default="dense")
    capacity_factor: float = static_field(default=1.25)
    group_size: int = static_field(default=0)

    @staticmethod
    def init(dim: int, hidden: int, num_experts: int, *, key,
             top_k: int = 2, dispatch: str = "dense",
             capacity_factor: float = 1.25, group_size: int = 0,
             dtype=jnp.float32) -> "SwiGLUMoE":
        if not 1 <= top_k <= num_experts:
            raise ValueError("need 1 <= top_k <= num_experts")
        if dispatch not in ("dense", "sorted", "capacity"):
            raise ValueError("dispatch must be 'dense', 'sorted' or "
                             "'capacity'")
        k0, k1, k2, k3 = jax.random.split(key, 4)
        return SwiGLUMoE(
            w_gate=initializers.normal(0.02)(k0, (dim, num_experts), dtype),
            w1=initializers.kaiming_normal(k1, (num_experts, dim, hidden),
                                           dtype, fan_in=dim),
            w3=initializers.kaiming_normal(k2, (num_experts, dim, hidden),
                                           dtype, fan_in=dim),
            w2=initializers.kaiming_normal(k3, (num_experts, hidden, dim),
                                           dtype, fan_in=hidden),
            top_k=top_k,
            dispatch=dispatch,
            capacity_factor=capacity_factor,
            group_size=group_size,
        )

    @property
    def num_experts(self):
        return self.w_gate.shape[1]

    def _route(self, flat, acc):
        logits = jnp.dot(flat, self.w_gate.astype(flat.dtype),
                         preferred_element_type=acc)
        probs = jax.nn.softmax(logits, axis=-1)                  # [T, E]
        top_vals, top_idx = jax.lax.top_k(probs, self.top_k)
        top_vals = top_vals / jnp.maximum(
            jnp.sum(top_vals, axis=-1, keepdims=True), 1e-9
        )
        return top_vals, top_idx, probs

    def _combine_weights(self, flat, acc):
        top_vals, top_idx, probs = self._route(flat, acc)
        combine = jnp.zeros(probs.shape, acc).at[
            jnp.arange(flat.shape[0])[:, None], top_idx
        ].set(top_vals.astype(acc))
        return combine, probs

    def forward(self, x, *, key=None, train=False):
        orig_shape = x.shape
        flat = x.reshape(-1, x.shape[-1])
        acc = jnp.promote_types(x.dtype, jnp.float32)
        if self.dispatch == "sorted":
            def experts(xs, group_sizes, slot_ids):
                g = jax.nn.silu(jax.lax.ragged_dot(
                    xs, self.w1.astype(xs.dtype), group_sizes,
                    preferred_element_type=acc,
                )) * jax.lax.ragged_dot(
                    xs, self.w3.astype(xs.dtype), group_sizes,
                    preferred_element_type=acc,
                )
                return jax.lax.ragged_dot(
                    g.astype(xs.dtype), self.w2.astype(xs.dtype),
                    group_sizes, preferred_element_type=acc,
                )

            top_vals, top_idx, _ = self._route(flat, acc)
            y = _sorted_expert_dispatch(flat, top_idx, top_vals, acc,
                                        self.num_experts, experts)
            return y.reshape(orig_shape).astype(x.dtype), self
        if self.dispatch == "capacity":
            def experts(xs):  # [G, E, C, d]
                h = jax.nn.silu(jnp.einsum(
                    "gecd,edh->gech", xs, self.w1.astype(xs.dtype),
                    preferred_element_type=acc,
                )) * jnp.einsum(
                    "gecd,edh->gech", xs, self.w3.astype(xs.dtype),
                    preferred_element_type=acc,
                )
                return jnp.einsum(
                    "gech,ehd->gecd", h.astype(xs.dtype),
                    self.w2.astype(xs.dtype), preferred_element_type=acc,
                )

            top_vals, top_idx, _ = self._route(flat, acc)
            y = _capacity_dispatch(flat, top_vals, top_idx, acc,
                                   self.num_experts, self.capacity_factor,
                                   self.group_size, experts)
            return y.reshape(orig_shape).astype(x.dtype), self
        combine, _ = self._combine_weights(flat, acc)
        h = jax.nn.silu(jnp.einsum(
            "td,edh->eth", flat, self.w1.astype(flat.dtype),
            preferred_element_type=acc,
        )) * jnp.einsum(
            "td,edh->eth", flat, self.w3.astype(flat.dtype),
            preferred_element_type=acc,
        )
        out = jnp.einsum(
            "eth,ehd->etd", h.astype(flat.dtype), self.w2.astype(flat.dtype),
            preferred_element_type=acc,
        )
        y = jnp.einsum("te,etd->td", combine, out)
        return y.reshape(orig_shape).astype(x.dtype), self

    def load_balancing_loss(self, x):
        """Switch-style aux objective: E * sum_e frac_routed_e * mean_prob_e
        (top-1 routing fraction). 1.0 = perfectly balanced."""
        flat = x.reshape(-1, x.shape[-1])
        acc = jnp.promote_types(x.dtype, jnp.float32)
        _, probs = self._combine_weights(flat, acc)
        top_idx = jnp.argmax(probs, axis=-1)
        frac = jnp.mean(
            jax.nn.one_hot(top_idx, self.num_experts, dtype=acc), axis=0
        )
        return jnp.sum(frac * jnp.mean(probs, axis=0)) * self.num_experts
