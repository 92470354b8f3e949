"""Shampoo optimizer (full-matrix preconditioning).

Reference: lamp-core/src/main/scala/lamp/nn/Shampoo.scala:33-199 — maintains
left/right Kronecker preconditioner statistics L += G G^T, R += G^T G per
(matrix-reshaped) parameter, refreshes their inverse-4th-roots periodically,
and falls back to diagonal preconditioning for axes larger than
``block_size`` (reference threshold 512, Shampoo.scala:44-80).

TPU notes: the inverse-pth-root is computed by eigendecomposition in f32 with
an epsilon ridge — eigh maps onto the MXU well at these sizes; the refresh is
guarded by ``lax.cond`` on the step counter so the common step compiles to the
cheap path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Hyper, Optimizer, resolve_hyper

__all__ = ["Shampoo"]


def _is_none(x):
    return x is None


def _map(fn, *trees):
    def wrapped(*leaves):
        if leaves[0] is None:
            return None
        return fn(*leaves)

    return jax.tree_util.tree_map(wrapped, *trees, is_leaf=_is_none)


def _f32(p):
    return p.astype(jnp.float32) if p.dtype in (jnp.bfloat16, jnp.float16) else p


def _as_matrix(p):
    """Reshape any-rank parameter to 2D (rows = first axis)."""
    if p.ndim == 0:
        return p.reshape(1, 1)
    if p.ndim == 1:
        return p.reshape(1, -1)
    return p.reshape(p.shape[0], -1)


def _inverse_quarter_root(mat, eps=1e-6):
    """M^{-1/4} for symmetric PSD M via eigendecomposition."""
    n = mat.shape[0]
    w, v = jnp.linalg.eigh(mat + eps * jnp.eye(n, dtype=mat.dtype))
    w = jnp.maximum(w, eps)
    return (v * jnp.power(w, -0.25)) @ v.T


class Shampoo(Optimizer):
    def __init__(self, learning_rate: Hyper = 1e-3, momentum: float = 0.9,
                 eps: float = 1e-4, weight_decay: Hyper = 0.0,
                 block_size: int = 512, update_preconditioner_every: int = 20,
                 tags=None):
        self.learning_rate = learning_rate
        self.momentum = momentum
        self.eps = eps
        self.weight_decay = weight_decay
        self.block_size = block_size
        self.update_every = update_preconditioner_every
        self.tags = tags

    def _stats_init(self, p):
        m = _as_matrix(p)
        r, c = m.shape
        left = (
            jnp.full((r,), self.eps, jnp.float32)
            if r > self.block_size
            else self.eps * jnp.eye(r, dtype=jnp.float32)
        )
        right = (
            jnp.full((c,), self.eps, jnp.float32)
            if c > self.block_size
            else self.eps * jnp.eye(c, dtype=jnp.float32)
        )
        left_root = (
            jnp.ones((r,), jnp.float32)
            if r > self.block_size
            else jnp.eye(r, dtype=jnp.float32)
        )
        right_root = (
            jnp.ones((c,), jnp.float32)
            if c > self.block_size
            else jnp.eye(c, dtype=jnp.float32)
        )
        return {"L": left, "R": right, "Linv": left_root, "Rinv": right_root,
                "mom": jnp.zeros(p.shape, jnp.float32)}

    def init(self, params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "stats": _map(self._stats_init, params),
        }

    def step(self, params, grads, state, lr_factor=1.0):
        tags = self.tags if self.tags is not None else _map(lambda p: "", params)
        lr = resolve_hyper(self.learning_rate, tags, params)
        wd = resolve_hyper(self.weight_decay, tags, params)
        t = state["step"] + 1
        # refresh on steps 1, 1+every, 1+2*every, ... (t % every == 1 would
        # never fire for every == 1)
        refresh = ((t - 1) % self.update_every) == 0

        def upd(p, g, st, l, w):
            gm = _as_matrix(g).astype(jnp.float32)
            r, c = gm.shape
            L, R = st["L"], st["R"]
            # accumulate statistics (diagonal if axis too large)
            L = L + (jnp.sum(gm * gm, axis=1) if L.ndim == 1 else gm @ gm.T)
            R = R + (jnp.sum(gm * gm, axis=0) if R.ndim == 1 else gm.T @ gm)

            def fresh_roots(_):
                Li = (
                    jnp.power(jnp.maximum(L, self.eps), -0.25)
                    if L.ndim == 1
                    else _inverse_quarter_root(L, self.eps)
                )
                Ri = (
                    jnp.power(jnp.maximum(R, self.eps), -0.25)
                    if R.ndim == 1
                    else _inverse_quarter_root(R, self.eps)
                )
                return Li, Ri

            Linv, Rinv = jax.lax.cond(
                refresh, fresh_roots, lambda _: (st["Linv"], st["Rinv"]), None
            )
            pre = gm
            pre = Linv[:, None] * pre if Linv.ndim == 1 else Linv @ pre
            pre = pre * Rinv[None, :] if Rinv.ndim == 1 else pre @ Rinv
            # graft the preconditioned direction to the gradient's norm so the
            # step size is comparable to SGD (standard Shampoo grafting)
            gnorm = jnp.linalg.norm(gm)
            pnorm = jnp.maximum(jnp.linalg.norm(pre), 1e-16)
            pre = pre * (gnorm / pnorm)
            mom = (self.momentum * st["mom"] + pre.reshape(p.shape)).astype(
                jnp.float32
            )
            pf = p.astype(jnp.float32)
            new_p = (pf - lr_factor * l * (mom + w * pf)).astype(p.dtype)
            return new_p, {"L": L, "R": R, "Linv": Linv, "Rinv": Rinv, "mom": mom}

        p_leaves, treedef = jax.tree_util.tree_flatten(params, is_leaf=_is_none)
        g_leaves = treedef.flatten_up_to(grads)
        s_leaves = treedef.flatten_up_to(state["stats"])
        l_leaves = treedef.flatten_up_to(lr)
        w_leaves = treedef.flatten_up_to(wd)
        new_p, new_s = [], []
        for p, g, st, l, w in zip(p_leaves, g_leaves, s_leaves, l_leaves, w_leaves):
            if p is None:
                new_p.append(None)
                new_s.append(None)
            else:
                np_, ns_ = upd(p, g, st, l, w)
                new_p.append(np_)
                new_s.append(ns_)
        return (
            treedef.unflatten(new_p),
            {"step": t, "stats": treedef.unflatten(new_s)},
        )
