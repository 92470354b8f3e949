"""Optimizers: SGDW, AdamW, RAdam, Yogi, Lamb, Lion, Adafactor, Muon.

Capability parity with the reference suite
(reference: lamp-core/src/main/scala/lamp/nn/{SGD,AdamW,RAdam,Yogi}.scala),
with AdamW carrying f32 master weights for bf16/f16 parameters exactly like
the reference's upCast/downCast path (AdamW.scala:35-120). Shampoo lives in
``shampoo.py``.

All updates are pure pytree maps — jitted into the train step, they fuse into
bandwidth-bound elementwise kernels on TPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .base import Hyper, Optimizer, resolve_hyper

__all__ = ["SGDW", "AdamW", "RAdam", "Yogi", "Lamb", "Lion", "Adafactor",
           "Muon", "ScheduleFreeAdamW", "newton_schulz_orthogonalize"]


def _is_none(x):
    return x is None


def _map(fn, *trees):
    """tree_map skipping None leaves (masked-out non-trainables)."""
    def wrapped(*leaves):
        if leaves[0] is None:
            return None
        return fn(*leaves)

    return jax.tree_util.tree_map(wrapped, *trees, is_leaf=_is_none)


def _f32(p):
    return p.astype(jnp.float32) if p.dtype in (jnp.bfloat16, jnp.float16) else p


class SGDW(Optimizer):
    """SGD with decoupled weight decay and optional momentum.

    Reference: lamp-core/src/main/scala/lamp/nn/SGD.scala:19-80.
    """

    def __init__(self, learning_rate: Hyper = 0.01, weight_decay: Hyper = 0.0,
                 momentum: Optional[Hyper] = None, tags=None):
        self.learning_rate = learning_rate
        self.weight_decay = weight_decay
        self.momentum = momentum
        self.tags = tags

    def init(self, params):
        vel = (
            _map(lambda p: jnp.zeros_like(_f32(p)), params)
            if self.momentum is not None
            else None
        )
        return {"velocity": vel}

    def step(self, params, grads, state, lr_factor=1.0):
        tags = self.tags if self.tags is not None else _map(lambda p: "", params)
        lr = resolve_hyper(self.learning_rate, tags, params)
        wd = resolve_hyper(self.weight_decay, tags, params)
        if self.momentum is not None:
            mom = resolve_hyper(self.momentum, tags, params)
            new_vel = _map(
                lambda g, v, m: m * v + _f32(g), grads, state["velocity"], mom
            )
            new_params = _map(
                lambda p, v, l, w: (
                    _f32(p) - lr_factor * l * (v + w * _f32(p))
                ).astype(p.dtype),
                params, new_vel, lr, wd,
            )
            return new_params, {"velocity": new_vel}
        new_params = _map(
            lambda p, g, l, w: (
                _f32(p) - lr_factor * l * (_f32(g) + w * _f32(p))
            ).astype(p.dtype),
            params, grads, lr, wd,
        )
        return new_params, state


class AdamW(Optimizer):
    """AdamW with debias, decoupled weight decay, optional per-update clip,
    and f32 master weights for low-precision params.

    Reference: lamp-core/src/main/scala/lamp/nn/AdamW.scala:35-120 — the
    mixed-precision scheme (upCast params/grads to f32, keep mt/vt/master in
    f32, downCast on write) is reproduced; on TPU this is the standard
    bf16-params + f32-optimizer-state recipe.
    """

    def __init__(self, learning_rate: Hyper = 1e-3, beta1: float = 0.9,
                 beta2: float = 0.999, eps: float = 1e-8,
                 weight_decay: Hyper = 0.0, clip: Optional[float] = None,
                 debias: bool = True, mixed_precision: bool = True, tags=None):
        self.learning_rate = learning_rate
        self.beta1, self.beta2, self.eps = beta1, beta2, eps
        self.weight_decay = weight_decay
        self.clip = clip
        self.debias = debias
        self.mixed_precision = mixed_precision
        self.tags = tags

    @staticmethod
    def _needs_master(p) -> bool:
        return p.dtype in (jnp.bfloat16, jnp.float16)

    def init(self, params):
        # f32 master copies exist ONLY for low-precision params (AdamW.scala
        # upCast path); f32 params are their own master — storing them again
        # would alias the same buffer in two pytree leaves and break donation.
        master = (
            _map(
                lambda p: p.astype(jnp.float32) if self._needs_master(p) else None,
                params,
            )
            if self.mixed_precision else None
        )
        return {
            "step": jnp.zeros((), jnp.int32),
            "mt": _map(lambda p: jnp.zeros(p.shape, jnp.float32), params),
            "vt": _map(lambda p: jnp.zeros(p.shape, jnp.float32), params),
            "master": master,
        }

    def step(self, params, grads, state, lr_factor=1.0):
        from .clip import clip_by_global_norm

        tags = self.tags if self.tags is not None else _map(lambda p: "", params)
        lr = resolve_hyper(self.learning_rate, tags, params)
        wd = resolve_hyper(self.weight_decay, tags, params)
        b1, b2, eps = self.beta1, self.beta2, self.eps
        if self.clip is not None:
            grads, _ = clip_by_global_norm(grads, self.clip)
        t = state["step"] + 1
        tf = t.astype(jnp.float32)
        new_mt = _map(lambda m, g: b1 * m + (1 - b1) * _f32(g), state["mt"], grads)
        new_vt = _map(
            lambda v, g: b2 * v + (1 - b2) * jnp.square(_f32(g)), state["vt"], grads
        )
        if self.debias:
            bc1 = 1 - b1 ** tf
            bc2 = 1 - b2 ** tf
        else:
            bc1 = bc2 = jnp.float32(1.0)

        masters = (
            state["master"] if self.mixed_precision
            else _map(lambda p: None, params)
        )

        def upd(p, p_master, m, v, l, w):
            pm = p.astype(jnp.float32) if p_master is None else p_master
            step_size = lr_factor * l / bc1
            denom = jnp.sqrt(v / bc2) + eps
            return pm - step_size * (m / denom) - lr_factor * l * w * pm

        new_master_full = _map(upd, params, masters, new_mt, new_vt, lr, wd)
        new_params = _map(
            lambda p, nm: nm.astype(p.dtype), params, new_master_full
        )
        stored_master = (
            _map(
                lambda p, nm: nm if self._needs_master(p) else None,
                params, new_master_full,
            )
            if self.mixed_precision else None
        )
        return new_params, {
            "step": t,
            "mt": new_mt,
            "vt": new_vt,
            "master": stored_master,
        }


class RAdam(Optimizer):
    """Rectified Adam (reference: lamp-core/src/main/scala/lamp/nn/RAdam.scala:32).

    Uses the variance-rectification term; falls back to SGD-with-momentum style
    update while the rectification term is non-positive.
    """

    def __init__(self, learning_rate: Hyper = 1e-3, beta1: float = 0.9,
                 beta2: float = 0.999, eps: float = 1e-8,
                 weight_decay: Hyper = 0.0, tags=None):
        self.learning_rate = learning_rate
        self.beta1, self.beta2, self.eps = beta1, beta2, eps
        self.weight_decay = weight_decay
        self.tags = tags

    def init(self, params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "mt": _map(lambda p: jnp.zeros(p.shape, jnp.float32), params),
            "vt": _map(lambda p: jnp.zeros(p.shape, jnp.float32), params),
        }

    def step(self, params, grads, state, lr_factor=1.0):
        tags = self.tags if self.tags is not None else _map(lambda p: "", params)
        lr = resolve_hyper(self.learning_rate, tags, params)
        wd = resolve_hyper(self.weight_decay, tags, params)
        b1, b2, eps = self.beta1, self.beta2, self.eps
        t = state["step"] + 1
        tf = t.astype(jnp.float32)
        new_mt = _map(lambda m, g: b1 * m + (1 - b1) * _f32(g), state["mt"], grads)
        new_vt = _map(
            lambda v, g: b2 * v + (1 - b2) * jnp.square(_f32(g)), state["vt"], grads
        )
        rho_inf = 2.0 / (1.0 - b2) - 1.0
        beta2t = b2 ** tf
        rho_t = rho_inf - 2.0 * tf * beta2t / (1.0 - beta2t)
        rect = jnp.sqrt(
            jnp.maximum(rho_t - 4.0, 1e-30)
            * (rho_t - 2.0)
            * rho_inf
            / ((rho_inf - 4.0) * (rho_inf - 2.0) * jnp.maximum(rho_t, 1e-30))
        )
        use_rect = rho_t > 5.0

        def upd(p, m, v, l, w):
            pf = _f32(p)
            m_hat = m / (1 - b1 ** tf)
            v_hat = jnp.sqrt(v / (1 - beta2t)) + eps
            adaptive = pf - lr_factor * l * rect * m_hat / v_hat
            plain = pf - lr_factor * l * m_hat
            out = jnp.where(use_rect, adaptive, plain) - lr_factor * l * w * pf
            return out.astype(p.dtype)

        new_params = _map(upd, params, new_mt, new_vt, lr, wd)
        return new_params, {"step": t, "mt": new_mt, "vt": new_vt}


class Yogi(Optimizer):
    """Yogi optimizer (reference: lamp-core/src/main/scala/lamp/nn/Yogi.scala:38):
    additive, sign-based second-moment update controlling effective LR growth."""

    def __init__(self, learning_rate: Hyper = 1e-2, beta1: float = 0.9,
                 beta2: float = 0.999, eps: float = 1e-3,
                 weight_decay: Hyper = 0.0, debias: bool = True, tags=None):
        self.learning_rate = learning_rate
        self.beta1, self.beta2, self.eps = beta1, beta2, eps
        self.weight_decay = weight_decay
        self.debias = debias
        self.tags = tags

    def init(self, params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "mt": _map(lambda p: jnp.zeros(p.shape, jnp.float32), params),
            "vt": _map(lambda p: jnp.zeros(p.shape, jnp.float32), params),
        }

    def step(self, params, grads, state, lr_factor=1.0):
        tags = self.tags if self.tags is not None else _map(lambda p: "", params)
        lr = resolve_hyper(self.learning_rate, tags, params)
        wd = resolve_hyper(self.weight_decay, tags, params)
        b1, b2, eps = self.beta1, self.beta2, self.eps
        t = state["step"] + 1
        tf = t.astype(jnp.float32)
        new_mt = _map(lambda m, g: b1 * m + (1 - b1) * _f32(g), state["mt"], grads)
        new_vt = _map(
            lambda v, g: v
            - (1 - b2) * jnp.sign(v - jnp.square(_f32(g))) * jnp.square(_f32(g)),
            state["vt"], grads,
        )
        bc1 = 1 - b1 ** tf if self.debias else 1.0
        bc2 = 1 - b2 ** tf if self.debias else 1.0

        def upd(p, m, v, l, w):
            pf = _f32(p)
            denom = jnp.sqrt(v / bc2) + eps
            out = pf - lr_factor * l * (m / bc1) / denom - lr_factor * l * w * pf
            return out.astype(p.dtype)

        new_params = _map(upd, params, new_mt, new_vt, lr, wd)
        return new_params, {"step": t, "mt": new_mt, "vt": new_vt}


class Lamb(Optimizer):
    """LAMB: layerwise-adaptive AdamW for very large batch training — a
    TPU-idiomatic extra beyond reference parity (useful at pod scale)."""

    def __init__(self, learning_rate: Hyper = 1e-3, beta1: float = 0.9,
                 beta2: float = 0.999, eps: float = 1e-6,
                 weight_decay: Hyper = 0.0, tags=None):
        self.learning_rate = learning_rate
        self.beta1, self.beta2, self.eps = beta1, beta2, eps
        self.weight_decay = weight_decay
        self.tags = tags

    def init(self, params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "mt": _map(lambda p: jnp.zeros(p.shape, jnp.float32), params),
            "vt": _map(lambda p: jnp.zeros(p.shape, jnp.float32), params),
        }

    def step(self, params, grads, state, lr_factor=1.0):
        tags = self.tags if self.tags is not None else _map(lambda p: "", params)
        lr = resolve_hyper(self.learning_rate, tags, params)
        wd = resolve_hyper(self.weight_decay, tags, params)
        b1, b2, eps = self.beta1, self.beta2, self.eps
        t = state["step"] + 1
        tf = t.astype(jnp.float32)
        new_mt = _map(lambda m, g: b1 * m + (1 - b1) * _f32(g), state["mt"], grads)
        new_vt = _map(
            lambda v, g: b2 * v + (1 - b2) * jnp.square(_f32(g)), state["vt"], grads
        )

        def upd(p, m, v, l, w):
            pf = _f32(p)
            m_hat = m / (1 - b1 ** tf)
            v_hat = v / (1 - b2 ** tf)
            update = m_hat / (jnp.sqrt(v_hat) + eps) + w * pf
            pnorm = jnp.linalg.norm(pf)
            unorm = jnp.linalg.norm(update)
            trust = jnp.where(
                (pnorm > 0) & (unorm > 0), pnorm / unorm, 1.0
            )
            return (pf - lr_factor * l * trust * update).astype(p.dtype)

        new_params = _map(upd, params, new_mt, new_vt, lr, wd)
        return new_params, {"step": t, "mt": new_mt, "vt": new_vt}


class Lion(Optimizer):
    """Lion (Chen et al. 2023, "Symbolic Discovery of Optimization
    Algorithms"): sign-of-interpolated-momentum updates. Beyond reference
    parity — one f32 momentum buffer per param (half Adam's state) and a
    sign update that is robust in bf16, which makes it a natural fit for
    memory-tight TPU training.
    """

    def __init__(self, learning_rate: Hyper = 1e-4, beta1: float = 0.9,
                 beta2: float = 0.99, weight_decay: Hyper = 0.0, tags=None):
        self.learning_rate = learning_rate
        self.beta1, self.beta2 = beta1, beta2
        self.weight_decay = weight_decay
        self.tags = tags

    def init(self, params):
        return {"mt": _map(lambda p: jnp.zeros(p.shape, jnp.float32), params)}

    def step(self, params, grads, state, lr_factor=1.0):
        tags = self.tags if self.tags is not None else _map(lambda p: "", params)
        lr = resolve_hyper(self.learning_rate, tags, params)
        wd = resolve_hyper(self.weight_decay, tags, params)
        b1, b2 = self.beta1, self.beta2

        def upd(p, m, g, l, w):
            pf = _f32(p)
            direction = jnp.sign(b1 * m + (1 - b1) * _f32(g))
            return (
                pf - lr_factor * l * (direction + w * pf)
            ).astype(p.dtype)

        new_params = _map(upd, params, state["mt"], grads, lr, wd)
        new_mt = _map(
            lambda m, g: b2 * m + (1 - b2) * _f32(g), state["mt"], grads
        )
        return new_params, {"mt": new_mt}


class Adafactor(Optimizer):
    """Adafactor (Shazeer & Stern 2018): sublinear-memory second moments.

    Beyond reference parity; the TPU-native large-model optimizer (used by
    T5/PaLM-era training). For params with ndim >= 2 the second moment is
    stored FACTORED — a row ema (mean over the last axis) and a column ema
    (mean over the second-to-last axis) whose outer product reconstructs the
    full moment — so optimizer state is O(n+m) instead of O(nm) per matrix.
    Vectors/scalars keep a full second moment. Includes the paper's
    update-RMS clipping (d=1.0), relative step sizes
    (min(1e-2, 1/sqrt(t)) · max(eps2, RMS(p)) when ``learning_rate`` is
    None), and the t^-0.8 decay schedule for beta2.
    """

    def __init__(self, learning_rate: Optional[Hyper] = None,
                 weight_decay: Hyper = 0.0, beta1: Optional[float] = None,
                 eps1: float = 1e-30, eps2: float = 1e-3,
                 clip_threshold: float = 1.0, decay_exponent: float = 0.8,
                 tags=None):
        self.learning_rate = learning_rate
        self.weight_decay = weight_decay
        self.beta1 = beta1
        self.eps1, self.eps2 = eps1, eps2
        self.clip_threshold = clip_threshold
        self.decay_exponent = decay_exponent
        self.tags = tags

    @staticmethod
    def _factored(p) -> bool:
        return p.ndim >= 2

    def init(self, params):
        def vr(p):
            return (jnp.zeros(p.shape[:-1], jnp.float32)
                    if self._factored(p) else None)

        def vc(p):
            return (jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32)
                    if self._factored(p) else None)

        def vfull(p):
            return (None if self._factored(p)
                    else jnp.zeros(p.shape, jnp.float32))

        return {
            "step": jnp.zeros((), jnp.int32),
            "vr": _map(vr, params),
            "vc": _map(vc, params),
            "v": _map(vfull, params),
            "mt": (_map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
                   if self.beta1 is not None else None),
        }

    def step(self, params, grads, state, lr_factor=1.0):
        tags = self.tags if self.tags is not None else _map(lambda p: "", params)
        lr = resolve_hyper(
            self.learning_rate if self.learning_rate is not None else 0.0,
            tags, params,
        )
        wd = resolve_hyper(self.weight_decay, tags, params)
        t = state["step"] + 1
        tf = t.astype(jnp.float32)
        beta2t = 1.0 - tf ** (-self.decay_exponent)
        eps1, eps2 = self.eps1, self.eps2
        relative = self.learning_rate is None

        def rms(x):
            return jnp.sqrt(jnp.mean(jnp.square(x)))

        def upd(p, g, vr, vc, v, m, l, w):
            if p is None:
                return None
            pf, gf = _f32(p), _f32(g)
            g2 = jnp.square(gf) + eps1
            if vr is not None:
                vr_n = beta2t * vr + (1 - beta2t) * jnp.mean(g2, axis=-1)
                vc_n = beta2t * vc + (1 - beta2t) * jnp.mean(g2, axis=-2)
                # reconstruct: vhat = vr ⊗ vc / mean(vr); rsqrt applied as
                # two rank-1 factors (paper eq. 4's normalized outer product)
                row = jax.lax.rsqrt(
                    vr_n / jnp.mean(vr_n, axis=-1, keepdims=True)
                )
                col = jax.lax.rsqrt(vc_n)
                u = gf * row[..., :, None] * col[..., None, :]
                v_n = None
            else:
                v_n = beta2t * v + (1 - beta2t) * g2
                u = gf * jax.lax.rsqrt(v_n)
                vr_n = vc_n = None
            u = u / jnp.maximum(1.0, rms(u) / self.clip_threshold)
            if m is not None:
                u = self.beta1 * m + (1 - self.beta1) * u
                m_n = u
            else:
                m_n = None
            if relative:
                alpha = jnp.minimum(1e-2, 1.0 / jnp.sqrt(tf)) * jnp.maximum(
                    eps2, rms(pf)
                )
            else:
                alpha = l
            alpha = lr_factor * alpha
            new_p = (pf - alpha * u - alpha * w * pf).astype(p.dtype)
            return new_p, vr_n, vc_n, v_n, m_n

        mt = state["mt"] if self.beta1 is not None \
            else _map(lambda p: None, params)
        packed = jax.tree_util.tree_map(
            upd, params, grads, state["vr"], state["vc"], state["v"], mt,
            lr, wd, is_leaf=_is_none,
        )

        def pick(i):
            return jax.tree_util.tree_map(
                lambda p, tup: None if tup is None else tup[i],
                params, packed, is_leaf=_is_none,
            )

        new_state = {
            "step": t, "vr": pick(1), "vc": pick(2), "v": pick(3),
            "mt": pick(4) if self.beta1 is not None else None,
        }
        return pick(0), new_state


class ScheduleFreeAdamW(Optimizer):
    """Schedule-free AdamW (Defazio et al. 2024, "The Road Less Scheduled").

    No LR schedule: the optimizer maintains the fast iterate ``z`` and a
    Polyak-style average ``x``; gradients are evaluated at the interpolation
    ``y = (1 - beta1) z + beta1 x`` (which is what ``params`` holds during
    training), and ``x`` is the point to EVALUATE — call
    :meth:`eval_params` before validation/export. Matches constant-LR AdamW
    cost: same two moments of state per parameter replaced by (z, x, v) —
    one extra f32 buffer versus AdamW-with-masters.

    Update (per step t, lr γ, warmup w):
        γ_t = γ · min(t/w, 1) · sqrt(1 - beta2^t)       (bias corr. folded)
        v   = beta2 v + (1-beta2) g²
        z  -= γ_t g / (sqrt(v) + eps) + γ_t λ y          (decay at y)
        c_t = γ_t² / Σ γ²                                (weighted average)
        x   = (1-c_t) x + c_t z
        y   = (1-beta1) z + beta1 x  → params

    The reference has nothing comparable (its schedules are explicit,
    LearningRateSchedule.scala:3-114); this composes with the same per-tag
    hyperparameter system as the other optimizers. ``z``/``x`` are kept in
    f32 (master-weight semantics for bf16 params, AdamW.scala:47-63), and
    are real copies — never aliases of the param buffers (donation safety).
    """

    def __init__(self, learning_rate: Hyper = 1e-3, beta1: float = 0.9,
                 beta2: float = 0.999, eps: float = 1e-8,
                 weight_decay: Hyper = 0.0, warmup_steps: int = 0,
                 weight_lr_power: float = 2.0, tags=None):
        self.learning_rate = learning_rate
        self.beta1, self.beta2, self.eps = beta1, beta2, eps
        self.weight_decay = weight_decay
        self.warmup_steps = int(warmup_steps)
        self.weight_lr_power = weight_lr_power
        self.tags = tags

    def init(self, params):
        # jnp.array(copy=True): z/x must not alias the param buffers
        copy_f32 = lambda p: jnp.array(p, jnp.float32)  # noqa: E731
        return {
            "step": jnp.zeros((), jnp.int32),
            "z": _map(copy_f32, params),
            "x": _map(copy_f32, params),
            "vt": _map(lambda p: jnp.zeros(p.shape, jnp.float32), params),
            "weight_sum": jnp.zeros((), jnp.float32),
        }

    def step(self, params, grads, state, lr_factor=1.0):
        tags = self.tags if self.tags is not None else _map(lambda p: "", params)
        lr = resolve_hyper(self.learning_rate, tags, params)
        wd = resolve_hyper(self.weight_decay, tags, params)
        b1, b2, eps = self.beta1, self.beta2, self.eps
        t = state["step"] + 1
        tf = t.astype(jnp.float32)
        warm = (jnp.minimum(tf / self.warmup_steps, 1.0)
                if self.warmup_steps > 0 else jnp.float32(1.0))
        sched = warm * jnp.sqrt(1 - b2 ** tf) * lr_factor

        new_vt = _map(lambda v, g: b2 * v + (1 - b2) * jnp.square(_f32(g)),
                      state["vt"], grads)

        # ckp1 from the LARGEST per-tag lr (the paper's schedule weight is
        # global; per-tag lrs share one averaging schedule)
        lr_max = max(jax.tree_util.tree_leaves(lr), default=0.0)
        gamma_ref = sched * lr_max
        weight = gamma_ref ** self.weight_lr_power
        new_sum = state["weight_sum"] + weight
        ckp1 = jnp.where(new_sum > 0, weight / jnp.maximum(new_sum, 1e-38),
                         0.0)

        def upd_z(p, z, v, g, l, w):
            gamma = sched * l
            return (z - gamma * _f32(g) / (jnp.sqrt(v) + eps)
                    - gamma * w * p.astype(jnp.float32))

        new_z = _map(upd_z, params, state["z"], new_vt, grads, lr, wd)
        new_x = _map(lambda x, z: (1 - ckp1) * x + ckp1 * z,
                     state["x"], new_z)
        new_params = _map(
            lambda p, z, x: ((1 - b1) * z + b1 * x).astype(p.dtype),
            params, new_z, new_x)
        return new_params, {
            "step": t,
            "z": new_z,
            "x": new_x,
            "vt": new_vt,
            "weight_sum": new_sum,
        }

    @staticmethod
    def eval_params(params, state):
        """The averaged iterate ``x`` in the params' dtypes — use for
        validation, checkpoint export, and final weights."""
        return _map(lambda p, x: x.astype(p.dtype), params, state["x"])


def newton_schulz_orthogonalize(g, steps: int = 5, eps: float = 1e-7):
    """Quintic Newton-Schulz iteration approximating UV^T of the SVD
    g = U S V^T — i.e. it replaces the singular values with ~1 (the official
    Muon coefficients land them in about [0.7, 1.3], which is what the
    method wants: a bounded, well-conditioned update direction, not an exact
    polar factor). Pure matmuls — MXU-native work, no host linalg.
    g: [m, n] (any dtype; computed in f32)."""
    a, b, c = 3.4445, -4.7750, 2.0315
    x = g.astype(jnp.float32)
    transpose = x.shape[0] > x.shape[1]
    if transpose:
        x = x.T
    x = x / (jnp.linalg.norm(x) + eps)

    def body(x, _):
        xxt = jnp.matmul(x, x.T, preferred_element_type=jnp.float32)
        bterm = b * xxt + c * jnp.matmul(xxt, xxt,
                                         preferred_element_type=jnp.float32)
        return a * x + jnp.matmul(bterm, x,
                                  preferred_element_type=jnp.float32), None

    x, _ = jax.lax.scan(body, x, None, length=steps)
    return (x.T if transpose else x)


class Muon(Optimizer):
    """Muon (Jordan et al. 2024, "Muon: an optimizer for the hidden layers
    of neural networks"): SGD-momentum whose 2D updates are orthogonalized
    by a quintic Newton-Schulz iteration. Beyond reference parity — the
    orthogonalization is five matmuls per weight matrix, which on TPU rides
    the MXU, making Muon's overhead small exactly where this framework runs.

    Parameters with ``ndim >= 2`` (convs are flattened to
    ``[out, -1]``) take the Muon step scaled by
    ``sqrt(max(1, rows/cols))``; everything else — biases, norm gains,
    scalars, and any parameter whose tag contains one of ``adam_tags``
    substrings (use it for embeddings / output heads, which Muon's authors
    keep on Adam) — takes an embedded AdamW step with ``adam_lr``.
    """

    def __init__(self, learning_rate: Hyper = 0.02, momentum: float = 0.95,
                 nesterov: bool = True, ns_steps: int = 5,
                 weight_decay: Hyper = 0.0,
                 adam_lr: float = 3e-4, adam_betas=(0.9, 0.95),
                 adam_eps: float = 1e-8, adam_tags=(), tags=None):
        self.learning_rate = learning_rate
        self.momentum = momentum
        self.nesterov = nesterov
        self.ns_steps = ns_steps
        self.weight_decay = weight_decay
        self.adam_lr = adam_lr
        self.adam_betas = adam_betas
        self.adam_eps = adam_eps
        self.adam_tags = tuple(adam_tags)
        self.tags = tags

    def _is_muon(self, p, tag: str) -> bool:
        return p is not None and p.ndim >= 2 and not any(
            t in tag for t in self.adam_tags
        )

    def init(self, params):
        tags = self.tags if self.tags is not None else _map(
            lambda p: "", params)
        mt = _map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
        # adam second moments only where the adam path runs (None elsewhere
        # keeps the state pytree lean)
        vt = _map(
            lambda p, t: (None if self._is_muon(p, t)
                          else jnp.zeros(p.shape, jnp.float32)),
            params, tags)
        return {"mt": mt, "vt": vt, "t": jnp.zeros((), jnp.int32)}

    def step(self, params, grads, state, lr_factor=1.0):
        tags = self.tags if self.tags is not None else _map(
            lambda p: "", params)
        lr = resolve_hyper(self.learning_rate, tags, params)
        wd = resolve_hyper(self.weight_decay, tags, params)
        mu, nest = self.momentum, self.nesterov
        b1, b2 = self.adam_betas
        t = state["t"] + 1

        class _Res:  # NOT a pytree node => a leaf to tree_map, so the
            # (params, mt, vt) results can't be confused with structural
            # tuples inside the params tree (e.g. Sequential.layers)
            __slots__ = ("p", "m", "v")

            def __init__(self, p, m, v):
                self.p, self.m, self.v = p, m, v

        def upd(path_p, m, v, g, l, w, tag):
            p = path_p
            gf = _f32(g)
            if self._is_muon(p, tag):
                m = mu * m + gf
                u = gf + mu * m if nest else m
                shape = u.shape
                if u.ndim > 2:  # conv kernels etc: [out, everything else]
                    u2 = u.reshape(shape[0], -1)
                else:
                    u2 = u
                o = newton_schulz_orthogonalize(u2, self.ns_steps)
                o = o.reshape(shape)
                scale = jnp.sqrt(
                    jnp.maximum(1.0, u2.shape[0] / u2.shape[1]))
                pf = _f32(p)
                pf = pf * (1.0 - lr_factor * l * w)
                return _Res(
                    (pf - lr_factor * l * scale * o).astype(p.dtype), m, v)
            # AdamW path (biases / tagged params)
            m = b1 * m + (1 - b1) * gf
            v = b2 * v + (1 - b2) * gf * gf
            mhat = m / (1 - b1 ** t.astype(jnp.float32))
            vhat = v / (1 - b2 ** t.astype(jnp.float32))
            pf = _f32(p)
            pf = pf * (1.0 - lr_factor * self.adam_lr * w)
            return _Res(
                (pf - lr_factor * self.adam_lr * mhat
                 / (jnp.sqrt(vhat) + self.adam_eps)).astype(p.dtype), m, v)

        triples = _map(upd, params, state["mt"], state["vt"], grads, lr, wd,
                       tags)

        def pick(f):
            return jax.tree_util.tree_map(
                lambda tr: None if tr is None else getattr(tr, f), triples,
                is_leaf=lambda x: x is None or isinstance(x, _Res))

        return pick("p"), {"mt": pick("m"), "vt": pick("v"), "t": t}
