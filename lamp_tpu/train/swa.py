"""Stochastic weight averaging.

Reference: lamp-data/src/main/scala/lamp/data/SWA.scala:13-325 and the
``IOLoops.withSWA`` composition (IOLoops.scala:169-303): train normally for
warmup epochs, then run SWA epochs with a cyclic/constant LR while averaging
the weights; finish with a BatchNorm-recalibration forward pass over the
training data (``forwardPassAfterTraining``).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp

from ..nn.module import combine, partition_params
from .loops import TrainState, epochs as _epochs, make_train_step, one_epoch

__all__ = ["swa_epochs", "constant_swa_schedule", "cyclic_swa_schedule",
           "recalibrate_batchnorm"]


def constant_swa_schedule(factor: float = 1.0):
    """Reference SWA.LearningRateSchedule.constant."""
    return lambda epoch, step_in_cycle: factor


def cyclic_swa_schedule(max_factor: float = 1.0, min_factor: float = 0.01,
                        cycle_length: int = 1):
    """Triangular per-epoch cyclic schedule (reference SWA.scala cyclic)."""

    def f(epoch, _):
        t = (epoch % cycle_length) / max(cycle_length, 1)
        return max_factor - (max_factor - min_factor) * t

    return f


def swa_epochs(*, state: TrainState, optimizer, loss_fn,
               train_batches: Callable[[int], Iterable], epochs: int, key=None,
               swa_schedule=None, accumulation_steps: int = 1,
               prefetch: bool = True,
               log: Optional[Callable[[str], None]] = None):
    """Run SWA epochs from an existing state; returns (state_with_averaged
    params, per-epoch losses). The running average is over trainable params
    (averaged in f32); buffers keep their last value until recalibration."""
    if key is None:
        key = jax.random.PRNGKey(0)
    if swa_schedule is None:
        swa_schedule = constant_swa_schedule(1.0)
    train_step = jax.jit(make_train_step(
        optimizer, loss_fn, accumulation_steps=accumulation_steps
    ))

    avg = jax.tree_util.tree_map(
        lambda p: None if p is None else p.astype(jnp.float32),
        state.params, is_leaf=lambda x: x is None,
    )
    losses = []
    for epoch in range(epochs):
        lr_factor = swa_schedule(epoch, 0)
        key, ek = jax.random.split(key)
        state, loss, _, _ = one_epoch(
            state, train_batches(epoch), train_step, ek, lr_factor=lr_factor,
            prefetch=prefetch, log=log,
        )
        losses.append(loss)
        w = 1.0 / (epoch + 2)  # epoch 0 averages 2 models (init + new)
        avg = jax.tree_util.tree_map(
            lambda a, p: None if a is None
            else a * (1 - w) + p.astype(jnp.float32) * w,
            avg, state.params, is_leaf=lambda x: x is None,
        )
    averaged_params = jax.tree_util.tree_map(
        lambda a, p: None if a is None else a.astype(p.dtype),
        avg, state.params, is_leaf=lambda x: x is None,
    )
    return state._replace(params=averaged_params), losses


def _is_batchnorm(node) -> bool:
    return hasattr(node, "running_mean") and hasattr(node, "momentum")


def _map_batchnorms(module, fn):
    """Rebuild ``module`` applying ``fn`` to every BatchNorm-like submodule
    (has running stats + momentum). Modules are registered pytrees, so this
    is ordinary module surgery (same pattern as ops.quantize_model)."""
    return jax.tree_util.tree_map(
        lambda n: fn(n) if _is_batchnorm(n) else n, module,
        is_leaf=_is_batchnorm,
    )


def recalibrate_batchnorm(state: TrainState, stream, forward_train: Callable,
                          *, reset: bool = True):
    """Final forward pass in train mode to refresh BatchNorm running stats for
    the averaged weights (reference SWA.forwardPassAfterTraining).

    ``reset=True`` discards the stale pre-SWA statistics: the first batch
    runs with momentum 1.0 (its batch statistics REPLACE the running stats
    outright), subsequent batches blend in with each norm's own momentum.
    Without the reset, a short pass would only nudge the old stats by
    ~momentum per batch.

    ``forward_train(model, batch) -> new_model``. Returns updated state.
    """
    import dataclasses

    model = state.model
    it = iter(stream)
    if reset:
        momenta = []

        def to_full(bn):
            momenta.append(bn.momentum)
            return dataclasses.replace(
                bn,
                running_mean=jnp.zeros_like(bn.running_mean),
                running_var=jnp.ones_like(bn.running_var),
                momentum=1.0,
            )

        model = _map_batchnorms(model, to_full)
        try:
            first = next(it)
        except StopIteration:
            first = None
        if first is not None:
            model = forward_train(model, first)
        restore = iter(momenta)

        def back(bn):
            return dataclasses.replace(bn, momentum=next(restore))

        model = _map_batchnorms(model, back)
    for batch in it:
        model = forward_train(model, batch)
    params, rest = partition_params(model)
    return state._replace(params=params, rest=rest)
