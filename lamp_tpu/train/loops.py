"""Training loops.

TPU-native replacement for the reference's IOLoops
(lamp-data/src/main/scala/lamp/data/IOLoops.scala): ``epochs`` (:305) with
per-epoch LR factor, validation with exponential smoothing, min-validation
model snapshot, checkpoint callback and learning curve; ``oneEpoch`` (:607)
with gradient accumulation and prefetch; ``validationOneEpoch`` (:751);
inference drivers (:30-165). The ``SupervisedModel`` loss-calculation
strategies (SupervisedModel.scala:26-150) — simple, adversarial (FGSM),
perturbed — appear as ``loss_calculation`` variants.

TPU design: the jit boundary is ONE train step (forward + backward + optimizer
update fused into a single XLA program); the epoch loop stays in Python. With
gradient accumulation the step takes a stacked mega-batch and folds over it
with ``lax.scan`` — still one program, no retracing.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterable, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.module import combine, partition_params
from ..optim.base import Optimizer
from ..optim import schedules as lr_schedules

__all__ = [
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "one_epoch",
    "validation_one_epoch",
    "epochs",
    "TrainingResult",
    "run_batch_stream",
]


class TrainState(NamedTuple):
    """Model split into trainable params + the rest, plus optimizer state.

    The full model is ``combine(params, rest)``; buffers (running stats) that
    change during training live in ``rest`` and are threaded through steps.
    """

    params: Any
    rest: Any
    opt_state: Any
    step: Any  # int32 scalar

    @property
    def model(self):
        return combine(self.params, self.rest)

    @staticmethod
    def init(model, optimizer: Optimizer) -> "TrainState":
        params, rest = partition_params(model)
        return TrainState(
            params=params,
            rest=rest,
            opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )


def make_train_step(optimizer: Optimizer, loss_fn: Callable, *,
                    accumulation_steps: int = 1,
                    loss_calculation: str = "simple",
                    adversarial_eps: float = 1e-3,
                    gradient_pmean_axis: Optional[str] = None,
                    accumulation_unroll: bool = False):
    """Build a jittable ``step(state, batch, key, lr_factor) -> (state, loss)``.

    ``loss_fn(model, batch, key, train) -> (loss, n_examples, new_model)``.

    - ``accumulation_steps > 1``: ``batch`` must be a pytree whose leaves have
      a leading axis of that size; gradients are example-weight averaged over
      the sub-batches (reference IOLoops.scala:638-657).
    - ``accumulation_unroll``: unroll the accumulation loop in the traced
      program instead of ``lax.scan``-ing it. Default **False**: an
      in-session A/B on the flagship 12L/768d b8x5 step measured the
      scan at 66.95 ms vs 76.62 ms unrolled (scripts/exp_lm_step_sol.py)
      — XLA schedules/fuses the single scanned body better than five
      inlined copies, and the carry-copy hypothesis that motivated
      unrolling came from a DCE-contaminated probe (it read back one
      gradient leaf, so XLA pruned most backward weight-gradient
      matmuls). The flag stays for experimentation on other shapes.
    - ``loss_calculation``: "simple" | "adversarial" | "perturbed"
      (reference SupervisedModel.scala:84,116,26).
    - ``gradient_pmean_axis``: mesh axis name for data-parallel gradient
      averaging inside shard_map/pjit (the NCCL allreduce equivalent).
    """
    def grads_of(params, rest, batch, key):
        def wrapped(p):
            model = combine(p, rest)
            loss, n, new_model = loss_fn(model, batch, key, True)
            _, new_rest = partition_params(new_model)
            return loss, (n, new_rest)

        (loss, (n, new_rest)), grads = jax.value_and_grad(
            wrapped, has_aux=True
        )(params)
        return loss, n, grads, new_rest

    def compute(params, rest, batch, key):
        if loss_calculation == "simple":
            return grads_of(params, rest, batch, key)
        if loss_calculation == "adversarial":
            # FGSM-style: perturb the *input* along the gradient sign and
            # train on clean + adversarial loss (SupervisedModel.scala:116)
            features, target = batch

            def input_loss(x):
                model = combine(params, rest)
                loss, _, _ = loss_fn(model, (x, target), key, True)
                return loss

            gx = jax.grad(input_loss)(features)
            adv = features + adversarial_eps * jnp.sign(gx)
            l1, n, g1, new_rest = grads_of(params, rest, batch, key)
            l2, _, g2, new_rest = grads_of(params, new_rest, (adv, target), key)
            g = jax.tree_util.tree_map(
                lambda a, b: None if a is None else 0.5 * (a + b), g1, g2,
                is_leaf=lambda x: x is None,
            )
            return 0.5 * (l1 + l2), n, g, new_rest
        if loss_calculation == "perturbed":
            # evaluate gradient at noise-perturbed weights
            # (SupervisedModel.scala:26 PerturbedLossCalculation)
            noise_key, key = jax.random.split(key)
            keys = jax.random.split(
                noise_key, len(jax.tree_util.tree_leaves(params))
            )
            it = iter(keys)
            noisy = jax.tree_util.tree_map(
                lambda p: None if p is None else p
                + adversarial_eps * jax.random.normal(next(it), p.shape, p.dtype),
                params, is_leaf=lambda x: x is None,
            )
            loss, n, grads, new_rest = grads_of(noisy, rest, batch, key)
            return loss, n, grads, new_rest
        raise ValueError(loss_calculation)

    def step(state: TrainState, batch, key, lr_factor=1.0):
        params, rest = state.params, state.rest
        if accumulation_steps > 1 and accumulation_unroll:
            gsum, lsum, nsum, k = None, 0.0, 0.0, key
            for i in range(accumulation_steps):
                k, sub_key = jax.random.split(k)
                sub = jax.tree_util.tree_map(lambda x: x[i], batch)
                loss_i, n_i, g_i, rest = compute(params, rest, sub, sub_key)
                nf = jnp.asarray(n_i, jnp.float32)
                if gsum is None:
                    gsum = jax.tree_util.tree_map(
                        lambda g: None if g is None
                        else g.astype(jnp.float32) * nf,
                        g_i, is_leaf=lambda x: x is None,
                    )
                else:
                    gsum = jax.tree_util.tree_map(
                        lambda a, g: None if a is None
                        else a + g.astype(jnp.float32) * nf,
                        gsum, g_i, is_leaf=lambda x: x is None,
                    )
                lsum = lsum + loss_i * nf
                nsum = nsum + nf
            grads = jax.tree_util.tree_map(
                lambda g, p: None if g is None else (g / nsum).astype(p.dtype),
                gsum, params, is_leaf=lambda x: x is None,
            )
            loss = lsum / nsum
            n = nsum
        elif accumulation_steps > 1:
            def body(carry, sub):
                rest_c, gsum, lsum, nsum, k = carry
                k, sub_key = jax.random.split(k)
                loss, n, grads, rest_c = compute(params, rest_c, sub, sub_key)
                nf = jnp.asarray(n, jnp.float32)
                gsum = jax.tree_util.tree_map(
                    lambda a, g: None if a is None
                    else a + g.astype(jnp.float32) * nf,
                    gsum, grads, is_leaf=lambda x: x is None,
                )
                return (rest_c, gsum, lsum + loss * nf, nsum + nf, k), None

            gzero = jax.tree_util.tree_map(
                lambda p: None if p is None else jnp.zeros(p.shape, jnp.float32),
                params, is_leaf=lambda x: x is None,
            )
            (rest, gsum, lsum, nsum, _), _ = jax.lax.scan(
                body, (rest, gzero, 0.0, 0.0, key), batch
            )
            grads = jax.tree_util.tree_map(
                lambda g, p: None if g is None else (g / nsum).astype(p.dtype),
                gsum, params, is_leaf=lambda x: x is None,
            )
            loss = lsum / nsum
            n = nsum
        else:
            loss, n, grads, rest = compute(params, rest, batch, key)

        if gradient_pmean_axis is not None:
            nf = jnp.asarray(n, jnp.float32)
            total = jax.lax.psum(nf, gradient_pmean_axis)
            grads = jax.tree_util.tree_map(
                lambda g: None if g is None
                else jax.lax.psum(g.astype(jnp.float32) * nf, gradient_pmean_axis)
                / total,
                grads, is_leaf=lambda x: x is None,
            )
            loss = jax.lax.psum(loss * nf, gradient_pmean_axis) / total

        new_params, new_opt = optimizer.step(params, grads, state.opt_state,
                                             lr_factor)
        return (
            TrainState(new_params, rest, new_opt, state.step + 1),
            (loss, n),
        )

    return step


def make_chained_train_step(optimizer: Optimizer, loss_fn: Callable,
                            **step_kwargs):
    """Build a step that runs K FULL optimizer steps per dispatched call
    (``lax.scan`` over batches stacked on a leading axis).

    Why: every host→device dispatch has fixed latency (µs on a local
    runtime, ~50 ms through a remote-TPU tunnel). For small models whose
    step time is below that, per-batch dispatch leaves the chip idle —
    measured on the CIFAR resnet (0.7 ms device step): 4.9k images/s
    per-call vs 359k images/s chained. The reference has no analogue (JNI
    dispatch per op); this is the TPU idiom for small-model training.

    ``chained(state, stacked_batches, key, lr_factor)`` where each
    ``stacked_batches`` leaf has leading axis K. Returns
    (state, (example-weighted mean loss, total examples)).
    """
    step = make_train_step(optimizer, loss_fn, **step_kwargs)

    def chained(state: TrainState, batches, key, lr_factor=1.0):
        def body(carry, sub):
            s, k = carry
            k, sk = jax.random.split(k)
            s, (loss, n) = step(s, sub, sk, lr_factor)
            return (s, k), (loss, jnp.sum(n))

        (state, _), (losses, ns) = jax.lax.scan(body, (state, key), batches)
        total = jnp.sum(ns)
        return state, (jnp.sum(losses * ns) / total, total)

    return chained


def make_eval_step(loss_fn: Callable):
    def step(state: TrainState, batch):
        model = state.model
        loss, n, _ = loss_fn(model, batch, None, False)
        return loss, n

    return step


def one_epoch(state: TrainState, stream, train_step, key, *, lr_factor=1.0,
              prefetch: bool = True, device=None, log=None,
              steps_per_call: int = 1):
    """Drive one training epoch (reference oneEpoch, IOLoops.scala:607-749).

    ``steps_per_call > 1``: buffer that many host batches, stack them, and
    hand them to ``train_step`` in one call — ``train_step`` must then be a
    :func:`make_chained_train_step` step. Amortizes dispatch latency for
    small models.

    Returns (state, mean_loss, instances, seconds).
    """
    from ..data.batchstream import prefetch_to_device

    it = prefetch_to_device(stream, device=device) if prefetch else iter(stream)
    # keep per-batch losses as device scalars; sync to host ONCE per epoch
    # (a per-batch readback would serialize the pipeline — and on remote-TPU
    # setups each sync is a full round trip)
    losses = []
    counts = []
    t0 = time.perf_counter()

    if steps_per_call > 1:
        def shapes_of(b):
            return tuple(
                np.shape(leaf) for leaf in jax.tree_util.tree_leaves(b)
            )

        def stacked_batches():
            buf = []
            for b in it:
                # a ragged batch (e.g. the short drop_last=False tail of
                # minibatches_from_full) cannot be stacked with the
                # buffered ones — flush the uniform prefix first
                if buf and shapes_of(b) != shapes_of(buf[0]):
                    yield jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(xs), *buf
                    )
                    buf = []
                buf.append(b)
                if len(buf) == steps_per_call:
                    yield jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(xs), *buf
                    )
                    buf = []
            if buf:  # remainder chunk (one extra trace per distinct size)
                yield jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *buf)

        batch_iter = stacked_batches()
    else:
        batch_iter = it

    for batch in batch_iter:
        key, sub = jax.random.split(key)
        state, (loss, n) = train_step(state, batch, sub, lr_factor)
        nn_ = jnp.sum(n)
        losses.append(loss * nn_)
        counts.append(nn_)
    if losses:
        total_loss = float(jnp.sum(jnp.stack(losses)))
        total_n = float(jnp.sum(jnp.stack(counts)))
    else:
        total_loss = total_n = 0.0
    dt = time.perf_counter() - t0
    mean = total_loss / max(total_n, 1.0)
    if log:
        log(f"train loss {mean:.6f} ({total_n:.0f} instances, "
            f"{total_n / max(dt, 1e-9):.1f} inst/s)")
    return state, mean, total_n, dt


def validation_one_epoch(state: TrainState, stream, eval_step, *,
                         prefetch: bool = True, device=None):
    """Reference validationOneEpoch (IOLoops.scala:751-831)."""
    from ..data.batchstream import prefetch_to_device

    it = prefetch_to_device(stream, device=device) if prefetch else iter(stream)
    losses = []
    counts = []
    for batch in it:
        loss, n = eval_step(state, batch)
        nn_ = jnp.sum(n)
        losses.append(loss * nn_)
        counts.append(nn_)
    if not losses:
        return 0.0
    return float(jnp.sum(jnp.stack(losses))) / max(
        float(jnp.sum(jnp.stack(counts))), 1.0
    )


@dataclasses.dataclass
class TrainingResult:
    """Reference epochs() return: (epoch of min validation, state, learning
    curve [(epoch, train, smoothed-val, val)], best model)."""

    state: TrainState
    learning_curve: List[Tuple[int, float, Optional[float], Optional[float]]]
    min_validation_loss: Optional[float]
    min_validation_epoch: Optional[int]
    min_validation_state: Optional[TrainState]


def epochs(*, model=None, state: Optional[TrainState] = None,
           optimizer: Optimizer, loss_fn: Callable,
           train_batches: Callable[[int], Iterable],
           validation_batches: Optional[Callable[[int], Iterable]] = None,
           epochs: int, key=None,
           learning_rate_schedule: Optional[lr_schedules.Schedule] = None,
           validation_frequency: int = 1,
           return_min_validation_loss_model: bool = False,
           validation_smoothing_factor: float = 1.0,
           accumulation_steps: int = 1,
           loss_calculation: str = "simple",
           checkpoint_callback: Optional[Callable[[TrainState, Dict], None]] = None,
           training_callback: Optional[Callable[[int, float], None]] = None,
           validation_callback: Optional[Callable[[int, float], None]] = None,
           train_step=None,
           prefetch: bool = True,
           steps_per_call: int = 1,
           resume_from: Optional[Dict] = None,
           log: Optional[Callable[[str], None]] = None) -> TrainingResult:
    """The master training loop (reference IOLoops.epochs, IOLoops.scala:305).

    ``train_batches(epoch)`` returns the epoch's batch iterable;
    ``loss_fn(model, batch, key, train) -> (loss, n, new_model)``.

    ``resume_from`` restarts a preempted run mid-way: pass the dict a
    ``checkpoint_callback`` received (the ``meta`` of
    :func:`lamp_tpu.io.checkpoint.load_loop_state`, or
    :func:`lamp_tpu.train.resumable_epochs`'s bookkeeping) together with
    the restored ``state=``. The loop continues at ``epoch + 1`` with the
    schedule state, learning curve, min-validation tracking and the SAME
    per-epoch PRNG stream (the key is advanced by the completed epochs) —
    a resumed run and an uninterrupted one see identical dropout/shuffle
    randomness from that point on.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if state is None:
        state = TrainState.init(model, optimizer)
    if train_step is not None and steps_per_call > 1:
        raise ValueError(
            "steps_per_call > 1 stacks batches on a leading axis, which a "
            "plain train_step will silently mis-handle; build yours with "
            "make_chained_train_step and drive one_epoch directly, or let "
            "epochs build the step (train_step=None)"
        )
    if train_step is None:
        maker = (
            make_chained_train_step if steps_per_call > 1 else make_train_step
        )
        train_step = jax.jit(maker(
            optimizer, loss_fn, accumulation_steps=accumulation_steps,
            loss_calculation=loss_calculation,
        ))
    eval_step = jax.jit(make_eval_step(loss_fn))
    schedule = learning_rate_schedule or lr_schedules.noop()
    sched_state = schedule.init_state

    curve: List = []
    min_val = None
    min_val_epoch = None
    min_val_state = None
    smoothed_val = None
    last_val = None
    start_epoch = 0
    if resume_from is not None:
        start_epoch = int(resume_from["epoch"]) + 1
        if resume_from.get("lr_state") is not None:
            sched_state = resume_from["lr_state"]
        curve = [tuple(c) for c in resume_from.get("learning_curve") or []]
        min_val = resume_from.get("min_validation_loss")
        min_val_epoch = resume_from.get("min_validation_epoch")
        min_val_state = resume_from.get("min_validation_state")
        smoothed_val = resume_from.get("smoothed_validation_loss", min_val)
        last_val = resume_from.get("validation_loss")
        for _ in range(start_epoch):
            key, _ = jax.random.split(key)

    for epoch in range(start_epoch, epochs):
        sched_state, lr_factor = schedule(sched_state, epoch, last_val)
        key, ek = jax.random.split(key)
        state, train_loss, n, dt = one_epoch(
            state, train_batches(epoch), train_step, ek, lr_factor=lr_factor,
            prefetch=prefetch, log=log, steps_per_call=steps_per_call,
        )
        if training_callback is not None:
            training_callback(epoch, train_loss)
        val_loss = None
        if validation_batches is not None and epoch % validation_frequency == 0:
            val_loss = validation_one_epoch(
                state, validation_batches(epoch), eval_step, prefetch=prefetch
            )
            last_val = val_loss
            smoothed_val = (
                val_loss if smoothed_val is None
                else validation_smoothing_factor * val_loss
                + (1 - validation_smoothing_factor) * smoothed_val
            )
            if min_val is None or smoothed_val < min_val:
                min_val = smoothed_val
                min_val_epoch = epoch
                if return_min_validation_loss_model:
                    min_val_state = state
            if validation_callback is not None:
                validation_callback(epoch, val_loss)
            if log:
                log(f"epoch {epoch}: validation loss {val_loss:.6f} "
                    f"(smoothed {smoothed_val:.6f})")
        curve.append((epoch, train_loss, smoothed_val, val_loss))
        if checkpoint_callback is not None:
            checkpoint_callback(state, {
                "epoch": epoch,
                "train_loss": train_loss,
                "validation_loss": last_val,
                "lr_state": sched_state,
                "learning_curve": curve,
                # resume bookkeeping (epochs(resume_from=) reads these)
                "min_validation_loss": min_val,
                "min_validation_epoch": min_val_epoch,
                "smoothed_validation_loss": smoothed_val,
                "min_validation_state": min_val_state,
            })

    return TrainingResult(
        state=state,
        learning_curve=curve,
        min_validation_loss=min_val,
        min_validation_epoch=min_val_epoch,
        min_validation_state=min_val_state,
    )


def run_batch_stream(state_or_model, stream, forward: Callable, *,
                     prefetch: bool = False):
    """Forward-only inference driver (reference IOLoops.runBatchStream,
    IOLoops.scala:64)."""
    model = (
        state_or_model.model
        if isinstance(state_or_model, TrainState)
        else state_or_model
    )
    if prefetch:
        from ..data.batchstream import prefetch_to_device

        stream = prefetch_to_device(stream)
    outs = []
    for batch in stream:
        outs.append(forward(model, batch))
    return outs


def parallel_run_batch_stream(state_or_model, stream, forward: Callable, *,
                              mesh, axis: str = "dp"):
    """Inference over a device mesh (reference parallelRunBatchStream,
    IOLoops.scala:120): each host batch is sharded over ``axis`` and the
    jitted forward runs SPMD across devices."""
    from ..parallel.mesh import batch_sharding

    model = (
        state_or_model.model
        if isinstance(state_or_model, TrainState)
        else state_or_model
    )
    jitted = jax.jit(forward)
    sharding = batch_sharding(mesh, axis)
    outs = []
    for batch in stream:
        outs.append(jitted(model, jax.device_put(batch, sharding)))
    return outs
