"""Preemption-safe training: checkpoint every epoch, resume automatically.

The reference's recovery story is "checkpoint + restart" (SURVEY.md §
aux subsystems: no elastic recovery; `initState` resume via
StateIO.readFromFile, docs/docs/multigpu.md:100-105) — the operator reloads
the loop state and re-launches. On TPU pods preemption is routine, so this
module packages that contract into one call:

    result = resumable_epochs(
        checkpoint_dir="ckpt", model=model, optimizer=opt, loss_fn=loss_fn,
        train_batches=..., epochs=100,
    )

Every ``every`` epochs the full loop state (TrainState + schedule state +
learning curve + min-validation tracking) is written atomically through
:func:`lamp_tpu.io.checkpoint.save_loop_state`; if the process dies and is
re-launched with the same arguments, training continues at the next epoch
with the identical per-epoch PRNG stream (see ``epochs(resume_from=)``).
``background=True`` snapshots on-device and writes from a daemon thread
(AsyncCheckpointer), keeping the step loop hot.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional

import jax.numpy as jnp

from ..io import checkpoint as ckpt_io
from ..nn.module import partition_params
from .loops import TrainState, TrainingResult, epochs

__all__ = ["resumable_epochs", "latest_loop_checkpoint"]


def latest_loop_checkpoint(checkpoint_dir: str) -> Optional[str]:
    """Path of the newest complete loop checkpoint in ``checkpoint_dir``,
    or None. A checkpoint is complete when its ``.meta`` sidecar exists
    (save_loop_state writes it last, atomically)."""
    if not os.path.isdir(checkpoint_dir):
        return None
    best = None
    for name in os.listdir(checkpoint_dir):
        if not name.endswith(".meta"):
            continue
        path = os.path.join(checkpoint_dir, name[: -len(".meta")])
        if not os.path.exists(path):
            continue
        ep = _epoch_of(path)
        if ep is not None and (best is None or ep > _epoch_of(best)):
            best = path
    return best


def _epoch_of(path: str) -> Optional[int]:
    name = os.path.basename(path)
    if name.startswith("epoch-") and name[len("epoch-"):].isdigit():
        return int(name[len("epoch-"):])
    return None


def resumable_epochs(*, checkpoint_dir: str, model, optimizer,
                     every: int = 1, keep: int = 2,
                     background: bool = False,
                     checkpoint_callback: Optional[Callable] = None,
                     log: Optional[Callable[[str], None]] = None,
                     **epochs_kwargs) -> TrainingResult:
    """:func:`lamp_tpu.train.epochs` with automatic checkpoint/resume.

    If ``checkpoint_dir`` holds a checkpoint from a previous (preempted)
    run of the same configuration, training resumes after its epoch;
    otherwise it starts fresh. State is saved every ``every`` epochs as
    ``epoch-N`` + ``epoch-N.meta`` (atomic: the meta sidecar lands last),
    keeping the newest ``keep`` checkpoints. Extra keyword arguments go to
    :func:`epochs` verbatim; a user ``checkpoint_callback`` still fires
    after the save.
    """
    if every < 1:
        raise ValueError("every must be >= 1")
    if keep < 1:
        raise ValueError("keep must be >= 1")
    if "state" in epochs_kwargs or "resume_from" in epochs_kwargs:
        raise ValueError(
            "resumable_epochs owns state/resume_from; pass model= instead"
        )
    os.makedirs(checkpoint_dir, exist_ok=True)

    template = TrainState.init(model, optimizer)
    state = template
    resume_from = None
    latest = latest_loop_checkpoint(checkpoint_dir)
    if latest is not None:
        with open(latest + ".meta") as f:
            meta = json.load(f)
        has_min = bool((meta.get("extra") or {}).get("has_min_state"))
        loaded, meta = ckpt_io.load_loop_state(
            latest,
            model_template=template.model,
            optimizer_state_template=template.opt_state,
            min_validation_model_template=(template if has_min else None),
        )
        params, rest = partition_params(loaded["model"])
        step = ((meta.get("extra") or {}).get("step")) or 0
        state = TrainState(params=params, rest=rest,
                           opt_state=loaded["optimizer_state"],
                           step=jnp.asarray(step, jnp.int32))
        resume_from = dict(meta)
        resume_from["min_validation_state"] = loaded["min_validation_model"]
        smoothed = (meta.get("extra") or {}).get("smoothed_validation_loss")
        resume_from["smoothed_validation_loss"] = smoothed
        resume_from["min_validation_epoch"] = (
            (meta.get("extra") or {}).get("min_validation_epoch")
        )
        resume_from["validation_loss"] = meta.get("last_validation_loss")
        if log:
            log(f"resuming from {latest} (epoch {meta['epoch']})")

    last_epoch = epochs_kwargs.get("epochs")

    def save(st: TrainState, payload) -> None:
        epoch = payload["epoch"]
        due = (epoch + 1) % every == 0 or epoch + 1 == last_epoch
        if due:
            path = os.path.join(checkpoint_dir, f"epoch-{epoch}")
            min_state = payload.get("min_validation_state")
            ckpt_io.save_loop_state(
                path,
                model=st.model,
                optimizer_state=st.opt_state,
                epoch=epoch,
                last_validation_loss=payload.get("validation_loss"),
                min_validation_loss=payload.get("min_validation_loss"),
                min_validation_model=min_state,
                learning_curve=payload.get("learning_curve"),
                lr_state=payload.get("lr_state"),
                extra={
                    "step": int(st.step),
                    "has_min_state": min_state is not None,
                    "smoothed_validation_loss":
                        payload.get("smoothed_validation_loss"),
                    "min_validation_epoch":
                        payload.get("min_validation_epoch"),
                },
                background=background,
            )
            _prune(checkpoint_dir, keep)
        if checkpoint_callback is not None:
            checkpoint_callback(st, payload)

    return epochs(state=state, optimizer=optimizer,
                  resume_from=resume_from, checkpoint_callback=save,
                  log=log, **epochs_kwargs)


def _prune(checkpoint_dir: str, keep: int) -> None:
    done = sorted(
        (p for p in (
            os.path.join(checkpoint_dir, n[: -len(".meta")])
            for n in os.listdir(checkpoint_dir) if n.endswith(".meta")
        ) if _epoch_of(p) is not None),
        key=_epoch_of,
    )
    for path in done[:-keep]:
        for suffix in (".meta", ".data", ""):
            try:
                os.remove(path + suffix)
            except OSError:
                pass
