"""Training loops, SWA, checkpoint-aware state."""

from .loops import (
    parallel_run_batch_stream,
    TrainState,
    TrainingResult,
    epochs,
    make_eval_step,
    make_chained_train_step,
    make_train_step,
    one_epoch,
    run_batch_stream,
    validation_one_epoch,
)
from .ema import ema_init, ema_params, ema_swap, ema_update
from .preference import (
    dpo_loss,
    make_distill_loss_fn,
    make_dpo_loss_fn,
    sequence_logprobs,
)
from .resilience import latest_loop_checkpoint, resumable_epochs
from .rl import (
    grpo_advantages,
    grpo_loss,
    grpo_rollout,
    make_grpo_loss_fn,
    token_logprobs,
)
from .swa import (
    constant_swa_schedule,
    cyclic_swa_schedule,
    recalibrate_batchnorm,
    swa_epochs,
)

__all__ = [
    "TrainState",
    "TrainingResult",
    "epochs",
    "make_chained_train_step",
    "make_train_step",
    "make_eval_step",
    "one_epoch",
    "validation_one_epoch",
    "run_batch_stream",
    "parallel_run_batch_stream",
    "resumable_epochs",
    "latest_loop_checkpoint",
    "sequence_logprobs",
    "dpo_loss",
    "make_dpo_loss_fn",
    "make_distill_loss_fn",
    "token_logprobs",
    "grpo_advantages",
    "grpo_loss",
    "grpo_rollout",
    "make_grpo_loss_fn",
    "swa_epochs",
    "ema_init",
    "ema_update",
    "ema_params",
    "ema_swap",
    "constant_swa_schedule",
    "cyclic_swa_schedule",
    "recalibrate_batchnorm",
]
