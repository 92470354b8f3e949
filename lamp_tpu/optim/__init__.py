"""Optimizers, gradient clipping, LR schedules."""

from .base import Optimizer, resolve_hyper, apply_updates
from .clip import clip_by_global_norm, clip_by_value, global_norm
from .optimizers import (SGDW, Adafactor, AdamW, Lamb, Lion, Muon, RAdam,
                         ScheduleFreeAdamW, Yogi,
                         newton_schulz_orthogonalize)
from .shampoo import Shampoo
from . import schedules

__all__ = [
    "Optimizer",
    "resolve_hyper",
    "apply_updates",
    "clip_by_global_norm",
    "clip_by_value",
    "global_norm",
    "SGDW",
    "AdamW",
    "Lamb",
    "RAdam",
    "Yogi",
    "Shampoo",
    "Lion",
    "Adafactor",
    "Muon",
    "ScheduleFreeAdamW",
    "newton_schulz_orthogonalize",
    "schedules",
]
