"""Floating point precision policy.

TPU-native replacement for the reference's ``FloatingPointPrecision`` hierarchy
(reference: lamp-sten/src/main/scala/lamp/device.scala:5-43) and the
dtype/device descriptor ``STenOptions`` (lamp-sten/src/main/scala/lamp/STen.scala:678-840).

On TPU the natural parameter/compute dtypes are float32 and bfloat16; float16
and float64 are supported for CPU-backed work (jax must be configured with
``jax_enable_x64`` for real float64).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

__all__ = [
    "Precision",
    "SINGLE",
    "DOUBLE",
    "HALF",
    "BF16",
    "canonical_dtype",
    "is_floating",
    "enable_x64",
]


@dataclasses.dataclass(frozen=True)
class Precision:
    """A floating point policy: parameter dtype, compute dtype and accumulator dtype.

    The reference framework converts whole models between double/single/half
    precision; on TPU the idiomatic scheme is bf16 parameters/activations with
    f32 accumulation on the MXU, so the policy carries all three dtypes.
    """

    name: str
    param_dtype: Any
    compute_dtype: Any
    accum_dtype: Any

    def cast_params(self, tree):
        """Cast every floating array leaf of ``tree`` to the parameter dtype."""
        def cast(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(self.param_dtype)
            return x

        return jax.tree_util.tree_map(cast, tree)

    def cast_compute(self, tree):
        def cast(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(self.compute_dtype)
            return x

        return jax.tree_util.tree_map(cast, tree)


SINGLE = Precision("single", jnp.float32, jnp.float32, jnp.float32)
DOUBLE = Precision("double", jnp.float64, jnp.float64, jnp.float64)
HALF = Precision("half", jnp.float16, jnp.float16, jnp.float32)
BF16 = Precision("bf16", jnp.bfloat16, jnp.bfloat16, jnp.float32)


def canonical_dtype(dtype) -> Any:
    """Resolve a dtype-ish (str, np dtype, jnp dtype) to a jnp dtype."""
    return jnp.dtype(dtype)


def is_floating(x) -> bool:
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)


def enable_x64(flag: bool = True) -> None:
    """Enable float64 support (needed for the double-precision test paths)."""
    jax.config.update("jax_enable_x64", flag)
