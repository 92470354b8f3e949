"""Weight initializers.

Matches the initialization conventions used by the reference's layers
(e.g. Linear: scaled normal, reference lamp-core/src/main/scala/lamp/nn/Linear.scala:30-44)
expressed as jax.nn.initializers-compatible callables.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = [
    "kaiming_normal",
    "xavier_uniform",
    "xavier_normal",
    "normal",
    "uniform",
    "zeros",
    "ones",
    "truncated_normal",
]


def kaiming_normal(key, shape, dtype=jnp.float32, fan_in=None):
    fan = fan_in if fan_in is not None else shape[0]
    std = math.sqrt(2.0 / fan)
    return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def xavier_normal(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)


def normal(std=0.02):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)

    return init


def uniform(scale=1.0):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


def zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def truncated_normal(std=0.02):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * jnp.asarray(
            std, dtype
        )

    return init
