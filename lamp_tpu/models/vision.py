"""Vision models: the CIFAR residual conv net and LeNet.

Capability parity with the reference's example-cifar100 model zoo
(example-cifar100/src/main/scala/lamp/example/cifar/cnn.scala:11-180):
``Residual.make`` blocks (conv-bn-relu-dropout-conv-bn + projection shortcut)
and the ``Cnn.resnet``/``Cnn.lenet`` factories with the same channel widths.

TPU note: NCHW layout; convs lower to MXU implicit GEMMs; for peak
throughput prefer channel counts that are multiples of 8/128 (the reference
widths are kept for parity; ``resnet`` accepts a ``width_multiplier``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..nn import (
    AvgPool2D,
    BatchNorm2D,
    Conv2D,
    Dropout,
    Fun,
    Linear,
    MaxPool2D,
    Module,
    Sequential,
    static_field,
)

__all__ = ["ResidualBlock", "resnet_cifar", "lenet"]


class ResidualBlock(Module):
    """right = conv-bn-relu-dropout-conv-bn; left = optional 1x1 projection
    (reference Residual.make, cnn.scala:34-87); output relu+dropout applied
    by the factory."""

    right: Sequential
    left: Optional[Sequential]

    @staticmethod
    def init(in_channels: int, out_channels: int, *, key, dropout: float = 0.0,
             stride: int = 1, dtype=jnp.float32) -> "ResidualBlock":
        k1, k2, k3 = jax.random.split(key, 3)
        right = Sequential.init(
            Conv2D.init(in_channels, out_channels, 3, key=k1, padding=1,
                        stride=stride, dtype=dtype),
            BatchNorm2D.init(out_channels, dtype=dtype),
            Fun.init(jax.nn.relu),
            Dropout.init(dropout),
            Conv2D.init(out_channels, out_channels, 3, key=k2, padding=1,
                        dtype=dtype),
            BatchNorm2D.init(out_channels, dtype=dtype),
        )
        if in_channels == out_channels and stride == 1:
            left = None
        else:
            left = Sequential.init(
                Conv2D.init(in_channels, out_channels, 1, key=k3,
                            stride=stride, dtype=dtype),
                BatchNorm2D.init(out_channels, dtype=dtype),
            )
        return ResidualBlock(right=right, left=left)

    def forward(self, x, *, key=None, train=False):
        k1, k2 = jax.random.split(key) if key is not None else (None, None)
        r, right = self.right.forward(x, key=k1, train=train)
        if self.left is not None:
            l, left = self.left.forward(x, key=k2, train=train)
        else:
            l, left = x, None
        return r + l, self.replace(right=right, left=left)


def resnet_cifar(num_classes: int, *, key, dropout: float = 0.0,
                 width_multiplier: int = 1, dtype=jnp.float32) -> Sequential:
    """The reference CIFAR resnet (cnn.scala:88-137): stem conv 3->6, residual
    stages 6->6/s2, 6->16/s2, 16->128, 128->classes, global avg pool 8x8,
    log-softmax."""
    w = width_multiplier
    keys = jax.random.split(key, 5)

    def block(cin, cout, stride, k, kk):
        return Sequential.init(
            ResidualBlock.init(cin, cout, key=kk, dropout=dropout,
                               stride=stride, dtype=dtype),
            Fun.init(jax.nn.relu),
            Dropout.init(dropout),
        )

    return Sequential.init(
        Conv2D.init(3, 6 * w, 5, key=keys[0], padding=2, dtype=dtype),
        block(6 * w, 6 * w, 2, 1, keys[1]),
        block(6 * w, 16 * w, 2, 2, keys[2]),
        block(16 * w, 128 * w, 1, 3, keys[3]),
        block(128 * w, num_classes, 1, 4, keys[4]),
        AvgPool2D.init(8),
        Fun.init(lambda x: x.reshape(x.shape[0], -1)),
        Fun.init(lambda x: jax.nn.log_softmax(x.astype(jnp.float32), axis=1)),
    )


def lenet(num_classes: int, *, key, dropout: float = 0.0,
          dtype=jnp.float32) -> Sequential:
    """LeNet-style baseline (reference Cnn.lenet, cnn.scala:139-180)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return Sequential.init(
        Conv2D.init(3, 6, 5, key=k1, padding=2, dtype=dtype),
        MaxPool2D.init(2),
        BatchNorm2D.init(6, dtype=dtype),
        Fun.init(jax.nn.relu),
        Conv2D.init(6, 16, 5, key=k2, padding=2, dtype=dtype),
        MaxPool2D.init(2),
        BatchNorm2D.init(16, dtype=dtype),
        Fun.init(jax.nn.relu),
        Fun.init(lambda x: x.reshape(x.shape[0], -1)),
        Linear.init(16 * 8 * 8, 120, key=k3, dtype=dtype),
        Fun.init(jax.nn.relu),
        Linear.init(120, num_classes, key=k4, dtype=dtype),
        Fun.init(lambda x: jax.nn.log_softmax(x.astype(jnp.float32), axis=1)),
    )
