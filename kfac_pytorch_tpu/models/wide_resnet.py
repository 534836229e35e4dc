"""Wide-ResNet (WRN-28-10 / WRN-28-20) for CIFAR in flax, K-FAC-tagged.

Re-design of the reference's Wide_ResNet workload
(/root/reference/examples/cifar_wide_resnet.py): pre-activation wide basic
blocks (BN-ReLU-Conv x2 with dropout), biased 3x3 convs, 1x1 projection
shortcut on shape change, depth = 6n+4.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from kfac_pytorch_tpu.capture import KFACConv, KFACDense

_xavier = nn.initializers.xavier_uniform()


class WideBasic(nn.Module):
    planes: int
    stride: int = 1
    dropout_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9,
            dtype=self.dtype,
        )
        y = nn.relu(norm(name="bn1")(x))
        y = KFACConv(
            self.planes, (3, 3), padding=1, kernel_init=_xavier,
            dtype=self.dtype, name="conv1",
        )(y)
        if self.dropout_rate > 0:
            y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        y = nn.relu(norm(name="bn2")(y))
        y = KFACConv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, kernel_init=_xavier, dtype=self.dtype, name="conv2",
        )(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            sc = KFACConv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                padding=0, kernel_init=_xavier, dtype=self.dtype,
                name="shortcut",
            )(x)
        else:
            sc = x
        return y + sc


class WideResNet(nn.Module):
    depth: int = 28
    widen_factor: int = 10
    dropout_rate: float = 0.0
    num_classes: int = 10
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert (self.depth - 4) % 6 == 0, "Wide-resnet depth should be 6n+4"
        n = (self.depth - 4) // 6
        k = self.widen_factor
        x = KFACConv(
            16, (3, 3), padding=1, kernel_init=_xavier, dtype=self.dtype,
            name="conv_init",
        )(x)
        for stage, planes in enumerate([16 * k, 32 * k, 64 * k]):
            for b in range(n):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = WideBasic(
                    planes, stride, self.dropout_rate, dtype=self.dtype,
                    name=f"stage{stage + 1}_block{b}",
                )(x, train=train)
        x = nn.relu(
            nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype,
                name="bn_final",
            )(x)
        )
        x = jnp.mean(x, axis=(1, 2))
        return KFACDense(self.num_classes, kernel_init=_xavier, name="fc")(x)


def wrn28_10(num_classes=10, **kw):
    return WideResNet(28, 10, num_classes=num_classes, **kw)


def wrn28_20(num_classes=10, **kw):
    return WideResNet(28, 20, num_classes=num_classes, **kw)
