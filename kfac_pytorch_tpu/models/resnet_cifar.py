"""CIFAR ResNet family (resnet20/32/44/56/110/1202) in flax, K-FAC-tagged.

TPU-native re-implementation of the model zoo the reference trains
(/root/reference/examples/cifar_resnet.py — the canonical "proper CIFAR
ResNet" with option-A parameter-free shortcuts): 3 stages of n basic blocks
at 16/32/64 channels, 3x3 convs without bias, BatchNorm, and a final dense
classifier. NHWC layout; every Conv/Dense is a KFACConv/KFACDense so the
preconditioner registers it (the reference registers Conv2d/Linear modules,
kfac_preconditioner_base.py:132-147).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from kfac_pytorch_tpu.capture import KFACConv, KFACDense

_kaiming = nn.initializers.kaiming_normal()


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9,
            epsilon=1e-5, dtype=self.dtype,
        )
        y = KFACConv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, kernel_init=_kaiming, dtype=self.dtype,
            name="conv1",
        )(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = KFACConv(
            self.planes, (3, 3), padding=1, use_bias=False,
            kernel_init=_kaiming, dtype=self.dtype, name="conv2",
        )(y)
        y = norm(name="bn2")(y)

        if self.stride != 1 or x.shape[-1] != self.planes:
            # Option-A shortcut: stride-2 subsample + zero channel padding
            # (parameter-free, matching the reference's CIFAR param counts).
            sc = x[:, :: self.stride, :: self.stride, :]
            pad = self.planes - sc.shape[-1]
            sc = jnp.pad(sc, ((0, 0), (0, 0), (0, 0), (pad // 2, pad - pad // 2)))
        else:
            sc = x
        return nn.relu(y + sc)


class ResNetCifar(nn.Module):
    stage_sizes: Sequence[int]
    num_classes: int = 10
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9,
            epsilon=1e-5, dtype=self.dtype,
        )
        x = KFACConv(
            16, (3, 3), padding=1, use_bias=False, kernel_init=_kaiming,
            dtype=self.dtype, name="conv_init",
        )(x)
        x = nn.relu(norm(name="bn_init")(x))
        for stage, n_blocks in enumerate(self.stage_sizes):
            planes = 16 * (2**stage)
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = BasicBlock(
                    planes, stride, dtype=self.dtype,
                    name=f"stage{stage + 1}_block{b}",
                )(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        x = KFACDense(self.num_classes, kernel_init=_kaiming, name="fc")(x)
        return x


def _make(n: int, num_classes: int = 10, **kw) -> ResNetCifar:
    return ResNetCifar(stage_sizes=[n, n, n], num_classes=num_classes, **kw)


def resnet20(num_classes=10, **kw):
    return _make(3, num_classes, **kw)


def resnet32(num_classes=10, **kw):
    return _make(5, num_classes, **kw)


def resnet44(num_classes=10, **kw):
    return _make(7, num_classes, **kw)


def resnet56(num_classes=10, **kw):
    return _make(9, num_classes, **kw)


def resnet110(num_classes=10, **kw):
    return _make(18, num_classes, **kw)


def resnet1202(num_classes=10, **kw):
    return _make(200, num_classes, **kw)
