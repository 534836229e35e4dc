"""DenseNet-121/169/201 (ImageNet) in flax, K-FAC-tagged.

Re-design of the reference's DenseNet efficiency workload
(/root/reference/batch.sh:31 runs densenet201 at bs=16; the torchvision
model family referenced by examples/pytorch_imagenet_resnet.py:235-258).
Standard DenseNet-BC: dense blocks of [BN-ReLU-1x1conv -> BN-ReLU-3x3conv]
layers with growth-rate concatenation, transition layers halving channels
and spatial size.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from kfac_pytorch_tpu.capture import KFACConv, KFACDense

_kaiming = nn.initializers.kaiming_normal()


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, dtype=self.dtype)
        y = nn.relu(norm(name="norm1")(x))
        y = KFACConv(
            self.bn_size * self.growth_rate, (1, 1), padding=0,
            use_bias=False, kernel_init=_kaiming, dtype=self.dtype,
            name="conv1",
        )(y)
        y = nn.relu(norm(name="norm2")(y))
        y = KFACConv(
            self.growth_rate, (3, 3), padding=1, use_bias=False,
            kernel_init=_kaiming, dtype=self.dtype, name="conv2",
        )(y)
        return jnp.concatenate([x, y], axis=-1)


class Transition(nn.Module):
    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(
            nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="norm")(x)
        )
        x = KFACConv(
            self.out_channels, (1, 1), padding=0, use_bias=False,
            kernel_init=_kaiming, dtype=self.dtype, name="conv",
        )(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    block_config: Sequence[int] = (6, 12, 24, 16)  # DenseNet-121
    growth_rate: int = 32
    num_init_features: int = 64
    num_classes: int = 1000
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = KFACConv(
            self.num_init_features, (7, 7), strides=(2, 2), padding=3,
            use_bias=False, kernel_init=_kaiming, dtype=self.dtype,
            name="conv_init",
        )(x)
        x = nn.relu(
            nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn_init")(x)
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        features = self.num_init_features
        for i, n_layers in enumerate(self.block_config):
            for j in range(n_layers):
                x = DenseLayer(
                    self.growth_rate, dtype=self.dtype,
                    name=f"block{i + 1}_layer{j}",
                )(x, train=train)
            features += n_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                features //= 2
                x = Transition(
                    features, dtype=self.dtype, name=f"transition{i + 1}"
                )(x, train=train)
        x = nn.relu(
            nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn_final")(x)
        )
        x = jnp.mean(x, axis=(1, 2))
        return KFACDense(self.num_classes, kernel_init=_kaiming, name="fc")(x)


def densenet121(num_classes=1000, **kw):
    return DenseNet((6, 12, 24, 16), num_classes=num_classes, **kw)


def densenet169(num_classes=1000, **kw):
    return DenseNet((6, 12, 32, 32), num_classes=num_classes, **kw)


def densenet201(num_classes=1000, **kw):
    return DenseNet((6, 12, 48, 32), num_classes=num_classes, **kw)
