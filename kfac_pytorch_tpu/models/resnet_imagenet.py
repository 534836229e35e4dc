"""ImageNet ResNet family (18/34/50/101/152) in flax, K-FAC-tagged.

TPU-native re-implementation of the reference's ImageNet model zoo
(/root/reference/examples/imagenet_resnet.py — the torchvision-0.5-style
ResNet v1.5: stride-2 on the 3x3 conv of bottleneck blocks). NHWC layout,
no-bias convs, BatchNorm with zero-init on the last block scale
(zero_init_residual equivalent). ResNet-50 is the flagship benchmark model:
its 54 K-FAC layers (A dims 147..4608, G dims 64..2048, see
/root/reference/scripts/dp_block_partition.py:92-93) define the factor
workload the preconditioner is tuned for.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import jax.numpy as jnp
import flax.linen as nn

from kfac_pytorch_tpu.capture import KFACConv, KFACDense

_kaiming = nn.initializers.kaiming_normal()


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9,
            dtype=self.dtype,
        )
        y = KFACConv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, kernel_init=_kaiming,
            dtype=self.dtype, name="conv1",
        )(x)
        y = nn.relu(norm(name="bn1")(y))
        y = KFACConv(
            self.planes, (3, 3), padding=1, use_bias=False,
            kernel_init=_kaiming, dtype=self.dtype, name="conv2",
        )(y)
        y = norm(name="bn2", scale_init=nn.initializers.zeros_init())(y)
        if self.downsample:
            x = KFACConv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                padding=0, use_bias=False, kernel_init=_kaiming,
                dtype=self.dtype, name="downsample_conv",
            )(x)
            x = norm(name="downsample_bn")(x)
        return nn.relu(y + x)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9,
            dtype=self.dtype,
        )
        y = KFACConv(
            self.planes, (1, 1), padding=0, use_bias=False,
            kernel_init=_kaiming, dtype=self.dtype, name="conv1",
        )(x)
        y = nn.relu(norm(name="bn1")(y))
        # v1.5: stride on the 3x3 conv
        y = KFACConv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, kernel_init=_kaiming,
            dtype=self.dtype, name="conv2",
        )(y)
        y = nn.relu(norm(name="bn2")(y))
        y = KFACConv(
            self.planes * 4, (1, 1), padding=0, use_bias=False,
            kernel_init=_kaiming, dtype=self.dtype, name="conv3",
        )(y)
        y = norm(name="bn3", scale_init=nn.initializers.zeros_init())(y)
        if self.downsample:
            x = KFACConv(
                self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                padding=0, use_bias=False, kernel_init=_kaiming,
                dtype=self.dtype, name="downsample_conv",
            )(x)
            x = norm(name="downsample_bn")(x)
        return nn.relu(y + x)


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    block: Any = Bottleneck
    num_classes: int = 1000
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9,
            dtype=self.dtype,
        )
        x = KFACConv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
            kernel_init=_kaiming, dtype=self.dtype, name="conv_init",
        )(x)
        x = nn.relu(norm(name="bn_init")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        expansion = 4 if self.block is Bottleneck else 1
        in_planes = 64
        for stage, n_blocks in enumerate(self.stage_sizes):
            planes = 64 * (2**stage)
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                downsample = stride != 1 or in_planes != planes * expansion
                x = self.block(
                    planes, stride, downsample, dtype=self.dtype,
                    name=f"stage{stage + 1}_block{b}",
                )(x, train=train)
                in_planes = planes * expansion
        x = jnp.mean(x, axis=(1, 2))
        return KFACDense(self.num_classes, kernel_init=_kaiming, name="fc")(x)


def resnet18(num_classes=1000, **kw):
    return ResNet([2, 2, 2, 2], BasicBlock, num_classes, **kw)


def resnet34(num_classes=1000, **kw):
    return ResNet([3, 4, 6, 3], BasicBlock, num_classes, **kw)


def resnet50(num_classes=1000, **kw):
    return ResNet([3, 4, 6, 3], Bottleneck, num_classes, **kw)


def resnet101(num_classes=1000, **kw):
    return ResNet([3, 4, 23, 3], Bottleneck, num_classes, **kw)


def resnet152(num_classes=1000, **kw):
    return ResNet([3, 8, 36, 3], Bottleneck, num_classes, **kw)
