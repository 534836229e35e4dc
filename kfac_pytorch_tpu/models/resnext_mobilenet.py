"""ResNeXt-50 (32x4d) and MobileNet-v1 in flax, K-FAC-tagged.

The last two model families from the reference's ImageNet zoo
(/root/reference/examples/pytorch_imagenet_resnet.py:235-258 lists resnext
and mobilenet). Both use grouped convolutions; K-FAC treats each group as a
separate block-diagonal factor (one LayerSpec per group — the correct math,
which the reference's dense-channel factor computation gets wrong for
grouped Conv2d).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from kfac_pytorch_tpu.capture import KFACConv, KFACDense

_kaiming = nn.initializers.kaiming_normal()


class ResNeXtBottleneck(nn.Module):
    planes: int  # width of the grouped conv
    cardinality: int = 32
    stride: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, dtype=self.dtype)
        y = KFACConv(self.planes, (1, 1), padding=0, use_bias=False,
                     kernel_init=_kaiming, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm(name="bn1")(y))
        y = KFACConv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, feature_group_count=self.cardinality,
            kernel_init=_kaiming, dtype=self.dtype, name="conv2",
        )(y)
        y = nn.relu(norm(name="bn2")(y))
        y = KFACConv(self.planes * 2, (1, 1), padding=0, use_bias=False,
                     kernel_init=_kaiming, dtype=self.dtype, name="conv3")(y)
        y = norm(name="bn3", scale_init=nn.initializers.zeros_init())(y)
        if self.downsample:
            x = KFACConv(
                self.planes * 2, (1, 1), strides=(self.stride, self.stride),
                padding=0, use_bias=False, kernel_init=_kaiming,
                dtype=self.dtype, name="downsample_conv",
            )(x)
            x = norm(name="downsample_bn")(x)
        return nn.relu(y + x)


class ResNeXt(nn.Module):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # ResNeXt-50
    cardinality: int = 32
    base_width: int = 4
    num_classes: int = 1000
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, dtype=self.dtype)
        x = KFACConv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                     kernel_init=_kaiming, dtype=self.dtype,
                     name="conv_init")(x)
        x = nn.relu(norm(name="bn_init")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        in_ch = 64
        for stage, n_blocks in enumerate(self.stage_sizes):
            width = self.cardinality * self.base_width * (2**stage)
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                downsample = stride != 1 or in_ch != width * 2
                x = ResNeXtBottleneck(
                    width, self.cardinality, stride, downsample,
                    dtype=self.dtype, name=f"stage{stage + 1}_block{b}",
                )(x, train=train)
                in_ch = width * 2
        x = jnp.mean(x, axis=(1, 2))
        return KFACDense(self.num_classes, kernel_init=_kaiming, name="fc")(x)


class MobileNetV1(nn.Module):
    """Depthwise-separable conv stack; depthwise convs are fully-grouped
    KFACConvs (one tiny kh*kw-dim factor block per channel)."""

    width_mult: float = 1.0
    num_classes: int = 1000
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, dtype=self.dtype)

        def c(ch):
            return max(8, int(ch * self.width_mult))

        def conv_bn(x, ch, stride, name):
            x = KFACConv(ch, (3, 3), strides=(stride, stride), padding=1,
                         use_bias=False, kernel_init=_kaiming,
                         dtype=self.dtype, name=f"{name}_conv")(x)
            return nn.relu(norm(name=f"{name}_bn")(x))

        def dw_sep(x, ch_out, stride, name):
            ch_in = x.shape[-1]
            # depthwise: groups == channels
            x = KFACConv(
                ch_in, (3, 3), strides=(stride, stride), padding=1,
                use_bias=False, feature_group_count=ch_in,
                kernel_init=_kaiming, dtype=self.dtype, name=f"{name}_dw",
            )(x)
            x = nn.relu(norm(name=f"{name}_dwbn")(x))
            x = KFACConv(ch_out, (1, 1), padding=0, use_bias=False,
                         kernel_init=_kaiming, dtype=self.dtype,
                         name=f"{name}_pw")(x)
            return nn.relu(norm(name=f"{name}_pwbn")(x))

        x = conv_bn(x, c(32), 2, "stem")
        cfg = [
            (64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
            (512, 1), (512, 1), (512, 1), (512, 1), (512, 1), (1024, 2),
            (1024, 1),
        ]
        for i, (ch, s) in enumerate(cfg):
            x = dw_sep(x, c(ch), s, f"ds{i}")
        x = jnp.mean(x, axis=(1, 2))
        return KFACDense(self.num_classes, kernel_init=_kaiming, name="fc")(x)


class MobileNetV2(nn.Module):
    """Inverted-residual MobileNet-v2 (the reference's mobilenetv2 option,
    pytorch_imagenet_resnet.py:258-259). Depthwise convs are fully-grouped
    KFACConvs (block-diagonal per-channel factors); ReLU6 activations."""

    width_mult: float = 1.0
    num_classes: int = 1000
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, dtype=self.dtype)
        relu6 = lambda v: jnp.minimum(nn.relu(v), 6.0)

        def c(ch):
            return max(8, int(ch * self.width_mult + 0.5) // 8 * 8)

        def inverted_residual(x, ch_out, stride, expand, name):
            ch_in = x.shape[-1]
            hidden = ch_in * expand
            h = x
            if expand != 1:
                h = KFACConv(hidden, (1, 1), padding=0, use_bias=False,
                             kernel_init=_kaiming, dtype=self.dtype,
                             name=f"{name}_exp")(h)
                h = relu6(norm(name=f"{name}_expbn")(h))
            h = KFACConv(
                hidden, (3, 3), strides=(stride, stride), padding=1,
                use_bias=False, feature_group_count=hidden,
                kernel_init=_kaiming, dtype=self.dtype, name=f"{name}_dw",
            )(h)
            h = relu6(norm(name=f"{name}_dwbn")(h))
            h = KFACConv(ch_out, (1, 1), padding=0, use_bias=False,
                         kernel_init=_kaiming, dtype=self.dtype,
                         name=f"{name}_proj")(h)
            h = norm(name=f"{name}_projbn")(h)
            if stride == 1 and ch_in == ch_out:
                h = h + x
            return h

        x = KFACConv(c(32), (3, 3), strides=(2, 2), padding=1,
                     use_bias=False, kernel_init=_kaiming, dtype=self.dtype,
                     name="stem_conv")(x)
        x = relu6(norm(name="stem_bn")(x))
        cfg = [
            # (expand t, channels c, repeats n, stride s)
            (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
        ]
        blk = 0
        for t, ch, n, s in cfg:
            for i in range(n):
                x = inverted_residual(
                    x, c(ch), s if i == 0 else 1, t, f"ir{blk}"
                )
                blk += 1
        x = KFACConv(c(1280) if self.width_mult > 1.0 else 1280, (1, 1),
                     padding=0, use_bias=False, kernel_init=_kaiming,
                     dtype=self.dtype, name="head_conv")(x)
        x = relu6(norm(name="head_bn")(x))
        x = jnp.mean(x, axis=(1, 2))
        return KFACDense(self.num_classes, kernel_init=_kaiming, name="fc")(x)


def resnext50_32x4d(num_classes=1000, **kw):
    return ResNeXt((3, 4, 6, 3), 32, 4, num_classes, **kw)


def mobilenet_v2(num_classes=1000, **kw):
    return MobileNetV2(num_classes=num_classes, **kw)


def mobilenet_v1(num_classes=1000, **kw):
    return MobileNetV1(1.0, num_classes, **kw)
