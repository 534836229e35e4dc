"""Inception-v4 (ImageNet) in flax, K-FAC-tagged.

Re-design of the reference's Inception workload
(/root/reference/examples/imagenet_inceptionv4.py, run by batch.sh:32 at
bs=16): the standard Inception-v4 topology — stem, 4x Inception-A,
Reduction-A, 7x Inception-B, Reduction-B, 3x Inception-C — with every conv
a KFACConv (conv + BN + ReLU, no conv bias).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax.numpy as jnp
import flax.linen as nn

from kfac_pytorch_tpu.capture import KFACConv, KFACDense

_kaiming = nn.initializers.kaiming_normal()


class ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = KFACConv(
            self.features, self.kernel, strides=self.strides,
            padding=self.padding, use_bias=False, kernel_init=_kaiming,
            dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-3,
            dtype=self.dtype, name="bn",
        )(x)
        return nn.relu(x)


def _maxpool(x, k=3, s=2, pad="VALID"):
    return nn.max_pool(x, (k, k), strides=(s, s), padding=pad)


def _avgpool_same(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")


class Stem(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train=False):
        cbr = partial(ConvBN, dtype=self.dtype)
        x = cbr(32, (3, 3), (2, 2), "VALID", name="c1")(x, train)
        x = cbr(32, (3, 3), (1, 1), "VALID", name="c2")(x, train)
        x = cbr(64, (3, 3), name="c3")(x, train)
        x = jnp.concatenate(
            [_maxpool(x), cbr(96, (3, 3), (2, 2), "VALID", name="c4")(x, train)],
            axis=-1,
        )
        a = cbr(64, (1, 1), name="a1")(x, train)
        a = cbr(96, (3, 3), (1, 1), "VALID", name="a2")(a, train)
        b = cbr(64, (1, 1), name="b1")(x, train)
        b = cbr(64, (7, 1), name="b2")(b, train)
        b = cbr(64, (1, 7), name="b3")(b, train)
        b = cbr(96, (3, 3), (1, 1), "VALID", name="b4")(b, train)
        x = jnp.concatenate([a, b], axis=-1)
        x = jnp.concatenate(
            [cbr(192, (3, 3), (2, 2), "VALID", name="c5")(x, train),
             _maxpool(x)],
            axis=-1,
        )
        return x


class InceptionA(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train=False):
        cbr = partial(ConvBN, dtype=self.dtype)
        b0 = cbr(96, (1, 1), name="b0")(x, train)
        b1 = cbr(64, (1, 1), name="b1a")(x, train)
        b1 = cbr(96, (3, 3), name="b1b")(b1, train)
        b2 = cbr(64, (1, 1), name="b2a")(x, train)
        b2 = cbr(96, (3, 3), name="b2b")(b2, train)
        b2 = cbr(96, (3, 3), name="b2c")(b2, train)
        b3 = cbr(96, (1, 1), name="b3")(_avgpool_same(x), train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class ReductionA(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train=False):
        cbr = partial(ConvBN, dtype=self.dtype)
        b0 = cbr(384, (3, 3), (2, 2), "VALID", name="b0")(x, train)
        b1 = cbr(192, (1, 1), name="b1a")(x, train)
        b1 = cbr(224, (3, 3), name="b1b")(b1, train)
        b1 = cbr(256, (3, 3), (2, 2), "VALID", name="b1c")(b1, train)
        return jnp.concatenate([b0, b1, _maxpool(x)], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train=False):
        cbr = partial(ConvBN, dtype=self.dtype)
        b0 = cbr(384, (1, 1), name="b0")(x, train)
        b1 = cbr(192, (1, 1), name="b1a")(x, train)
        b1 = cbr(224, (1, 7), name="b1b")(b1, train)
        b1 = cbr(256, (7, 1), name="b1c")(b1, train)
        b2 = cbr(192, (1, 1), name="b2a")(x, train)
        b2 = cbr(192, (7, 1), name="b2b")(b2, train)
        b2 = cbr(224, (1, 7), name="b2c")(b2, train)
        b2 = cbr(224, (7, 1), name="b2d")(b2, train)
        b2 = cbr(256, (1, 7), name="b2e")(b2, train)
        b3 = cbr(128, (1, 1), name="b3")(_avgpool_same(x), train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class ReductionB(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train=False):
        cbr = partial(ConvBN, dtype=self.dtype)
        b0 = cbr(192, (1, 1), name="b0a")(x, train)
        b0 = cbr(192, (3, 3), (2, 2), "VALID", name="b0b")(b0, train)
        b1 = cbr(256, (1, 1), name="b1a")(x, train)
        b1 = cbr(256, (1, 7), name="b1b")(b1, train)
        b1 = cbr(320, (7, 1), name="b1c")(b1, train)
        b1 = cbr(320, (3, 3), (2, 2), "VALID", name="b1d")(b1, train)
        return jnp.concatenate([b0, b1, _maxpool(x)], axis=-1)


class InceptionC(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train=False):
        cbr = partial(ConvBN, dtype=self.dtype)
        b0 = cbr(256, (1, 1), name="b0")(x, train)
        b1 = cbr(384, (1, 1), name="b1a")(x, train)
        b1 = jnp.concatenate(
            [cbr(256, (1, 3), name="b1b")(b1, train),
             cbr(256, (3, 1), name="b1c")(b1, train)],
            axis=-1,
        )
        b2 = cbr(384, (1, 1), name="b2a")(x, train)
        b2 = cbr(448, (3, 1), name="b2b")(b2, train)
        b2 = cbr(512, (1, 3), name="b2c")(b2, train)
        b2 = jnp.concatenate(
            [cbr(256, (1, 3), name="b2d")(b2, train),
             cbr(256, (3, 1), name="b2e")(b2, train)],
            axis=-1,
        )
        b3 = cbr(256, (1, 1), name="b3")(_avgpool_same(x), train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionV4(nn.Module):
    num_classes: int = 1000
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Stem(dtype=self.dtype, name="stem")(x, train)
        for i in range(4):
            x = InceptionA(dtype=self.dtype, name=f"incA{i}")(x, train)
        x = ReductionA(dtype=self.dtype, name="redA")(x, train)
        for i in range(7):
            x = InceptionB(dtype=self.dtype, name=f"incB{i}")(x, train)
        x = ReductionB(dtype=self.dtype, name="redB")(x, train)
        for i in range(3):
            x = InceptionC(dtype=self.dtype, name=f"incC{i}")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return KFACDense(self.num_classes, kernel_init=_kaiming, name="fc")(x)


def inceptionv4(num_classes=1000, **kw):
    return InceptionV4(num_classes=num_classes, **kw)


# ---------------------------------------------------------------------------
# Inception-v3 (torchvision topology; the reference's other Inception option,
# pytorch_imagenet_resnet.py:254-255). The train-time auxiliary classifier is
# omitted: the reference train loop calls model(data) and consumes a single
# logits tensor, so the aux head never contributes there either.
# ---------------------------------------------------------------------------


class V3Stem(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train=False):
        cbr = partial(ConvBN, dtype=self.dtype)
        x = cbr(32, (3, 3), (2, 2), "VALID", name="c1")(x, train)
        x = cbr(32, (3, 3), (1, 1), "VALID", name="c2")(x, train)
        x = cbr(64, (3, 3), name="c3")(x, train)
        x = _maxpool(x)
        x = cbr(80, (1, 1), name="c4")(x, train)
        x = cbr(192, (3, 3), (1, 1), "VALID", name="c5")(x, train)
        return _maxpool(x)


class InceptionV3A(nn.Module):
    pool_features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train=False):
        cbr = partial(ConvBN, dtype=self.dtype)
        b0 = cbr(64, (1, 1), name="b0")(x, train)
        b1 = cbr(48, (1, 1), name="b1a")(x, train)
        b1 = cbr(64, (5, 5), name="b1b")(b1, train)
        b2 = cbr(64, (1, 1), name="b2a")(x, train)
        b2 = cbr(96, (3, 3), name="b2b")(b2, train)
        b2 = cbr(96, (3, 3), name="b2c")(b2, train)
        b3 = cbr(self.pool_features, (1, 1), name="b3")(
            _avgpool_same(x), train
        )
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionV3B(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train=False):
        cbr = partial(ConvBN, dtype=self.dtype)
        b0 = cbr(384, (3, 3), (2, 2), "VALID", name="b0")(x, train)
        b1 = cbr(64, (1, 1), name="b1a")(x, train)
        b1 = cbr(96, (3, 3), name="b1b")(b1, train)
        b1 = cbr(96, (3, 3), (2, 2), "VALID", name="b1c")(b1, train)
        return jnp.concatenate([b0, b1, _maxpool(x)], axis=-1)


class InceptionV3C(nn.Module):
    c7: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train=False):
        cbr = partial(ConvBN, dtype=self.dtype)
        c7 = self.c7
        b0 = cbr(192, (1, 1), name="b0")(x, train)
        b1 = cbr(c7, (1, 1), name="b1a")(x, train)
        b1 = cbr(c7, (1, 7), name="b1b")(b1, train)
        b1 = cbr(192, (7, 1), name="b1c")(b1, train)
        b2 = cbr(c7, (1, 1), name="b2a")(x, train)
        b2 = cbr(c7, (7, 1), name="b2b")(b2, train)
        b2 = cbr(c7, (1, 7), name="b2c")(b2, train)
        b2 = cbr(c7, (7, 1), name="b2d")(b2, train)
        b2 = cbr(192, (1, 7), name="b2e")(b2, train)
        b3 = cbr(192, (1, 1), name="b3")(_avgpool_same(x), train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionV3D(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train=False):
        cbr = partial(ConvBN, dtype=self.dtype)
        b0 = cbr(192, (1, 1), name="b0a")(x, train)
        b0 = cbr(320, (3, 3), (2, 2), "VALID", name="b0b")(b0, train)
        b1 = cbr(192, (1, 1), name="b1a")(x, train)
        b1 = cbr(192, (1, 7), name="b1b")(b1, train)
        b1 = cbr(192, (7, 1), name="b1c")(b1, train)
        b1 = cbr(192, (3, 3), (2, 2), "VALID", name="b1d")(b1, train)
        return jnp.concatenate([b0, b1, _maxpool(x)], axis=-1)


class InceptionV3E(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train=False):
        cbr = partial(ConvBN, dtype=self.dtype)
        b0 = cbr(320, (1, 1), name="b0")(x, train)
        b1 = cbr(384, (1, 1), name="b1a")(x, train)
        b1 = jnp.concatenate(
            [cbr(384, (1, 3), name="b1b")(b1, train),
             cbr(384, (3, 1), name="b1c")(b1, train)],
            axis=-1,
        )
        b2 = cbr(448, (1, 1), name="b2a")(x, train)
        b2 = cbr(384, (3, 3), name="b2b")(b2, train)
        b2 = jnp.concatenate(
            [cbr(384, (1, 3), name="b2c")(b2, train),
             cbr(384, (3, 1), name="b2d")(b2, train)],
            axis=-1,
        )
        b3 = cbr(192, (1, 1), name="b3")(_avgpool_same(x), train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionV3(nn.Module):
    num_classes: int = 1000
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = V3Stem(dtype=self.dtype, name="stem")(x, train)
        for i, pf in enumerate([32, 64, 64]):
            x = InceptionV3A(pf, dtype=self.dtype, name=f"a{i}")(x, train)
        x = InceptionV3B(dtype=self.dtype, name="b")(x, train)
        for i, c7 in enumerate([128, 160, 160, 192]):
            x = InceptionV3C(c7, dtype=self.dtype, name=f"c{i}")(x, train)
        x = InceptionV3D(dtype=self.dtype, name="d")(x, train)
        for i in range(2):
            x = InceptionV3E(dtype=self.dtype, name=f"e{i}")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return KFACDense(self.num_classes, kernel_init=_kaiming, name="fc")(x)


def inceptionv3(num_classes=1000, **kw):
    return InceptionV3(num_classes=num_classes, **kw)
