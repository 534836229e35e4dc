"""VGG-11/13/16/19 (CIFAR variant, with BatchNorm) in flax, K-FAC-tagged.

Re-design of the reference VGG workload (/root/reference/examples/
cifar_vgg.py): 3x3 conv stacks with BN+ReLU, max-pool stage boundaries, and
a single dense classifier head.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Union

import jax.numpy as jnp
import flax.linen as nn

from kfac_pytorch_tpu.capture import KFACConv, KFACDense

CFG: Dict[str, Sequence[Union[int, str]]] = {
    "VGG11": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "VGG13": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"],
    "VGG16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
              "M", 512, 512, 512, "M"],
    "VGG19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512,
              512, 512, "M", 512, 512, 512, 512, "M"],
}


class VGG(nn.Module):
    name_cfg: str = "VGG16"
    num_classes: int = 10
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        idx = 0
        for c in CFG[self.name_cfg]:
            if c == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = KFACConv(
                    int(c), (3, 3), padding=1, dtype=self.dtype,
                    name=f"conv{idx}",
                )(x)
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    dtype=self.dtype, name=f"bn{idx}",
                )(x)
                x = nn.relu(x)
                idx += 1
        x = x.reshape(x.shape[0], -1)
        return KFACDense(self.num_classes, name="fc")(x)


def vgg11(num_classes=10, **kw):
    return VGG("VGG11", num_classes, **kw)


def vgg13(num_classes=10, **kw):
    return VGG("VGG13", num_classes, **kw)


def vgg16(num_classes=10, **kw):
    return VGG("VGG16", num_classes, **kw)


def vgg19(num_classes=10, **kw):
    return VGG("VGG19", num_classes, **kw)
