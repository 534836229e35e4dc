"""Model zoo: K-FAC-tagged flax models mirroring the reference's workloads.

Registry usage (reference examples select models by --model string,
pytorch_cifar10_resnet.py:200-217, pytorch_imagenet_resnet.py:235-258)::

    model = get_model('resnet32', num_classes=10)
"""

from kfac_pytorch_tpu.models import (
    densenet,
    inception,
    resnet_cifar,
    resnet_imagenet,
    resnext_mobilenet,
    rnn_lm,
    transformer,
    vgg,
    wide_resnet,
)
from kfac_pytorch_tpu.models import translator
from kfac_pytorch_tpu.models.rnn_lm import RNNLM
from kfac_pytorch_tpu.models.transformer import Transformer

_REGISTRY = {
    # CIFAR ResNets
    "resnet20": resnet_cifar.resnet20,
    "resnet32": resnet_cifar.resnet32,
    "resnet44": resnet_cifar.resnet44,
    "resnet56": resnet_cifar.resnet56,
    "resnet110": resnet_cifar.resnet110,
    "resnet1202": resnet_cifar.resnet1202,
    # Wide ResNets
    "wrn28-10": wide_resnet.wrn28_10,
    "wrn28-20": wide_resnet.wrn28_20,
    # VGG
    "vgg11": vgg.vgg11,
    "vgg13": vgg.vgg13,
    "vgg16": vgg.vgg16,
    "vgg19": vgg.vgg19,
    # DenseNets
    "densenet121": densenet.densenet121,
    "densenet169": densenet.densenet169,
    "densenet201": densenet.densenet201,
    # ResNeXt / MobileNet (grouped convs)
    "resnext50-32x4d": resnext_mobilenet.resnext50_32x4d,
    "mobilenet-v1": resnext_mobilenet.mobilenet_v1,
    "mobilenet-v2": resnext_mobilenet.mobilenet_v2,
    # Inception
    "inceptionv3": inception.inceptionv3,
    "inceptionv4": inception.inceptionv4,
    # ImageNet ResNets
    "imagenet-resnet18": resnet_imagenet.resnet18,
    "imagenet-resnet34": resnet_imagenet.resnet34,
    "imagenet-resnet50": resnet_imagenet.resnet50,
    "imagenet-resnet101": resnet_imagenet.resnet101,
    "imagenet-resnet152": resnet_imagenet.resnet152,
}


def get_model(name: str, **kwargs):
    """Build a model from the registry by name."""
    key = name.lower()
    if key not in _REGISTRY:
        raise ValueError(
            f"unknown model '{name}'; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[key](**kwargs)


def available_models():
    return sorted(_REGISTRY)
