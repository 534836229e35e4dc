"""Deterministic host-side data augmentation (no torchvision).

Reference pipeline (/root/reference/examples/pytorch_cifar10_resnet.py:
158-166): RandomCrop(32, padding=4) + RandomHorizontalFlip + per-channel
normalization with the standard CIFAR statistics. Implemented as vectorized
NumPy over the whole batch — augmentation runs on the host while the
previous step executes on the device, and a seeded Generator makes runs
reproducible.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# torchvision-normalization constants used by the reference (NHWC order)
CIFAR_MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32)
CIFAR_STD = np.array([0.2023, 0.1994, 0.2010], np.float32)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize(x: np.ndarray, mean=CIFAR_MEAN, std=CIFAR_STD) -> np.ndarray:
    """Per-channel normalization of NHWC images in [0, 1] (or raw uint8,
    which is rescaled first)."""
    x = np.asarray(x)
    if x.dtype == np.uint8:
        x = x.astype(np.float32) / 255.0
    return ((x - mean) / std).astype(np.float32)


def random_crop_flip(
    x: np.ndarray,
    rng: np.random.Generator,
    padding: int = 4,
    flip: bool = True,
) -> np.ndarray:
    """Batched RandomCrop(size, padding) + RandomHorizontalFlip, NHWC.

    Matches torchvision RandomCrop semantics (zero padding by default).
    """
    b, h, w, c = x.shape
    padded = np.zeros((b, h + 2 * padding, w + 2 * padding, c), x.dtype)
    padded[:, padding : padding + h, padding : padding + w] = x
    ys = rng.integers(0, 2 * padding + 1, size=b)
    xs = rng.integers(0, 2 * padding + 1, size=b)
    out = np.empty_like(x)
    for i in range(b):  # strided gather per image; B is a few hundred max
        out[i] = padded[i, ys[i] : ys[i] + h, xs[i] : xs[i] + w]
    if flip:
        do = rng.random(b) < 0.5
        out[do] = out[do, :, ::-1]
    return out


def make_augment_fn(
    seed: int,
    padding: int = 4,
    flip: bool = True,
):
    """Seeded augmentation closure for a training run: called once per
    batch, returns the augmented copy."""
    rng = np.random.default_rng(seed)

    def augment(x: np.ndarray) -> np.ndarray:
        return random_crop_flip(x, rng, padding=padding, flip=flip)

    return augment
