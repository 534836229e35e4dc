"""Deterministic augmenting batch loaders (native C++ + NumPy fallback).

The production input-feeding path of the framework: raw uint8 NHWC images +
int32 labels in host memory -> shuffled, crop/flip-augmented, normalized
float32 batches ready for ``jax.device_put``. Replaces the reference's
persistent-worker DataLoader + torchvision transform stack
(/root/reference/examples/utils.py:93-121 MultiEpochsDataLoader,
/root/reference/examples/pytorch_cifar10_resnet.py:158-166 RandomCrop +
RandomHorizontalFlip + Normalize) with two interchangeable implementations:

* ``NativeBatchLoader`` — ctypes binding of native/dataloader.cpp: a C++
  thread pool fills a bounded prefetch ring, so batch assembly runs
  concurrently with device compute.
* ``PyBatchLoader`` — pure NumPy, same math.

Both draw ALL randomness from splitmix64 counters keyed by
(seed, epoch, position) — never from thread timing or global RNG state —
so the two implementations produce BITWISE-IDENTICAL batches and any run
is exactly reproducible from its seed. Augmentation follows torchvision
order (pad/crop/flip the RAW image, then normalize), so zero padding is
black, not mean-colored.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX = np.uint64(0xD1B54A32D192ED03)
_AUG_SALT = np.uint64(0xA5A5A5A55A5A5A5A)

_NATIVE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libkfac_dataloader.so",
)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — identical to the C++ (dataloader.cpp)."""
    with np.errstate(over="ignore"):
        z = (x + _GOLDEN).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _epoch_key(seed: int, epoch: int) -> np.uint64:
    with np.errstate(over="ignore"):
        return _splitmix64(
            np.uint64(seed) * _GOLDEN + np.uint64(epoch)
        )


def epoch_order(seed: int, epoch: int, n: int) -> np.ndarray:
    """The deterministic shuffle both loaders use: argsort of per-index
    splitmix64 keys (ties broken by index, matching std::sort on pairs)."""
    es = _epoch_key(seed, epoch)
    idx = np.arange(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        keys = _splitmix64(es ^ (idx * _GOLDEN))
    return np.lexsort((idx, keys)).astype(np.int64)


def _augment_draws(
    seed: int, epoch: int, k: np.ndarray, pad: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(y_offset, x_offset, flip) for epoch positions ``k`` — the C++
    fill_batch draw."""
    es = _epoch_key(seed, epoch)
    span = np.uint64(2 * pad + 1)
    with np.errstate(over="ignore"):
        r = _splitmix64(es ^ _AUG_SALT ^ (k.astype(np.uint64) * _MIX))
    ys = (r % span).astype(np.int64)
    xs = ((r >> np.uint64(16)) % span).astype(np.int64)
    flips = ((r >> np.uint64(32)) & np.uint64(1)).astype(bool)
    return ys, xs, flips


def _check_dataset(images: np.ndarray, labels: np.ndarray):
    if images.dtype != np.uint8 or images.ndim != 4:
        raise ValueError("images must be uint8 NHWC")
    if len(labels) != len(images):
        raise ValueError("images/labels length mismatch")


class PyBatchLoader:
    """Pure-NumPy reference implementation of the loader contract."""

    def __init__(
        self,
        images: np.ndarray,
        labels: np.ndarray,
        batch: int,
        *,
        pad: int = 4,
        flip: bool = True,
        augment: bool = True,
        shuffle: bool = True,
        mean: Optional[np.ndarray] = None,
        std: Optional[np.ndarray] = None,
        seed: int = 0,
    ):
        _check_dataset(images, labels)
        self.images = images
        self.labels = labels.astype(np.int32)
        self.batch = batch
        self.pad = pad
        self.flip = flip
        self.augment = augment
        self.shuffle = shuffle
        c = images.shape[-1]
        self.mean = (
            np.zeros(c, np.float32) if mean is None
            else np.asarray(mean, np.float32)
        )
        self.std = (
            np.ones(c, np.float32) if std is None
            else np.asarray(std, np.float32)
        )
        self.seed = seed
        self.n_batches = len(images) // batch
        self._epoch = None
        self._order = None
        self._next = 0

    def start_epoch(self, epoch: int):
        self._epoch = epoch
        self._order = (
            epoch_order(self.seed, epoch, len(self.images))
            if self.shuffle
            else np.arange(len(self.images), dtype=np.int64)
        )
        self._next = 0

    def __iter__(self):
        if self._epoch is None:
            self.start_epoch(0)
        while True:
            item = self.next()
            if item is None:
                return
            yield item

    def next(self):
        if self._next >= self.n_batches:
            return None
        b = self._next
        self._next += 1
        k = np.arange(b * self.batch, (b + 1) * self.batch, dtype=np.int64)
        raw = self.images[self._order[k]]
        if self.augment:
            h, w = raw.shape[1:3]
            p = self.pad
            ys, xs, flips = _augment_draws(self.seed, self._epoch, k, p)
            padded = np.zeros(
                (len(raw), h + 2 * p, w + 2 * p, raw.shape[-1]), raw.dtype
            )
            padded[:, p : p + h, p : p + w] = raw
            out = np.empty_like(raw)
            for i in range(len(raw)):
                out[i] = padded[i, ys[i] : ys[i] + h, xs[i] : xs[i] + w]
            if self.flip:
                out[flips] = out[flips, :, ::-1]
            raw = out
        x = (raw.astype(np.float32) / 255.0 - self.mean) / self.std
        return x, self.labels[self._order[k]].copy()


_lib = None


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_NATIVE_PATH)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.kfac_dl_create.restype = ctypes.c_void_p
    lib.kfac_dl_create.argtypes = [
        u8p, i32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
    ]
    lib.kfac_dl_batches.restype = ctypes.c_int64
    lib.kfac_dl_batches.argtypes = [ctypes.c_void_p]
    lib.kfac_dl_start_epoch.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.kfac_dl_next.restype = ctypes.c_int
    lib.kfac_dl_next.argtypes = [ctypes.c_void_p, f32p, i32p]
    lib.kfac_dl_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load_native()
        return True
    except OSError:
        return False


class NativeBatchLoader:
    """ctypes binding of the C++ threaded prefetch loader."""

    def __init__(
        self,
        images: np.ndarray,
        labels: np.ndarray,
        batch: int,
        *,
        pad: int = 4,
        flip: bool = True,
        augment: bool = True,
        shuffle: bool = True,
        mean: Optional[np.ndarray] = None,
        std: Optional[np.ndarray] = None,
        seed: int = 0,
        n_threads: int = 4,
        depth: int = 4,
    ):
        _check_dataset(images, labels)
        self._lib = _load_native()
        # keep alive: the C++ side borrows these buffers
        self._images = np.ascontiguousarray(images)
        self._labels = np.ascontiguousarray(labels, dtype=np.int32)
        c = images.shape[-1]
        self._mean = (
            np.zeros(c, np.float32) if mean is None
            else np.ascontiguousarray(mean, np.float32)
        )
        self._std = (
            np.ones(c, np.float32) if std is None
            else np.ascontiguousarray(std, np.float32)
        )
        self.batch = batch
        n, h, w, _ = images.shape
        self._shape = (batch, h, w, c)
        self._h = self._lib.kfac_dl_create(
            self._images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self._labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n, h, w, c, batch, pad, int(flip), int(augment), int(shuffle),
            self._mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            seed, n_threads, depth,
        )
        if not self._h:
            raise RuntimeError("kfac_dl_create failed")
        self.n_batches = self._lib.kfac_dl_batches(self._h)

    def start_epoch(self, epoch: int):
        self._lib.kfac_dl_start_epoch(self._h, epoch)

    def next(self):
        x = np.empty(self._shape, np.float32)
        y = np.empty(self.batch, np.int32)
        ok = self._lib.kfac_dl_next(
            self._h,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return (x, y) if ok else None

    def __iter__(self):
        while True:
            item = self.next()
            if item is None:
                return
            yield item

    def close(self):
        if self._h:
            self._lib.kfac_dl_destroy(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass


def make_loader(images, labels, batch, impl: str = "auto", **kw):
    """Factory: ``impl='native'|'python'|'auto'`` (auto prefers native)."""
    if impl == "native" or (impl == "auto" and native_available()):
        return NativeBatchLoader(images, labels, batch, **kw)
    if impl not in ("auto", "python"):
        raise ValueError(f"unknown loader impl {impl!r}")
    kw.pop("n_threads", None)
    kw.pop("depth", None)
    return PyBatchLoader(images, labels, batch, **kw)
