"""Native C++ loader vs pure-NumPy loader: bitwise parity + determinism.

The loader contract (kfac_pytorch_tpu/data/loader.py): all randomness is
splitmix64-counter-derived, so the two implementations must agree exactly
and any epoch is reproducible from (seed, epoch).
"""

import numpy as np
import pytest

from kfac_pytorch_tpu.data import (
    NativeBatchLoader,
    PyBatchLoader,
    epoch_order,
    make_loader,
    native_available,
)

MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32)
STD = np.array([0.2023, 0.1994, 0.2010], np.float32)


def _dataset(n=64, h=16, w=16, c=3, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randint(0, 256, (n, h, w, c)).astype(np.uint8)
    y = rng.randint(0, 10, n).astype(np.int32)
    return x, y


def _drain(loader, epoch):
    loader.start_epoch(epoch)
    return list(iter(loader))


def test_epoch_order_is_a_permutation_and_epoch_dependent():
    o0 = epoch_order(seed=7, epoch=0, n=100)
    o1 = epoch_order(seed=7, epoch=1, n=100)
    assert sorted(o0) == list(range(100))
    assert not np.array_equal(o0, o1)
    assert np.array_equal(o0, epoch_order(seed=7, epoch=0, n=100))


def test_python_loader_shapes_and_determinism():
    x, y = _dataset()
    mk = lambda: PyBatchLoader(
        x, y, batch=16, pad=2, mean=MEAN, std=STD, seed=3
    )
    b0 = _drain(mk(), 0)
    b1 = _drain(mk(), 0)
    assert len(b0) == 4
    for (xa, ya), (xb, yb) in zip(b0, b1):
        assert xa.shape == (16, 16, 16, 3) and xa.dtype == np.float32
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)


def test_python_loader_epochs_differ_and_cover_dataset():
    x, y = _dataset()
    ld = PyBatchLoader(x, y, batch=16, augment=False, seed=3)
    e0 = _drain(ld, 0)
    e1 = _drain(ld, 1)
    assert not np.array_equal(e0[0][0], e1[0][0])
    # labels across one epoch are a permutation of the dataset labels
    seen = np.concatenate([b[1] for b in e0])
    assert sorted(seen.tolist()) == sorted(y.tolist())


def test_no_augment_no_shuffle_is_plain_normalization():
    x, y = _dataset(n=32)
    ld = PyBatchLoader(
        x, y, batch=32, augment=False, shuffle=False, mean=MEAN, std=STD
    )
    (bx, by), = _drain(ld, 0)
    ref = (x.astype(np.float32) / 255.0 - MEAN) / STD
    np.testing.assert_array_equal(bx, ref)
    np.testing.assert_array_equal(by, y)


@pytest.mark.skipif(not native_available(), reason="native lib not built")
@pytest.mark.parametrize("augment,shuffle", [
    (True, True), (True, False), (False, True), (False, False),
])
def test_native_matches_python_bitwise(augment, shuffle):
    x, y = _dataset(n=48, h=12, w=12)
    kw = dict(
        batch=16, pad=3, augment=augment, shuffle=shuffle,
        mean=MEAN, std=STD, seed=11,
    )
    nat = NativeBatchLoader(x, y, n_threads=3, depth=2, **kw)
    py = PyBatchLoader(x, y, **kw)
    try:
        for epoch in (0, 1, 5):
            for (xn, yn), (xp, yp) in zip(
                _drain(nat, epoch), _drain(py, epoch)
            ):
                np.testing.assert_array_equal(xn, xp)
                np.testing.assert_array_equal(yn, yp)
    finally:
        nat.close()


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_native_prefetch_across_many_batches():
    """More batches than ring slots: exercises producer/consumer blocking."""
    x, y = _dataset(n=256, h=8, w=8)
    nat = NativeBatchLoader(
        x, y, batch=8, seed=5, n_threads=4, depth=2, mean=MEAN, std=STD
    )
    py = PyBatchLoader(x, y, batch=8, seed=5, mean=MEAN, std=STD)
    try:
        bn = _drain(nat, 2)
        bp = _drain(py, 2)
        assert len(bn) == 32
        for (xn, yn), (xp, yp) in zip(bn, bp):
            np.testing.assert_array_equal(xn, xp)
            np.testing.assert_array_equal(yn, yp)
    finally:
        nat.close()


def test_make_loader_python_fallback():
    x, y = _dataset(n=16, h=8, w=8)
    ld = make_loader(x, y, 8, impl="python", n_threads=2, depth=2)
    assert isinstance(ld, PyBatchLoader)
    assert ld.n_batches == 2
