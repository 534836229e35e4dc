"""Fused Pallas patch-covariance kernel (ops/pallas/patch_cov.py).

Interpret mode on CPU; the compiled path is validated on real TPU by
tools/bench_ops.py --op patches and the bench's factor_impl=pallas arm.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu

from kfac_pytorch_tpu.ops import factors as fops
from kfac_pytorch_tpu.ops.pallas import patch_cov as pcov


@pytest.mark.parametrize(
    "b,h,w,c,k,s,p",
    [
        (2, 8, 8, 64, 3, 1, 1),
        (2, 9, 9, 64, 3, 2, 1),
        (1, 8, 8, 128, 3, 1, 1),
        # k=5 with D=3200: exercises the multi-column-chunk (dslice) path
        # (c_chunk=640, n_cols=5); the old k=5/c=64 case (D=1600, no
        # 128-multiple divisor, 10.2 MB single output block) is now
        # rejected by the VMEM-feasibility gate
        (1, 10, 10, 128, 5, 1, 2),
        # c=256 k=3: D=2304, (D, D) output over VMEM -> the tap-pair-
        # blocked path (upper pair chunks, mirrored outside)
        (2, 8, 8, 256, 3, 1, 1),
        # c=384 k=3 with batch not fitting one tile chunk
        (2, 7, 7, 384, 3, 1, 1),
    ],
)
def test_patch_cov_matches_materialized(b, h, w, c, k, s, p):
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    pad = ((p, p), (p, p))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            pcov.patch_cov(a, (k, k), (s, s), pad,
                           compute_dtype=jnp.float32)
        )
    x = np.asarray(
        fops.extract_patches(a, (k, k), (s, s), pad)
    ).reshape(-1, k * k * c)
    np.testing.assert_allclose(got, x.T @ x, rtol=1e-5, atol=1e-4)


def test_compute_a_conv_pallas_impl_with_bias():
    """The full A-factor (scale + bias row/col assembly) through the pallas
    impl equals the XLA path."""
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32))
    args = ((3, 3), (1, 1), ((1, 1), (1, 1)), True)
    want = np.asarray(fops.compute_a_conv(a, *args))

    # drive the pallas branch explicitly (CPU: interpret mode, f32)
    orig = pcov.patch_cov
    try:
        pcov_calls = []

        def wrapped(x, ks, st, pd, compute_dtype=jnp.bfloat16):
            pcov_calls.append(1)
            with pltpu.force_tpu_interpret_mode():
                return orig(x, ks, st, pd, compute_dtype=jnp.float32)

        pcov.patch_cov = wrapped
        backend = jax.default_backend

        jax.default_backend = lambda: "tpu"  # force the pallas branch
        got = np.asarray(fops.compute_a_conv(a, *args, impl="pallas"))
    finally:
        pcov.patch_cov = orig
        jax.default_backend = backend
    assert pcov_calls
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_patch_col_sums():
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.randn(3, 7, 7, 8).astype(np.float32))
    pad = ((1, 1), (1, 1))
    col, n_rows = fops._patch_col_sums(a, (3, 3), (1, 1), pad)
    x = np.asarray(
        fops.extract_patches(a, (3, 3), (1, 1), pad)
    ).reshape(-1, 9 * 8)
    assert n_rows == x.shape[0]
    np.testing.assert_allclose(np.asarray(col), x.sum(0), rtol=1e-5,
                               atol=1e-5)


def test_supported_gate():
    assert pcov.supported((2, 8, 8, 64), (3, 3))
    assert not pcov.supported((2, 8, 8, 64), (1, 1))  # 1x1: no patches
    assert not pcov.supported((2, 224, 224, 3), (7, 7))  # tiny C stem
    # huge spatial map: even a single-image X_cat overflows VMEM
    assert not pcov.supported((32, 112, 112, 128), (3, 3))
    # the RN50 3x3 geometries all remain dispatchable
    for (b, h, w, c) in [(32, 56, 56, 64), (32, 28, 28, 128),
                         (32, 14, 14, 256), (32, 7, 7, 512)]:
        assert pcov.supported((b, h, w, c), (3, 3))


@pytest.mark.parametrize(
    "b,h,w,c,k,p",
    [
        (2, 8, 8, 128, 3, 1),
        (1, 10, 10, 128, 5, 2),
        (2, 7, 7, 256, 3, 1),
    ],
)
def test_tap_cov_matches_materialized(b, h, w, c, k, p):
    """Tap-pair kernel == materialized X^T X (f32 compute, interpret)."""
    from kfac_pytorch_tpu.ops.pallas import tap_cov as tcov

    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    pad = ((p, p), (p, p))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            tcov.tap_cov(a, (k, k), pad, compute_dtype=jnp.float32)
        )
    x = np.asarray(
        fops.extract_patches(a, (k, k), (1, 1), pad)
    ).reshape(-1, k * k * c)
    want = x.T @ x
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    # exact block symmetry by construction
    np.testing.assert_allclose(got, got.T, rtol=0, atol=0)


def test_tap_cov_supported_gate():
    from kfac_pytorch_tpu.ops.pallas import tap_cov as tcov

    assert tcov.supported((2, 8, 8, 128), (3, 3), (1, 1))
    assert not tcov.supported((2, 8, 8, 128), (3, 3), (2, 2))  # stride
    assert not tcov.supported((2, 8, 8, 64), (3, 3), (1, 1))   # lanes
    assert not tcov.supported((2, 8, 8, 128), (1, 1), (1, 1))  # 1x1
    # large-c: Mosaic compile blow-up on this environment + measured loss
    assert not tcov.supported((2, 7, 7, 256), (3, 3), (1, 1))


def test_compute_a_conv_auto_dispatch():
    """impl='auto' routes by the measured rows/channels policy and always
    computes the same factor as the XLA path (on CPU both branches lower
    to XLA, so this checks routing is at least value-transparent), and the
    policy itself picks pallas exactly for the traffic-bound geometries."""
    from kfac_pytorch_tpu.ops import factors as F

    rng = np.random.RandomState(3)
    for (b, h, w, c) in [(32, 56, 56, 64), (32, 28, 28, 128)]:
        a = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        pad = F.resolve_conv_padding("SAME", (h, w), (3, 3), (1, 1))
        got = np.asarray(
            F.compute_a_conv(a, (3, 3), (1, 1), pad, True, impl="auto")
        )
        want = np.asarray(
            F.compute_a_conv(a, (3, 3), (1, 1), pad, True, impl="xla")
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # the routing decision itself (rows >= 70*c): the traffic-bound RN50
    # geometries go pallas, the small-spatial ones stay XLA
    assert 32 * 56 * 56 >= 70 * 64
    assert 32 * 28 * 28 >= 70 * 128
    assert 32 * 14 * 14 < 70 * 256


def test_compute_a_conv_taps_impl_matches_xla():
    """compute_a_conv(impl='taps') == XLA path incl. scaling + bias row
    (forced through the kernel in interpret mode via a fake tpu check)."""
    from kfac_pytorch_tpu.ops.pallas import tap_cov as tcov

    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.randn(2, 8, 8, 128).astype(np.float32))
    want = np.asarray(
        fops.compute_a_conv(a, (3, 3), (1, 1), ((1, 1), (1, 1)), True)
    )
    import unittest.mock as mock

    with pltpu.force_tpu_interpret_mode():
        with mock.patch.object(jax, "default_backend", return_value="tpu"):
            got = fops.compute_a_conv(
                a, (3, 3), (1, 1), ((1, 1), (1, 1)), True, impl="taps"
            )
    # bf16 GEMM inputs in the kernel vs f32 XLA: loose tolerance
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize(
    "b,h,w,c,k,s,p",
    [
        # RN50 stem geometry (scaled down): 7x7 stride-2 pad-3, c=3
        (2, 15, 15, 3, 7, 2, 3),
        # Inception/MobileNet-style 3x3 stride-2 stem
        (2, 14, 14, 3, 3, 2, 1),
        # stride-2 with c already sublane-aligned (no channel padding)
        (1, 12, 12, 8, 3, 2, 1),
        # anisotropic strides
        (2, 13, 11, 4, 5, (2, 1), 2),
    ],
)
def test_patch_cov_polyphase_matches_materialized(b, h, w, c, k, s, p):
    """The polyphase transform (strided im2col -> unit-stride im2col of
    the phase-packed tensor + feature gather) must reproduce the
    materialized strided X^T X exactly."""
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    s = (s, s) if isinstance(s, int) else s
    pad = ((p, p), (p, p))
    assert pcov.polyphase_supported((b, h, w, c), (k, k), s, pad)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            pcov.patch_cov_polyphase(a, (k, k), s, pad,
                                     compute_dtype=jnp.float32)
        )
    x = np.asarray(
        fops.extract_patches(a, (k, k), s, pad)
    ).reshape(-1, k * k * c)
    np.testing.assert_allclose(got, x.T @ x, rtol=1e-5, atol=1e-4)


def test_polyphase_gates():
    # unit stride: not a polyphase case (the direct kernels own it)
    assert not pcov.polyphase_supported((2, 8, 8, 64), (3, 3), (1, 1))
    # The real RN50 stem packs to cpk=16 — 8x lane padding makes its
    # input blocks 7.1 MB/buffer and the kernel 19.6 MB scoped VMEM
    # (measured compile failure on v5e's 16 MB limit) — so the gate
    # must REJECT it now that _pad_bytes models Mosaic tile padding.
    assert not pcov.polyphase_supported(
        (32, 224, 224, 3), (7, 7), (2, 2), ((3, 3), (3, 3))
    )
    # lane-friendly packed channels (cpk = 4c, 128-multiple) stay
    # feasible for explicit opt-in
    assert pcov.polyphase_supported(
        (32, 56, 56, 128), (3, 3), (2, 2), ((1, 1), (1, 1))
    )
    # 'auto' never routes strided layers to polyphase (3.16x wasted
    # Gram flops at k3-s2) — the stem stays on the XLA path
    impl = fops.resolve_a_conv_impl(
        (32, 224, 224, 3), (7, 7), (2, 2), ((3, 3), (3, 3)), "auto"
    )
    assert impl == "xla"
    impl = fops.resolve_a_conv_impl(
        (32, 56, 56, 128), (3, 3), (2, 2), ((1, 1), (1, 1)), "auto"
    )
    assert impl == "xla"
    # explicit 'pallas' on a lane-friendly strided layer opts in to the
    # polyphase route on TPU (falls back to xla elsewhere)
    impl = fops.resolve_a_conv_impl(
        (32, 56, 56, 128), (3, 3), (2, 2), ((1, 1), (1, 1)), "pallas"
    )
    assert impl == ("pallas_poly" if jax.default_backend() == "tpu"
                    else "xla")
