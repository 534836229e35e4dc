"""Unit tests for Kronecker-factor statistics vs independent NumPy math."""

import numpy as np
import pytest
import jax.numpy as jnp

from kfac_pytorch_tpu.ops import factors as F


def naive_patches(x, kernel_size, strides, padding):
    """Straight-loop im2col ground truth (NHWC, (kh, kw, c) ordering)."""
    kh, kw = kernel_size
    sh, sw = strides
    (ph0, ph1), (pw0, pw1) = padding
    x = np.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    b, hh, ww, c = x.shape
    oh = (hh - kh) // sh + 1
    ow = (ww - kw) // sw + 1
    out = np.zeros((b, oh, ow, kh * kw * c), dtype=x.dtype)
    for bi in range(b):
        for i in range(oh):
            for j in range(ow):
                patch = x[bi, i * sh : i * sh + kh, j * sw : j * sw + kw, :]
                out[bi, i, j] = patch.reshape(-1)
    return out


@pytest.mark.parametrize(
    "shape,ks,st,pad",
    [
        ((2, 8, 8, 3), (3, 3), (1, 1), ((1, 1), (1, 1))),
        ((3, 9, 7, 4), (3, 2), (2, 2), ((0, 0), (1, 1))),
        ((1, 5, 5, 2), (1, 1), (1, 1), ((0, 0), (0, 0))),
        ((2, 11, 11, 3), (5, 5), (3, 3), ((2, 2), (2, 2))),
    ],
)
def test_extract_patches(shape, ks, st, pad):
    rng = np.random.RandomState(0)
    x = rng.randn(*shape).astype(np.float32)
    got = np.asarray(F.extract_patches(jnp.asarray(x), ks, st, pad))
    want = naive_patches(x, ks, st, pad)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_resolve_conv_padding_same():
    # SAME for 3x3 stride 1 on any size -> (1,1) pads
    assert F.resolve_conv_padding("SAME", (32, 32), (3, 3), (1, 1)) == (
        (1, 1),
        (1, 1),
    )
    # SAME for stride 2: 32 -> 16 out, total pad = 15*2+3-32 = 1
    assert F.resolve_conv_padding("SAME", (32, 32), (3, 3), (2, 2)) == (
        (0, 1),
        (0, 1),
    )
    assert F.resolve_conv_padding("VALID", (8, 8), (3, 3), (1, 1)) == (
        (0, 0),
        (0, 0),
    )
    assert F.resolve_conv_padding(2, (8, 8), (3, 3), (1, 1)) == ((2, 2), (2, 2))


def test_compute_a_dense_2d():
    rng = np.random.RandomState(1)
    a = rng.randn(16, 5).astype(np.float32)
    got = np.asarray(F.compute_a_dense(jnp.asarray(a), has_bias=True))
    aa = np.concatenate([a, np.ones((16, 1), np.float32)], axis=1)
    want = aa.T @ (aa / 16)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    got_nb = np.asarray(F.compute_a_dense(jnp.asarray(a), has_bias=False))
    np.testing.assert_allclose(got_nb, a.T @ (a / 16), rtol=1e-5, atol=1e-6)


def test_compute_a_dense_seq():
    """(B, T, D) inputs are mean-reduced over tokens first."""
    rng = np.random.RandomState(2)
    a = rng.randn(4, 7, 5).astype(np.float32)
    got = np.asarray(F.compute_a_dense(jnp.asarray(a), has_bias=True))
    am = a.mean(axis=1)
    aa = np.concatenate([am, np.ones((4, 1), np.float32)], axis=1)
    want = aa.T @ (aa / 4)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_compute_a_conv():
    rng = np.random.RandomState(3)
    a = rng.randn(2, 6, 6, 3).astype(np.float32)
    ks, st, pad = (3, 3), (1, 1), ((1, 1), (1, 1))
    got = np.asarray(
        F.compute_a_conv(jnp.asarray(a), ks, st, pad, has_bias=True)
    )
    p = naive_patches(a, ks, st, pad)
    spatial = p.shape[1] * p.shape[2]
    v = p.reshape(-1, p.shape[-1])
    v = np.concatenate([v, np.ones((v.shape[0], 1), np.float32)], axis=1)
    v = v / spatial  # bias column divided too (reference utils.py:92-93)
    want = v.T @ (v / 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_compute_g_dense():
    rng = np.random.RandomState(4)
    g = rng.randn(8, 6).astype(np.float32)
    got = np.asarray(F.compute_g_dense(jnp.asarray(g), batch_averaged=True))
    gs = g * 8
    want = gs.T @ (gs / 8)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    got2 = np.asarray(F.compute_g_dense(jnp.asarray(g), batch_averaged=False))
    np.testing.assert_allclose(got2, g.T @ (g / 8), rtol=1e-5, atol=1e-6)


def test_compute_g_dense_seq():
    rng = np.random.RandomState(5)
    g = rng.randn(4, 9, 6).astype(np.float32)
    got = np.asarray(F.compute_g_dense(jnp.asarray(g), batch_averaged=True))
    gm = g.mean(axis=1) * 4
    want = gm.T @ (gm / 4)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_compute_g_conv():
    rng = np.random.RandomState(6)
    g = rng.randn(2, 4, 4, 5).astype(np.float32)
    got = np.asarray(F.compute_g_conv(jnp.asarray(g), batch_averaged=True))
    spatial = 16
    v = g.reshape(-1, 5) * 2 * spatial
    want = v.T @ (v / v.shape[0])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ema_update():
    new = jnp.ones((3, 3))
    cur = jnp.zeros((3, 3))
    out = F.ema_update(new, cur, 0.95)
    np.testing.assert_allclose(np.asarray(out), 0.95 * np.ones((3, 3)))
    out2 = F.ema_update(new, jnp.eye(3), 0.95)
    np.testing.assert_allclose(
        np.asarray(out2), 0.95 * np.ones((3, 3)) + 0.05 * np.eye(3)
    )


@pytest.mark.parametrize("d,k", [(1152, 2), (1280, 4), (1100, 2), (1024, 3)])
def test_sym_gram_matches_full(d, k):
    """Block-triangular Gram == single-GEMM Gram (incl. uneven last chunk)."""
    rng = np.random.RandomState(7)
    v = jnp.asarray(rng.randn(37, d).astype(np.float32))
    full = np.asarray(F._gram(v, None, sym_k=0))
    sym = np.asarray(F._gram(v, None, sym_k=k))
    np.testing.assert_allclose(sym, full, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(sym, sym.T, rtol=0, atol=0)


def test_sym_gram_auto_gate():
    """Gate fires only on big-d, big-flop Grams (when enabled); the
    measured default is DISABLED (single-GEMM Gram fuses patch extraction,
    sym chunking loses — see factors._SYM_GRAM_MIN_FLOPS)."""
    assert F._SYM_GRAM_MIN_FLOPS == float("inf")
    assert F._sym_gram_k(6272, 2304) == 0       # disabled at default
    orig = F._SYM_GRAM_MIN_FLOPS
    F._SYM_GRAM_MIN_FLOPS = 1.0e10
    try:
        assert F._sym_gram_k(32, 512) == 0      # small d
        assert F._sym_gram_k(8, 4608) == 0      # big d, tiny rows
        assert F._sym_gram_k(6272, 2304) == 2   # RN50 c256 3x3 A factor
        assert F._sym_gram_k(1568, 4608) == 4   # RN50 c512 3x3 A factor
    finally:
        F._SYM_GRAM_MIN_FLOPS = orig


def test_cov_with_bias_sym_path():
    """compute_a_conv through the forced sym path == default, bias incl."""
    rng = np.random.RandomState(8)
    a = jnp.asarray(rng.randn(2, 6, 6, 128).astype(np.float32))
    want = np.asarray(
        F.compute_a_conv(a, (3, 3), (1, 1), ((1, 1), (1, 1)), True)
    )
    orig = F._SYM_GRAM_MIN_FLOPS
    F._SYM_GRAM_MIN_FLOPS = 1.0  # force the sym path (d=1152 >= 1024)
    try:
        got = np.asarray(
            F.compute_a_conv(a, (3, 3), (1, 1), ((1, 1), (1, 1)), True)
        )
    finally:
        F._SYM_GRAM_MIN_FLOPS = orig
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_compute_a_conv_spatial_stride_unbiased_form():
    """ss=2 must equal the naive estimator over the strided position
    subset with the 1/(T_full * t_sub * B) scaling (unbiased sampled-Gram
    form), and reduce exactly to the full computation at ss=1."""
    rng = np.random.RandomState(7)
    a = rng.randn(2, 8, 8, 3).astype(np.float32)
    ks, st, pad = (3, 3), (1, 1), ((1, 1), (1, 1))
    full = np.asarray(
        F.compute_a_conv(jnp.asarray(a), ks, st, pad, has_bias=True)
    )
    same = np.asarray(
        F.compute_a_conv(jnp.asarray(a), ks, st, pad, has_bias=True,
                         spatial_stride=1)
    )
    np.testing.assert_array_equal(full, same)
    got = np.asarray(
        F.compute_a_conv(jnp.asarray(a), ks, st, pad, has_bias=True,
                         spatial_stride=2)
    )
    p = naive_patches(a, ks, st, pad)
    t_full = p.shape[1] * p.shape[2]
    p = p[:, ::2, ::2]
    t_sub = p.shape[1] * p.shape[2]
    v = p.reshape(-1, p.shape[-1])
    v = np.concatenate([v, np.ones((v.shape[0], 1), np.float32)], axis=1)
    want = (v.T @ v) / (t_full * t_sub * a.shape[0])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_compute_g_conv_spatial_stride_unbiased_form():
    rng = np.random.RandomState(8)
    g = rng.randn(2, 8, 8, 5).astype(np.float32)
    got = np.asarray(
        F.compute_g_conv(jnp.asarray(g), batch_averaged=True,
                         spatial_stride=2)
    )
    t_full = 64
    gs = g[:, ::2, ::2].reshape(-1, 5)
    v = gs * 2 * t_full  # batch undo + FULL spatial scaling (estimator def)
    want = v.T @ (v / v.shape[0])  # divide by SAMPLED rows -> unbiased
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_spatial_stride_exact_when_position_stationary():
    """With VALID padding and spatially-constant activations every patch
    row is identical, so the subsampled estimator equals the full one
    EXACTLY (the clean unbiasedness case with no border effects)."""
    b, c = 3, 4
    base = np.random.RandomState(9).randn(b, 1, 1, c).astype(np.float32)
    a = np.broadcast_to(base, (b, 9, 9, c)).copy()
    ks, st, pad = (3, 3), (1, 1), ((0, 0), (0, 0))
    full = np.asarray(
        F.compute_a_conv(jnp.asarray(a), ks, st, pad, has_bias=True)
    )
    sub = np.asarray(
        F.compute_a_conv(jnp.asarray(a), ks, st, pad, has_bias=True,
                         spatial_stride=2)
    )
    np.testing.assert_allclose(sub, full, rtol=1e-5, atol=1e-6)
    gfull = np.asarray(F.compute_g_conv(jnp.asarray(a)))
    gsub = np.asarray(F.compute_g_conv(jnp.asarray(a), spatial_stride=3))
    np.testing.assert_allclose(gsub, gfull, rtol=1e-5, atol=1e-6)
