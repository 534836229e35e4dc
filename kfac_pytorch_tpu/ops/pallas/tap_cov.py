"""Tap-pair patch covariance for conv K-FAC A-factors (Pallas, TPU).

Second-generation fused A-factor kernel. The first generation
(ops/pallas/patch_cov.py) assembled the full im2col row block X_cat in
VMEM scratch and issued one (N, D)^T (N, c_chunk) MXU dot per 128-wide
output column chunk — measured on a v5e it LOSES to XLA's
materialize-then-GEMM (factor stage 16.3 ms -> ~32 ms): X_cat is
re-assembled for every column chunk (D/128 times, ~36x for D=4608), and
the assembly strided-copies dominate.

This kernel exploits the block structure of the patch covariance instead.
With taps t = (i, j) in the kh x kw kernel window and windows
W_t = a_pad[:, i : i+oh, j : j+ow, :] (stride 1), the A factor is a
T x T grid of C x C blocks

    A[t1, t2] = W_t1^T W_t2          (T = kh*kw, reshaped to (N, C))

and A[t2, t1] = A[t1, t2]^T — so only the T(T+1)/2 upper pairs need
computing (a 45% FLOP cut at 3x3), and no patch matrix ever exists: each
grid step keeps one activation tile resident in VMEM and loops over a
static chunk of tap pairs, reading both windows straight from the tile
into one MXU dot each. The lower triangle is mirrored outside the kernel
with one batched block-transpose.

This is the tcmm f_gemm_ex analogue done the TPU way (reference
/root/reference/packages/tcmm/src/tcmm_kernel.cu:125-157 pairs a separate
im2col with a tensor-core GEMM; here the im2col never happens).

Restrictions (gated by supported()): stride (1, 1) — strided window reads
lower to tpu.strided_load which Mosaic rejects for non-128 base memrefs —
and C a multiple of 128 (the dot's lane dim); other conv geometries keep
the XLA path, which is fastest for them anyway (small C => small D).
"""

from __future__ import annotations

import functools
import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PadPairs = Tuple[Tuple[int, int], Tuple[int, int]]

# VMEM working-set budgets (bytes). v5e has ~16 MB/core and Pallas
# double-buffers the input tile; keep tile + out chunk + window temps
# comfortably under half.
_TILE_BUDGET = 4 * 1024 * 1024
_OUT_BUDGET = 4 * 1024 * 1024


def upper_pairs(n_taps: int) -> List[Tuple[int, int]]:
    return [(t1, t2) for t1 in range(n_taps) for t2 in range(t1, n_taps)]


def _kernel(a_ref, out_ref, *, pairs, taps, oh, ow, c, n_rows):
    """One grid step: accumulate this chunk's tap-pair blocks from one
    activation tile. Windows are plain static slices of the resident tile;
    identical slices across pairs CSE away."""
    nb = pl.program_id(0)

    def win(t):
        i, j = taps[t]
        w = a_ref[:, i : i + oh, j : j + ow, :]
        return w.reshape(n_rows, c)

    for p, (t1, t2) in enumerate(pairs):
        acc = jax.lax.dot_general(
            win(t1),
            win(t2),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(nb == 0)
        def _(acc=acc, p=p):
            out_ref[p] = acc

        @pl.when(nb != 0)
        def _(acc=acc, p=p):
            out_ref[p] += acc


def _pick_b_chunk(b: int, hp: int, wp: int, c: int, itemsize: int = 2) -> int:
    """Largest batch chunk dividing b with the activation tile under the
    VMEM tile budget (the tile is double-buffered by the pipeline)."""
    best = 1
    for bc in range(1, b + 1):
        if b % bc:
            continue
        if bc * hp * wp * c * itemsize <= _TILE_BUDGET:
            best = bc
    return best


def supported(a_shape, kernel_size, strides=(1, 1)) -> bool:
    """Unit-stride multi-tap convs with lane-aligned channels, c <= 128.

    The c cap is a measured Mosaic limit on this environment: at c=256
    the per-pair window dots blow up compile memory (chunk<=8 OOM-kills
    the compile helper; chunk=1 fails outright), and at the sizes that DO
    compile the kernel only ties/loses to the XLA path (bench_ops
    --op factor_a), so large-c support is not worth chasing."""
    _, _, _, c = a_shape
    kh, kw = kernel_size
    if kh * kw == 1 or c % 128 != 0 or c > 128:
        return False
    if tuple(strides) != (1, 1):
        return False
    return True


@functools.partial(
    jax.jit, static_argnames=("kernel_size", "padding", "compute_dtype")
)
def tap_cov(
    a: jax.Array,
    kernel_size: Tuple[int, int],
    padding: PadPairs,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Raw patch covariance X^T X via upper tap-pair GEMMs (stride 1).

    a: (B, H, W, C) float32 NHWC. Returns (D, D) float32, D = kh*kw*C,
    feature order (kh, kw, c) — identical to extract_patches(...) summed
    as X^T X at ``compute_dtype`` GEMM-input precision (f32 accumulation).
    """
    kh, kw = kernel_size
    (ph0, ph1), (pw0, pw1) = padding
    if ph0 or ph1 or pw0 or pw1:
        a = jnp.pad(a, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    a = a.astype(compute_dtype)
    b, hp, wp, c = a.shape
    oh = hp - kh + 1
    ow = wp - kw + 1
    n_taps = kh * kw
    taps = [(i, j) for i in range(kh) for j in range(kw)]
    pairs = upper_pairs(n_taps)

    bc = _pick_b_chunk(b, hp, wp, c, jnp.dtype(compute_dtype).itemsize)
    n_b = b // bc
    n_rows = bc * oh * ow

    # chunk pairs so each call's resident output block fits VMEM; group by
    # t1 (pairs are generated t1-major) so window reads CSE within a chunk.
    # Also cap the unrolled dot count per kernel: Mosaic compile memory
    # grows superlinearly in unrolled window-reshape dots (16 pairs at
    # c=256 OOM-killed the remote compile helper; 8 is safe)
    chunk = max(1, min(_OUT_BUDGET // (c * c * 4),
                       int(os.environ.get("KFAC_TAP_CHUNK", "8"))))
    blocks = []
    for start in range(0, len(pairs), chunk):
        chunk_pairs = pairs[start : start + chunk]
        kernel = functools.partial(
            _kernel, pairs=chunk_pairs, taps=taps, oh=oh, ow=ow, c=c,
            n_rows=n_rows,
        )
        out = pl.pallas_call(
            kernel,
            grid=(n_b,),
            in_specs=[
                pl.BlockSpec(
                    (bc, hp, wp, c), lambda nb: (nb, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (len(chunk_pairs), c, c), lambda nb: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (len(chunk_pairs), c, c), jnp.float32
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * oh * ow * c * c * len(chunk_pairs),
                bytes_accessed=b * hp * wp * c
                * jnp.dtype(compute_dtype).itemsize,
                transcendentals=0,
            ),
        )(a)
        blocks.append(out)
    upper = jnp.concatenate(blocks)  # (P, C, C)

    # scatter into the (T, T, C, C) block grid and mirror the lower
    # triangle: A[t2, t1] = A[t1, t2]^T
    iu = np.array([p[0] for p in pairs])
    ju = np.array([p[1] for p in pairs])
    grid4 = jnp.zeros((n_taps, n_taps, c, c), jnp.float32)
    grid4 = grid4.at[iu, ju].set(upper)
    strict = grid4.at[np.arange(n_taps), np.arange(n_taps)].set(0.0)
    full = grid4 + jnp.transpose(strict, (1, 0, 3, 2))
    d = n_taps * c
    return jnp.transpose(full, (0, 2, 1, 3)).reshape(d, d)
