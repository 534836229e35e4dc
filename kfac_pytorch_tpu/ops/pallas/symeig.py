"""Batched symmetric eigendecomposition: Pallas one-sided Jacobi (TPU).

The native-kernel replacement for the reference's cuSOLVER symeig
(/root/reference/packages/tcmm/src/tcmm_kernel.cu:56-116, tcmm_symeig) and
the performance-critical stage of eigen K-FAC. XLA's QDWH ``eigh`` on a v5e
costs ~10ms @ 512 / ~34ms @ 1024 / ~123ms @ 2048 / ~955ms @ 4608 per
matrix; this kernel wins in the many-small-matrix regime of K-FAC factor
buckets (measured 1.9x at 512 single, 1.7x batched 8x512).

Algorithm: for SPD A, shift + Cholesky A + dI = L L^T (XLA, cheap), then
**one-sided Jacobi** on G = L^T: right rotations V orthogonalize column
pairs of G, giving A = V diag(w) V^T with w = squared column norms and d
subtracted exactly (the shift only translates the spectrum). Everything is
stored TRANSPOSED (sublane rows of the kernel state are columns of G), so
the kernel does only sublane-dimension ops — no transposes, no lane
shuffles:

  * pairs are aligned rows of the top/bottom half of the state,
  * pair dot products are row-wise lane reductions (VPU),
  * rotations are row-pair linear combinations (VPU),
  * the Brent-Luk round-robin tournament is a static slice+concat row
    rotation with order n-1, so after every full sweep rows return to their
    original positions (outputs need no unscrambling, and identity padding
    stays separated in the trailing rows),
Requirements: n divisible by 256 (``symeig_auto`` pads via identity
embedding); one matrix per program (measured faster than in-program
batching). ``symeig_auto`` dispatches Pallas vs XLA eigh by size.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Measured on v5e: Jacobi beats XLA QDWH up to ~512 (1.9x single, 1.7x
# batched); at 1024 XLA wins (0.8x). In-program batching (inner > 1) was
# measured SLOWER than one-matrix-per-program (VMEM pressure outweighs loop
# amortization), so inner stays 1.
MAX_PALLAS_DIM = 512


def _inner_batch_for(n: int) -> int:
    return 1


def _jacobi_kernel(g_ref, vt_ref, w_ref, *, n: int, sweeps: int, inner: int):
    """One program = ``inner`` matrices.

    g_ref (state, mutated in place): (inner, n, n), rows = columns of G.
    vt_ref: (inner, n, n) output, row i = eigenvector of w_ref[:, 0, i].
    w_ref: (inner, 8, n) output (8 identical sublane rows; wrapper reads 0).
    """
    n2 = n // 2

    # init V^T = I (rows 0..n2-1 in the top half, n2..n-1 in the bottom)
    row = jax.lax.broadcasted_iota(jnp.int32, (inner, n2, n), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (inner, n2, n), 2)
    vt_ref[:, 0:n2, :] = (col == row).astype(jnp.float32)
    vt_ref[:, n2:n, :] = (col == row + n2).astype(jnp.float32)

    def step(_, carry):
        del carry
        t_g = g_ref[:, 0:n2, :]
        b_g = g_ref[:, n2:n, :]
        t_v = vt_ref[:, 0:n2, :]
        b_v = vt_ref[:, n2:n, :]
        # pair Gram entries (lane reductions); pairs are (top[i], bot[i])
        bpp = jnp.sum(t_g * t_g, axis=2, keepdims=True)
        bqq = jnp.sum(b_g * b_g, axis=2, keepdims=True)
        bpq = jnp.sum(t_g * b_g, axis=2, keepdims=True)
        # Jacobi rotation zeroing this pair's Gram off-diagonal
        small = jnp.abs(bpq) < 1e-30
        safe_bpq = jnp.where(small, 1.0, bpq)
        tau = (bqq - bpp) / (2.0 * safe_bpq)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        c = jax.lax.rsqrt(1.0 + t * t)
        s = c * t
        c = jnp.where(small, 1.0, c)
        s = jnp.where(small, 0.0, s)
        new_t_g = c * t_g - s * b_g
        new_b_g = s * t_g + c * b_g
        new_t_v = c * t_v - s * b_v
        new_b_v = s * t_v + c * b_v
        # Brent-Luk tournament rotation (static slices; order n-1):
        #   top <- [top[0], bot[0], top[1:-1]];  bot <- [bot[1:], top[-1]]
        g_ref[:, 0:n2, :] = jnp.concatenate(
            [new_t_g[:, 0:1], new_b_g[:, 0:1], new_t_g[:, 1 : n2 - 1]], axis=1
        )
        g_ref[:, n2:n, :] = jnp.concatenate(
            [new_b_g[:, 1:n2], new_t_g[:, n2 - 1 : n2]], axis=1
        )
        vt_ref[:, 0:n2, :] = jnp.concatenate(
            [new_t_v[:, 0:1], new_b_v[:, 0:1], new_t_v[:, 1 : n2 - 1]], axis=1
        )
        vt_ref[:, n2:n, :] = jnp.concatenate(
            [new_b_v[:, 1:n2], new_t_v[:, n2 - 1 : n2]], axis=1
        )
        return 0

    jax.lax.fori_loop(0, sweeps * (n - 1), step, 0)

    # after integer sweeps the seating is back in original order
    g_fin = g_ref[...]
    w = jnp.sum(g_fin * g_fin, axis=2)  # (inner, n)
    w_ref[...] = jnp.broadcast_to(w[:, None, :], (inner, 8, n))


def _jacobi_from_chol(l_batched: jax.Array, sweeps: int):
    """(B, n, n) lower-Cholesky factors -> (w (B, n), vt (B, n, n)).

    Rows of the state are columns of G = L^T, i.e. the state IS L's rows.
    """
    b, n, _ = l_batched.shape
    inner = _inner_batch_for(n)
    b_pad = ((b + inner - 1) // inner) * inner
    if b_pad != b:
        pad = jnp.broadcast_to(jnp.eye(n), (b_pad - b, n, n))
        l_batched = jnp.concatenate([l_batched, pad], axis=0)
    kernel = functools.partial(
        _jacobi_kernel, n=n, sweeps=sweeps, inner=inner
    )
    vt, w = pl.pallas_call(
        kernel,
        grid=(b_pad // inner,),
        in_specs=[
            pl.BlockSpec((inner, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((inner, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((inner, 8, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, n, n), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 8, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=b_pad * sweeps * (n - 1) * 7 * n,
            bytes_accessed=b_pad * n * n * 8,
            transcendentals=b_pad * sweeps * (n - 1) * n,
        ),
    )(l_batched)
    return w[:b, 0, :], vt[:b]


def jacobi_symeig(
    a: jax.Array, *, sweeps: int = 10, shift_scale: float = 1e-6
) -> Tuple[jax.Array, jax.Array]:
    """Batched SPD symmetric eigendecomposition via Pallas one-sided Jacobi.

    a: (..., n, n) symmetric PSD, n divisible by 256.
    Returns (w, v) with v[..., :, i] the eigenvector of w[..., i] — same
    layout as jnp.linalg.eigh but WITHOUT sorted eigenvalue order (K-FAC's
    eigen-basis preconditioning is order-invariant).
    """
    orig_shape = a.shape
    n = a.shape[-1]
    if n % 256 != 0:
        raise ValueError(f"jacobi_symeig needs n % 256 == 0, got {n}")
    a = a.astype(jnp.float32).reshape(-1, n, n)
    # shift so Cholesky is safe on PSD inputs; subtracted exactly below
    tr = jnp.trace(a, axis1=-2, axis2=-1)
    delta = shift_scale * tr / n + 1e-12
    shifted = a + delta[:, None, None] * jnp.eye(n, dtype=a.dtype)
    l = jnp.linalg.cholesky(shifted)
    w, vt = _jacobi_from_chol(l, sweeps)
    w = w - delta[:, None]
    v = jnp.swapaxes(vt, -2, -1)  # columns = eigenvectors
    return w.reshape(orig_shape[:-1]), v.reshape(orig_shape)


def pad_to_supported(n: int) -> int:
    """Smallest Pallas-supported padded dim >= n."""
    return ((n + 255) // 256) * 256


def symeig_auto(
    x: jax.Array, eps: float = 1e-10, *, sweeps: int = 10,
    max_pallas_dim: int = MAX_PALLAS_DIM,
) -> Tuple[jax.Array, jax.Array]:
    """Clamped symeig dispatching Pallas Jacobi (n <= max_pallas_dim, with
    identity padding to a multiple of 256) or XLA eigh (larger sizes).
    Drop-in replacement for ops.linalg.symeig."""
    n = x.shape[-1]
    if n <= max_pallas_dim:
        n_pad = pad_to_supported(n)
        if n_pad != n:
            batch = x.shape[:-2]
            eye = jnp.eye(n_pad, dtype=jnp.float32)
            padded = jnp.broadcast_to(eye, batch + (n_pad, n_pad))
            padded = padded.at[..., :n, :n].set(x)
            w, v = jacobi_symeig(padded, sweeps=sweeps)
            # identity padding has exactly-zero cross Gram entries with the
            # real block, so pad eigenpairs stay in the trailing positions
            w = w[..., :n]
            v = v[..., :n, :n]
        else:
            w, v = jacobi_symeig(x, sweeps=sweeps)
        w = w * (w > eps).astype(w.dtype)
        return w, v
    from kfac_pytorch_tpu.ops.linalg import symeig

    return symeig(x, eps)
