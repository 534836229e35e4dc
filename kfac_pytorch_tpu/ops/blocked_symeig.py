"""Blocked one-sided Jacobi eigendecomposition for large K-FAC factors.

The round-1 Pallas one-sided Jacobi (ops/pallas/symeig.py) is VPU-bound
(rotation work ~ n^3 per sweep at ~1 elementwise-TFLOP/s) and loses to XLA's
QDWH ``eigh`` above ~512. This module is the large-dim kernel: a BLOCKED
one-sided Jacobi whose heavy work — column-block Gram matrices and block
rotations — is batched (pairs, n, 2b) x (pairs, 2b, 2b) matmuls on the MXU,
with only a small (pairs, 2b, 2b) inner eigenproblem per round, solved
either by the existing Pallas kernel (early sweeps) or by a first-order
perturbative rotation + Newton-Schulz orthonormalization (late sweeps, when
the Gram blocks are already near-diagonal — all matmuls, no rotations).

This is the TPU-native equivalent of the reference's cuSOLVER ``syevd``
(tcmm_symeig, /root/reference/packages/tcmm/src/tcmm_kernel.cu:56-116),
which serves all factor sizes: XLA eigh costs ~955ms at dim 4608 on a v5e
(BENCH_NOTES.md) where the FLOP count (~30 n^3) is worth ~15ms at MXU rate —
QDWH's QR factorizations dominate. Blocked Jacobi replaces them with plain
batched GEMMs.

Algorithm (for SPD A):
  A + dI = L L^T (Cholesky; d ~ 1e-6 tr/n, subtracted exactly at the end)
  one-sided Jacobi on G = L^T: find orthogonal V with GV's columns
  orthogonal => A = V diag(w) V^T, w = squared column norms of GV.
  Columns are processed in k = n/b blocks; each round pairs up blocks
  (Brent-Luk round-robin seating, k-1 rounds per sweep), computes the pair's
  2b x 2b Gram S = U^T U, diagonalizes S = R D R^T (the inner solve), and
  applies R to the pair's columns of both GV and V.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from kfac_pytorch_tpu.ops.pallas.symeig import jacobi_symeig


def _perturb_rotation(s: jax.Array, ns_iters: int = 2,
                      precision=None) -> jax.Array:
    """Approximate orthogonal R diagonalizing near-diagonal symmetric S.

    First-order eigenvector perturbation: X_ij = S_ij / (S_jj - S_ii)
    (skew-symmetric for symmetric S), gap-clamped, then Newton-Schulz
    orthonormalization R <- R (3I - R^T R)/2 — matmuls only. Near-degenerate
    pairs (|gap| below tol * scale) are left unrotated: within-cluster
    mixing only delays convergence there, while the clamp keeps R well
    conditioned.
    """
    d = jnp.diagonal(s, axis1=-2, axis2=-1)  # (..., m)
    gap = d[..., None, :] - d[..., :, None]  # gap[i,j] = d_j - d_i
    scale = jnp.max(jnp.abs(d), axis=-1, keepdims=True)[..., None] + 1e-30
    tol = 0.01
    safe = jnp.abs(gap) > tol * scale
    x = jnp.where(safe, s / jnp.where(safe, gap, 1.0), 0.0)
    x = jnp.clip(x, -0.25, 0.25)
    m = s.shape[-1]
    eye = jnp.eye(m, dtype=s.dtype)
    x = x * (1.0 - eye)  # zero diagonal
    # bound the OPERATOR norm (||X||_2 <= ||X||_inf): elementwise clipping
    # alone lets many saturated entries push I+X far from orthogonal, and
    # Newton-Schulz diverges outside sigma in (0, sqrt 3). A uniformly
    # scaled-down X is still a descent rotation, just smaller.
    row_sum = jnp.max(jnp.sum(jnp.abs(x), axis=-1), axis=-1)
    shrink = jnp.minimum(1.0, 0.3 / (row_sum + 1e-30))
    x = x * shrink[..., None, None]
    r = eye + x
    mm = lambda a_, b_: jnp.matmul(a_, b_, precision=precision,
                                   preferred_element_type=jnp.float32)
    for _ in range(ns_iters):
        rtr = mm(jnp.swapaxes(r, -2, -1), r)
        r = mm(r, 1.5 * eye - 0.5 * rtr)
    return r


def _align_to_identity(r: jax.Array) -> jax.Array:
    """Post-multiply an orthogonal R by a signed permutation so it is as
    identity-like as possible.

    Cyclic Jacobi convergence requires rotations bounded away from
    permutations (the scalar algorithm's |angle| <= pi/4 rule); an
    eigh-based inner solve returns eigenvectors in eigenvalue-sorted order,
    which near convergence degenerates to a pure sorting permutation — the
    sweep then reshuffles columns forever instead of annihilating the
    remaining off-diagonal mass (a measured limit cycle, not a theoretical
    nicety). Choosing column order by per-row argmax undoes the sort
    exactly in the near-permutation regime; when the argmax map is not a
    bijection (far from convergence, where sloshing is not a concern) R is
    returned unchanged.
    """
    m = r.shape[-1]
    idx = jnp.argmax(jnp.abs(r), axis=-1)  # row i -> dominant column j*(i)
    sign = jnp.sign(
        jnp.take_along_axis(r, idx[..., None], axis=-1)[..., 0]
    )
    p = jax.nn.one_hot(idx, m, dtype=r.dtype) * sign[..., None]
    valid = jnp.all(
        jnp.sum(jnp.abs(p), axis=-2) == 1, axis=-1, keepdims=True
    )[..., None]
    aligned = jnp.einsum("...aj,...ij->...ai", r, p)
    return jnp.where(valid, aligned, r)


def _inner_rotation(s: jax.Array, inner_sweeps: int,
                    precision=None) -> jax.Array:
    """Orthogonal R (approximately) diagonalizing the SPD Gram blocks S.

    inner_sweeps > 0: the Pallas one-sided Jacobi kernel (exact for enough
    sweeps; returns unsorted, identity-like rotations by construction);
    0: the perturbative all-matmul rotation; < 0: batched XLA eigh
    (exact — cheap at 2b x 2b scale, and the CPU/test fallback), aligned to
    the identity to avoid the sorting limit cycle.
    """
    if inner_sweeps > 0:
        _, r = jacobi_symeig(s, sweeps=inner_sweeps)
        return r
    if inner_sweeps < 0:
        return _align_to_identity(jnp.linalg.eigh(s)[1])
    return _perturb_rotation(s, precision=precision)


def symeig_blocked_padded(
    x: jax.Array,
    eps: float = 1e-10,
    *,
    block: int = 128,
    inner_schedule: Optional[Sequence[int]] = None,
    precision=None,
) -> Tuple[jax.Array, jax.Array]:
    """Clamped blocked-Jacobi symeig with identity padding to a multiple of
    2*block (drop-in for ops.linalg.symeig; identity padding keeps real
    eigenpairs exact — pad columns have zero Gram coupling to the real
    block, see ops/pallas/symeig.symeig_auto)."""
    n = x.shape[-1]
    step = max(2 * block, 256)
    n_pad = ((n + step - 1) // step) * step
    if n_pad != n:
        # Pad with c*I, c above the Gershgorin bound of x: pad columns have
        # zero Gram coupling with the real block (never rotated into it),
        # and pad eigenvalues strictly exceed every real one, so the real
        # eigenpairs are exactly the n smallest — selected by value, which
        # is robust to the position shuffling a sorting (eigh) inner solve
        # can introduce (unlike truncation by position).
        batch = x.shape[:-2]
        x32 = x.astype(jnp.float32)
        gersh = jnp.max(jnp.sum(jnp.abs(x32), axis=-1), axis=-1)
        c = 1.05 * gersh + 1.0
        eye = jnp.eye(n_pad, dtype=jnp.float32)
        padded = c[..., None, None] * jnp.broadcast_to(
            eye, batch + (n_pad, n_pad)
        )
        padded = padded.at[..., :n, :n].set(x32)
        w, v = blocked_jacobi_symeig(
            padded, block=block, inner_schedule=inner_schedule,
            precision=precision,
        )
        idx = jnp.argsort(w, axis=-1)[..., :n]
        w = jnp.take_along_axis(w, idx, axis=-1)
        v = jnp.take_along_axis(v, idx[..., None, :], axis=-1)[..., :n, :]
    else:
        w, v = blocked_jacobi_symeig(
            x, block=block, inner_schedule=inner_schedule,
            precision=precision,
        )
    w = w * (w > eps).astype(w.dtype)
    return w, v


def tracking_symeig_update(
    a: jax.Array,
    v_prev: jax.Array,
    *,
    iters: int = 2,
    precision=jax.lax.Precision.HIGHEST,
    eps: float = 1e-10,
) -> Tuple[jax.Array, jax.Array]:
    """Online eigendecomposition TRACKING for slowly-varying SPD matrices.

    K-FAC factors evolve by EMA (new = 0.05*fresh + 0.95*old, reference
    utils.py:66-71) and START at identity (inv.py:84-90) — whose eigenbasis
    is known exactly. So the eigendecomposition never has to be computed
    cold: carry (w, V) in the optimizer state and, each refresh, rotate the
    basis to follow the factor. B = V^T A V is near-diagonal (off-diagonal
    ~ the EMA step), so one or two first-order perturbation rotations
    (matmuls only — _perturb_rotation) re-diagonalize it. Per refresh this
    costs ~6 n^3-matmuls vs XLA eigh's ~955ms at n=4608 — the
    eigendecomposition becomes an O(matmul) streaming computation, which is
    the TPU-native answer to cuSOLVER syevd (tcmm_kernel.cu:56-116).

    Near-degenerate eigenvalue pairs keep some coupling (the perturbation
    clamp); for K-FAC this is benign — the preconditioner applies a smooth
    function of (w, V), invariant under within-cluster mixing. (Online
    decomposition updates for K-FAC factors have published precedent —
    "Brand New K-FACs: Speeding up K-FAC with Online Decomposition
    Updates", arXiv:2210.08494 — this formulation is matmul-only and
    designed for the MXU.)

    a: (..., n, n) current factor; v_prev (..., n, n) the carried basis.
    Returns (w, v) with eps-clamping matching ops.linalg.symeig.
    """
    mm = lambda x, y: jnp.matmul(x, y, precision=precision,
                                 preferred_element_type=jnp.float32)
    v = v_prev
    b = mm(mm(jnp.swapaxes(v, -2, -1), a), v)
    for _ in range(iters):
        r = _perturb_rotation(b, precision=precision)
        v = mm(v, r)
        b = mm(mm(jnp.swapaxes(r, -2, -1), b), r)
    # one Newton-Schulz pass keeps V orthonormal against drift accumulation
    n = v.shape[-1]
    eye = jnp.eye(n, dtype=v.dtype)
    vtv = mm(jnp.swapaxes(v, -2, -1), v)
    v = mm(v, 1.5 * eye - 0.5 * vtv)
    w = jnp.diagonal(b, axis1=-2, axis2=-1)
    w = w * (w > eps).astype(w.dtype)
    return w, v


def default_inner_schedule(n: int, block: int) -> Tuple[int, ...]:
    """Sweep schedule scaled to the block count k = n/block.

    MEASURED (round 2, CPU exact-inner): convergence of the parallel
    (Brent-Luk) block ordering needs roughly k + 2 sweeps — k=4 converges in
    6, k=8 in 10 — a known property of static parallel orderings (sequential
    or dynamic orderings converge in O(1) sweeps but serialize). The
    schedule spends exact inner solves early and perturbative (all-matmul)
    polish late.
    """
    k = max(n // block, 2)
    exact = max(k, 4)
    return (4, 2) + (1,) * (exact - 2) + (0, 0)


def blocked_jacobi_symeig(
    a: jax.Array,
    *,
    block: int = 128,
    inner_schedule: Optional[Sequence[int]] = None,
    shift_scale: float = 1e-6,
    precision=None,
    final_precision=jax.lax.Precision.HIGHEST,
) -> Tuple[jax.Array, jax.Array]:
    """Batched SPD eigendecomposition via blocked one-sided Jacobi.

    a: (..., n, n) SPD, n divisible by 2*block and by 256 (the inner Pallas
    kernel's tiling; use symeig_auto for identity padding).
    inner_schedule: one entry per outer sweep — Pallas inner-sweep count
    (> 0), 0 for the perturbative rotation (cheap, valid once
    near-diagonal), < 0 for batched XLA eigh (exact; CPU fallback). None =
    default_inner_schedule(n, block) — note the sweep count grows ~ n/block
    (parallel-ordering property), which caps this kernel's win to moderate
    dims; the production large-dim path is the tracking refresh below.
    precision: matmul precision of the Gram/update GEMMs (None = default =
    bf16 MXU passes with f32 accumulation); the final sweep and the
    eigenvalue extraction run at ``final_precision``.

    Returns (w, v), jnp.linalg.eigh layout (columns of v are eigenvectors),
    eigenvalues unsorted (K-FAC's use is order-invariant).
    """
    orig_shape = a.shape
    n = a.shape[-1]
    b = block
    if n % (2 * b) != 0:
        raise ValueError(f"n={n} must be divisible by 2*block={2*b}")
    if inner_schedule is None:
        inner_schedule = default_inner_schedule(n, b)
    k = n // b
    half = k // 2
    a = a.astype(jnp.float32).reshape(-1, n, n)
    nb = a.shape[0]

    # shift so Cholesky is safe on PSD inputs; subtracted exactly below
    tr = jnp.trace(a, axis1=-2, axis2=-1)
    delta = shift_scale * tr / n + 1e-12
    l = jnp.linalg.cholesky(
        a + delta[:, None, None] * jnp.eye(n, dtype=a.dtype)
    )
    g = jnp.swapaxes(l, -2, -1)  # G = L^T, columns to orthogonalize

    # column blocks: w_blk[i] = G[:, i*b:(i+1)*b]  -> (nb, k, n, b)
    def to_blocks(m):
        return jnp.swapaxes(m.reshape(nb, n, k, b), 1, 2)

    w_blk = to_blocks(g)
    v_blk = to_blocks(jnp.broadcast_to(jnp.eye(n, dtype=a.dtype),
                                       (nb, n, n)))

    def make_round(inner_sweeps, prec):
        mm = lambda x, y: jax.lax.dot_general(
            x, y, (((x.ndim - 1,), (y.ndim - 2,)),
                   (tuple(range(x.ndim - 2)), tuple(range(y.ndim - 2)))),
            precision=prec, preferred_element_type=jnp.float32,
        )

        def round_body(_, carry):
            wb, vb = carry
            top_w, bot_w = wb[:, :half], wb[:, half:]
            top_v, bot_v = vb[:, :half], vb[:, half:]
            u = jnp.concatenate([top_w, bot_w], axis=-1)  # (nb, half, n, 2b)
            uv = jnp.concatenate([top_v, bot_v], axis=-1)
            # pair Gram (MXU): S = U^T U
            s = jnp.einsum(
                "bpnc,bpnd->bpcd", u, u,
                precision=prec, preferred_element_type=jnp.float32,
            )
            r = _inner_rotation(
                s.reshape(nb * half, 2 * b, 2 * b), inner_sweeps,
                precision=prec,
            ).reshape(nb, half, 2 * b, 2 * b)
            u = mm(u, r)
            uv = mm(uv, r)
            new_top_w, new_bot_w = u[..., :b], u[..., b:]
            new_top_v, new_bot_v = uv[..., :b], uv[..., b:]
            if half == 1:
                wb = jnp.concatenate([new_top_w, new_bot_w], axis=1)
                vb = jnp.concatenate([new_top_v, new_bot_v], axis=1)
                return (wb, vb)
            # Brent-Luk seating rotation (static slices, order k-1)
            wb = jnp.concatenate(
                [new_top_w[:, 0:1], new_bot_w[:, 0:1],
                 new_top_w[:, 1 : half - 1], new_bot_w[:, 1:],
                 new_top_w[:, half - 1 : half]],
                axis=1,
            )
            vb = jnp.concatenate(
                [new_top_v[:, 0:1], new_bot_v[:, 0:1],
                 new_top_v[:, 1 : half - 1], new_bot_v[:, 1:],
                 new_top_v[:, half - 1 : half]],
                axis=1,
            )
            return (wb, vb)

        return round_body

    rounds_per_sweep = max(k - 1, 1)
    n_sweeps = len(inner_schedule)
    for si, inner_sweeps in enumerate(inner_schedule):
        prec = final_precision if si == n_sweeps - 1 else precision
        w_blk, v_blk = jax.lax.fori_loop(
            0, rounds_per_sweep, make_round(inner_sweeps, prec),
            (w_blk, v_blk),
        )

    # unblock: (nb, k, n, b) -> (nb, n, n)
    def from_blocks(mb):
        return jnp.swapaxes(mb, 1, 2).reshape(nb, n, n)

    gv = from_blocks(w_blk)
    v = from_blocks(v_blk)
    w = jnp.sum(gv * gv, axis=1) - delta[:, None]  # squared column norms
    return (
        w.reshape(orig_shape[:-1]),
        v.reshape(orig_shape),
    )
