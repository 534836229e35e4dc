"""Dense linear-algebra ops for K-FAC factors (TPU-native).

The reference uses cuSOLVER (via torch.linalg / the tcmm CUDA extension,
/root/reference/kfac/utils.py:11-30, /root/reference/packages/tcmm/src/
tcmm_kernel.cu:56-116) for symmetric eigendecomposition and Cholesky
inversion. On TPU the equivalents are XLA's QDWH-based ``eigh`` and
triangular-solve Cholesky — both MXU-heavy — plus an optional Pallas
batched Jacobi eigensolver (kfac_pytorch_tpu.ops.pallas.symeig) for the
many-small-matrix regime.

All functions are batched: inputs may be (..., n, n).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def add_diag(x: jax.Array, value) -> jax.Array:
    """x + value*I over the trailing (n, n) dims.

    (Reference: _add_value_to_diagonal,
    /root/reference/kfac/kfac_preconditioner_inv.py:106-107.)
    """
    n = x.shape[-1]
    eye = jnp.eye(n, dtype=x.dtype)
    return x + eye * jnp.asarray(value, dtype=x.dtype)


def pi_trace_norm(a: jax.Array, g: jax.Array) -> jax.Array:
    """Tikhonov damping split pi = sqrt((tr(A)/dA) / (tr(G)/dG)).

    (Reference: /root/reference/kfac/kfac_preconditioner_inv.py:121.)
    """
    # f32 diagonal sums: with bf16-stored factors a bf16 reduce over a
    # 4608-long diagonal loses the trace's low bits
    tr_a = jnp.sum(
        jnp.diagonal(a, axis1=-2, axis2=-1).astype(jnp.float32), axis=-1
    ) / a.shape[-1]
    tr_g = jnp.sum(
        jnp.diagonal(g, axis1=-2, axis2=-1).astype(jnp.float32), axis=-1
    ) / g.shape[-1]
    return jnp.sqrt(tr_a / tr_g)


def cholesky_inverse(x: jax.Array) -> jax.Array:
    """Symmetric positive-definite inverse via Cholesky.

    (Reference ``mat_inv`` 'cholesky' method, utils.py:11-16.)
    """
    if x.dtype in (jnp.bfloat16, jnp.float16):
        # half-precision factor storage: the decomposition itself needs
        # f32 (bf16 triangular solves lose the inverse's low bits and
        # XLA's cholesky expects a float32/float64 operand)
        x = x.astype(jnp.float32)
    n = x.shape[-1]
    chol = jnp.linalg.cholesky(x)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=x.dtype), x.shape)
    # X^-1 = L^-T L^-1 : two triangular solves against I.
    inv_l = jax.scipy.linalg.solve_triangular(chol, eye, lower=True)
    return jnp.einsum("...ki,...kj->...ij", inv_l, inv_l)


def damped_inverse(x: jax.Array, damping) -> jax.Array:
    """(x + damping*I)^-1 via Cholesky."""
    return cholesky_inverse(add_diag(x, damping))


def symeig(x: jax.Array, eps: float = 1e-10):
    """Symmetric eigendecomposition with small-eigenvalue clamping.

    Returns (d, q) where d are eigenvalues with entries <= eps zeroed
    (reference kfac_preconditioner_eigen.py:112-119, eps=1e-10 from
    kfac_preconditioner_base.py:115) and q the eigenvectors (columns).
    """
    d, q = jnp.linalg.eigh(x)
    d = d * (d > eps).astype(d.dtype)
    return d, q
