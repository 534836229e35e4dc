"""Unit tests for factor linear algebra and preconditioning formulas."""

import numpy as np
import jax.numpy as jnp

from kfac_pytorch_tpu.ops import linalg as L
from kfac_pytorch_tpu.ops import precond as P


def _spd(rng, n):
    m = rng.randn(n, n).astype(np.float32)
    return m @ m.T / n + np.eye(n, dtype=np.float32)


def test_add_diag():
    x = np.zeros((4, 4), np.float32)
    out = np.asarray(L.add_diag(jnp.asarray(x), 2.5))
    np.testing.assert_allclose(out, 2.5 * np.eye(4))
    # batched
    xb = np.zeros((3, 4, 4), np.float32)
    outb = np.asarray(L.add_diag(jnp.asarray(xb), 1.0))
    np.testing.assert_allclose(outb, np.broadcast_to(np.eye(4), (3, 4, 4)))


def test_pi_trace_norm():
    a = 4.0 * np.eye(6, dtype=np.float32)
    g = 1.0 * np.eye(3, dtype=np.float32)
    pi = np.asarray(L.pi_trace_norm(jnp.asarray(a), jnp.asarray(g)))
    np.testing.assert_allclose(pi, 2.0, rtol=1e-6)


def test_cholesky_inverse():
    rng = np.random.RandomState(0)
    x = _spd(rng, 16)
    inv = np.asarray(L.cholesky_inverse(jnp.asarray(x)))
    np.testing.assert_allclose(inv @ x, np.eye(16), atol=1e-4)


def test_cholesky_inverse_batched():
    rng = np.random.RandomState(1)
    xs = np.stack([_spd(rng, 8) for _ in range(5)])
    invs = np.asarray(L.cholesky_inverse(jnp.asarray(xs)))
    for x, inv in zip(xs, invs):
        np.testing.assert_allclose(inv @ x, np.eye(8), atol=1e-4)


def test_damped_inverse():
    rng = np.random.RandomState(2)
    x = _spd(rng, 12)
    inv = np.asarray(L.damped_inverse(jnp.asarray(x), 0.1))
    np.testing.assert_allclose(
        inv @ (x + 0.1 * np.eye(12)), np.eye(12), atol=1e-4
    )


def test_symeig_reconstruction_and_clamp():
    rng = np.random.RandomState(3)
    x = _spd(rng, 10)
    d, q = L.symeig(jnp.asarray(x))
    d, q = np.asarray(d), np.asarray(q)
    np.testing.assert_allclose(q @ np.diag(d) @ q.T, x, atol=1e-4)
    # rank-deficient matrix: zero eigenvalues stay exactly zero after clamp
    low = np.zeros((4, 4), np.float32)
    low[0, 0] = 1.0
    d2, _ = L.symeig(jnp.asarray(low))
    d2 = np.asarray(d2)
    assert (d2[:-1] == 0.0).all() and abs(d2[-1] - 1.0) < 1e-6


def test_precond_eigen_matches_exact_kron_solve():
    """The eigen preconditioner equals (G (x) A + damping I)^-1 vec(grad).

    With exact (non-EMA) factors, QG[(QG^T D QA)/(dG dA^T + lam)]QA^T is the
    matrix form of solving the damped Kronecker system — verified against an
    explicit Kronecker-product inverse.
    """
    rng = np.random.RandomState(4)
    na, ng, lam = 6, 4, 0.1
    a = _spd(rng, na)
    g = _spd(rng, ng)
    grad = rng.randn(ng, na).astype(np.float32)

    da, qa = L.symeig(jnp.asarray(a))
    dg, qg = L.symeig(jnp.asarray(g))
    got = np.asarray(
        P.precond_eigen(jnp.asarray(grad), qa, da, qg, dg, lam)
    )

    # vec is row-major over (ng, na): F = kron(G, A^T)? Use the identity
    # G V A = unvec(kron(A^T, G) vec(V)) with row-major vec; A symmetric here.
    big = np.kron(g, a) + lam * np.eye(na * ng)
    want = np.linalg.solve(big, grad.reshape(-1)).reshape(ng, na)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_precond_inverse():
    rng = np.random.RandomState(5)
    a = _spd(rng, 5)
    g = _spd(rng, 3)
    grad = rng.randn(3, 5).astype(np.float32)
    inv_a = np.linalg.inv(a)
    inv_g = np.linalg.inv(g)
    got = np.asarray(
        P.precond_inverse(
            jnp.asarray(grad), jnp.asarray(inv_a), jnp.asarray(inv_g)
        )
    )
    np.testing.assert_allclose(got, inv_g @ grad @ inv_a, rtol=1e-4, atol=1e-5)


def test_kl_clip_nu():
    nu = np.asarray(P.kl_clip_nu(jnp.asarray(4e-3), 1e-3))
    np.testing.assert_allclose(nu, 0.5, rtol=1e-6)
    nu2 = np.asarray(P.kl_clip_nu(jnp.asarray(1e-6), 1e-3))
    np.testing.assert_allclose(nu2, 1.0)
    nu3 = np.asarray(P.kl_clip_nu(jnp.asarray(-4e-3), 1e-3))
    np.testing.assert_allclose(nu3, 0.5, rtol=1e-6)
