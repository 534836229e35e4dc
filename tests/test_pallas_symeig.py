"""Correctness tests for the Pallas one-sided Jacobi symeig.

On CPU these run in Pallas interpreter mode (the compiled path is exercised
on real TPU by tools/bench_ops.py and the bench). Matrix sizes are kept
small — interpreter mode is slow — with the tournament schedule itself
validated separately in NumPy for full coverage.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu

from kfac_pytorch_tpu.ops.pallas import symeig as psym


def _tournament_coverage(n):
    """Simulate the kernel's Brent-Luk rotation; return the set of pairs
    (by original index) met over n-1 steps."""
    n2 = n // 2
    top = list(range(n2))
    bot = list(range(n2, n))
    met = set()
    for _ in range(n - 1):
        for a, b in zip(top, bot):
            met.add((min(a, b), max(a, b)))
        new_top = [top[0], bot[0]] + top[1 : n2 - 1]
        new_bot = bot[1:] + [top[n2 - 1]]
        top, bot = new_top, new_bot
    return met, top, bot


@pytest.mark.parametrize("n", [4, 8, 16, 256, 1024])
def test_tournament_meets_all_pairs_and_returns_identity(n):
    met, top, bot = _tournament_coverage(n)
    want = {(i, j) for i in range(n) for j in range(i + 1, n)}
    assert met == want
    # seating returns to the identity order after one full sweep
    assert top == list(range(n // 2))
    assert bot == list(range(n // 2, n))


def _spd(rng, n, cond=100.0):
    q, _ = np.linalg.qr(rng.randn(n, n))
    w = np.logspace(0, np.log10(cond), n)
    return (q * w) @ q.T


def test_jacobi_symeig_interpret_correctness():
    rng = np.random.RandomState(0)
    n = 256
    mats = np.stack([_spd(rng, n), _spd(rng, n, cond=1000.0)]).astype(
        np.float32
    )
    with pltpu.force_tpu_interpret_mode():
        w, v = psym.jacobi_symeig(jnp.asarray(mats), sweeps=8)
    w, v = np.asarray(w), np.asarray(v)
    for i in range(2):
        recon = v[i] @ np.diag(w[i]) @ v[i].T
        scale = np.abs(mats[i]).max()
        assert np.abs(recon - mats[i]).max() / scale < 5e-4, i
        orth = np.abs(v[i].T @ v[i] - np.eye(n)).max()
        assert orth < 1e-4, i
        # eigenvalues match (sorted) the reference eigh
        ref = np.linalg.eigvalsh(mats[i])
        np.testing.assert_allclose(
            np.sort(w[i]), ref, rtol=1e-3, atol=1e-3 * scale
        )


def test_symeig_auto_pads_odd_dims():
    rng = np.random.RandomState(1)
    n = 200  # not a multiple of 256 -> identity-padded to 256
    m = _spd(rng, n).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        w, v = psym.symeig_auto(jnp.asarray(m), sweeps=8)
    w, v = np.asarray(w), np.asarray(v)
    assert w.shape == (n,) and v.shape == (n, n)
    recon = v @ np.diag(w) @ v.T
    assert np.abs(recon - m).max() / np.abs(m).max() < 5e-4


def test_symeig_auto_large_dims_fall_back_to_xla():
    rng = np.random.RandomState(2)
    m = jnp.asarray(_spd(rng, 48).astype(np.float32))
    # force fallback by setting the pallas ceiling below n
    w, v = psym.symeig_auto(m, max_pallas_dim=16)
    recon = np.asarray(v) @ np.diag(np.asarray(w)) @ np.asarray(v).T
    assert np.abs(recon - np.asarray(m)).max() < 1e-3


def test_precond_equivalence_with_xla_eigh():
    """The eigen preconditioner is eigen-order-invariant: Jacobi (unsorted)
    and XLA eigh (sorted) must give identical preconditioned gradients."""
    from kfac_pytorch_tpu.ops import linalg as L
    from kfac_pytorch_tpu.ops import precond as P

    rng = np.random.RandomState(3)
    na, ng, lam = 256, 256, 0.03
    A = _spd(rng, na).astype(np.float32)
    G = _spd(rng, ng).astype(np.float32)
    grad = rng.randn(ng, na).astype(np.float32)

    dA1, QA1 = L.symeig(jnp.asarray(A))
    dG1, QG1 = L.symeig(jnp.asarray(G))
    want = np.asarray(P.precond_eigen(jnp.asarray(grad), QA1, dA1, QG1, dG1, lam))

    with pltpu.force_tpu_interpret_mode():
        dA2, QA2 = psym.symeig_auto(jnp.asarray(A), sweeps=10)
        dG2, QG2 = psym.symeig_auto(jnp.asarray(G), sweeps=10)
    got = np.asarray(P.precond_eigen(jnp.asarray(grad), QA2, dA2, QG2, dG2, lam))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
