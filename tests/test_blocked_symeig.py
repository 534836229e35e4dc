"""Blocked one-sided Jacobi symeig + online tracking eigendecomposition.

CPU tests use the exact XLA-eigh inner solve (inner_schedule entries < 0);
the Pallas inner is exercised on real TPU by tools/bench_ops.py. The
sorting-limit-cycle regression (eigh inner without identity alignment
stalls — measured round 2) is covered explicitly.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kfac_pytorch_tpu.ops.blocked_symeig import (
    _align_to_identity,
    _perturb_rotation,
    blocked_jacobi_symeig,
    symeig_blocked_padded,
    tracking_symeig_update,
)

H = jax.lax.Precision.HIGHEST


def _rand_spd(n, seed=0, floor=0.01):
    rng = np.random.RandomState(seed)
    m = rng.randn(n, n).astype(np.float32)
    return m @ m.T / n + floor * np.eye(n, dtype=np.float32)


def test_blocked_jacobi_converges():
    a = jnp.asarray(_rand_spd(512))
    w, v = blocked_jacobi_symeig(
        a, block=128, inner_schedule=(-1,) * 6, precision=H
    )
    w, v = np.asarray(w), np.asarray(v)
    rec = v @ np.diag(w) @ v.T
    assert np.linalg.norm(rec - np.asarray(a)) / np.linalg.norm(
        np.asarray(a)
    ) < 1e-4
    assert np.linalg.norm(v.T @ v - np.eye(512)) < 1e-3
    np.testing.assert_allclose(
        np.sort(w), np.linalg.eigvalsh(np.asarray(a)), rtol=2e-3, atol=1e-5
    )


def test_blocked_jacobi_perturb_polish():
    """Perturbative (all-matmul) sweeps after exact sweeps must improve, not
    diverge (round-2 regression: unclamped operator norm made Newton-Schulz
    blow up)."""
    a = jnp.asarray(_rand_spd(512, seed=1))
    w3, v3 = blocked_jacobi_symeig(
        a, block=128, inner_schedule=(-1, -1, -1), precision=H
    )
    w, v = blocked_jacobi_symeig(
        a, block=128, inner_schedule=(-1, -1, -1, 0, 0), precision=H
    )
    a_np = np.asarray(a)

    def recon_err(w_, v_):
        w_, v_ = np.asarray(w_), np.asarray(v_)
        return np.linalg.norm(v_ @ np.diag(w_) @ v_.T - a_np) / np.linalg.norm(a_np)

    assert np.isfinite(np.asarray(w)).all()
    assert recon_err(w, v) <= recon_err(w3, v3) * 1.05
    assert np.linalg.norm(np.asarray(v).T @ np.asarray(v) - np.eye(512)) < 1e-2


def test_align_to_identity_undoes_permutation():
    rng = np.random.RandomState(0)
    m = 16
    perm = rng.permutation(m)
    p = np.zeros((m, m), np.float32)
    signs = rng.choice([-1.0, 1.0], m)
    for i, j in enumerate(perm):
        p[i, j] = signs[i]
    # near-permutation orthogonal matrix
    aligned = np.asarray(_align_to_identity(jnp.asarray(p[None]))[0])
    np.testing.assert_allclose(aligned, np.eye(m), atol=1e-6)


def test_align_leaves_generic_rotation_unchanged():
    rng = np.random.RandomState(1)
    m = 8
    q, _ = np.linalg.qr(rng.randn(m, m))
    # a fully mixed rotation typically has argmax collisions -> unchanged,
    # or a bijective argmax -> a column-permuted version; either way output
    # must stay orthogonal
    out = np.asarray(_align_to_identity(jnp.asarray(q[None], jnp.float32))[0])
    np.testing.assert_allclose(out.T @ out, np.eye(m), atol=1e-5)


def test_symeig_blocked_padded_matches_eigh():
    n = 400  # pads to 512
    a = jnp.asarray(_rand_spd(n, seed=2))
    w, v = symeig_blocked_padded(
        a, block=128, inner_schedule=(-1,) * 6, precision=H
    )
    w, v = np.asarray(w), np.asarray(v)
    assert w.shape == (n,) and v.shape == (n, n)
    rec = v @ np.diag(w) @ v.T
    assert np.linalg.norm(rec - np.asarray(a)) / np.linalg.norm(
        np.asarray(a)
    ) < 1e-3
    np.testing.assert_allclose(
        np.sort(w), np.linalg.eigvalsh(np.asarray(a)), rtol=5e-3, atol=1e-5
    )


def test_symeig_blocked_padded_batched():
    a = jnp.stack([jnp.asarray(_rand_spd(300, seed=s)) for s in range(3)])
    w, v = symeig_blocked_padded(
        a, block=128, inner_schedule=(-1,) * 6, precision=H
    )
    assert w.shape == (3, 300) and v.shape == (3, 300, 300)
    for i in range(3):
        np.testing.assert_allclose(
            np.sort(np.asarray(w[i])),
            np.linalg.eigvalsh(np.asarray(a[i])),
            rtol=5e-3, atol=1e-3,
        )


def test_tracking_follows_ema_drift():
    """Tracking from an exact basis along an EMA drift (the steady-state
    K-FAC factor evolution after warmup) stays an accurate
    eigendecomposition throughout. (The identity->covariance warmup
    transient is handled by KFACConfig.tracking_warmup exact refreshes, not
    by tracking.)"""
    n = 96
    a = _rand_spd(n, seed=3, floor=0.05)
    w0, v0 = np.linalg.eigh(a)
    v = jnp.asarray(v0.astype(np.float32))
    errs = []
    rng = np.random.RandomState(7)
    for step in range(30):
        # EMA toward a fresh noisy covariance each step (decay 0.95)
        m = rng.randn(n, 2 * n).astype(np.float32)
        fresh = (m @ m.T) / (2 * n) * np.trace(a) / n
        a = (0.05 * fresh + 0.95 * a).astype(np.float32)
        w, v = tracking_symeig_update(jnp.asarray(a), v, iters=2,
                                      precision=H)
        wn, vn = np.asarray(w), np.asarray(v)
        rec = vn @ np.diag(wn) @ vn.T
        errs.append(np.linalg.norm(rec - a) / np.linalg.norm(a))
    # slow creep from clamped cluster couplings (~0.15%/step) is expected
    # and bounded in production by tracking_exact_freq periodic refreshes
    assert max(errs) < 8e-2
    assert np.mean(errs) < 5e-2
    assert errs[0] < 2e-2
    assert np.linalg.norm(vn.T @ vn - np.eye(n)) < 1e-3


def test_tracking_in_block_kfac_matches_exact_eigen():
    """BlockKFAC with symeig_impl='tracking' must produce preconditioned
    gradients close to the exact eigen path over a multi-step run."""
    import flax.linen as nn
    import optax

    import kfac_pytorch_tpu as ktpu
    from kfac_pytorch_tpu.parallel.strategies import BlockKFAC
    from kfac_pytorch_tpu.preconditioner import KFACConfig
    from kfac_pytorch_tpu.training.bucketed import (
        init_bucketed_state, make_bucketed_train_step,
    )
    from kfac_pytorch_tpu.training.loop import KFACScalars

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = ktpu.KFACConv(8, (3, 3), name="c1")(x)
            x = nn.relu(x)
            x = x.reshape(x.shape[0], -1)
            x = ktpu.KFACDense(16, name="f1")(x)
            x = jnp.tanh(x)
            return ktpu.KFACDense(5, name="f2")(x)

    rng = np.random.RandomState(0)
    model = Net()
    x = jnp.asarray(rng.randn(16, 8, 8, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 5, 16))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    specs, perturbs = ktpu.setup_kfac(model, {"params": params}, x)

    def run(impl, steps):
        cfg = KFACConfig(inv_type="eigen", damping=0.03, kl_clip=0.001,
                         symeig_impl=impl, tracking_iters=2,
                         tracking_warmup=4)
        kfac = BlockKFAC(specs, cfg)
        st = init_bucketed_state(kfac, params)
        step = jax.jit(make_bucketed_train_step(
            model, kfac, perturb_template=perturbs
        ))
        scalars = KFACScalars.create(lr=0.05, damping=0.03)
        losses = []
        for _ in range(steps):
            st, m = step(st, (x, y), scalars)
            losses.append(float(m["loss"]))
        return st, losses

    # within the exact-refresh warmup the paths are bit-identical
    st_x, lo_x = run("xla", 4)
    st_t, lo_t = run("tracking", 4)
    np.testing.assert_allclose(lo_x, lo_t, rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        st_x.params,
        st_t.params,
    )
    # past warmup the approximate refresh must keep training comparably
    # (trajectory-exact comparison is meaningless in a chaotic system)
    _, lo_x = run("xla", 16)
    _, lo_t = run("tracking", 16)
    assert lo_t[-1] < lo_x[0]  # trains
    assert abs(lo_t[-1] - lo_x[-1]) < 0.15


def test_tracking_precision_config():
    """tracking_precision maps 'default' -> None (bf16 MXU passes) and
    'highest' -> Precision.HIGHEST; both run through the update."""
    from kfac_pytorch_tpu.ops.blocked_symeig import tracking_symeig_update
    from kfac_pytorch_tpu.preconditioner import KFACConfig

    assert KFACConfig(tracking_precision="default")._tracking_precision is None
    assert (
        KFACConfig(tracking_precision="highest")._tracking_precision
        == jax.lax.Precision.HIGHEST
    )
    rng = np.random.RandomState(0)
    m = rng.randn(12, 12).astype(np.float32)
    a = jnp.asarray(m @ m.T / 12 + np.eye(12, dtype=np.float32))
    w0, v0 = jnp.linalg.eigh(a)
    for prec in (None, jax.lax.Precision.HIGHEST):
        w, v = tracking_symeig_update(
            0.05 * a + 0.95 * a, v0, precision=prec
        )
        recon = v @ jnp.diag(w) @ v.T
        assert float(jnp.linalg.norm(recon - a) / jnp.linalg.norm(a)) < 1e-3
