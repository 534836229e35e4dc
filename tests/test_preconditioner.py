"""Tests for the K-FAC preconditioner core: step pipeline, variants,
frequency gating, kl-clip, and end-to-end training behavior."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

import kfac_pytorch_tpu as ktpu
from kfac_pytorch_tpu.capture import COL_A, COL_G
from kfac_pytorch_tpu.ops import factors as fops
from kfac_pytorch_tpu.ops import linalg as lops
from kfac_pytorch_tpu.ops import precond as pops
from kfac_pytorch_tpu.preconditioner import (
    KFAC,
    KFACConfig,
    KFACParamScheduler,
    KFACHypers,
    grad_from_2d,
    grad_to_2d,
)
from kfac_pytorch_tpu.training.loop import (
    KFACScalars,
    TrainState,
    make_train_step,
)


class MLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = ktpu.KFACDense(16, name="fc1")(x)
        x = jnp.tanh(x)
        x = ktpu.KFACDense(4, name="fc2")(x)
        return x


def _setup_mlp(seed=0, batch=16, din=8):
    rng = np.random.RandomState(seed)
    model = MLP()
    x = jnp.asarray(rng.randn(batch, din).astype(np.float32))
    y = jnp.asarray(rng.randn(batch, 4).astype(np.float32))
    params = model.init(jax.random.PRNGKey(seed), x)["params"]
    perturbs = ktpu.make_zero_perturbations(model, {"params": params}, x)
    specs = ktpu.collect_layer_specs(
        lambda: model.apply({"params": params, COL_G: perturbs}, x, mutable=[COL_A])
    )

    def loss_fn(params, perturbs):
        out, muts = model.apply(
            {"params": params, COL_G: perturbs}, x, mutable=[COL_A]
        )
        return jnp.mean((out - y) ** 2), muts[COL_A]

    (loss, acts), (grads, gs) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(params, perturbs)
    return model, params, specs, acts, grads, gs, x, y


def test_grad2d_roundtrip_conv():
    spec = ktpu.LayerSpec(
        path=("c",), kind="conv", in_dim=27, out_dim=8, has_bias=True,
        param_path=("c", "layer"), kernel_size=(3, 3),
    )
    rng = np.random.RandomState(0)
    kernel = jnp.asarray(rng.randn(3, 3, 3, 8).astype(np.float32))
    bias = jnp.asarray(rng.randn(8).astype(np.float32))
    g2d = grad_to_2d(spec, {"kernel": kernel, "bias": bias})
    assert g2d.shape == (8, 28)
    back = grad_from_2d(spec, g2d, kernel.shape)
    np.testing.assert_array_equal(np.asarray(back["kernel"]), np.asarray(kernel))
    np.testing.assert_array_equal(np.asarray(back["bias"]), np.asarray(bias))


def test_step_eigen_matches_manual_math():
    """One KFAC.step must equal the hand-rolled reference pipeline:
    EMA(I -> factors) -> clamped eigh -> eigen precond -> kl_clip."""
    model, params, specs, acts, grads, gs, x, y = _setup_mlp()
    cfg = KFACConfig(inv_type="eigen", damping=0.03, kl_clip=0.001,
                     factor_decay=0.95)
    kfac = KFAC(specs, cfg)
    state = kfac.init_state()
    lr = 0.1
    out, new_state = jax.jit(
        lambda s, g, a, p: kfac.step(s, g, a, p, lr=lr)
    )(state, grads, acts, gs)

    # manual per-layer
    vg_sum = 0.0
    manual = {}
    for spec in specs:
        a = acts[spec.path[0]]["a"]
        g = gs[spec.path[0]]["p"]
        A = fops.ema_update(
            fops.compute_a_dense(a, True), jnp.eye(spec.grad_in_dim), 0.95
        )
        G = fops.ema_update(
            fops.compute_g_dense(g, True), jnp.eye(spec.out_dim), 0.95
        )
        dA, QA = lops.symeig(A)
        dG, QG = lops.symeig(G)
        g2d = grad_to_2d(spec, grads[spec.path[0]]["layer"])
        v = pops.precond_eigen(g2d, QA, dA, QG, dG, 0.03)
        manual[spec.name] = (v, g2d, A, G)
        vg_sum += float(jnp.sum(v * g2d)) * lr**2
    nu = min(1.0, float(np.sqrt(0.001 / abs(vg_sum))))

    for spec in specs:
        v, g2d, A, G = manual[spec.name]
        got2d = grad_to_2d(spec, out[spec.path[0]]["layer"])
        np.testing.assert_allclose(
            np.asarray(got2d), np.asarray(v) * nu, rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(new_state["layers"][spec.name]["A"]),
            np.asarray(A),
            rtol=1e-5,
            atol=1e-6,
        )
    assert int(new_state["step"]) == 1


def test_step_inverse_variant():
    """Explicit-inverse path: v = invG @ grad @ invA with pi-split damping
    (reference inv.py:109-129,156-161)."""
    model, params, specs, acts, grads, gs, x, y = _setup_mlp(seed=1)
    cfg = KFACConfig(inv_type="inverse", damping=0.03, kl_clip=None,
                     factor_decay=1.0)
    kfac = KFAC(specs, cfg)
    state = kfac.init_state()
    out, new_state = kfac.step(state, grads, acts, gs, lr=0.1)

    for spec in specs:
        a = acts[spec.path[0]]["a"]
        g = gs[spec.path[0]]["p"]
        A = fops.compute_a_dense(a, True)  # decay=1 -> pure new factor
        G = fops.compute_g_dense(g, True)
        pi = lops.pi_trace_norm(A, G)
        invA = lops.cholesky_inverse(lops.add_diag(A, np.sqrt(0.03) * pi))
        invG = lops.cholesky_inverse(lops.add_diag(G, np.sqrt(0.03) / pi))
        g2d = grad_to_2d(spec, grads[spec.path[0]]["layer"])
        want = invG @ g2d @ invA
        got2d = grad_to_2d(spec, out[spec.path[0]]["layer"])
        np.testing.assert_allclose(
            np.asarray(got2d), np.asarray(want), rtol=1e-4, atol=1e-5
        )


def test_freq_gating():
    """fac/kfac_update_freq gate factor and eigen updates by step counter
    (reference base.py:199-213)."""
    model, params, specs, acts, grads, gs, x, y = _setup_mlp(seed=2)
    cfg = KFACConfig(inv_type="eigen", kl_clip=None)
    kfac = KFAC(specs, cfg)
    state = kfac.init_state()
    step = jax.jit(
        lambda s, g, a, p, ff, kf: kfac.step(
            s, g, a, p, lr=0.1, fac_update_freq=ff, kfac_update_freq=kf
        )
    )
    # step 0: updates happen
    _, s1 = step(state, grads, acts, gs, 2, 2)
    a1 = np.asarray(s1["layers"][specs[0].name]["A"])
    assert not np.allclose(a1, np.eye(a1.shape[0]))
    # step 1 (odd): both gated off -> A unchanged
    _, s2 = step(s1, grads, acts, gs, 2, 2)
    np.testing.assert_array_equal(
        np.asarray(s2["layers"][specs[0].name]["A"]), a1
    )
    # step 2: gate opens again
    _, s3 = step(s2, grads, acts, gs, 2, 2)
    a3 = np.asarray(s3["layers"][specs[0].name]["A"])
    assert not np.allclose(a3, a1)


def test_exclude_parts_compute_inverse_passthrough():
    """exclude ComputeInverse: grads pass through unpreconditioned
    (reference base.py:216-225)."""
    model, params, specs, acts, grads, gs, x, y = _setup_mlp(seed=3)
    cfg = KFACConfig(exclude_compute_inverse=True)
    kfac = KFAC(specs, cfg)
    out, _ = kfac.step(kfac.init_state(), grads, acts, gs, lr=0.1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        out,
        grads,
    )


def test_kl_clip_caps_update_norm():
    model, params, specs, acts, grads, gs, x, y = _setup_mlp(seed=4)
    clipped = KFAC(specs, KFACConfig(kl_clip=1e-6))
    unclipped = KFAC(specs, KFACConfig(kl_clip=None))
    out_c, _ = clipped.step(clipped.init_state(), grads, acts, gs, lr=1.0)
    out_u, _ = unclipped.step(unclipped.init_state(), grads, acts, gs, lr=1.0)
    norm_c = float(optax.global_norm(out_c))
    norm_u = float(optax.global_norm(out_u))
    assert norm_c < norm_u


def test_registry_and_factories():
    specs = (
        ktpu.LayerSpec(path=("l",), kind="dense", in_dim=4, out_dim=2,
                       has_bias=False, param_path=("l", "layer")),
    )
    for name, (it, strat) in {
        "inverse": ("inverse", "mpd"),
        "eigen": ("eigen", "mpd"),
        "inverse_dp": ("inverse", "dp"),
        "eigen_dp": ("eigen", "dp"),
    }.items():
        k = ktpu.get_kfac_module(name)(specs, damping=0.5)
        assert isinstance(k, KFAC)
        assert k.config.inv_type == it and k.config.strategy == strat
        assert k.config.damping == 0.5
    k = ktpu.DP_KFAC(specs, inv_type="inverse")
    assert k.config.inv_type == "inverse" and k.config.strategy == "dp"
    with pytest.raises(ValueError):
        ktpu.DP_KFAC(specs, inv_type="bogus")


def test_param_scheduler_parity():
    """Mirror of reference KFACParamScheduler semantics (base.py:233-301)."""
    hp = KFACHypers(damping=0.03, fac_update_freq=1, kfac_update_freq=10)
    sched = KFACParamScheduler(
        hp,
        damping_alpha=0.5,
        damping_schedule=[2, 4],
        update_freq_alpha=2.0,
        update_freq_schedule=[3],
    )
    sched.step(1)
    assert hp.damping == 0.03 and hp.kfac_update_freq == 10
    sched.step(2)
    assert np.isclose(hp.damping, 0.015)
    sched.step(4)
    assert np.isclose(hp.damping, 0.0075)  # both thresholds passed
    assert hp.fac_update_freq == 2 and hp.kfac_update_freq == 20
    # start_epoch resume realignment
    hp2 = KFACHypers(damping=0.03, fac_update_freq=1, kfac_update_freq=10)
    sched2 = KFACParamScheduler(
        hp2, damping_alpha=0.5, damping_schedule=[2, 4], start_epoch=4
    )
    sched2.step()
    assert np.isclose(hp2.damping, 0.0075)


def test_production_config_pins_validated_stride_combo():
    """The shipped production estimator is the (ss=3, G=1) combo that
    passed the round-5 PRE-REGISTERED adjudication (7/7 positive 2k
    seeds + 10k arm, BENCH_NOTES round 5). A future default flip must
    consciously update this pin alongside new validation evidence —
    (3, follow-A) and (2, *) both FAILED convergence arms."""
    from kfac_pytorch_tpu.preconditioner import production_pcg_config

    cfg = production_pcg_config()
    assert cfg.factor_spatial_stride == 3
    assert cfg.factor_g_spatial_stride == 1
    # overrides still work (the bench env hooks / harness flags)
    cfg2 = production_pcg_config(factor_spatial_stride=1,
                                 factor_g_spatial_stride=None)
    assert cfg2.factor_spatial_stride == 1
    assert cfg2.factor_g_spatial_stride is None


def test_param_scheduler_freq_clamps_to_one():
    """update_freq_alpha < 1 must never truncate a live freq to 0 (= K-FAC
    silently disabled); an explicit base of 0 stays 0 (user-disabled)."""
    hp = KFACHypers(damping=0.03, fac_update_freq=1, kfac_update_freq=2)
    sched = KFACParamScheduler(
        hp, update_freq_alpha=0.1, update_freq_schedule=[1]
    )
    sched.step(1)
    assert hp.fac_update_freq == 1  # int(1 * 0.1) == 0 would disable
    assert hp.kfac_update_freq == 1
    hp0 = KFACHypers(damping=0.03, fac_update_freq=0, kfac_update_freq=0)
    sched0 = KFACParamScheduler(
        hp0, update_freq_alpha=0.1, update_freq_schedule=[1]
    )
    sched0.step(1)
    assert hp0.fac_update_freq == 0 and hp0.kfac_update_freq == 0


def test_train_loop_end_to_end_kfac_beats_sgd():
    """Full jitted train loop: K-FAC converges at least as fast as SGD on a
    small classification problem (the reference's convergence-arm pattern)."""
    rng = np.random.RandomState(0)
    n, din, classes = 256, 10, 5
    w_true = rng.randn(din, classes)
    x_np = rng.randn(n, din).astype(np.float32)
    y_np = np.argmax(x_np @ w_true + 0.1 * rng.randn(n, classes), axis=1)
    x, y = jnp.asarray(x_np), jnp.asarray(y_np)

    class Net(nn.Module):
        @nn.compact
        def __call__(self, inp):
            h = ktpu.KFACDense(32, name="fc1")(inp)
            h = jnp.tanh(h)
            return ktpu.KFACDense(classes, name="fc2")(h)

    model = Net()
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    perturbs = ktpu.make_zero_perturbations(model, {"params": params}, x)
    specs = ktpu.collect_layer_specs(
        lambda: model.apply({"params": params, COL_G: perturbs}, x, mutable=[COL_A])
    )

    def run(kfac, steps=40, lr=0.05):
        tx = optax.sgd(lr, momentum=0.9)
        st = TrainState(
            params=params,
            opt_state=tx.init(params),
            kfac_state=kfac.init_state() if kfac else None,
        )
        train_step = jax.jit(
            make_train_step(model, tx, kfac, perturb_template=perturbs)
        )
        scalars = KFACScalars.create(lr=lr, damping=0.03)
        losses = []
        for _ in range(steps):
            st, m = train_step(st, (x, y), scalars)
            losses.append(float(m["loss"]))
        return losses

    losses_sgd = run(None)
    losses_kfac = run(KFAC(specs, KFACConfig(damping=0.03, kl_clip=0.001)))
    assert losses_kfac[-1] < losses_sgd[0], "KFAC training must reduce loss"
    assert losses_kfac[-1] <= losses_sgd[-1] * 1.1, (
        f"KFAC should converge at least as fast: {losses_kfac[-1]} vs "
        f"{losses_sgd[-1]}"
    )


def test_f1mc_fisher_type():
    """True-Fisher MC sampling: G factors come from pseudo-label cotangents;
    the step runs under jit and trains."""
    rng_np = np.random.RandomState(7)
    x = jnp.asarray(rng_np.randn(32, 8).astype(np.float32))
    y = jnp.asarray(rng_np.randint(0, 4, 32))
    model = MLP()
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    specs, perturbs = ktpu.setup_kfac(model, {"params": params}, x)
    kfac = KFAC(specs, KFACConfig(damping=0.03))
    tx = optax.sgd(0.05, momentum=0.9)
    st = TrainState(params=params, opt_state=tx.init(params),
                    kfac_state=kfac.init_state(), model_state={})
    step = jax.jit(
        make_train_step(model, tx, kfac, perturb_template=perturbs,
                        fisher_type="F1mc")
    )
    scalars = KFACScalars.create(0.05, 0.03)
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(8):
        st, m = step(st, (x, y), scalars, jax.random.fold_in(key, i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # missing rng raises
    with pytest.raises(ValueError):
        make_train_step(model, tx, kfac, perturb_template=perturbs,
                        fisher_type="F1mc")(st, (x, y), scalars)
    with pytest.raises(ValueError):
        make_train_step(model, tx, kfac, perturb_template=perturbs,
                        fisher_type="bogus")
