"""Gradient accumulation (--batches-per-allreduce parity) and round-2 minor
fixes: make_mesh factorization, warmup lr ramp.

Reference semantics (pytorch_imagenet_resnet.py:355-367): backward() over
n sub-batches sums into .grad, then ONE allreduce + ONE preconditioner.step
+ ONE optimizer.step; the K-FAC hooks overwrite m_a/m_g each forward so the
curvature statistics come from the LAST sub-batch.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

import kfac_pytorch_tpu as ktpu
from kfac_pytorch_tpu.parallel import mesh as meshlib
from kfac_pytorch_tpu.parallel.strategies import BlockKFAC
from kfac_pytorch_tpu.preconditioner import KFACConfig
from kfac_pytorch_tpu.training.loop import (
    KFACScalars,
    TrainState,
    make_grad_accum_train_step,
)


class Net(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ktpu.KFACConv(6, (3, 3), name="conv")(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        return ktpu.KFACDense(4, name="fc")(x)


def _setup(batch=8, seed=0):
    rng = np.random.RandomState(seed)
    model = Net()
    x = jnp.asarray(rng.randn(batch, 6, 6, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 4, batch))
    params = model.init(jax.random.PRNGKey(seed), x)["params"]
    return model, params, x, y


def test_grad_accum_matches_manual_reference():
    """n_accum=2 must equal: average of micro grads, K-FAC step with the
    LAST micro-batch's (a, g), one optimizer update."""
    model, params, x, y = _setup(batch=8)
    micro = 4
    specs, pert_micro = ktpu.setup_kfac(
        model, {"params": params}, x[:micro]
    )
    cfg = KFACConfig(inv_type="eigen", damping=0.03, kl_clip=0.001)
    kfac = BlockKFAC(specs, cfg)
    tx = optax.sgd(0.1, momentum=0.9)
    scalars = KFACScalars.create(lr=0.1, damping=0.03)

    # library path
    step = jax.jit(make_grad_accum_train_step(
        model, tx, kfac, 2, perturb_template=pert_micro
    ))
    st = TrainState(params=params, opt_state=tx.init(params),
                    kfac_state=kfac.init_state(), model_state={})
    st_out, _ = step(st, (x, y), scalars)

    # manual reference
    def loss_fn(p, pert, batch):
        out, muts = model.apply(
            {"params": p, ktpu.COL_G: pert}, batch[0], mutable=[ktpu.COL_A]
        )
        one_hot = jax.nn.one_hot(batch[1], out.shape[-1])
        return (
            -jnp.mean(jnp.sum(one_hot * jax.nn.log_softmax(out), -1)),
            muts[ktpu.COL_A],
        )

    grads_list, acts, gs = [], None, None
    for k in range(2):
        chunk = (x[k * micro : (k + 1) * micro],
                 y[k * micro : (k + 1) * micro])
        (_, acts), (g, gs) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, pert_micro, chunk)
        grads_list.append(g)
    grads = jax.tree_util.tree_map(
        lambda a, b: (a + b) / 2.0, *grads_list
    )
    pg, _ = kfac.step(kfac.init_state(), grads, acts, gs, lr=0.1,
                      damping=jnp.asarray(0.03))
    upd, _ = tx.update(pg, tx.init(params), params)
    params_ref = optax.apply_updates(params, upd)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
        ),
        st_out.params,
        params_ref,
    )


def test_grad_accum_sgd_arm():
    """n_accum with kfac=None equals SGD on the averaged gradient."""
    model, params, x, y = _setup(batch=8, seed=1)
    tx = optax.sgd(0.1)
    step = jax.jit(make_grad_accum_train_step(model, tx, None, 2))
    st = TrainState(params=params, opt_state=tx.init(params),
                    kfac_state=None, model_state={})
    st_out, m = step(st, (x, y), KFACScalars.create(0.1))
    assert np.isfinite(float(m["loss"]))

    def loss(p, batch):
        out = model.apply({"params": p}, batch[0])
        one_hot = jax.nn.one_hot(batch[1], out.shape[-1])
        return -jnp.mean(jnp.sum(one_hot * jax.nn.log_softmax(out), -1))

    g1 = jax.grad(lambda p: loss(p, (x[:4], y[:4])))(params)
    g2 = jax.grad(lambda p: loss(p, (x[4:], y[4:])))(params)
    g = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2)
    ref = jax.tree_util.tree_map(lambda p, gg: p - 0.1 * gg, params, g)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
        ),
        st_out.params,
        ref,
    )


def test_sharded_accum_smoke():
    from kfac_pytorch_tpu.parallel.train import (
        make_sharded_train_step, shard_train_state,
    )

    model, params, x, y = _setup(batch=32, seed=2)
    mesh = meshlib.make_mesh(8)
    specs, _ = ktpu.setup_kfac(model, {"params": params}, x)
    kfac = BlockKFAC(specs, KFACConfig(inv_type="eigen", damping=0.03),
                     world_size=8)
    tx = optax.sgd(0.05, momentum=0.9)
    state = TrainState(params=params, opt_state=tx.init(params),
                       kfac_state=kfac.init_state(), model_state={})
    # device-local batch = 4, n_accum=2 -> micro = 2
    local_pert = ktpu.make_zero_perturbations(
        model, {"params": params}, x[:2]
    )
    step = make_sharded_train_step(
        model, tx, kfac, mesh, state, local_perturb_template=local_pert,
        n_accum=2,
    )
    state = shard_train_state(mesh, kfac, state)
    data = meshlib.shard_batch(mesh, (x, y))
    scalars = KFACScalars.create(lr=0.05, damping=0.03)
    losses = []
    for _ in range(3):
        state, m = step(state, data, scalars)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_bf16_grad_allreduce_compression():
    """grad_compression='bf16' (the reference's --fp16-allreduce) trains
    and stays close to the f32 allreduce."""
    from kfac_pytorch_tpu.parallel.train import (
        make_sharded_train_step, shard_train_state,
    )

    model, params, x, y = _setup(batch=32, seed=5)
    mesh = meshlib.make_mesh(8)
    tx = optax.sgd(0.05)

    def run(comp):
        state = TrainState(params=params, opt_state=tx.init(params),
                           kfac_state=None, model_state={})
        step = make_sharded_train_step(
            model, tx, None, mesh, state, grad_compression=comp,
        )
        state = shard_train_state(mesh, None, state)
        data = meshlib.shard_batch(mesh, (x, y))
        scalars = KFACScalars.create(lr=0.05)
        for _ in range(3):
            state, m = step(state, data, scalars)
        return state, float(m["loss"])

    st32, l32 = run(None)
    stbf, lbf = run("bf16")
    assert abs(l32 - lbf) < 0.05
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0.05, atol=5e-3
        ),
        st32.params,
        stbf.params,
    )


def test_make_mesh_multi_axis_factorization():
    """Non-perfect-power device counts factor exactly (round-1 latent bug:
    n=8 with 2 axes raised)."""
    devs = jax.devices()
    m = meshlib.make_mesh(8, axis_names=("data", "model"))
    assert m.devices.size == 8
    assert int(np.prod(m.devices.shape)) == 8
    m6 = meshlib.make_mesh(6, axis_names=("data", "model"))
    assert sorted(m6.devices.shape) == [2, 3]
    m7 = meshlib.make_mesh(7, axis_names=("data", "model"))
    assert int(np.prod(m7.devices.shape)) == 7


def test_per_layer_kfac_factor_mean_axis_shard_map():
    """Per-layer KFAC.step with factor_mean_axis (the MPD factor allreduce)
    under shard_map: must lower (pmean hoisted outside the cond — the
    round-1 ADVICE SPMD-safety fix) and equal the single-device full-batch
    run."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from kfac_pytorch_tpu.preconditioner import KFAC

    model, params, x, y = _setup(batch=32, seed=3)
    specs, perturbs = ktpu.setup_kfac(model, {"params": params}, x)
    cfg = KFACConfig(inv_type="eigen", damping=0.03, kl_clip=0.001)
    kfac = KFAC(specs, cfg)
    mesh = meshlib.make_mesh(8)

    def capture(pert, batch):
        def loss_fn(p, pe):
            out, muts = model.apply(
                {"params": p, ktpu.COL_G: pe}, batch[0],
                mutable=[ktpu.COL_A],
            )
            one_hot = jax.nn.one_hot(batch[1], out.shape[-1])
            return (
                -jnp.mean(jnp.sum(one_hot * jax.nn.log_softmax(out), -1)),
                muts[ktpu.COL_A],
            )

        (_, acts), (grads, gs) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, pert)
        return acts, grads, gs

    # single-device full batch
    acts, grads, gs = capture(perturbs, (x, y))
    out_ref, _ = kfac.step(kfac.init_state(), grads, acts, gs, lr=0.1)

    # sharded: local capture, pmean'd grads, factor_mean_axis='data'
    local_pert = ktpu.make_zero_perturbations(model, {"params": params},
                                              x[:4])

    def local_step(state, batch):
        acts, grads, gs = capture(local_pert, batch)
        grads = jax.lax.pmean(grads, "data")
        out, state = kfac.step(state, grads, acts, gs, lr=0.1,
                               factor_mean_axis="data")
        return out, state

    specs_state = jax.tree_util.tree_map(lambda _: P(), kfac.init_state())
    fn = jax.jit(shard_map(
        local_step, mesh=mesh,
        in_specs=(specs_state, (P("data"), P("data"))),
        out_specs=(jax.tree_util.tree_map(lambda _: P(), grads),
                   specs_state),
        check_vma=False,
    ))
    out_sh, _ = fn(kfac.init_state(), (x, y))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        ),
        out_ref,
        out_sh,
    )


def test_warmup_multistep_matches_reference_ramp():
    """Exact parity with reference create_lr_schedule
    (examples/utils.py:54-66) applied to lr = base * workers."""
    from kfac_pytorch_tpu.utils.lr_schedules import warmup_multistep

    workers, warmup, base = 4, 5, 0.1
    sched = warmup_multistep(base, warmup, [35, 75], alpha=0.1,
                             steps_per_epoch=1, workers=workers)

    def ref(epoch):
        if epoch < warmup:
            adj = 1.0 / workers * (epoch * (workers - 1) / warmup + 1)
        else:
            adj = 1.0
            for e in [75, 35]:
                if epoch >= e:
                    adj *= 0.1
        return base * workers * adj

    for ep in [0, 1, 2, 4, 5, 10, 35, 36, 74, 75, 80]:
        np.testing.assert_allclose(
            float(sched(jnp.asarray(ep))), ref(ep), rtol=1e-6
        )
    # workers == 1: no ramp (reference behavior)
    s1 = warmup_multistep(base, warmup, [35], workers=1)
    np.testing.assert_allclose(float(s1(jnp.asarray(0))), base, rtol=1e-6)
