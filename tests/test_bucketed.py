"""Bucket-resident trainer (training/bucketed.py) and round-2 BlockKFAC
restructure: stage-major conds, static schedule, cost-model bucket merging.

The semantics contract: the bucketed pipeline must reproduce the reference
pipeline (KFAC.step overwriting grads + torch.optim.SGD, reference
base.py:185-230 + pytorch_cifar10_resnet.py:226-231), which here is
make_train_step(model, optax.sgd, kfac).
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
from kfac_pytorch_tpu.training.bucketed import (
    BucketedTrainState,
    init_bucketed_state,
    kfac_leaf_mask,
    make_bucketed_train_step,
)
from kfac_pytorch_tpu.training.loop import (
    KFACScalars,
    TrainState,
    make_train_step,
)


class Net(nn.Module):
    classes: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ktpu.KFACConv(8, (3, 3), name="conv1")(x)
        x = nn.relu(x)
        x = ktpu.KFACConv(8, (3, 3), name="conv2")(x)  # same shape as conv1
        x = nn.relu(x)
        x = ktpu.KFACConv(12, (3, 3), strides=(2, 2), name="conv3")(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        x = x.reshape(x.shape[0], -1)
        x = ktpu.KFACDense(16, name="fc1")(x)
        x = jnp.tanh(x)
        return ktpu.KFACDense(self.classes, name="fc2")(x)


def _setup(batch=16, seed=0):
    rng = np.random.RandomState(seed)
    model = Net()
    x = jnp.asarray(rng.randn(batch, 8, 8, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 5, batch))
    variables = model.init(jax.random.PRNGKey(seed), x, train=True)
    params = variables["params"]
    model_state = {"batch_stats": variables["batch_stats"]}
    specs, perturbs = ktpu.setup_kfac(
        model, {"params": params, **model_state}, x, train=True
    )
    return model, params, model_state, specs, perturbs, x, y


def _run_reference(model, params, model_state, specs, perturbs, x, y, cfg,
                   steps, momentum=0.9, weight_decay=0.0, lr=0.05):
    kfac = BlockKFAC(specs, cfg, world_size=1)
    if weight_decay:
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.trace(decay=momentum),
            optax.scale(-lr),
        )
    else:
        tx = optax.sgd(lr, momentum=momentum)
    st = TrainState(
        params=params, opt_state=tx.init(params),
        kfac_state=kfac.init_state(), model_state=model_state,
    )
    step = jax.jit(make_train_step(
        model, tx, kfac, perturb_template=perturbs,
        train_kwargs={"train": True},
    ))
    scalars = KFACScalars.create(lr=lr, damping=cfg.damping)
    for _ in range(steps):
        st, m = step(st, (x, y), scalars)
    return st, m


def _run_bucketed(model, params, model_state, specs, perturbs, x, y, cfg,
                  steps, momentum=0.9, weight_decay=0.0, lr=0.05, **blk_kw):
    kfac = BlockKFAC(specs, cfg, world_size=1, **blk_kw)
    st = init_bucketed_state(kfac, params, model_state=model_state)
    step = jax.jit(make_bucketed_train_step(
        model, kfac, momentum=momentum, weight_decay=weight_decay,
        perturb_template=perturbs, train_kwargs={"train": True},
    ))
    scalars = KFACScalars.create(lr=lr, damping=cfg.damping)
    for _ in range(steps):
        st, m = step(st, (x, y), scalars)
    return st, m


def _assert_trees_close(a, b, rtol=2e-4, atol=1e-5):
    jax.tree_util.tree_map(
        lambda u, v: np.testing.assert_allclose(
            np.asarray(u), np.asarray(v), rtol=rtol, atol=atol
        ),
        a,
        b,
    )


@pytest.mark.parametrize("inv_type", ["eigen", "pcg"])
def test_bucketed_trainer_matches_reference_pipeline(inv_type):
    model, params, model_state, specs, perturbs, x, y = _setup()
    cfg = KFACConfig(inv_type=inv_type, damping=0.03, kl_clip=0.001,
                     pcg_precond_dtype=None)
    st_ref, m_ref = _run_reference(
        model, params, model_state, specs, perturbs, x, y, cfg, steps=3
    )
    st_b, m_b = _run_bucketed(
        model, params, model_state, specs, perturbs, x, y, cfg, steps=3
    )
    _assert_trees_close(st_ref.params, st_b.params)
    np.testing.assert_allclose(
        float(m_ref["loss"]), float(m_b["loss"]), rtol=1e-5
    )


def test_bucketed_weight_decay_matches_torch_sgd_semantics():
    model, params, model_state, specs, perturbs, x, y = _setup(seed=1)
    cfg = KFACConfig(inv_type="eigen", damping=0.03, kl_clip=0.001)
    st_ref, _ = _run_reference(
        model, params, model_state, specs, perturbs, x, y, cfg, steps=3,
        weight_decay=5e-4,
    )
    st_b, _ = _run_bucketed(
        model, params, model_state, specs, perturbs, x, y, cfg, steps=3,
        weight_decay=5e-4,
    )
    _assert_trees_close(st_ref.params, st_b.params)


def test_static_schedule_matches_dynamic():
    """static_schedule=True (no conds emitted at freq 1) must be numerically
    identical to the dynamic-gated path."""
    model, params, model_state, specs, perturbs, x, y = _setup(seed=2)
    dyn = KFACConfig(inv_type="pcg", damping=0.03, kl_clip=0.001,
                     pcg_precond_dtype=None)
    sta = KFACConfig(inv_type="pcg", damping=0.03, kl_clip=0.001,
                     pcg_precond_dtype=None, static_schedule=True)
    st_d, _ = _run_bucketed(
        model, params, model_state, specs, perturbs, x, y, dyn, steps=3
    )
    st_s, _ = _run_bucketed(
        model, params, model_state, specs, perturbs, x, y, sta, steps=3
    )
    _assert_trees_close(st_d.params, st_s.params, rtol=1e-6, atol=1e-7)


def test_static_schedule_freq_gating():
    """Static freq > 1 must gate exactly like dynamic freq > 1."""
    model, params, model_state, specs, perturbs, x, y = _setup(seed=3)
    sta = KFACConfig(inv_type="eigen", damping=0.03, kl_clip=None,
                     fac_update_freq=2, kfac_update_freq=2,
                     static_schedule=True)
    blk = BlockKFAC(specs, sta, world_size=1)

    def capture(params):
        def loss_fn(p, pert):
            out, muts = model.apply(
                {"params": p, "batch_stats": model_state["batch_stats"],
                 ktpu.COL_G: pert},
                x, train=True,
                mutable=[ktpu.COL_A, "batch_stats"],
            )
            one_hot = jax.nn.one_hot(y, out.shape[-1])
            loss = -jnp.mean(jnp.sum(one_hot * jax.nn.log_softmax(out), -1))
            return loss, muts[ktpu.COL_A]

        (_, acts), (grads, gs) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, perturbs)
        return acts, grads, gs

    acts, grads, gs = capture(params)
    step = jax.jit(lambda s, g, a, p: blk.step(s, g, a, p, lr=0.1))
    _, s1 = step(blk.init_state(), grads, acts, gs)
    a1 = np.asarray(s1["buckets"][0]["A"])
    # step 1: gated off -> A unchanged
    _, s2 = step(s1, grads, acts, gs)
    np.testing.assert_array_equal(np.asarray(s2["buckets"][0]["A"]), a1)
    # step 2: gated on -> A updates
    _, s3 = step(s2, grads, acts, gs)
    assert not np.allclose(np.asarray(s3["buckets"][0]["A"]), a1)


def test_merged_buckets_match_unmerged():
    """Cost-model bucket merging (identity padding) must not change the
    math."""
    model, params, model_state, specs, perturbs, x, y = _setup(seed=4)
    cfg = KFACConfig(inv_type="pcg", damping=0.03, kl_clip=0.001,
                     pcg_precond_dtype=None)
    st_a, _ = _run_bucketed(
        model, params, model_state, specs, perturbs, x, y, cfg, steps=2
    )
    st_b, _ = _run_bucketed(
        model, params, model_state, specs, perturbs, x, y, cfg, steps=2,
        # absurdly high dispatch cost -> everything merges into one bucket
        merge_flop_rate=1e12, merge_dispatch_cost=1.0,
    )
    kfac_merged = BlockKFAC(
        specs, cfg, merge_flop_rate=1e12, merge_dispatch_cost=1.0
    )
    assert len(kfac_merged.buckets) == 1
    _assert_trees_close(st_a.params, st_b.params, rtol=5e-4, atol=1e-5)


def test_bucket_merge_cost_model_keeps_large_apart():
    """With a realistic cost model, small buckets merge but large ones stay
    natural (round-1 measurement: blanket merging loses)."""
    from kfac_pytorch_tpu.capture import LayerSpec

    specs = tuple(
        LayerSpec(path=(f"l{i}",), kind="dense", in_dim=d, out_dim=d,
                  has_bias=False, param_path=(f"l{i}",))
        for i, d in enumerate([64, 96, 128, 2048, 4096])
    )
    kfac = BlockKFAC(
        specs, KFACConfig(), merge_flop_rate=8e13, merge_dispatch_cost=1e-3
    )
    dims = sorted((b.da, b.dg) for b in kfac.buckets)
    # small dims merged into one bucket; 2048/4096 untouched
    assert (2048, 2048) in dims and (4096, 4096) in dims
    assert len(kfac.buckets) == 3


def test_kfac_leaf_mask():
    model, params, model_state, specs, perturbs, x, y = _setup(seed=5)
    kfac = BlockKFAC(specs, KFACConfig())
    mask = kfac_leaf_mask(kfac, params)
    assert mask["conv1"]["layer"]["kernel"] is True
    assert mask["bn"]["scale"] is False
    n_true = sum(jax.tree_util.tree_leaves(mask))
    assert n_true == 10  # 5 kfac layers x (kernel, bias)


def test_bucketed_sharded_dp_smoke():
    """Bucketed trainer inside shard_map on the simulated mesh (via the
    make_sharded_bucketed_train_step assembly): dp strategy trains."""
    from kfac_pytorch_tpu.training.bucketed import (
        make_sharded_bucketed_train_step,
        shard_bucketed_state,
    )

    model, params, model_state, specs, perturbs, x, y = _setup(
        batch=32, seed=6
    )
    mesh = meshlib.make_mesh(8)
    n_dev = 8
    cfg = KFACConfig(inv_type="pcg", strategy="dp", damping=0.03,
                     kl_clip=0.001, static_schedule=True,
                     pcg_precond_dtype=None)
    kfac = BlockKFAC(specs, cfg, world_size=n_dev)
    local_x = x[: x.shape[0] // n_dev]
    local_pert = ktpu.make_zero_perturbations(
        model, {"params": params, **model_state}, local_x, train=True
    )
    st = init_bucketed_state(kfac, params, model_state=model_state)
    step_fn = make_sharded_bucketed_train_step(
        model, kfac, mesh, st, local_pert,
        train_kwargs={"train": True},
    )
    st = shard_bucketed_state(mesh, kfac, st)
    data = meshlib.shard_batch(mesh, (x, y))
    scalars = KFACScalars.create(lr=0.05, damping=0.03)
    losses = []
    for _ in range(4):
        st, m = step_fn(st, data, scalars)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_bucketed_grad_accum_matches_loop_trainer():
    """Bucketed n_accum=2 must reproduce make_grad_accum_train_step's
    semantics (reference --batches-per-allreduce,
    pytorch_imagenet_resnet.py:355-367): averaged micro grads, curvature
    from the LAST micro-batch, ONE K-FAC step + ONE momentum-SGD update."""
    from kfac_pytorch_tpu.training.loop import make_grad_accum_train_step

    model, params, model_state, specs, perturbs, x, y = _setup()
    micro = x.shape[0] // 2
    pert_micro = ktpu.make_zero_perturbations(
        model, {"params": params, **model_state}, x[:micro], train=True
    )
    cfg = KFACConfig(inv_type="eigen", damping=0.03, kl_clip=0.001)
    lr, momentum = 0.05, 0.9
    scalars = KFACScalars.create(lr=lr, damping=cfg.damping)

    kfac_ref = BlockKFAC(specs, cfg, world_size=1)
    tx = optax.sgd(lr, momentum=momentum)
    st_ref = TrainState(
        params=params, opt_state=tx.init(params),
        kfac_state=kfac_ref.init_state(), model_state=model_state,
    )
    ref_step = jax.jit(make_grad_accum_train_step(
        model, tx, kfac_ref, 2, perturb_template=pert_micro,
        train_kwargs={"train": True},
    ))
    for _ in range(3):
        st_ref, m_ref = ref_step(st_ref, (x, y), scalars)

    kfac_b = BlockKFAC(specs, cfg, world_size=1)
    st_b = init_bucketed_state(kfac_b, params, model_state=model_state)
    b_step = jax.jit(make_bucketed_train_step(
        model, kfac_b, momentum=momentum, perturb_template=pert_micro,
        train_kwargs={"train": True}, n_accum=2,
    ))
    for _ in range(3):
        st_b, m_b = b_step(st_b, (x, y), scalars)

    _assert_trees_close(st_ref.params, st_b.params)
    np.testing.assert_allclose(
        float(m_ref["loss"]), float(m_b["loss"]), rtol=1e-5
    )


def test_bucketed_sharded_accum_compression():
    """Sharded bucketed trainer with n_accum=2 + bf16 grad compression
    (the reference's --batches-per-allreduce and --fp16-allreduce on the
    flagship pipeline): trains, and tracks the uncompressed trajectory to
    bf16 tolerance."""
    from kfac_pytorch_tpu.training.bucketed import (
        make_sharded_bucketed_train_step,
        shard_bucketed_state,
    )

    model, params, model_state, specs, perturbs, x, y = _setup(
        batch=32, seed=7
    )
    mesh = meshlib.make_mesh(8)
    n_dev = 8
    cfg = KFACConfig(inv_type="pcg", strategy="dp", damping=0.03,
                     kl_clip=0.001, static_schedule=True,
                     pcg_precond_dtype=None)
    results = {}
    for compression in (None, "bf16"):
        kfac = BlockKFAC(specs, cfg, world_size=n_dev)
        micro = x.shape[0] // n_dev // 2
        local_pert = ktpu.make_zero_perturbations(
            model, {"params": params, **model_state}, x[:micro], train=True
        )
        st = init_bucketed_state(kfac, params, model_state=model_state)
        step_fn = make_sharded_bucketed_train_step(
            model, kfac, mesh, st, local_pert,
            train_kwargs={"train": True}, n_accum=2,
            grad_compression=compression,
        )
        st = shard_bucketed_state(mesh, kfac, st)
        data = meshlib.shard_batch(mesh, (x, y))
        scalars = KFACScalars.create(lr=0.05, damping=0.03)
        losses = []
        for _ in range(4):
            st, m = step_fn(st, data, scalars)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        results[compression] = (losses, st)
    np.testing.assert_allclose(
        results["bf16"][0], results[None][0], rtol=2e-2, atol=1e-3
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-3
        ),
        results["bf16"][1].params,
        results[None][1].params,
    )


def test_bucketed_sharded_delta_gather_compression():
    """bf16 delta-gather compression (the sync-gather exposure mitigation,
    tools/overlap_check evidence): trains, and tracks the uncompressed
    trajectory to bf16 tolerance — the gather is the reference's pred
    broadcast (inv.py:164-175) moved post-momentum."""
    from kfac_pytorch_tpu.training.bucketed import (
        make_sharded_bucketed_train_step,
        shard_bucketed_state,
    )

    model, params, model_state, specs, perturbs, x, y = _setup(
        batch=32, seed=8
    )
    mesh = meshlib.make_mesh(8)
    n_dev = 8
    cfg = KFACConfig(inv_type="pcg", strategy="dp", damping=0.03,
                     kl_clip=0.001, static_schedule=True,
                     pcg_precond_dtype=None)
    results = {}
    for compression in (None, "bf16"):
        kfac = BlockKFAC(specs, cfg, world_size=n_dev)
        local_x = x[: x.shape[0] // n_dev]
        local_pert = ktpu.make_zero_perturbations(
            model, {"params": params, **model_state}, local_x, train=True
        )
        st = init_bucketed_state(kfac, params, model_state=model_state)
        step_fn = make_sharded_bucketed_train_step(
            model, kfac, mesh, st, local_pert,
            train_kwargs={"train": True},
            delta_gather_compression=compression,
        )
        st = shard_bucketed_state(mesh, kfac, st)
        data = meshlib.shard_batch(mesh, (x, y))
        scalars = KFACScalars.create(lr=0.05, damping=0.03)
        losses = []
        for _ in range(4):
            st, m = step_fn(st, data, scalars)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        results[compression] = (losses, st)
    np.testing.assert_allclose(
        results["bf16"][0], results[None][0], rtol=2e-2, atol=1e-3
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-3
        ),
        results["bf16"][1].params,
        results[None][1].params,
    )


def test_build_bucketed_trainer_resume_state_passthrough():
    """build_bucketed_trainer(state=...) must wire the CALLER's state (the
    checkpoint-resume path in the harnesses) — not re-init: training must
    continue from the given momentum/factors, and the single-call builder
    must match the hand-assembled pipeline exactly."""
    from kfac_pytorch_tpu.training.bucketed import (
        build_bucketed_trainer,
        init_bucketed_state,
        make_bucketed_train_step,
    )

    model, params, model_state, specs, perturbs, x, y = _setup(seed=5)
    cfg = KFACConfig(inv_type="inverse", damping=0.03)
    kfac = BlockKFAC(specs, cfg, world_size=1)
    scalars = KFACScalars.create(lr=0.05, damping=0.03)

    # hand-assembled: 4 steps straight through
    st_ref = init_bucketed_state(kfac, params, model_state=model_state)
    step_ref = jax.jit(make_bucketed_train_step(
        model, kfac, perturb_template=perturbs,
        train_kwargs={"train": True},
    ))
    for _ in range(4):
        st_ref, _ = step_ref(st_ref, (x, y), scalars)

    # builder: 2 steps, "checkpoint" the state, rebuild with state=..., 2 more
    step_a, st = build_bucketed_trainer(
        model, kfac, params, model_state, x, micro_batch=x.shape[0],
        weight_decay=0.0,
    )
    for _ in range(2):
        st, _ = step_a(st, (x, y), scalars)
    restored = jax.tree_util.tree_map(jnp.asarray, st)  # "round-trip"
    step_b, st2 = build_bucketed_trainer(
        model, kfac, params, model_state, x, micro_batch=x.shape[0],
        weight_decay=0.0, state=restored,
    )
    for _ in range(2):
        st2, _ = step_b(st2, (x, y), scalars)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        st_ref.params, st2.params,
    )
