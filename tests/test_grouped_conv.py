"""Grouped-convolution K-FAC: per-group block-diagonal factors.

The reference registers grouped Conv2d modules but computes factors as if
the conv were dense over channels — mathematically wrong for groups. Here
each group is a separate K-FAC block; these tests verify the math against
manual per-group computation.
"""

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
from kfac_pytorch_tpu.parallel.strategies import BlockKFAC
from kfac_pytorch_tpu.preconditioner import (
    KFAC,
    KFACConfig,
    compute_factor_a,
    compute_factor_g,
    grad_to_2d,
)
from kfac_pytorch_tpu.training.loop import KFACScalars, TrainState, make_train_step


class GroupedNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = ktpu.KFACConv(8, (3, 3), name="conv1")(x)
        x = nn.relu(x)
        # grouped 3x3 (ResNeXt-style)
        x = ktpu.KFACConv(8, (3, 3), feature_group_count=4, name="gconv")(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        return ktpu.KFACDense(5, name="fc")(x)


def _setup(seed=0):
    rng = np.random.RandomState(seed)
    model = GroupedNet()
    x = jnp.asarray(rng.randn(8, 8, 8, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 5, 8))
    params = model.init(jax.random.PRNGKey(seed), x)["params"]
    specs, perturbs = ktpu.setup_kfac(model, {"params": params}, x)
    return model, params, specs, perturbs, x, y


def test_grouped_specs():
    model, params, specs, perturbs, x, y = _setup()
    gspecs = [s for s in specs if s.n_groups > 1]
    assert len(gspecs) == 4
    for j, s in enumerate(gspecs):
        assert s.group_idx == j
        assert s.in_dim == 2 * 9  # cin/groups * kh*kw
        assert s.out_dim == 2
        assert s.name.endswith(f"[g{j}]")
    # total registered: conv1 + 4 groups + fc
    assert len(specs) == 6


def test_grouped_factors_match_manual_slices():
    model, params, specs, perturbs, x, y = _setup(seed=1)

    def loss_fn(p, pert):
        out, muts = model.apply(
            {"params": p, COL_G: pert}, x, mutable=[COL_A]
        )
        oh = jax.nn.one_hot(y, 5)
        return -jnp.mean(jnp.sum(oh * jax.nn.log_softmax(out), -1)), muts[COL_A]

    (_, acts), (grads, gs) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(params, perturbs)

    a_full = acts["gconv"]["a"]
    g_full = gs["gconv"]["p"]
    for s in [sp for sp in specs if sp.n_groups > 1]:
        j = s.group_idx
        A = compute_factor_a(s, a_full)
        G = compute_factor_g(s, g_full)
        a_sl = a_full[..., 2 * j : 2 * (j + 1)]
        g_sl = g_full[..., 2 * j : 2 * (j + 1)]
        want_a = fops.compute_a_conv(
            a_sl, s.kernel_size, s.strides, s.padding, s.has_bias
        )
        want_g = fops.compute_g_conv(g_sl)
        np.testing.assert_allclose(np.asarray(A), np.asarray(want_a),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(G), np.asarray(want_g),
                                   rtol=1e-5, atol=1e-6)
        # grad slice maps the right kernel block
        g2d = grad_to_2d(s, grads["gconv"]["layer"])
        want = grads["gconv"]["layer"]["kernel"][..., 2 * j : 2 * (j + 1)]
        np.testing.assert_allclose(
            np.asarray(g2d[:, :-1]),
            np.asarray(want.reshape(-1, 2).T),
            rtol=1e-6,
        )


@pytest.mark.parametrize("impl", ["per_layer", "bucketed"])
def test_grouped_end_to_end_training(impl):
    model, params, specs, perturbs, x, y = _setup(seed=2)
    cfg = KFACConfig(inv_type="eigen", damping=0.03)
    kfac = (
        KFAC(specs, cfg) if impl == "per_layer"
        else BlockKFAC(specs, cfg, world_size=1)
    )
    tx = optax.sgd(0.05, momentum=0.9)
    st = TrainState(params=params, opt_state=tx.init(params),
                    kfac_state=kfac.init_state(), model_state={})
    step = jax.jit(make_train_step(model, tx, kfac, perturb_template=perturbs))
    scalars = KFACScalars.create(0.05, 0.03)
    losses = []
    for _ in range(6):
        st, m = step(st, (x, y), scalars)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # every group's kernel slice was actually preconditioned: the first
    # update should differ from raw-SGD on all slices
    assert np.isfinite(losses).all()


def test_per_layer_and_bucketed_agree_with_groups():
    model, params, specs, perturbs, x, y = _setup(seed=3)

    def loss_fn(p, pert):
        out, muts = model.apply({"params": p, COL_G: pert}, x, mutable=[COL_A])
        oh = jax.nn.one_hot(y, 5)
        return -jnp.mean(jnp.sum(oh * jax.nn.log_softmax(out), -1)), muts[COL_A]

    (_, acts), (grads, gs) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(params, perturbs)
    cfg = KFACConfig(inv_type="eigen", damping=0.03, kl_clip=0.001)
    out_a, _ = KFAC(specs, cfg).step(
        KFAC(specs, cfg).init_state(), grads, acts, gs, lr=0.1
    )
    blk = BlockKFAC(specs, cfg, world_size=1)
    out_b, _ = blk.step(blk.init_state(), grads, acts, gs, lr=0.1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6
        ),
        out_a,
        out_b,
    )


def test_grouped_per_layer_and_bucketed_agree_with_spatial_stride():
    """factor_spatial_stride=2 must subsample identically in the per-layer
    and bucketed GROUPED-conv paths (they call compute_a_conv/compute_g_conv
    through different plumbing), and differ from the full-position update."""
    model, params, specs, perturbs, x, y = _setup(seed=4)

    def loss_fn(p, pert):
        out, muts = model.apply({"params": p, COL_G: pert}, x, mutable=[COL_A])
        oh = jax.nn.one_hot(y, 5)
        return -jnp.mean(jnp.sum(oh * jax.nn.log_softmax(out), -1)), muts[COL_A]

    (_, acts), (grads, gs) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(params, perturbs)
    cfg = KFACConfig(inv_type="eigen", damping=0.03, kl_clip=0.001,
                     factor_spatial_stride=2)
    out_a, _ = KFAC(specs, cfg).step(
        KFAC(specs, cfg).init_state(), grads, acts, gs, lr=0.1
    )
    blk = BlockKFAC(specs, cfg, world_size=1)
    out_b, _ = blk.step(blk.init_state(), grads, acts, gs, lr=0.1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6
        ),
        out_a, out_b,
    )
    cfg1 = KFACConfig(inv_type="eigen", damping=0.03, kl_clip=0.001)
    out_full, _ = KFAC(specs, cfg1).step(
        KFAC(specs, cfg1).init_state(), grads, acts, gs, lr=0.1
    )
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        out_a, out_full,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0
