"""Checkpoint/resume tests: full TrainState incl. K-FAC factor state."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

import kfac_pytorch_tpu as ktpu
from kfac_pytorch_tpu.training import checkpoint as ckpt
from kfac_pytorch_tpu.training.loop import KFACScalars, TrainState, make_train_step


class Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = ktpu.KFACDense(8, name="fc1")(x)
        x = jnp.tanh(x)
        return ktpu.KFACDense(3, name="fc2")(x)


def test_save_restore_roundtrip(tmp_path):
    model = Net()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 4).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 3, 8))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    specs, perturbs = ktpu.setup_kfac(model, {"params": params}, x)
    kfac = ktpu.DP_KFAC(specs, damping=0.03)
    tx = optax.sgd(0.1, momentum=0.9)
    state = TrainState(
        params=params, opt_state=tx.init(params),
        kfac_state=kfac.init_state(), model_state={},
    )
    step = jax.jit(make_train_step(model, tx, kfac, perturb_template=perturbs))
    scalars = KFACScalars.create(0.1, 0.03)
    for _ in range(3):
        state, _ = step(state, (x, y), scalars)

    base = str(tmp_path / "ckpts")
    os.makedirs(base)
    ckpt.save_checkpoint(base, state, epoch=0)
    for _ in range(2):
        state, _ = step(state, (x, y), scalars)
    ckpt.save_checkpoint(base, state, epoch=1)
    assert ckpt.latest_epoch(base) == 1

    template = TrainState(
        params=params, opt_state=tx.init(params),
        kfac_state=kfac.init_state(), model_state={},
    )
    restored, epoch = ckpt.restore_checkpoint(base, template)
    assert epoch == 1
    # K-FAC factor state restored exactly (warm curvature after resume —
    # the reference re-warms from scratch)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        jax.device_get(state),
        restored,
    )
    assert int(restored.kfac_state["step"]) == 5

    # training continues identically from the restored state
    s1, m1 = step(state, (x, y), scalars)
    s2, m2 = step(
        jax.tree_util.tree_map(jnp.asarray, restored), (x, y), scalars
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_restore_empty_dir(tmp_path):
    template = {"a": jnp.zeros(3)}
    restored, epoch = ckpt.restore_checkpoint(str(tmp_path), template)
    assert epoch is None and restored is template


def test_checkpoint_pruning(tmp_path):
    base = str(tmp_path)
    state = {"w": jnp.ones(4)}
    for e in range(5):
        ckpt.save_checkpoint(base, state, epoch=e, keep=2)
    left = sorted(os.listdir(base))
    assert left == ["checkpoint-3", "checkpoint-4"]


def test_async_checkpointer_roundtrip_and_resume(tmp_path):
    """AsyncCheckpointer: async save commits atomically, restore_latest
    resumes the full TrainState (incl. K-FAC factors), pruning keeps the
    newest `keep`."""
    model = Net()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8, 4).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 3, 8))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    specs, perturbs = ktpu.setup_kfac(model, {"params": params}, x)
    kfac = ktpu.DP_KFAC(specs, damping=0.03)
    tx = optax.sgd(0.1, momentum=0.9)
    state = TrainState(
        params=params, opt_state=tx.init(params),
        kfac_state=kfac.init_state(), model_state={},
    )
    step = jax.jit(make_train_step(model, tx, kfac, perturb_template=perturbs))
    scalars = KFACScalars.create(0.1, 0.03)

    base = str(tmp_path / "async_ckpts")
    mgr = ckpt.AsyncCheckpointer(base, keep=2)
    # empty dir -> no-op resume
    st0, start = mgr.restore_latest(state)
    assert start == 0

    for epoch in range(4):
        state, _ = step(state, (x, y), scalars)
        mgr.save(epoch, state)  # non-blocking
    mgr.close()

    # fresh manager (simulated process restart): auto-resume from newest
    template = TrainState(
        params=params, opt_state=tx.init(params),
        kfac_state=kfac.init_state(), model_state={},
    )
    mgr2 = ckpt.AsyncCheckpointer(base, keep=2)
    restored, start = mgr2.restore_latest(template)
    assert start == 4  # resume AFTER epoch 3
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6
        ),
        restored,
        jax.device_get(state),
    )
    # retention: only the newest 2 steps remain
    steps = sorted(mgr2._mgr.all_steps())
    assert steps == [2, 3]
    mgr2.close()
