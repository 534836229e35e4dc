"""True multi-process jax.distributed test (VERDICT round-1 item 5).

Two CPU processes on localhost, 4 simulated devices each -> a global
8-device mesh; both run the full sharded K-FAC train step through
parallel/multihost.py (init_multihost, make_global_batch,
local_batch_slice) and must agree with the single-process 8-device run on
the same global batch. This covers the reference's always-multi-node
execution model (/root/reference/launch_torch.sh:36-46) at the
process-boundary level — the part the simulated single-process mesh cannot.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent(
    """
    import json, os, sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, os.environ["KFAC_REPO"])
    import kfac_pytorch_tpu as ktpu
    from kfac_pytorch_tpu.parallel import mesh as meshlib
    from kfac_pytorch_tpu.parallel.multihost import (
        init_multihost, is_primary, local_batch_slice, make_global_batch,
    )
    from kfac_pytorch_tpu.parallel.strategies import BlockKFAC
    from kfac_pytorch_tpu.parallel.train import (
        make_sharded_train_step, shard_train_state,
    )
    from kfac_pytorch_tpu.preconditioner import KFACConfig
    from kfac_pytorch_tpu.training.loop import KFACScalars, TrainState
    import flax.linen as nn
    import optax

    init_multihost(
        coordinator_address=os.environ["COORD"],
        num_processes=int(os.environ["NPROC"]),
        process_id=int(os.environ["PID_IDX"]),
    )
    assert jax.device_count() == 8, jax.device_count()
    assert jax.process_count() == int(os.environ["NPROC"])

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = ktpu.KFACConv(6, (3, 3), name="conv")(x)
            x = nn.relu(x)
            x = x.reshape(x.shape[0], -1)
            return ktpu.KFACDense(4, name="fc")(x)

    GLOBAL_BATCH = 32
    rng = np.random.RandomState(0)
    X = rng.randn(GLOBAL_BATCH, 6, 6, 3).astype(np.float32)
    Y = rng.randint(0, 4, GLOBAL_BATCH)

    model = Net()
    x0 = jnp.asarray(X[:8])
    params = model.init(jax.random.PRNGKey(0), x0)["params"]
    specs, _ = ktpu.setup_kfac(model, {"params": params}, x0)

    mesh = meshlib.make_mesh(8)
    kfac = BlockKFAC(
        specs,
        KFACConfig(inv_type="eigen", strategy="mpd", damping=0.03,
                   kl_clip=0.001),
        world_size=8,
    )
    tx = optax.sgd(0.05, momentum=0.9)
    state = TrainState(params=params, opt_state=tx.init(params),
                      kfac_state=kfac.init_state(), model_state={})
    local_pert = ktpu.make_zero_perturbations(
        model, {"params": params}, jnp.asarray(X[: GLOBAL_BATCH // 8])
    )
    step = make_sharded_train_step(
        model, tx, kfac, mesh, state, local_perturb_template=local_pert
    )
    state = shard_train_state(mesh, kfac, state)

    start, size = local_batch_slice(GLOBAL_BATCH)
    batch = make_global_batch(
        mesh, (jnp.asarray(X[start : start + size]),
               jnp.asarray(Y[start : start + size]))
    )
    scalars = KFACScalars.create(lr=0.05, damping=0.03)
    losses = []
    for _ in range(3):
        state, m = step(state, batch, scalars)
        losses.append(float(m["loss"]))
    if is_primary():
        print("RESULT " + json.dumps(losses))
    if int(os.environ["NPROC"]) > 1:
        jax.distributed.shutdown()
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_matches_single_process(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            COORD=f"127.0.0.1:{port}",
            NPROC="2",
            PID_IDX=str(pid),
            KFAC_REPO=repo,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
        )
        env.pop("PYTEST_CURRENT_TEST", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
    result_lines = [
        ln for out, _ in outs for ln in out.splitlines()
        if ln.startswith("RESULT ")
    ]
    assert len(result_lines) == 1  # printed by the primary only
    losses_2proc = json.loads(result_lines[0][len("RESULT "):])

    # single-process 8-device run of the identical program
    env = dict(
        os.environ,
        COORD="unused",
        NPROC="1",
        PID_IDX="0",
        KFAC_REPO=repo,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    env.pop("PYTEST_CURRENT_TEST", None)
    p = subprocess.run(
        [sys.executable, str(worker)],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert p.returncode == 0, p.stderr
    line = [
        ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")
    ][0]
    losses_1proc = json.loads(line[len("RESULT "):])

    np.testing.assert_allclose(losses_2proc, losses_1proc, rtol=2e-4,
                               atol=1e-5)
    assert losses_2proc[-1] < losses_2proc[0]


def test_two_process_imagenet_harness_cli(tmp_path):
    """The HARNESS-level multihost path (train_imagenet --num-processes /
    --coordinator + per-process local batch feeding via
    make_global_batch): two localhost CPU processes, 4 simulated devices
    each, global 8-device mesh, 2 synthetic steps — both processes must
    exit cleanly and log the epoch metrics."""
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "examples", "train_imagenet.py")
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            PYTHONPATH=repo,
        )
        env.pop("PYTEST_CURRENT_TEST", None)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, script,
                    "--model", "resnet20", "--synthetic",
                    "--image-size", "32", "--num-classes", "10",
                    "--batch-size", "2", "--iters", "2", "--epochs", "1",
                    "--n-devices", "8",
                    "--coordinator", f"127.0.0.1:{port}",
                    "--num-processes", "2", "--process-id", str(pid),
                ],
                env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"harness worker failed:\n{out}"
    assert any("epoch 0:" in out for out in outs)
