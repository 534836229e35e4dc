"""Compile-time collective-traffic analysis of the distributed K-FAC step.

Counts the collective ops (all-reduce / all-gather / reduce-scatter /
collective-permute) and their payload bytes in the COMPILED HLO of the
sharded train step, per strategy — the measurable form of DP-KFAC's core
claim (no factor communication; only the gradient allreduce + one
preconditioned-gradient gather) versus MPD-KFAC's factor allreduce
(reference kfac_preconditioner_inv.py:94-103 vs inv_dp.py:93-95; paper
IEEE TCC 2022). Runs on the simulated CPU mesh — collective structure is
identical on a real TPU mesh; only link bandwidth differs.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/comm_volume.py [--devices 8] [--model resnet20] \
        [--strategies dp mpd sgd] [--bf16-allreduce]

Prints one table row per strategy: collective op counts and total bytes
moved per device per step.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


_COLLECTIVES = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "s32": 4,
    "u64": 8, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}


def _shape_bytes(shape_str: str) -> int:
    """Bytes of one HLO shape string like 'f32[8,128,128]' or a tuple
    '(f32[4], bf16[2,2])'."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


_COLLECTIVE_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(.*?)\s+"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"((?:-start)?)[\d.]*\("
)


def collective_stats(hlo_text: str):
    """{op_kind: (count, payload_bytes)} from compiled HLO text.

    Handles variadic collectives (tuple output shapes) and async
    start/done pairs (the -done half repeats the shape; only the op —
    sync or -start — is counted)."""
    stats = {}
    for line in hlo_text.splitlines():
        m = _COLLECTIVE_RE.match(line)
        if not m:
            continue
        shape_str, kind = m.group(1), m.group(2)
        cnt, byt = stats.get(kind, (0, 0))
        stats[kind] = (cnt + 1, byt + _shape_bytes(shape_str))
    return stats


def build_step(model_name, strategy, n_dev, batch, image, classes,
               bf16_allreduce=False, inv_type=None):
    import jax
    import jax.numpy as jnp

    import kfac_pytorch_tpu as ktpu
    from kfac_pytorch_tpu.models import get_model
    from kfac_pytorch_tpu.parallel import mesh as meshlib
    from kfac_pytorch_tpu.parallel.strategies import BlockKFAC
    from kfac_pytorch_tpu.parallel.train import (
        make_sharded_train_step,
        shard_train_state,
    )
    from kfac_pytorch_tpu.preconditioner import KFACConfig
    from kfac_pytorch_tpu.training.loop import KFACScalars, TrainState
    from kfac_pytorch_tpu.utils import lr_schedules

    mesh = meshlib.make_mesh(n_dev)
    model = get_model(model_name, num_classes=classes)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((batch * n_dev, image, image, 3), jnp.float32)
    y = jnp.zeros((batch * n_dev,), jnp.int32)
    variables = model.init(rng, x, train=True)
    params = variables["params"]
    model_state = {
        k: v for k, v in variables.items()
        if k not in ("params", ktpu.COL_A, ktpu.COL_G)
    }

    kfac = None
    local_pert = None
    if strategy != "sgd":
        specs, _ = ktpu.setup_kfac(
            model, {"params": params, **model_state}, x, train=True
        )
        kfac = BlockKFAC(
            specs,
            KFACConfig(
                inv_type=inv_type or "eigen",
                strategy=strategy,
                damping=0.03,
            ),
            world_size=n_dev,
        )
        local_pert = ktpu.make_zero_perturbations(
            model, {"params": params, **model_state}, x[:batch], train=True
        )

    tx = lr_schedules.sgd_optimizer(lambda s: 0.1, 0.9, 5e-4)
    state = TrainState(
        params=params,
        opt_state=tx.init(params),
        kfac_state=kfac.init_state() if kfac else None,
        model_state=model_state,
    )
    step = make_sharded_train_step(
        model, tx, kfac, mesh, state,
        local_perturb_template=local_pert,
        train_kwargs={"train": True},
        grad_compression="bf16" if bf16_allreduce else None,
    )
    state = shard_train_state(mesh, kfac, state)
    scalars = KFACScalars.create(lr=0.1, damping=0.03)
    return step, state, (x, y), scalars


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--model", default="resnet20")
    p.add_argument("--batch", type=int, default=8, help="per-device batch")
    p.add_argument("--image", type=int, default=32)
    p.add_argument("--classes", type=int, default=10)
    p.add_argument("--strategies", nargs="+",
                   default=["sgd", "dp", "mpd"])
    p.add_argument("--inv-type", default=None,
                   help="eigen|inverse|pcg (default eigen)")
    p.add_argument("--bf16-allreduce", action="store_true")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    rows = []
    for strategy in args.strategies:
        step, state, data, scalars = build_step(
            args.model, strategy, args.devices, args.batch, args.image,
            args.classes, bf16_allreduce=args.bf16_allreduce,
            inv_type=args.inv_type,
        )
        lowered = jax.jit(step).lower(state, data, scalars)
        hlo = lowered.compile().as_text()
        stats = collective_stats(hlo)
        total = sum(b for _, b in stats.values())
        rows.append((strategy, stats, total))
        detail = ", ".join(
            f"{k}: n={c} {b/1e6:.3f}MB" for k, (c, b) in sorted(stats.items())
        )
        print(f"{strategy:8s} total {total/1e6:8.3f} MB/step/device | "
              f"{detail}")
    if {"dp", "mpd"} <= {r[0] for r in rows}:
        by = {r[0]: r[2] for r in rows}
        sgd = by.get("sgd", 0)
        print(
            f"# K-FAC-added comm: dp {max(by['dp']-sgd,0)/1e6:.3f} MB vs "
            f"mpd {max(by['mpd']-sgd,0)/1e6:.3f} MB "
            f"(reference claim: DP-KFAC removes the factor allreduce, "
            f"inv_dp.py:93-95)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
