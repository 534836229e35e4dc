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


# --------------------------------------------------------------------------
# Executed-flop analysis (dot ops, conditional-aware)
# --------------------------------------------------------------------------

_COMP_HEADER_RE = re.compile(r"^(ENTRY\s+)?%?([\w.\-]+)\s*\(")
_INSTR_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\w+)\[([\d,]*)\]")
_DOT_LINE_RE = re.compile(r"\bdot\(([^)]*)\)")
_CALL_ATTR_RE = re.compile(
    r"(?:to_apply|calls|body|condition|true_computation|false_computation)="
    r"%?([\w.\-]+)"
)
_BRANCHES_RE = re.compile(r"branch_computations=\{([^}]*)\}")
_PARAM_RE = re.compile(r"%?([\w.\-]+):\s*(\w+)\[([\d,]*)\]")


def _parse_computations(hlo_text: str):
    """Split HLO text into {computation_name: [lines]} plus the entry name.

    Headers may carry tuple-typed params (nested parens), so only the
    leading ``[ENTRY] %name (`` is matched; the header line itself is kept
    as the first body line so simple param shapes remain resolvable."""
    comps, cur, entry = {}, None, None
    for line in hlo_text.splitlines():
        stripped = line.strip()
        if not line.startswith(" ") and stripped.endswith("{"):
            m = _COMP_HEADER_RE.match(stripped)
            if m:
                cur = m.group(2)
                comps[cur] = [stripped]
                if m.group(1):
                    entry = cur
                continue
        if cur is not None and stripped == "}":
            cur = None
            continue
        if cur is not None:
            comps[cur].append(line)
    return comps, entry


def _comp_shapes(lines):
    """{instr_name: [dims]} for one computation: defining instructions plus
    simple (non-tuple) header params."""
    shapes = {}
    if lines:
        for pm in _PARAM_RE.finditer(lines[0]):
            shapes[pm.group(1)] = [
                int(d) for d in pm.group(3).split(",") if d
            ]
    for line in lines[1:]:
        im = _INSTR_RE.match(line)
        if im:
            shapes[im.group(1)] = [
                int(d) for d in im.group(3).split(",") if d
            ]
    return shapes


def _line_dot_flops(line: str, shapes=None) -> float:
    """2 * prod(out_shape) * K for a dot line. K = contracted size from the
    lhs operand's shape (resolved via ``shapes`` — compiled HLO prints bare
    operand names) and lhs_contracting_dims."""
    if "dot(" not in line:
        return 0.0
    im = _INSTR_RE.match(line)
    dm = _DOT_LINE_RE.search(line)
    if not im or not dm:
        return 0.0
    out_dims = [int(d) for d in im.group(3).split(",") if d]
    out_elems = float(np.prod(out_dims)) if out_dims else 1.0
    k = 1.0
    cdims = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", line)
    lhs_dims = None
    args = dm.group(1).split(",")
    if args:
        a0 = args[0].strip()
        sm = re.match(r"(\w+)\[([\d,]*)\]", a0)  # typed operand form
        if sm:
            lhs_dims = [int(d) for d in sm.group(2).split(",") if d]
        elif shapes is not None:
            lhs_dims = shapes.get(a0.split(" ")[-1].lstrip("%"))
    if cdims and cdims.group(1) and lhs_dims:
        for ci in cdims.group(1).split(","):
            ci = int(ci)
            if ci < len(lhs_dims):
                k *= lhs_dims[ci]
    return 2.0 * out_elems * k


def executed_dot_flops(hlo_text: str) -> float:
    """Estimated per-device EXECUTED dot flops of one step.

    Walks the computation call graph from the entry: called computations
    (fusions, calls, while bodies) count once per call site; a
    ``conditional`` counts the MEAN over its branches — under SPMD
    owner-only scheduling every device executes exactly one of the N
    symmetric shard branches, so the mean is the per-device truth. (While
    trip counts are not modeled; the K-FAC step has no dot-bearing loops —
    CG is unrolled.)
    """
    comps, entry = _parse_computations(hlo_text)
    if entry is None:
        return 0.0
    return _subtree_dot_flops(comps, entry)


def _subtree_dot_flops(comps, root) -> float:
    """Transitive executed dot flops of one computation subtree (conditional
    branches averaged)."""
    memo = {}

    def rec(name, stack=()):
        if name in memo:
            return memo[name]
        if name not in comps or name in stack:
            return 0.0
        shapes = _comp_shapes(comps[name])
        total = 0.0
        for line in comps[name]:
            total += _line_dot_flops(line, shapes)
            bm = _BRANCHES_RE.search(line)
            if bm:
                branches = [
                    b.strip().lstrip("%")
                    for b in bm.group(1).split(",") if b.strip()
                ]
                if branches:
                    total += sum(
                        rec(b, stack + (name,)) for b in branches
                    ) / len(branches)
            for cm in _CALL_ATTR_RE.finditer(line):
                total += rec(cm.group(1), stack + (name,))
        memo[name] = total
        return total

    return rec(root)


def build_step(model_name, strategy, n_dev, batch, image, classes,
               bf16_allreduce=False, inv_type=None, owner_only=True):
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
                owner_only_factors=owner_only,
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
    p.add_argument("--flops", action="store_true",
                   help="also report per-device EXECUTED dot GFLOPs "
                        "(conditional branches averaged — the owner-only "
                        "factor sharding shows up here)")
    p.add_argument("--no-owner-only", action="store_true",
                   help="disable owner-only dp factor compute (A/B)")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    rows = []
    for strategy in args.strategies:
        step, state, data, scalars = build_step(
            args.model, strategy, args.devices, args.batch, args.image,
            args.classes, bf16_allreduce=args.bf16_allreduce,
            inv_type=args.inv_type, owner_only=not args.no_owner_only,
        )
        lowered = jax.jit(step).lower(state, data, scalars)
        hlo = lowered.compile().as_text()
        stats = collective_stats(hlo)
        total = sum(b for _, b in stats.values())
        rows.append((strategy, stats, total))
        detail = ", ".join(
            f"{k}: n={c} {b/1e6:.3f}MB" for k, (c, b) in sorted(stats.items())
        )
        flops_str = ""
        if args.flops:
            gf = executed_dot_flops(hlo) / 1e9
            flops_str = f" | executed dot {gf:8.3f} GFLOP/device"
        print(f"{strategy:8s} total {total/1e6:8.3f} MB/step/device | "
              f"{detail}{flops_str}")
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
