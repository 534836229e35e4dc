"""Collective/compute overlap evidence from the REAL TPU compiler schedule.

The reference's multiBcast exists to overlap per-layer inverse compute
with broadcast on parallel CUDA streams
(/root/reference/packages/tcmm/src/communicator.cpp:75-117). The TPU
claim (parallel/strategies.py) is that XLA's async collectives +
latency-hiding scheduler do this without manual streams. This tool
PROVES it (or disproves it) without multi-chip hardware: it AOT-compiles
the production sharded train step against a real TPU topology descriptor
(jax.experimental.topologies — the actual TPU compiler + scheduler, no
devices needed) and walks the scheduled HLO: every async collective pair
(-start/-done) is located in the instruction schedule, and the
instructions between start and done are counted and flop-weighted.

A collective whose -done immediately follows its -start is EXPOSED
(nothing hides its latency); one with substantial compute between the
pair is OVERLAPPED — the schedule-level equivalent of multiBcast's
stream concurrency.

Usage:
  python tools/overlap_check.py [--topology v5e:2x4] [--model resnet20]
      [--batch 8] [--image 32] [--production]

Note: XLA:CPU emits only sync collectives, so the 8-device CPU sim mesh
cannot answer this question — the TPU topology compile is load-bearing.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def analyze_schedule(hlo_text: str):
    """Per async-collective overlap stats from scheduled HLO text.

    Returns rows: {name, kind, payload_bytes, ops_between, flops_between,
    exposed}. Only the entry/while-body computations containing pairs are
    walked; textual order == schedule order when is_scheduled=true.
    """
    from tools.comm_volume import (
        _line_dot_flops,
        _parse_computations,
        _comp_shapes,
        _shape_bytes,
    )

    comps, _ = _parse_computations(hlo_text)
    start_re = re.compile(
        r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*?)\s+"
        r"(all-gather|all-reduce|reduce-scatter|collective-permute)"
        r"-start"
    )
    done_re = re.compile(
        r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*.*?"
        r"(?:all-gather|all-reduce|reduce-scatter|collective-permute)"
        r"-done[.\d]*\(%?([\w.\-]+)"
    )
    sync_re = re.compile(
        r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*?)\s+"
        r"(all-gather|all-reduce|reduce-scatter|collective-permute)"
        r"[.\d]*\("
    )
    rows = []
    for cname, lines in comps.items():
        starts = {}
        shapes = _comp_shapes(lines)
        for idx, line in enumerate(lines):
            sm = start_re.match(line)
            if sm:
                starts[sm.group(1)] = (idx, sm.group(3), sm.group(2))
                continue
            dm = done_re.match(line)
            if dm and dm.group(2) in starts:
                sidx, kind, shape_str = starts.pop(dm.group(2))
                between = lines[sidx + 1: idx]
                flops = sum(
                    _line_dot_flops(bl, shapes) for bl in between
                )
                # fusions hide dots: count convolution/fusion lines too
                heavy = sum(
                    1 for bl in between
                    if re.search(r"= \S+ (fusion|convolution|dot)", bl)
                )
                rows.append({
                    "computation": cname,
                    "name": dm.group(2),
                    "kind": kind,
                    "payload_bytes": _shape_bytes(shape_str),
                    "ops_between": len(between),
                    "heavy_ops_between": heavy,
                    "dot_flops_between": flops,
                    "exposed": len(between) == 0,
                    "async": True,
                })
                continue
            cm = sync_re.match(line)
            if cm and "-start" not in line.split("(")[0]:
                rows.append({
                    "computation": cname,
                    "name": cm.group(1),
                    "kind": cm.group(3),
                    "payload_bytes": _shape_bytes(cm.group(2)),
                    "ops_between": 0,
                    "heavy_ops_between": 0,
                    "dot_flops_between": 0.0,
                    "exposed": True,  # sync = blocking in schedule
                    "async": False,
                })
    return rows


def build_and_compile(topology: str, model_name: str, batch: int,
                      image: int, classes: int, production: bool,
                      n_devices: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import NamedSharding, PartitionSpec as P

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import kfac_pytorch_tpu as ktpu
    from kfac_pytorch_tpu.models import get_model
    from kfac_pytorch_tpu.parallel import mesh as meshlib
    from kfac_pytorch_tpu.parallel.strategies import BlockKFAC
    from kfac_pytorch_tpu.preconditioner import (
        KFACConfig,
        production_pcg_config,
    )
    from kfac_pytorch_tpu.training.bucketed import (
        bucketed_state_pspecs,
        init_bucketed_state,
        make_sharded_bucketed_train_step,
    )
    from kfac_pytorch_tpu.training.loop import KFACScalars

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name=topology
    )
    devs = np.array(topo.devices)[:n_devices]
    mesh = meshlib.make_mesh(devices=devs)
    n = len(devs)

    model = get_model(model_name, num_classes=classes)
    x = jnp.zeros((batch * n, image, image, 3), jnp.float32)
    y = jnp.zeros((batch * n,), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    params = variables["params"]
    model_state = {"batch_stats": variables["batch_stats"]}
    specs, _ = ktpu.setup_kfac(
        model, {"params": params, **model_state}, x, train=True
    )
    local_pert = ktpu.make_zero_perturbations(
        model, {"params": params, **model_state}, x[:batch], train=True
    )
    cfg = (production_pcg_config() if production
           else KFACConfig(inv_type="pcg", strategy="dp", damping=0.002))
    kfac = BlockKFAC(specs, cfg, world_size=n)
    st = init_bucketed_state(kfac, params, model_state=model_state)
    step = make_sharded_bucketed_train_step(
        model, kfac, mesh, st, local_pert, momentum=0.9,
        train_kwargs={"train": True},
    )
    state_specs = bucketed_state_pspecs(kfac, st, "data")

    def sds(a, s):
        return jax.ShapeDtypeStruct(
            a.shape, a.dtype, sharding=NamedSharding(mesh, s)
        )

    st_s = jax.tree_util.tree_map(sds, st, state_specs)
    data_s = jax.tree_util.tree_map(
        lambda a: sds(a, P("data")), (x, y)
    )
    scal = KFACScalars.create(lr=0.1, damping=cfg.damping)
    scal_s = jax.tree_util.tree_map(
        lambda a: sds(jnp.asarray(a), P()), scal
    )
    return jax.jit(step).lower(st_s, data_s, scal_s).compile().as_text()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--topology", default="v5e:2x4")
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--model", default="resnet20")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--image", type=int, default=32)
    p.add_argument("--classes", type=int, default=10)
    p.add_argument("--production", action="store_true",
                   help="production_pcg_config instead of plain pcg/dp")
    p.add_argument("--dump-hlo", default=None)
    args = p.parse_args(argv)

    hlo = build_and_compile(
        args.topology, args.model, args.batch, args.image, args.classes,
        args.production, args.devices,
    )
    if args.dump_hlo:
        open(args.dump_hlo, "w").write(hlo)
    assert "is_scheduled=true" in hlo, "expected a scheduled TPU module"
    rows = analyze_schedule(hlo)
    if not rows:
        print("no collectives found")
        return 1
    n_async = sum(r["async"] for r in rows)
    n_exposed = sum(r["exposed"] for r in rows)
    print(f"{len(rows)} collectives: {n_async} async, "
          f"{len(rows) - n_async} sync; {n_exposed} exposed, "
          f"{len(rows) - n_exposed} overlapped")
    from tools.project_pod import wire_bytes

    bw = 1e11  # conservative v5p-class per-device goodput (project_pod)
    total_exposed_s = 0.0
    for r in rows:
        tag = ("sync/EXPOSED " if not r["async"]
               else ("EXPOSED " if r["exposed"] else "overlap "))
        wire = wire_bytes(r["kind"], r["payload_bytes"], args.devices)
        if r["exposed"]:
            total_exposed_s += wire / bw
        print(f"  {tag:14s}{r['kind']:18s} "
              f"{r['payload_bytes']/1e6:8.3f} MB "
              f"| {r['ops_between']:4d} ops "
              f"({r['heavy_ops_between']} heavy, "
              f"{r['dot_flops_between']/1e9:.2f} GFLOP dot) "
              f"between start/done | {r['name']}")
    print(f"exposed wire-time bound @100GB/s, n={args.devices}: "
          f"{total_exposed_s*1e3:.3f} ms/step")
    return 0


if __name__ == "__main__":
    sys.exit(main())
