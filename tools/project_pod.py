"""Projected pod-scale K-FAC step overhead vs SGD (the north-star metric).

Multi-host hardware is not available in this environment, so the
BASELINE.json "1 chip / 1 host / >= 2 hosts" scaling row is projected, not
measured — the same modeling the reference itself ships for its cluster
(alpha-beta NCCL fits, /root/reference/scripts/comm_models.py:8-50). The
projection combines three measured inputs:

  1. MEASURED single-chip step times (bench.py scan-chained: sgd step,
     kfac step, and the fixed non-GEMM tail from the KFB_PROFILE
     attribution),
  2. HLO-MEASURED per-device collective payload bytes AND executed dot
     flops of the real sharded train step at n in {1,2,4,8} devices
     (tools/comm_volume.py machinery on the simulated CPU mesh — the
     compiled collective structure is exact per device count; only link
     speed differs from TPU),
  3. an alpha-beta ICI link model (configurable; defaults are
     conservative v5p-class numbers).

and prints predicted per-step overhead vs SGD at n = 8/16/32 for the dp
and mpd strategies. The owner-only 1/n factor-flop sharding enters through
the HLO executed-flop curve (conditional-mean accounting in
comm_volume.executed_dot_flops), NOT as an assumed 1/n.

Model (weak scaling, fixed per-device batch):
  t_sgd(n)  = t_sgd_1dev + t_comm(sgd, n)
  t_kfac(n) = t_sgd_1dev + t_fixed
              + (t_kfac_1dev - t_sgd_1dev - t_fixed) * dflops(n)/dflops(1)
              + t_comm(strategy, n)
  overhead(n) = t_kfac(n) / t_sgd(n)
where dflops(n) = per-device K-FAC-added executed dot flops from HLO, and
t_comm converts HLO payload bytes to wire time with ring-algorithm wire
factors (allreduce 2B(n-1)/n, allgather/reducescatter B(n-1)/n) plus a
per-collective launch latency alpha.

Usage:
  python tools/project_pod.py --measure            # collect + project
  python tools/project_pod.py --from-json F.json   # project from saved
  python tools/project_pod.py --collect N          # (internal) one n
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from typing import Dict, List, Sequence

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# ---------------------------------------------------------------------------
# wire-traffic model
# ---------------------------------------------------------------------------

# bytes actually moved per device by a ring-algorithm collective, as a
# multiple of the HLO payload bytes B (comm_volume._shape_bytes of the op's
# printed shape: operand size for all-reduce, full gathered output for
# all-gather, full input for reduce-scatter via (n-1)/n sharding)
def wire_bytes(kind: str, payload: int, n: int) -> float:
    if n <= 1:
        return 0.0
    ring = (n - 1) / n
    if kind == "all-reduce":
        return 2.0 * payload * ring          # reduce-scatter + all-gather
    if kind in ("all-gather", "reduce-scatter"):
        return payload * ring
    if kind in ("collective-permute", "all-to-all"):
        return float(payload)
    return float(payload)


def fit_scaling(ns: Sequence[int], vals: Sequence[float]):
    """Least-squares fit v(n) = c0 + c1*(n-1)/n — the two regimes every
    per-device collective/flop quantity here follows (constant payload vs
    ring-scaled payload; replicated compute vs owner-sharded compute is
    fitted separately with 1/n, see fit_inverse_scaling)."""
    x = np.asarray([(n - 1) / n for n in ns], float)
    A = np.stack([np.ones_like(x), x], axis=1)
    coef, *_ = np.linalg.lstsq(A, np.asarray(vals, float), rcond=None)
    return float(coef[0]), float(coef[1])


def predict_scaling(c0: float, c1: float, n: int) -> float:
    return c0 + c1 * (n - 1) / n


def fit_inverse_scaling(ns: Sequence[int], vals: Sequence[float]):
    """Least-squares fit v(n) = c0 + c1/n (owner-only sharded compute:
    each device executes ~1/n of the factor/inverse flops plus a
    replicated remainder)."""
    x = np.asarray([1.0 / n for n in ns], float)
    A = np.stack([np.ones_like(x), x], axis=1)
    coef, *_ = np.linalg.lstsq(A, np.asarray(vals, float), rcond=None)
    return float(coef[0]), float(coef[1])


def predict_inverse_scaling(c0: float, c1: float, n: int) -> float:
    return c0 + c1 / n


# ---------------------------------------------------------------------------
# projection
# ---------------------------------------------------------------------------


def comm_time_s(stats: Dict[str, Sequence[float]], n: int,
                alpha_s: float, bw_bytes_s: float) -> float:
    """stats: {kind: (count, payload_bytes)} for one compiled step."""
    t = 0.0
    for kind, (count, payload) in stats.items():
        t += count * alpha_s + wire_bytes(kind, payload, n) / bw_bytes_s
    return t


def project(measured: Dict, t_sgd_1dev: float, t_kfac_1dev: float,
            t_fixed: float, alpha_s: float, bw_bytes_s: float,
            targets: Sequence[int] = (8, 16, 32)) -> List[Dict]:
    """measured: {strategy: {n(str|int): {"collectives": {kind: [cnt, B]},
    "dot_flops": F}}} from --measure/--collect. Returns one row per
    (strategy, n) with predicted times and the overhead ratio."""
    meas = {
        s: {int(n): v for n, v in per_n.items()}
        for s, per_n in measured.items()
    }
    sgd = meas["sgd"]
    sgd_ns = sorted(sgd)
    rows = []
    for strategy, per_n in meas.items():
        if strategy == "sgd":
            continue
        ns = sorted(per_n)
        multi = [n for n in ns if n > 1]
        if 1 not in per_n or not multi:
            raise ValueError(
                f"need n=1 and at least one multi-device HLO for {strategy}"
            )
        # K-FAC-added executed dot flops per device, fitted with the
        # owner-only 1/n law over measured n
        dflops = {
            n: per_n[n]["dot_flops"]
            - sgd[min(sgd_ns, key=lambda m: abs(m - n))]["dot_flops"]
            for n in ns
        }
        c0, c1 = fit_inverse_scaling(ns, [dflops[n] for n in ns])
        # per-collective-kind payload fits (c + c'*(n-1)/n) over multi-n
        kinds = sorted({
            k for n in multi for k in per_n[n]["collectives"]
        })
        kind_fits = {}
        for k in kinds:
            payloads = [
                per_n[n]["collectives"].get(k, (0, 0))[1] for n in multi
            ]
            counts = [
                per_n[n]["collectives"].get(k, (0, 0))[0] for n in multi
            ]
            kind_fits[k] = (fit_scaling(multi, payloads),
                            max(counts))
        sgd_kinds = sorted({
            k for n in multi if n in sgd for k in sgd[n]["collectives"]
        })
        sgd_multi = [n for n in sgd_ns if n > 1]
        sgd_fits = {}
        for k in sgd_kinds:
            payloads = [
                sgd[n]["collectives"].get(k, (0, 0))[1] for n in sgd_multi
            ]
            counts = [
                sgd[n]["collectives"].get(k, (0, 0))[0] for n in sgd_multi
            ]
            sgd_fits[k] = (fit_scaling(sgd_multi, payloads), max(counts))

        t_added_comp_1 = max(t_kfac_1dev - t_sgd_1dev - t_fixed, 0.0)
        d1 = max(dflops[1], 1.0)
        for n in targets:
            stats_n = {
                k: (cnt, predict_scaling(*fit, n))
                for k, (fit, cnt) in kind_fits.items()
            }
            sgd_stats_n = {
                k: (cnt, predict_scaling(*fit, n))
                for k, (fit, cnt) in sgd_fits.items()
            }
            flop_ratio = max(
                predict_inverse_scaling(c0, c1, n), 0.0) / d1
            t_sgd_n = t_sgd_1dev + comm_time_s(
                sgd_stats_n, n, alpha_s, bw_bytes_s)
            t_kfac_n = (
                t_sgd_1dev + t_fixed + t_added_comp_1 * flop_ratio
                + comm_time_s(stats_n, n, alpha_s, bw_bytes_s)
            )
            rows.append({
                "strategy": strategy,
                "n": n,
                "t_sgd_ms": round(t_sgd_n * 1e3, 3),
                "t_kfac_ms": round(t_kfac_n * 1e3, 3),
                "kfac_comm_ms": round(comm_time_s(
                    stats_n, n, alpha_s, bw_bytes_s) * 1e3, 3),
                "kfac_added_comp_ms": round(
                    (t_fixed + t_added_comp_1 * flop_ratio) * 1e3, 3),
                "overhead": round(t_kfac_n / t_sgd_n, 4),
            })
    return rows


# ---------------------------------------------------------------------------
# measurement (simulated CPU mesh, subprocess per device count)
# ---------------------------------------------------------------------------


def collect_one(n: int, model: str, batch: int, image: int, classes: int,
                strategies: Sequence[str], inv_type: str) -> Dict:
    """Compile the sharded step at n devices and extract collective stats
    + executed dot flops per strategy (runs inside a subprocess whose
    XLA_FLAGS force n host devices)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tools.comm_volume import (
        build_step,
        collective_stats,
        executed_dot_flops,
    )

    out = {}
    for strategy in strategies:
        step, state, data, scalars = build_step(
            model, strategy, n, batch, image, classes, inv_type=inv_type
        )
        hlo = jax.jit(step).lower(state, data, scalars).compile().as_text()
        out[strategy] = {
            "collectives": {
                k: list(v) for k, v in collective_stats(hlo).items()
            },
            "dot_flops": executed_dot_flops(hlo),
        }
    return out


def measure(ns: Sequence[int], model: str, batch: int, image: int,
            classes: int, strategies: Sequence[str], inv_type: str) -> Dict:
    measured: Dict[str, Dict[int, Dict]] = {s: {} for s in strategies}
    for n in ns:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        ).strip()
        env["JAX_PLATFORMS"] = "cpu"
        cmd = [
            sys.executable, os.path.abspath(__file__), "--collect", str(n),
            "--model", model, "--batch", str(batch), "--image", str(image),
            "--classes", str(classes), "--inv-type", inv_type,
            "--strategies", *strategies,
        ]
        res = subprocess.run(
            cmd, env=env, capture_output=True, text=True, timeout=3600
        )
        if res.returncode != 0:
            raise RuntimeError(
                f"collect n={n} failed:\n{res.stderr[-2000:]}")
        payload = json.loads(res.stdout.splitlines()[-1])
        for s, v in payload.items():
            measured[s][n] = v
        print(f"# collected n={n}", file=sys.stderr)
    return measured


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--measure", action="store_true")
    p.add_argument("--from-json", default=None,
                   help="projection inputs saved by a prior --measure")
    p.add_argument("--save-json", default=None)
    p.add_argument("--collect", type=int, default=None,
                   help="(internal) emit one device count's HLO stats")
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--targets", type=int, nargs="+", default=[8, 16, 32])
    p.add_argument("--model", default="imagenet-resnet50")
    p.add_argument("--batch", type=int, default=8,
                   help="per-device batch (collective BYTES are "
                        "batch-independent for factors/preds/grads; dot "
                        "flops are normalized per ratio so a small batch "
                        "keeps CPU compile tractable)")
    p.add_argument("--image", type=int, default=64)
    p.add_argument("--classes", type=int, default=1000)
    p.add_argument("--strategies", nargs="+", default=["sgd", "dp", "mpd"])
    p.add_argument("--inv-type", default="pcg")
    # measured single-chip anchors (bench.py defaults reproduction; the
    # fixed tail is the profile-attributed non-GEMM copy/relayout +
    # dispatch share that does NOT scale with the owner-only flop shard)
    p.add_argument("--t-sgd-ms", type=float, default=23.6,
                   help="measured single-chip SGD step (bench.py)")
    p.add_argument("--t-kfac-ms", type=float, default=40.0,
                   help="measured single-chip K-FAC step (bench.py)")
    p.add_argument("--fixed-ms", type=float, default=6.0,
                   help="non-flop-scaling share of the K-FAC-added time "
                        "(profile attribution: copy/relayout + dispatch)")
    # ICI model: conservative v5p-class effective numbers; the reference
    # fits the same alpha-beta form to NCCL logs (comm_models.py:8-50)
    p.add_argument("--ici-alpha-us", type=float, default=3.0,
                   help="per-collective launch latency")
    p.add_argument("--ici-bw-gbps", type=float, default=100.0,
                   help="effective per-device ICI collective goodput "
                        "(v5p 3D-torus ring; conservative)")
    args = p.parse_args(argv)

    if args.collect is not None:
        out = collect_one(
            args.collect, args.model, args.batch, args.image, args.classes,
            args.strategies, args.inv_type,
        )
        print(json.dumps(out))
        return 0

    if args.from_json:
        measured = json.load(open(args.from_json))
    elif args.measure:
        measured = measure(
            args.devices, args.model, args.batch, args.image, args.classes,
            args.strategies, args.inv_type,
        )
        if args.save_json:
            json.dump(measured, open(args.save_json, "w"))
    else:
        p.error("one of --measure / --from-json / --collect required")

    rows = project(
        measured,
        t_sgd_1dev=args.t_sgd_ms * 1e-3,
        t_kfac_1dev=args.t_kfac_ms * 1e-3,
        t_fixed=args.fixed_ms * 1e-3,
        alpha_s=args.ici_alpha_us * 1e-6,
        bw_bytes_s=args.ici_bw_gbps * 1e9,
        targets=args.targets,
    )
    print(f"{'strategy':8s} {'n':>4s} {'sgd ms':>8s} {'kfac ms':>8s} "
          f"{'comm ms':>8s} {'comp ms':>8s} {'overhead':>9s}")
    for r in rows:
        print(f"{r['strategy']:8s} {r['n']:4d} {r['t_sgd_ms']:8.3f} "
              f"{r['t_kfac_ms']:8.3f} {r['kfac_comm_ms']:8.3f} "
              f"{r['kfac_added_comp_ms']:8.3f} {r['overhead']:9.4f}")
    for r in rows:
        print(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
