"""Aggregate a jax.profiler chrome trace into an op-class time breakdown.

Usage:
    python tools/profile_summary.py <trace-dir-or-file> [--top 25]

<trace-dir-or-file>: a directory passed to jax.profiler.trace (the
*.trace.json.gz under plugins/profile/... is globbed) or the trace file
itself. Prints total device time, per-op-class totals (fusion, conv, dot,
copy/transpose, dynamic-update-slice, collectives, infeed, ...) and the
top individual events — the attribution layer for bench.py's KFB_PROFILE
hook (the reference's breakdown role is scripts/time_breakdown.py over
hook timers; here the compiled XLA ops are the ground truth).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

# op-class buckets by event-name substring (XLA HLO naming; order matters —
# first match wins, so the specific fusion flavors come before the generic
# 'fusion' substring match, which also catches XLA's '<rootop>_fusion.N'
# names like multiply_add_fusion.511)
_CLASSES = [
    ("dyn-update-slice", re.compile(r"dynamic.?update.?slice", re.I)),
    ("dyn-slice/gather", re.compile(r"dynamic.?slice|gather", re.I)),
    ("collective", re.compile(r"all.?reduce|all.?gather|collective|"
                              r"reduce.?scatter|permute", re.I)),
    ("cholesky/tri", re.compile(r"cholesky|triangular", re.I)),
    ("custom-call/pallas", re.compile(r"custom.?call|tpu.?custom|patch_cov|"
                                      r"jacobi|symeig", re.I)),
    ("convolution", re.compile(r"^(%?)(\w*)?conv")),
    ("dot/matmul", re.compile(r"^(%?)dot|matmul|gemm", re.I)),
    ("copy/transpose", re.compile(r"^(%?)(copy|transpose|bitcast)")),
    ("fusion", re.compile(r"fusion")),
    ("reduce", re.compile(r"^(%?)reduce|select_and_scatter")),
    ("infeed/outfeed", re.compile(r"infeed|outfeed", re.I)),
]


def _classify(name: str) -> str:
    for cls, pat in _CLASSES:
        if pat.search(name):
            return cls
    return "other"


def load_trace(path: str) -> dict:
    if os.path.isdir(path):
        cands = sorted(
            glob.glob(os.path.join(path, "**", "*.trace.json.gz"),
                      recursive=True),
            key=os.path.getmtime,
        )
        if not cands:
            raise SystemExit(f"no *.trace.json.gz under {path}")
        path = cands[-1]
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        return json.load(f)


def device_events(trace: dict):
    """Complete events on device-timeline tracks (XLA op executions).

    jax traces put device lanes in processes whose name contains
    'TPU'/'GPU'/'Device'; host python/runtime lanes are excluded so the
    totals are device-busy time, not wall time.
    """
    procs = {}
    tids_ok = set()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            procs[ev["pid"]] = ev.get("args", {}).get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            nm = ev.get("args", {}).get("name", "")
            if re.search(r"XLA Op|Steps|TensorFlow Op|XLA Modules", nm):
                tids_ok.add((ev["pid"], ev.get("tid")))
    dev_pids = {
        p for p, nm in procs.items()
        if re.search(r"TPU|GPU|Device|/device", nm, re.I)
    }
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pid = ev.get("pid")
        if dev_pids and pid not in dev_pids:
            continue
        nm = ev.get("name", "")
        # keep the XLA-op lane; skip module/step envelope lanes which
        # double-count their children
        tnm = (pid, ev.get("tid"))
        if tids_ok and tnm not in tids_ok:
            continue
        if re.search(r"^jit_|^pjit", nm):
            continue  # module envelopes
        yield nm, float(ev.get("dur", 0.0))


def summarize(path: str, top: int = 25):
    trace = load_trace(path)
    by_name = defaultdict(float)
    for name, dur in device_events(trace):
        # step-number ("0","1",...) and scan ("while.N") envelopes span
        # their children — counting them double-counts everything
        if re.fullmatch(r"\d+|while(\.\d+)?", name):
            continue
        by_name[name] += dur
    if not by_name:
        # fallback: no recognizable device lanes (e.g. CPU traces) —
        # aggregate everything except the obvious host/runtime envelopes
        host = re.compile(
            r"block_until_ready|try_to_block|profiler|ThreadPool|"
            r"ThunkExecutor|\$|^python|callback", re.I)
        for ev in trace.get("traceEvents", []):
            if ev.get("ph") == "X" and not host.search(ev.get("name", "")):
                by_name[ev.get("name", "")] += float(ev.get("dur", 0.0))
    total = sum(by_name.values())
    by_class = defaultdict(float)
    for name, dur in by_name.items():
        by_class[_classify(name)] += dur
    print(f"total device-op time: {total / 1e3:.3f} ms "
          f"(across the traced window)")
    print("\nby op class:")
    for cls, dur in sorted(by_class.items(), key=lambda kv: -kv[1]):
        print(f"  {cls:>18s}  {dur / 1e3:9.3f} ms  {dur / total * 100:5.1f}%")
    print(f"\ntop {top} events:")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {dur / 1e3:9.3f} ms  {dur / total * 100:5.1f}%  "
              f"{name[:110]}")
    return by_class, by_name


def summarize_by_source(path: str, top: int = 25, steps: int = 1):
    """Aggregate device-op time by the PYTHON SOURCE LINE that emitted the
    op (jax records it in the trace args) — the per-stage attribution view:
    ops/factors.py = factor GEMMs, ops/pcg.py = the CG stage, flax = the
    model's own fwd/bwd, etc. ``steps`` divides totals into per-step ms
    (pass the traced scan length)."""
    trace = load_trace(path)
    by_src = defaultdict(float)
    by_file = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if re.fullmatch(r"\d+|while(\.\d+)?", ev.get("name", "")):
            continue  # step/scan envelopes double-count their children
        src = ev.get("args", {}).get("source")
        if src is None:
            continue
        dur = float(ev.get("dur", 0.0))
        total += dur
        by_src[src] += dur
        by_file[src.split(":")[0]] += dur
    k = steps * 1e3
    print(f"source-attributed device time: {total / k:.2f} ms/step "
          f"({steps} steps)")
    print("\nby file:")
    for f, d in sorted(by_file.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {d / k:8.3f} ms/step {d / total * 100:5.1f}%  {f}")
    print(f"\nby line (top {top}):")
    for s, d in sorted(by_src.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {d / k:8.3f} ms/step {d / total * 100:5.1f}%  {s}")
    return by_file, by_src


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--by-source", action="store_true",
                    help="aggregate by emitting python source line "
                         "(per-stage attribution)")
    ap.add_argument("--steps", type=int, default=4,
                    help="steps in the traced window (bench.py's "
                         "KFB_PROFILE traces 4); divides into ms/step")
    args = ap.parse_args(argv)
    if args.by_source:
        summarize_by_source(args.path, args.top, args.steps)
    else:
        summarize(args.path, args.top)
    return 0


if __name__ == "__main__":
    sys.exit(main())
