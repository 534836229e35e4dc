"""Training-log parser and time-breakdown reporting.

TPU-native counterpart of /root/reference/scripts/{parse_logs,reader,
time_breakdown}.py: extracts per-epoch metrics and per-stage timings from
train_cifar/train_imagenet logs, aggregates training speed, and prints the
stacked SGD-vs-KFAC step breakdown.

Log lines parsed (produced by examples/train_*.py):
  "epoch N: train loss L acc A | val loss L acc A | lr X damping Y"
  "iter N: io T step T" and "timer summary: {...}"
"""

from __future__ import annotations

import argparse
import ast
import re
import sys
from typing import Dict, List


EPOCH_RE = re.compile(
    r"epoch (\d+): train loss ([\d.]+) acc ([\d.]+) \| val loss ([\d.]+) "
    r"acc ([\d.]+)"
)
ITER_RE = re.compile(r"iter (\d+): io ([\d.]+)s step ([\d.]+)s")
SUMMARY_RE = re.compile(r"timer summary: (\{.*\})")


def parse(path: str) -> Dict:
    epochs: List[Dict] = []
    iters: List[Dict] = []
    summary = {}
    for line in open(path):
        m = EPOCH_RE.search(line)
        if m:
            epochs.append(
                dict(
                    epoch=int(m.group(1)),
                    train_loss=float(m.group(2)),
                    train_acc=float(m.group(3)),
                    val_loss=float(m.group(4)),
                    val_acc=float(m.group(5)),
                )
            )
        m = ITER_RE.search(line)
        if m:
            iters.append(
                dict(iter=int(m.group(1)), io=float(m.group(2)),
                     step=float(m.group(3)))
            )
        m = SUMMARY_RE.search(line)
        if m:
            summary = ast.literal_eval(m.group(1))
    return {"epochs": epochs, "iters": iters, "summary": summary}


def report(parsed: Dict) -> None:
    ep = parsed["epochs"]
    if ep:
        best = max(ep, key=lambda e: e["val_acc"])
        print(
            f"epochs: {len(ep)}  final val acc {ep[-1]['val_acc']:.4f}  "
            f"best {best['val_acc']:.4f} @ epoch {best['epoch']}"
        )
    it = parsed["iters"]
    if it:
        # skip the first (compile) measurement
        steps = [r["step"] for r in it[1:]] or [r["step"] for r in it]
        print(
            f"iters: {len(it)}  mean step {sum(steps)/len(steps):.4f}s  "
            f"mean io {sum(r['io'] for r in it)/len(it):.4f}s"
        )
    if parsed["summary"]:
        print("timer summary:", parsed["summary"])


def breakdown(sgd_step: float, kfac_stages: Dict[str, float]) -> None:
    """Stacked step breakdown (reference scripts/time_breakdown.py): prints
    each K-FAC stage's cost on top of the SGD step and the overhead ratio."""
    total = sgd_step + sum(kfac_stages.values())
    print(f"{'SGD step':24s} {sgd_step*1e3:9.2f} ms")
    for k, v in kfac_stages.items():
        print(f"{k:24s} {v*1e3:9.2f} ms")
    print(f"{'TOTAL':24s} {total*1e3:9.2f} ms  = {total/sgd_step:.2f}x SGD")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("logs", nargs="+")
    args = p.parse_args(argv)
    for path in args.logs:
        print(f"== {path}")
        report(parse(path))


if __name__ == "__main__":
    main()
