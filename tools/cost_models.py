"""Alpha-beta cost-model fitting for comm and compute stages.

TPU-native counterpart of /root/reference/scripts/comm_models.py (linear
alpha + beta*size fits of NCCL broadcast logs) and inverse_model.py (eigh/
cholesky time vs dimension): fits simple parametric models to measured
timings so the scheduler can predict stage costs.

Usage:
  python tools/cost_models.py --fit-linalg      # d^3 model from bench_ops
  python tools/cost_models.py --fit-comm FILE   # alpha-beta from JSON rows
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import List, Sequence, Tuple

import numpy as np


def fit_alpha_beta(sizes: Sequence[float], times: Sequence[float]) -> Tuple[float, float]:
    """Least-squares fit t = alpha + beta * size (the reference's comm model,
    comm_models.py:8-50). Returns (alpha_s, beta_s_per_elem)."""
    A = np.stack([np.ones(len(sizes)), np.asarray(sizes, float)], axis=1)
    coef, *_ = np.linalg.lstsq(A, np.asarray(times, float), rcond=None)
    return float(coef[0]), float(coef[1])


def fit_cubic(dims: Sequence[float], times: Sequence[float]) -> Tuple[float, float]:
    """Fit t = alpha + gamma * d^3 (eigendecomposition/inverse cost model,
    reference inverse_model.py)."""
    A = np.stack(
        [np.ones(len(dims)), np.asarray(dims, float) ** 3], axis=1
    )
    coef, *_ = np.linalg.lstsq(A, np.asarray(times, float), rcond=None)
    return float(coef[0]), float(coef[1])


def predict_cubic(alpha: float, gamma: float, d: float) -> float:
    return alpha + gamma * d**3


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--fit-linalg", action="store_true",
                   help="run bench_ops symeig/cholesky and fit d^3 models")
    p.add_argument("--fit-comm", default=None,
                   help="JSON file of [{'size': N, 'time_s': t}, ...]")
    p.add_argument("--sizes", type=int, nargs="+",
                   default=[128, 256, 512, 1024, 2048])
    args = p.parse_args(argv)

    if args.fit_comm:
        rows = json.load(open(args.fit_comm))
        a, b = fit_alpha_beta(
            [r["size"] for r in rows], [r["time_s"] for r in rows]
        )
        print(json.dumps({"model": "comm", "alpha_s": a, "beta_s_per_elem": b}))

    if args.fit_linalg:
        sys.path.insert(0, "/root/repo")
        from tools.bench_ops import main as bench_main

        results = bench_main(["--op", "symeig", "--sizes",
                              *map(str, args.sizes)])
        dims = [r["n"] for r in results if r["op"] == "symeig"]
        times = [r["time_s"] for r in results if r["op"] == "symeig"]
        a, g = fit_cubic(dims, times)
        print(json.dumps({"model": "symeig", "alpha_s": a, "gamma": g,
                          "pred_4608_s": predict_cubic(a, g, 4608)}))


if __name__ == "__main__":
    main()
