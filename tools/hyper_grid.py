"""Damping x update-frequency hyper grid on the teacher task.

The measured counterpart of the reference's batch-hyper.sh sweep
(/root/reference/batch-hyper.sh:6-28: damping {0.005,0.01,0.05,0.1} x
kfac-update-freq {1,10,50,100} on CIFAR ResNet-110): with no datasets in
this environment the grid runs convergence_check's latent teacher task and
reports val accuracy per cell, giving the defaults (damping 0.03, TInv=1)
measured support.

Usage:
    python tools/hyper_grid.py [--steps 2000] [--variant eigen_dp]
        [--dampings 0.005 0.01 0.05 0.1] [--freqs 1 10 50 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--variant", default="eigen_dp")
    p.add_argument("--dampings", type=float, nargs="+",
                   default=[0.005, 0.01, 0.05, 0.1])
    p.add_argument("--freqs", type=int, nargs="+",
                   default=[1, 10, 50, 100])
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from kfac_pytorch_tpu.utils.platform import ensure_platform_from_env
    ensure_platform_from_env()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tools.convergence_check import make_dataset, run_arm

    x, y = make_dataset(4096 + 2048, 10, args.seed, margin_frac=0.5)
    xv, yv = x[-2048:], y[-2048:]
    x, y = x[:4096], y[:4096]

    table = {}
    for freq in args.freqs:
        for damping in args.dampings:
            r = run_arm(
                args.variant, x, y, xv, yv, args.steps, args.batch,
                args.lr, damping, args.seed, tinv=freq, tcov=freq,
            )
            table[(freq, damping)] = r["val_acc"]
            print(json.dumps({
                "variant": args.variant, "freq": freq,
                "damping": damping, **{k: round(float(v), 4)
                                       for k, v in r.items()
                                       if isinstance(v, (int, float))},
            }), flush=True)

    # markdown summary (rows = freq, cols = damping)
    print("\n| TInv=TCov \\ damping | "
          + " | ".join(str(d) for d in args.dampings) + " |")
    print("|" + "---|" * (len(args.dampings) + 1))
    for freq in args.freqs:
        row = [f"{table[(freq, d)]:.4f}" for d in args.dampings]
        print(f"| {freq} | " + " | ".join(row) + " |")
    return table


if __name__ == "__main__":
    main()
