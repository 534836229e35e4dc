"""Step-by-step non-finite diagnostics for the bench training config.

Runs the same model/preconditioner the headline bench builds (all KFB_*
env overrides honored, incl. bucket merging) WITHOUT scan-chaining, fetching
the loss and per-bucket state summaries after every step, and reports the
first step at which anything goes non-finite — and which bucket/leaf.

The reference has no equivalent; its failure mode was a hand-run script and
eyeballs. Usage:

    KFB_MERGE_RATE=2e14 KFB_MERGE_COST=3e-5 python tools/nan_probe.py \
        --steps 8 [--sgd]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _leaf_summaries(tree):
    import jax

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        if hasattr(leaf, "dtype") and np.issubdtype(leaf.dtype, np.floating):
            out[jax.tree_util.keystr(path)] = leaf
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--model", default="imagenet-resnet50")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--image", type=int, default=224)
    p.add_argument("--classes", type=int, default=1000)
    p.add_argument("--sgd", action="store_true", help="probe the SGD arm")
    args = p.parse_args(argv)

    from bench import _build  # reuses the exact bench setup + env knobs

    import jax
    import jax.numpy as jnp

    (sgd_raw, sgd_st), (kfac_raw, kfac_st), data, scalars = _build(
        args.model, args.batch, args.image, args.classes
    )
    raw, st = (sgd_raw, sgd_st) if args.sgd else (kfac_raw, kfac_st)
    step = jax.jit(raw)

    def batch_absmax(tree):
        leaves = _leaf_summaries(tree)
        names = list(leaves)
        vals = [jnp.max(jnp.abs(leaves[n])) for n in names]
        return names, jnp.stack(vals)

    names, _ = batch_absmax(st)

    @jax.jit
    def summarize(st):
        _, vals = batch_absmax(st)
        return vals

    for i in range(args.steps):
        st, m = step(st, data, scalars)
        loss = float(jax.device_get(m["loss"]))
        vals = np.asarray(jax.device_get(summarize(st)))
        bad = [
            (n, float(v)) for n, v in zip(names, vals) if not np.isfinite(v)
        ]
        big = sorted(
            zip(names, vals), key=lambda kv: -kv[1]
        )[:3]
        print(
            f"step {i}: loss={loss:.6g} "
            f"max3={[(n, float(v)) for n, v in big]}",
            flush=True,
        )
        if bad or not np.isfinite(loss):
            print(f"NON-FINITE at step {i}:", flush=True)
            for n, v in bad[:40]:
                print(f"  {n} = {v}")
            return 1
    print("all finite", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
