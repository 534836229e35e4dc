"""Measure the K-FAC step stage breakdown via exclude-parts ablation.

The reference measures stage costs by subtraction with its exclude_parts
switches (base.py:96-99, scripts/time_breakdown.py); this does the same with
scan-chained timing on the current accelerator:

  t(full) - t(exclude ComputeInverse)            ~= inverse+precond cost
  t(exclude ComputeInverse) - t(exclude both)    ~= factor cost
  t(exclude both)                                ~= fwd/bwd + sgd

Usage: python tools/stage_breakdown.py [--model imagenet-resnet50]
         [--batch 32] [--image 224] [--inv-type pcg] [--iters 6]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="imagenet-resnet50")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--image", type=int, default=224)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--inv-type", default="pcg",
                   choices=["pcg", "eigen", "inverse"])
    p.add_argument("--pcg-iters", type=int, default=12)
    p.add_argument("--k", type=int, default=6)
    args = p.parse_args(argv)
    from kfac_pytorch_tpu.utils.platform import ensure_platform_from_env
    ensure_platform_from_env()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    import kfac_pytorch_tpu as ktpu
    from kfac_pytorch_tpu.models import get_model
    from kfac_pytorch_tpu.parallel.strategies import BlockKFAC
    from kfac_pytorch_tpu.preconditioner import KFACConfig
    from kfac_pytorch_tpu.training.loop import (
        KFACScalars, TrainState, make_train_step,
    )

    model = get_model(args.model, num_classes=args.num_classes)
    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.randn(args.batch, args.image, args.image, 3).astype(np.float32)
    )
    y = jnp.asarray(rng.randint(0, args.num_classes, args.batch))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    params = variables["params"]
    model_state = {"batch_stats": variables["batch_stats"]}
    specs, perturbs = ktpu.setup_kfac(
        model, {"params": params, **model_state}, x, train=True
    )
    tx = optax.sgd(0.1, momentum=0.9)
    scalars = KFACScalars.create(lr=0.1, damping=0.002)

    def timed(kfac):
        st = TrainState(
            params=params, opt_state=tx.init(params),
            kfac_state=kfac.init_state() if kfac else None,
            model_state=model_state,
        )
        raw = make_train_step(
            model, tx, kfac, perturb_template=perturbs if kfac else None,
            train_kwargs={"train": True},
        )

        @functools.partial(jax.jit, static_argnames=("k",))
        def multi(state, k):
            def body(s, _):
                s, m = raw(s, (x, y), scalars)
                return s, m["loss"]
            s, losses = jax.lax.scan(body, state, None, length=k)
            # whole-state probe: keeps state chains (factor EMA etc.) from
            # being dead-coded out of the timed window (see bench.py)
            probe = sum(
                jnp.sum(l).astype(jnp.float32) * 1e-30
                for l in jax.tree_util.tree_leaves(s)
                if hasattr(l, "dtype")
                and jnp.issubdtype(l.dtype, jnp.floating)
            )
            return losses[-1] + probe

        def run(k):
            t0 = time.perf_counter()
            float(jax.device_get(multi(st, k)))
            return time.perf_counter() - t0

        run(1); run(args.k)
        t1 = min(run(1) for _ in range(2))
        tk = min(run(args.k) for _ in range(2))
        return (tk - t1) / (args.k - 1)

    def make_kfac(**flags):
        return BlockKFAC(
            specs,
            KFACConfig(inv_type=args.inv_type, strategy="dp", damping=0.002,
                       pcg_iters=args.pcg_iters, **flags),
            world_size=1,
        )

    t_sgd = timed(None)
    print(f"sgd step:                    {t_sgd*1e3:9.2f} ms", flush=True)
    t_nofac_noinv = timed(
        make_kfac(exclude_compute_factor=True, exclude_compute_inverse=True)
    )
    print(f"kfac capture-only overhead:  {(t_nofac_noinv-t_sgd)*1e3:9.2f} ms",
          flush=True)
    t_noinv = timed(make_kfac(exclude_compute_inverse=True))
    print(f"factor stage:                {(t_noinv-t_nofac_noinv)*1e3:9.2f} ms",
          flush=True)
    t_full = timed(make_kfac())
    print(f"inverse+precond stage:       {(t_full-t_noinv)*1e3:9.2f} ms",
          flush=True)
    print(f"TOTAL kfac step:             {t_full*1e3:9.2f} ms  = "
          f"{t_full/t_sgd:.2f}x SGD", flush=True)
    print(json.dumps({
        "sgd_s": t_sgd, "capture_s": t_nofac_noinv - t_sgd,
        "factor_s": t_noinv - t_nofac_noinv,
        "inverse_s": t_full - t_noinv, "total_s": t_full,
        "ratio": t_full / t_sgd,
    }))


if __name__ == "__main__":
    main()
