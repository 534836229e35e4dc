"""CIFAR-10/100 K-FAC training harness (TPU-native).

Equivalent of /root/reference/examples/pytorch_cifar10_resnet.py: model zoo
selection, SGD + K-FAC assembly, warmup+multistep lr, per-stage SPEED
timers, and the SGD control arm via --kfac-update-freq 0.

Data: real CIFAR from an .npz (keys: x_train,y_train,x_test,y_test) via
--data-path, or --synthetic random data (default — this environment has no
dataset downloads).

Examples:
  python examples/train_cifar.py --model resnet32 --synthetic --iters 30
  python examples/train_cifar.py --model resnet110 --epochs 100 \
      --kfac-name eigen_dp --damping 0.03 --data-path cifar10.npz
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp
import optax

import kfac_pytorch_tpu as ktpu
from kfac_pytorch_tpu.models import get_model
from kfac_pytorch_tpu.parallel import mesh as meshlib
from kfac_pytorch_tpu.parallel.strategies import BlockKFAC
from kfac_pytorch_tpu.parallel.train import make_sharded_train_step, shard_train_state
from kfac_pytorch_tpu.preconditioner import KFACConfig, KFACHypers, KFACParamScheduler
from kfac_pytorch_tpu.training.loop import (
    KFACScalars,
    TrainState,
    make_eval_step,
    make_train_step,
)
from kfac_pytorch_tpu.utils import lr_schedules
from kfac_pytorch_tpu.utils.metrics import Metric, StageTimers

log = logging.getLogger("train_cifar")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="resnet32")
    p.add_argument("--num-classes", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--base-lr", type=float, default=0.1)
    p.add_argument("--lr-decay", type=float, nargs="+", default=[35, 75, 90])
    p.add_argument("--warmup-epochs", type=int, default=5)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--wd", type=float, default=5e-4)
    p.add_argument("--label-smoothing", type=float, default=0.0)
    # K-FAC flags (reference pytorch_cifar10_resnet.py:62-87)
    p.add_argument("--kfac-name", default="eigen_dp",
                   choices=sorted(ktpu.kfac_mappers))
    p.add_argument("--kfac-update-freq", type=int, default=1,
                   help="TInv; 0 disables K-FAC (SGD control arm)")
    p.add_argument("--kfac-cov-update-freq", type=int, default=1, help="TCov")
    p.add_argument("--stat-decay", type=float, default=0.95)
    p.add_argument("--damping", type=float, default=0.03)
    p.add_argument("--kl-clip", type=float, default=0.001)
    p.add_argument("--damping-alpha", type=float, default=0.5)
    p.add_argument("--damping-schedule", type=float, nargs="*", default=None)
    p.add_argument("--kfac-update-freq-alpha", type=float, default=10)
    p.add_argument("--kfac-update-freq-schedule", type=float, nargs="*",
                   default=None)
    p.add_argument("--exclude-parts", default="")
    p.add_argument("--kfac-type", default="Femp", choices=["Femp", "F1mc"],
                   help="empirical Fisher vs true-Fisher MC sampling")
    p.add_argument("--symeig-impl", default="xla",
                   choices=["xla", "jacobi", "blocked", "tracking"],
                   help="eigen-variant eigensolver (tracking = online "
                        "eigenbasis refresh, matmuls only)")
    p.add_argument("--factor-impl", default="auto",
                   choices=["auto", "xla", "pallas", "taps"],
                   help="conv A-factor path (auto = measured dispatch "
                        "policy, pallas where patch traffic dominates; "
                        "pallas = fused streaming patch covariance; taps "
                        "= symmetric tap-pair GEMMs; TPU only)")
    p.add_argument("--pcg-iters", type=int, default=5,
                   help="CG iterations for --kfac-name pcg_dp")
    p.add_argument("--pcg-warm-start", action="store_true",
                   help="warm-start CG from the previous step's solution "
                        "(pcg_dp mesh path; fewer iterations at equal "
                        "accuracy)")
    p.add_argument("--n-devices", type=int, default=None,
                   help="run the sharded mesh path over N devices "
                        "(batch-size becomes per-device)")
    p.add_argument("--bf16-allreduce", action="store_true",
                   help="bfloat16 gradient allreduce compression (the "
                        "reference's --fp16-allreduce, "
                        "pytorch_cifar10_resnet.py:252-254)")
    p.add_argument("--bf16-delta-gather", action="store_true",
                   help="bfloat16 compression of the post-momentum delta "
                        "all-gather (the pred-broadcast equivalent; "
                        "halves its exposed wire time)")
    p.add_argument("--factor-spatial-stride", type=int, default=1,
                   help="conv factor statistics from every ss-th spatial "
                        "position (see KFACConfig.factor_spatial_stride)")
    p.add_argument("--factor-g-spatial-stride", type=int, default=-1,
                   help="G-factor stride override; -1 = follow "
                        "--factor-spatial-stride. 1 with a strided A = "
                        "A-only subsampling with exact G statistics "
                        "(KFACConfig.factor_g_spatial_stride)")
    p.add_argument("--inv-stagger", action="store_true",
                   help="stagger TInv-amortized inverse/eigen refreshes "
                        "round-robin across buckets/layers (KFACConfig."
                        "inv_stagger) — avoids the all-eigendecompositions-"
                        "in-one-step spike at large dims")
    p.add_argument("--trainer", choices=["loop", "bucketed"],
                   default="loop",
                   help="'bucketed' = the bucket-resident flagship "
                        "pipeline (training/bucketed.py — the bench.py "
                        "headline path: gradients stacked once, K-FAC + "
                        "SGD momentum in bucket form); requires K-FAC on "
                        "and kfac-type Femp")
    # harness
    p.add_argument("--data-path", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--no-augment", action="store_true",
                   help="disable crop/flip augmentation (real data defaults "
                        "to the reference pipeline: RandomCrop(32, pad=4) + "
                        "RandomHorizontalFlip + CIFAR normalization, "
                        "pytorch_cifar10_resnet.py:158-166)")
    p.add_argument("--loader", choices=["inline", "python", "native"],
                   default="inline",
                   help="batch pipeline: inline = in-loop numpy "
                        "augmentation (default); python/native = the "
                        "kfac_pytorch_tpu.data prefetch loaders (native = "
                        "C++ thread pool overlapping batch assembly with "
                        "device compute; requires uint8 npz data)")
    p.add_argument("--iters", type=int, default=None,
                   help="cap total iterations (smoke/SPEED runs)")
    p.add_argument("--speed", action="store_true",
                   help="print per-stage timer breakdown")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax profiler trace (xprof) of a few steps")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--log-interval", type=int, default=10)
    return p.parse_args(argv)


def load_data(args):
    """Returns ((x_train, y_train), (x_test, y_test), raw_train) where
    raw_train is the (uint8 images, labels) pair when the dataset is raw
    uint8 (usable by the prefetch loaders), else None."""
    if args.data_path and os.path.exists(args.data_path):
        from kfac_pytorch_tpu.utils.augment import normalize

        d = np.load(args.data_path)
        # raw images (uint8 or [0,1] floats) are normalized with the
        # reference's CIFAR statistics; pre-normalized float data
        # (mean ~ 0) is passed through untouched
        x_tr, x_te = d["x_train"], d["x_test"]
        raw = None
        if x_tr.dtype == np.uint8:
            raw = (x_tr, d["y_train"].astype(np.int32))
        if x_tr.dtype == np.uint8 or float(np.abs(x_tr).max()) <= 1.5:
            x_tr, x_te = normalize(x_tr), normalize(x_te)
        return (
            (x_tr.astype(np.float32), d["y_train"].astype(np.int32)),
            (x_te.astype(np.float32), d["y_test"].astype(np.int32)),
            raw,
        )
    n_train, n_test = 2048, 512
    rng = np.random.RandomState(args.seed)
    x = rng.randn(n_train, 32, 32, 3).astype(np.float32)
    y = rng.randint(0, args.num_classes, n_train).astype(np.int32)
    xt = rng.randn(n_test, 32, 32, 3).astype(np.float32)
    yt = rng.randint(0, args.num_classes, n_test).astype(np.int32)
    return (x, y), (xt, yt), None


def main(argv=None):
    from kfac_pytorch_tpu.utils.platform import ensure_platform_from_env
    ensure_platform_from_env()
    args = parse_args(argv)
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(name)s %(message)s"
    )
    n_dev = args.n_devices or 1
    mesh = meshlib.make_mesh(n_dev) if n_dev > 1 else None
    global_bs = args.batch_size * n_dev

    (x_train, y_train), (x_test, y_test), raw_train = load_data(args)
    steps_per_epoch = max(len(x_train) // global_bs, 1)

    model = get_model(args.model, num_classes=args.num_classes)
    rng = jax.random.PRNGKey(args.seed)
    sample = jnp.zeros((global_bs, 32, 32, 3), jnp.float32)
    variables = model.init(rng, sample, train=True)
    params = variables["params"]
    model_state = {
        k: v for k, v in variables.items()
        if k not in ("params", ktpu.COL_A, ktpu.COL_G)
    }

    use_kfac = args.kfac_update_freq > 0
    kfac = None
    perturbs = None
    if use_kfac:
        specs, perturbs = ktpu.setup_kfac(
            model, {"params": params, **model_state}, sample, train=True
        )
        log.info("#register modules: %d", len(specs))
        if mesh is not None or args.trainer == "bucketed":
            builder = ktpu.get_kfac_module(args.kfac_name)(specs)
            kfac = BlockKFAC(
                specs,
                KFACConfig(
                    inv_type=builder.config.inv_type,
                    strategy=builder.config.strategy,
                    damping=args.damping, kl_clip=args.kl_clip,
                    factor_decay=args.stat_decay,
                    symeig_impl=args.symeig_impl,
                    factor_impl=args.factor_impl,
                    pcg_iters=args.pcg_iters,
                    pcg_warm_start=args.pcg_warm_start,
                    factor_spatial_stride=args.factor_spatial_stride,
                    factor_g_spatial_stride=(
                        None if args.factor_g_spatial_stride < 0
                        else args.factor_g_spatial_stride
                    ),
                    inv_stagger=args.inv_stagger,
                    **KFACConfig.exclude_parts_flags(args.exclude_parts),
                ),
                world_size=n_dev if mesh is not None else 1,
            )
        else:
            kfac = ktpu.get_kfac_module(args.kfac_name)(
                specs,
                damping=args.damping,
                kl_clip=args.kl_clip,
                factor_decay=args.stat_decay,
                symeig_impl=args.symeig_impl,
                factor_impl=args.factor_impl,
                factor_spatial_stride=args.factor_spatial_stride,
                factor_g_spatial_stride=(
                    None if args.factor_g_spatial_stride < 0
                    else args.factor_g_spatial_stride
                ),
                inv_stagger=args.inv_stagger,
                pcg_iters=args.pcg_iters,
                **KFACConfig.exclude_parts_flags(args.exclude_parts),
            )

    lr_fn = lr_schedules.warmup_multistep(
        args.base_lr, args.warmup_epochs, args.lr_decay,
        steps_per_epoch=steps_per_epoch,
        workers=(mesh.devices.size if mesh is not None else 1),
    )
    tx = lr_schedules.sgd_optimizer(lr_fn, args.momentum, args.wd)
    state = TrainState(
        params=params,
        opt_state=tx.init(params) if args.trainer == "loop" else None,
        kfac_state=kfac.init_state() if kfac else None,
        model_state=model_state,
    )
    if args.trainer == "bucketed":
        # the bucket-resident flagship pipeline (the bench.py headline
        # path): K-FAC + SGD momentum in stacked bucket form
        if not use_kfac:
            raise SystemExit(
                "--trainer bucketed requires K-FAC (--kfac-update-freq > 0)"
            )
        if args.kfac_type != "Femp":
            raise SystemExit("--trainer bucketed supports --kfac-type Femp")
        from kfac_pytorch_tpu.training.bucketed import build_bucketed_trainer

        train_step, state = build_bucketed_trainer(
            model, kfac, params, model_state, sample,
            mesh=mesh,
            micro_batch=args.batch_size if mesh is not None else global_bs,
            momentum=args.momentum, weight_decay=args.wd,
            label_smoothing=args.label_smoothing,
            grad_compression="bf16" if args.bf16_allreduce else None,
            delta_gather_compression=(
                "bf16" if args.bf16_delta_gather else None),
        )
    elif mesh is not None:
        local_pert = (
            ktpu.make_zero_perturbations(
                model, {"params": params, **model_state},
                sample[: args.batch_size], train=True,
            ) if use_kfac else None
        )
        train_step = make_sharded_train_step(
            model, tx, kfac, mesh, state,
            local_perturb_template=local_pert,
            label_smoothing=args.label_smoothing,
            train_kwargs={"train": True},
            grad_compression="bf16" if args.bf16_allreduce else None,
        )
        state = shard_train_state(mesh, kfac, state)
    else:
        train_step = jax.jit(
            make_train_step(
                model, tx, kfac,
                label_smoothing=args.label_smoothing,
                perturb_template=perturbs,
                train_kwargs={"train": True},
                fisher_type=args.kfac_type,
            )
        )
    eval_step = jax.jit(make_eval_step(model))

    hypers = KFACHypers(args.damping, args.kfac_cov_update_freq,
                        args.kfac_update_freq)
    sched = KFACParamScheduler(
        hypers,
        damping_alpha=args.damping_alpha,
        damping_schedule=args.damping_schedule,
        update_freq_alpha=args.kfac_update_freq_alpha,
        update_freq_schedule=args.kfac_update_freq_schedule,
    )

    data_rng = np.random.RandomState(args.seed)
    augment = None
    loader = None
    if args.loader != "inline":
        if raw_train is None:
            raise SystemExit(
                "--loader python/native needs raw uint8 npz data "
                "(--data-path with uint8 x_train)"
            )
        from kfac_pytorch_tpu.data import make_loader
        from kfac_pytorch_tpu.utils.augment import CIFAR_MEAN, CIFAR_STD

        loader = make_loader(
            raw_train[0], raw_train[1], global_bs,
            impl=args.loader,
            pad=4, flip=True, augment=not args.no_augment,
            mean=CIFAR_MEAN, std=CIFAR_STD, seed=args.seed,
        )
        steps_per_epoch = loader.n_batches
        log.info("loader: %s (%d batches/epoch)",
                 type(loader).__name__, loader.n_batches)
    elif args.data_path and not args.no_augment:
        from kfac_pytorch_tpu.utils.augment import make_augment_fn

        augment = make_augment_fn(args.seed)
    timers = StageTimers()
    global_step = 0
    for epoch in range(args.epochs):
        if loader is not None:
            loader.start_epoch(epoch)
        else:
            perm = data_rng.permutation(len(x_train))
        train_loss, train_acc = Metric("loss"), Metric("acc")
        for i in range(steps_per_epoch):
            timers.start("io")
            if loader is not None:
                xb, yb = loader.next()
            else:
                idx = perm[i * global_bs : (i + 1) * global_bs]
                xb, yb = x_train[idx], y_train[idx]
                if augment is not None:
                    xb = augment(xb)
            batch = (jnp.asarray(xb), jnp.asarray(yb))
            if mesh is not None:
                batch = meshlib.shard_batch(mesh, batch)
            timers.stop("io", batch[0])
            scalars = KFACScalars.create(
                lr=lr_fn(global_step),
                damping=hypers.damping,
                fac_update_freq=hypers.fac_update_freq,
                kfac_update_freq=hypers.kfac_update_freq,
            )
            if args.profile_dir and global_step == 5:
                jax.profiler.start_trace(args.profile_dir)
            timers.start("step")
            if mesh is not None or args.trainer == "bucketed":
                state, m = train_step(state, batch, scalars)
            else:
                step_rng = (
                    jax.random.fold_in(rng, global_step)
                    if args.kfac_type == "F1mc" else None
                )
                state, m = train_step(state, batch, scalars, step_rng)
            timers.stop("step", m["loss"])
            if args.profile_dir and global_step == 10:
                jax.profiler.stop_trace()
            train_loss.update(m["loss"])
            train_acc.update(m["accuracy"])
            global_step += 1
            if args.iters and global_step >= args.iters:
                break
            if args.speed and global_step % args.log_interval == 0:
                s = timers.summary(args.log_interval)
                log.info(
                    "iter %d: io %.4fs step %.4fs", global_step, s["io"],
                    s["step"],
                )
        sched.step(epoch + 1)
        # eval
        n_eval = min(len(x_test), 10 * args.batch_size)
        em = eval_step(
            state.params, state.model_state,
            (jnp.asarray(x_test[:n_eval]), jnp.asarray(y_test[:n_eval])),
        )
        log.info(
            "epoch %d: train loss %.4f acc %.4f | val loss %.4f acc %.4f | "
            "lr %.4f damping %.4g",
            epoch,
            train_loss.avg,
            train_acc.avg,
            float(em["loss"]),
            float(em["accuracy"]),
            float(lr_fn(global_step)),
            hypers.damping,
        )
        if args.iters and global_step >= args.iters:
            break
    if args.speed:
        log.info("timer summary: %s", timers.summary())
    return state


if __name__ == "__main__":
    main()
