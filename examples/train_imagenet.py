"""ImageNet K-FAC training harness (TPU-native).

Equivalent of /root/reference/examples/pytorch_imagenet_resnet.py: ResNet
family + label smoothing, K-FAC with KFACParamScheduler damping/update-freq
decay schedules, checkpoint scan/resume, per-stage SPEED timers, gradient
accumulation (the reference's --batches-per-allreduce), and the distributed
path over a device mesh (--n-devices) using the sharded DP-KFAC step.

Data: --data-path npz (x_train,y_train,...) or --synthetic (default).

Canonical config parity (train_imagenet.sh:3-24): bs=32/device, base-lr
0.0125 x devices, 55 epochs decaying at 25/35/40/45/50, warmup 5,
eigen_dp damping 0.002, label smoothing 0.1.
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
from kfac_pytorch_tpu.training import checkpoint as ckpt
from kfac_pytorch_tpu.training.loop import (
    KFACScalars,
    TrainState,
    make_eval_step,
    make_grad_accum_train_step,
)
from kfac_pytorch_tpu.utils import lr_schedules
from kfac_pytorch_tpu.utils.metrics import Metric, StageTimers

log = logging.getLogger("train_imagenet")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="imagenet-resnet50")
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=32,
                   help="per-device batch size")
    p.add_argument("--val-batch-size", type=int, default=32)
    p.add_argument("--batches-per-allreduce", type=int, default=1,
                   help="gradient accumulation steps")
    p.add_argument("--bf16-allreduce", action="store_true",
                   help="bfloat16 gradient allreduce compression (the "
                        "reference's --fp16-allreduce)")
    p.add_argument("--bf16-delta-gather", action="store_true",
                   help="bfloat16 compression of the post-momentum delta "
                        "all-gather (the pred-broadcast equivalent; "
                        "halves its exposed wire time)")
    p.add_argument("--epochs", type=int, default=55)
    p.add_argument("--base-lr", type=float, default=0.0125,
                   help="lr per device (scaled by device count)")
    p.add_argument("--lr-decay", type=float, nargs="+",
                   default=[25, 35, 40, 45, 50])
    p.add_argument("--warmup-epochs", type=int, default=5)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--wd", type=float, default=5e-5)
    p.add_argument("--label-smoothing", type=float, default=0.1)
    # K-FAC
    p.add_argument("--kfac-name", default="eigen_dp",
                   choices=sorted(ktpu.kfac_mappers))
    p.add_argument("--kfac-update-freq", type=int, default=1)
    p.add_argument("--kfac-cov-update-freq", type=int, default=1)
    p.add_argument("--stat-decay", type=float, default=0.95)
    p.add_argument("--damping", type=float, default=0.002)
    p.add_argument("--kl-clip", type=float, default=0.001)
    p.add_argument("--damping-alpha", type=float, default=0.5)
    p.add_argument("--damping-schedule", type=float, nargs="*",
                   default=[25, 35])
    p.add_argument("--kfac-update-freq-alpha", type=float, default=10)
    p.add_argument("--kfac-update-freq-schedule", type=float, nargs="*",
                   default=[25, 35])
    p.add_argument("--exclude-parts", default="")
    p.add_argument("--factor-spatial-stride", type=int, default=None,
                   help="conv factor statistics from every ss-th spatial "
                        "position (1/ss^2 the factor-GEMM flops; the KFC "
                        "estimator over a position subset). Unset = 1, or "
                        "the validated (3, G=1) combo under --production")
    p.add_argument("--factor-g-spatial-stride", type=int, default=None,
                   help="G-factor stride override; -1 = follow "
                        "--factor-spatial-stride. 1 with a strided A = "
                        "A-only subsampling with exact G statistics "
                        "(KFACConfig.factor_g_spatial_stride). Unset = "
                        "follow A, or exact G (=1) under --production")
    p.add_argument("--inv-stagger", action="store_true",
                   help="stagger TInv-amortized inverse/eigen refreshes "
                        "round-robin across buckets/layers (KFACConfig."
                        "inv_stagger) — avoids the all-eigendecompositions-"
                        "in-one-step spike at large dims")
    p.add_argument("--production", action="store_true",
                   help="use the bench-validated production K-FAC combo "
                        "(preconditioner.production_pcg_config: warm-2 "
                        "fused CG, NS-refreshed bf16 inverses, cost-model "
                        "bucket merging) — overrides --kfac-name")
    p.add_argument("--trainer", choices=["loop", "bucketed"],
                   default="loop",
                   help="'bucketed' = the bucket-resident flagship "
                        "pipeline (training/bucketed.py — the bench.py "
                        "headline path); requires K-FAC on")
    # distribution
    p.add_argument("--n-devices", type=int, default=None,
                   help="use the sharded mesh path over N devices "
                        "(POD-GLOBAL device count under --num-processes)")
    p.add_argument("--coordinator", default=os.environ.get("KFB_COORDINATOR"),
                   help="jax.distributed coordinator host:port (multi-host "
                        "pods; the reference's mpirun/ssh hostfile role)")
    p.add_argument("--num-processes", type=int,
                   default=int(os.environ.get("KFB_NUM_PROCESSES", "1")))
    p.add_argument("--process-id", type=int,
                   default=int(os.environ.get("KFB_PROCESS_ID", "0")))
    # harness
    p.add_argument("--data-path", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--speed", action="store_true")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--async-checkpoint", action="store_true",
                   help="overlap checkpoint IO with training "
                   "(orbax async manager + atomic-commit auto-resume)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax profiler trace (xprof) of a few steps")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--log-interval", type=int, default=10)
    return p.parse_args(argv)


def load_data(args):
    if args.data_path and os.path.exists(args.data_path):
        d = np.load(args.data_path)
        return (
            (d["x_train"].astype(np.float32), d["y_train"].astype(np.int32)),
            (d["x_test"].astype(np.float32), d["y_test"].astype(np.int32)),
        )
    s = args.image_size
    n_train, n_test = 512, 128
    rng = np.random.RandomState(args.seed)
    return (
        (rng.randn(n_train, s, s, 3).astype(np.float32),
         rng.randint(0, args.num_classes, n_train).astype(np.int32)),
        (rng.randn(n_test, s, s, 3).astype(np.float32),
         rng.randint(0, args.num_classes, n_test).astype(np.int32)),
    )


def main(argv=None):
    from kfac_pytorch_tpu.utils.platform import ensure_platform_from_env
    ensure_platform_from_env()
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    multihost = args.num_processes > 1
    if multihost:
        # every host runs this same script; jax.distributed wires the pod
        # (the reference's mpirun/ssh + hostfile role, launch_torch.sh)
        from kfac_pytorch_tpu.parallel.multihost import init_multihost

        init_multihost(args.coordinator, args.num_processes,
                       args.process_id)
    n_dev = args.n_devices or (jax.device_count() if multihost else 1)
    mesh = meshlib.make_mesh(n_dev) if n_dev > 1 else None
    n_accum = max(args.batches_per_allreduce, 1)
    # one *effective* step consumes micro_bs x n_accum rows per device
    # (reference --batches-per-allreduce, pytorch_imagenet_resnet.py:355-367)
    global_bs = args.batch_size * n_dev * n_accum
    lr_scale = n_dev  # reference scales lr by world size

    (x_train, y_train), (x_test, y_test) = load_data(args)
    steps_per_epoch = max(len(x_train) // global_bs, 1)

    model = get_model(args.model, num_classes=args.num_classes)
    rng = jax.random.PRNGKey(args.seed)
    sample = jnp.zeros((global_bs, args.image_size, args.image_size, 3))
    variables = model.init(rng, sample, train=True)
    params = variables["params"]
    model_state = {
        k: v for k, v in variables.items()
        if k not in ("params", ktpu.COL_A, ktpu.COL_G)
    }

    use_kfac = args.kfac_update_freq > 0
    # name -> (inv_type, strategy), covering every kfac_mappers entry
    # (inverse/eigen/pcg x mpd/dp) — the old if-chain silently mapped
    # 'pcg'/'pcg_dp' to inverse-mpd
    strategy = "dp" if args.kfac_name.endswith("_dp") else "mpd"
    inv_type = args.kfac_name.removesuffix("_dp")
    kfac = None
    if use_kfac:
        specs, _ = ktpu.setup_kfac(
            model, {"params": params, **model_state}, sample, train=True
        )
        log.info("#register modules: %d", len(specs))
        common = dict(
            damping=args.damping, kl_clip=args.kl_clip,
            factor_decay=args.stat_decay,
            inv_stagger=args.inv_stagger,
            **KFACConfig.exclude_parts_flags(args.exclude_parts),
        )
        # stride flags use a None sentinel: unset flags are OMITTED so
        # production_pcg_config keeps its convergence-validated
        # (factor_spatial_stride=3, factor_g_spatial_stride=1) combo —
        # passing the CLI defaults through unconditionally would silently
        # revert --production to full-position stats (and a user setting
        # only the A stride would get the convergence-failed G-follows-A
        # combo). Non-production unset = KFACConfig defaults (1, follow-A).
        if args.factor_spatial_stride is not None:
            common["factor_spatial_stride"] = args.factor_spatial_stride
        if args.factor_g_spatial_stride is not None:
            common["factor_g_spatial_stride"] = (
                None if args.factor_g_spatial_stride < 0
                else args.factor_g_spatial_stride)
        blk_kw = {}
        if args.production:
            # the bench.py headline combo, calibrated to this chip when
            # tools/calibrate.py has been run
            from kfac_pytorch_tpu.preconditioner import (
                production_block_kwargs, production_pcg_config)
            from kfac_pytorch_tpu.utils.calibration import apply_calibration

            # static_schedule=False: the bench compiles its canonical
            # TCov=TInv=1 config with static gates, but a REAL run drives
            # the update freqs dynamically through KFACParamScheduler
            # (epoch decay) — under static_schedule the bucketed trainer
            # passes freq=None and the scheduler (and --kfac-update-freq)
            # would be silently ignored (training/bucketed.py step gating)
            cfg = production_pcg_config(static_schedule=False, **common)
            blk_kw = production_block_kwargs(apply_calibration())
        else:
            cfg = KFACConfig(inv_type=inv_type, strategy=strategy, **common)
        kfac = BlockKFAC(specs, cfg, world_size=n_dev, **blk_kw)

    lr_fn = lr_schedules.warmup_multistep(
        args.base_lr, args.warmup_epochs, args.lr_decay,
        steps_per_epoch=steps_per_epoch, workers=lr_scale,
    )
    tx = lr_schedules.sgd_optimizer(lr_fn, args.momentum, args.wd)
    state = TrainState(
        # bucketed trainer: momentum lives in bucket form — skip the
        # params-sized optax state allocation it would discard
        params=params,
        opt_state=tx.init(params) if args.trainer == "loop" else None,
        kfac_state=kfac.init_state() if kfac else None,
        model_state=model_state,
    )
    if args.trainer == "bucketed":
        if not use_kfac:
            raise SystemExit(
                "--trainer bucketed requires K-FAC (--kfac-update-freq > 0)"
            )
        from kfac_pytorch_tpu.training.bucketed import init_bucketed_state

        # BucketedTrainState shares the params/model_state surface the
        # eval/checkpoint code uses; checkpoints restore against whichever
        # state pytree the trainer runs (template-generic orbax restore)
        state = init_bucketed_state(kfac, params, model_state=model_state)

    # resume
    start_epoch = 0
    ckpt_mgr = None
    if args.checkpoint_dir and args.async_checkpoint:
        ckpt_mgr = ckpt.AsyncCheckpointer(args.checkpoint_dir)
        state, start_epoch = ckpt_mgr.restore_latest(state)
        if start_epoch:
            log.info("resumed from epoch %d", start_epoch - 1)
            state = jax.tree_util.tree_map(jnp.asarray, state)
    elif args.checkpoint_dir:
        state, resumed = ckpt.restore_checkpoint(args.checkpoint_dir, state)
        if resumed is not None:
            start_epoch = resumed + 1
            log.info("resumed from epoch %d", resumed)
            state = jax.tree_util.tree_map(jnp.asarray, state)

    if args.trainer == "bucketed":
        from kfac_pytorch_tpu.training.bucketed import build_bucketed_trainer

        # perturb templates sized for the MICRO-batch (device-local rows /
        # n_accum) — see make_bucketed_train_step
        train_step, state = build_bucketed_trainer(
            model, kfac, params, model_state, sample,
            state=state,  # possibly checkpoint-restored above
            mesh=mesh,
            micro_batch=(args.batch_size if mesh is not None
                         else global_bs // n_accum),
            momentum=args.momentum, weight_decay=args.wd,
            label_smoothing=args.label_smoothing,
            n_accum=n_accum,
            grad_compression="bf16" if args.bf16_allreduce else None,
            delta_gather_compression=(
                "bf16" if args.bf16_delta_gather else None),
        )
    elif mesh is not None:
        local_sample = sample[: args.batch_size]
        local_pert = (
            ktpu.make_zero_perturbations(
                model, {"params": params, **model_state}, local_sample,
                train=True,
            )
            if use_kfac else None
        )
        train_step = make_sharded_train_step(
            model, tx, kfac, mesh, state,
            local_perturb_template=local_pert,
            label_smoothing=args.label_smoothing,
            train_kwargs={"train": True},
            n_accum=n_accum,
            grad_compression="bf16" if args.bf16_allreduce else None,
        )
        state = shard_train_state(mesh, kfac, state)
    else:
        micro_sample = sample[: global_bs // n_accum]
        perturbs = (
            ktpu.make_zero_perturbations(
                model, {"params": params, **model_state}, micro_sample,
                train=True,
            )
            if use_kfac else None
        )
        train_step = jax.jit(
            make_grad_accum_train_step(
                model, tx, kfac, n_accum,
                label_smoothing=args.label_smoothing,
                perturb_template=perturbs, train_kwargs={"train": True},
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
        start_epoch=start_epoch,
    )

    data_rng = np.random.RandomState(args.seed)
    timers = StageTimers()
    global_step = start_epoch * steps_per_epoch
    for epoch in range(start_epoch, args.epochs):
        perm = data_rng.permutation(len(x_train))
        train_loss, train_acc = Metric("loss"), Metric("acc")
        for i in range(steps_per_epoch):
            idx = perm[i * global_bs : (i + 1) * global_bs]
            timers.start("io")
            if multihost:
                # each process feeds only its addressable slice of the
                # global batch; assembly into one pod-global array is
                # jax.make_array_from_process_local_data's job
                from kfac_pytorch_tpu.parallel.multihost import (
                    local_batch_slice, make_global_batch,
                )

                s0, sz = local_batch_slice(len(idx))
                loc = idx[s0 : s0 + sz]
                batch = make_global_batch(
                    mesh,
                    (jnp.asarray(x_train[loc]), jnp.asarray(y_train[loc])),
                )
            else:
                batch = (jnp.asarray(x_train[idx]),
                         jnp.asarray(y_train[idx]))
                if mesh is not None:
                    batch = meshlib.shard_batch(mesh, batch)
            timers.stop("io", batch[0])
            scalars = KFACScalars.create(
                lr=lr_fn(global_step), damping=hypers.damping,
                fac_update_freq=hypers.fac_update_freq,
                kfac_update_freq=hypers.kfac_update_freq,
            )
            if args.profile_dir and global_step == 5:
                jax.profiler.start_trace(args.profile_dir)
            timers.start("step")
            state, m = train_step(state, batch, scalars)
            timers.stop("step", m["loss"])
            if args.profile_dir and global_step == 10:
                jax.profiler.stop_trace()
            train_loss.update(m["loss"])
            train_acc.update(m["accuracy"])
            global_step += 1
            if args.speed and global_step % args.log_interval == 0:
                s = timers.summary(args.log_interval)
                log.info("iter %d: io %.4fs step %.4fs", global_step,
                         s["io"], s["step"])
            if args.iters and global_step >= args.iters:
                break
        sched.step(epoch + 1)
        n_eval = min(len(x_test), 4 * args.val_batch_size)
        em = eval_step(
            state.params, state.model_state,
            (jnp.asarray(x_test[:n_eval]), jnp.asarray(y_test[:n_eval])),
        )
        log.info(
            "epoch %d: train loss %.4f acc %.4f | val loss %.4f acc %.4f | "
            "lr %.4f damping %.4g",
            epoch, train_loss.avg, train_acc.avg, float(em["loss"]),
            float(em["accuracy"]), float(lr_fn(global_step)), hypers.damping,
        )
        if ckpt_mgr is not None:
            ckpt_mgr.save(epoch, state)  # async: IO overlaps next epoch
        elif args.checkpoint_dir:
            os.makedirs(args.checkpoint_dir, exist_ok=True)
            ckpt.save_checkpoint(args.checkpoint_dir, state, epoch)
        if args.iters and global_step >= args.iters:
            break
    if ckpt_mgr is not None:
        ckpt_mgr.close()
    if args.speed:
        log.info("timer summary: %s", timers.summary())
    if multihost:
        jax.distributed.shutdown()
    return state


if __name__ == "__main__":
    main()
