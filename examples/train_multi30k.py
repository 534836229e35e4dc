"""Multi-30k-class seq2seq Transformer K-FAC harness (TPU-native).

Equivalent of /root/reference/examples/pytorch_multi30k_transformer.py:
Transformer with K-FAC over all attention/FFN dense layers (vocab
projection excluded — reference passes exclude_vocabulary_size=trg_vocab,
:297), SGD+KFAC vs Adam control arm (--optimizer adam disables K-FAC like
the reference's control), label-smoothed token CE ignoring padding, and
beam-search (beam=5, like the reference's Translator.py) BLEU each epoch
under --eval-bleu.

Data: --data-path npz with (src_train, trg_train, ...) int32 token arrays,
or --synthetic copy-task data (default; the model must learn to copy a
shifted source sequence — a real seq2seq task with measurable accuracy).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp
import optax

import kfac_pytorch_tpu as ktpu
from kfac_pytorch_tpu.models import Transformer
from kfac_pytorch_tpu.models.translator import (
    beam_search_decode, corpus_bleu, greedy_decode)
from kfac_pytorch_tpu.preconditioner import KFACConfig, KFACHypers, KFACParamScheduler
from kfac_pytorch_tpu.training.loop import KFACScalars, TrainState, make_train_step
from kfac_pytorch_tpu.utils import lr_schedules
from kfac_pytorch_tpu.utils.metrics import Metric

log = logging.getLogger("train_multi30k")
PAD = 1


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--d-model", type=int, default=512)
    p.add_argument("--d-ff", type=int, default=2048)
    p.add_argument("--n-layers", type=int, default=6)
    p.add_argument("--n-head", type=int, default=8)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--src-vocab", type=int, default=9521)
    p.add_argument("--trg-vocab", type=int, default=9521)
    p.add_argument("--seq-len", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--optimizer", default="sgd", choices=["sgd", "adam"],
                   help="adam = the reference's control arm (no K-FAC)")
    p.add_argument("--base-lr", type=float, default=0.1)
    p.add_argument("--warmup-steps", type=int, default=4000)
    p.add_argument("--lr-factor", type=float, default=2.0,
                   help="inverse-sqrt schedule multiplier for the Adam "
                        "control arm (reference Optim.py lr_mul; peak lr = "
                        "factor / sqrt(d_model * warmup_steps))")
    p.add_argument("--label-smoothing", type=float, default=0.1)
    # K-FAC
    p.add_argument("--kfac-name", default="eigen_dp",
                   choices=sorted(ktpu.kfac_mappers))
    p.add_argument("--kfac-update-freq", type=int, default=1)
    p.add_argument("--kfac-cov-update-freq", type=int, default=1)
    p.add_argument("--stat-decay", type=float, default=0.95)
    p.add_argument("--damping", type=float, default=0.03)
    p.add_argument("--kl-clip", type=float, default=0.001)
    # harness
    p.add_argument("--data-path", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--eval-bleu", action="store_true",
                   help="beam-search BLEU on the test split each epoch "
                        "(reference Translator.py beam=5)")
    p.add_argument("--beam-size", type=int, default=5,
                   help="eval beam width; 1 = greedy decode")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def load_data(args):
    if args.data_path and os.path.exists(args.data_path):
        d = np.load(args.data_path)
        return (d["src_train"], d["trg_train"]), (d["src_test"], d["trg_test"])
    # synthetic copy task: trg = src shifted by +1 token id
    rng = np.random.RandomState(args.seed)
    n_train, n_test, t = 2048, 256, args.seq_len

    def make(n):
        src = rng.randint(3, min(args.src_vocab, 100), (n, t)).astype(np.int32)
        lengths = rng.randint(t // 2, t, n)
        for i, l in enumerate(lengths):
            src[i, l:] = PAD
        trg = np.where(src != PAD, np.minimum(src + 1, args.trg_vocab - 1),
                       PAD).astype(np.int32)
        return src, trg

    return make(n_train), make(n_test)


def token_loss(label_smoothing):
    def loss_fn(logits, labels):
        mask = (labels != PAD).astype(jnp.float32)
        n_cls = logits.shape[-1]
        oh = jax.nn.one_hot(labels, n_cls)
        if label_smoothing > 0:
            oh = oh * (1 - label_smoothing) + label_smoothing / n_cls
        ll = -jnp.sum(oh * jax.nn.log_softmax(logits), axis=-1)
        return jnp.sum(ll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    return loss_fn


def main(argv=None):
    from kfac_pytorch_tpu.utils.platform import ensure_platform_from_env
    ensure_platform_from_env()
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    (src_tr, trg_tr), (src_te, trg_te) = load_data(args)

    model = Transformer(
        n_src_vocab=args.src_vocab, n_trg_vocab=args.trg_vocab,
        d_model=args.d_model, d_ff=args.d_ff, n_layers=args.n_layers,
        n_head=args.n_head, dropout=args.dropout,
        max_len=max(args.seq_len, 64), pad_idx=PAD,
    )
    rng = jax.random.PRNGKey(args.seed)
    bs = args.batch_size
    s_src = jnp.asarray(src_tr[:bs])
    s_trg = jnp.asarray(trg_tr[:bs, :-1])
    variables = model.init(rng, s_src, s_trg)
    params = variables["params"]

    use_kfac = args.optimizer == "sgd" and args.kfac_update_freq > 0
    kfac, perturbs = None, None
    if use_kfac:
        specs, perturbs = ktpu.setup_kfac(
            model, {"params": params}, s_src, s_trg
        )
        log.info("#register modules: %d (vocab projection excluded)",
                 len(specs))
        kfac = ktpu.get_kfac_module(args.kfac_name)(
            specs, damping=args.damping, kl_clip=args.kl_clip,
            factor_decay=args.stat_decay,
        )

    steps_per_epoch = max(len(src_tr) // bs, 1)
    if args.optimizer == "adam":
        lr_fn = lr_schedules.inverse_sqrt(args.d_model, args.warmup_steps,
                                          factor=args.lr_factor)
        tx = optax.adam(lr_fn, b1=0.9, b2=0.98, eps=1e-9)
    else:
        lr_fn = lr_schedules.warmup_multistep(
            args.base_lr, 1, [int(args.epochs * 0.6), int(args.epochs * 0.8)],
            steps_per_epoch=steps_per_epoch,
        )
        tx = lr_schedules.sgd_optimizer(lr_fn, 0.9, 1e-4)

    state = TrainState(
        params=params, opt_state=tx.init(params),
        kfac_state=kfac.init_state() if kfac else None, model_state={},
    )
    step = jax.jit(
        make_train_step(
            model, tx, kfac, loss_fn=token_loss(args.label_smoothing),
            perturb_template=perturbs,
            train_kwargs={"train": False},  # dropout off for determinism
        )
    )
    hypers = KFACHypers(args.damping, args.kfac_cov_update_freq,
                        args.kfac_update_freq)

    data_rng = np.random.RandomState(args.seed)
    global_step = 0
    for epoch in range(args.epochs):
        perm = data_rng.permutation(len(src_tr))
        ep_loss, ep_acc = Metric("loss"), Metric("acc")
        for i in range(steps_per_epoch):
            idx = perm[i * bs : (i + 1) * bs]
            src = jnp.asarray(src_tr[idx])
            trg = jnp.asarray(trg_tr[idx])
            batch = ((src, trg[:, :-1]), trg[:, 1:])
            scalars = KFACScalars.create(
                lr=lr_fn(global_step), damping=hypers.damping,
                fac_update_freq=hypers.fac_update_freq,
                kfac_update_freq=hypers.kfac_update_freq,
            )
            state, m = step(state, batch, scalars)
            ep_loss.update(m["loss"])
            ep_acc.update(m["accuracy"])
            global_step += 1
            if args.iters and global_step >= args.iters:
                break
        if args.eval_bleu:
            n_eval = min(len(src_te), 4 * bs)
            src_eval = jnp.asarray(src_te[:n_eval])
            if args.beam_size > 1:
                # the reference evaluates BLEU through a beam=5 search
                # (/root/reference/examples/transformer/Translator.py)
                hyps = beam_search_decode(
                    model, state.params, src_eval, bos=2, eos=3, pad=PAD,
                    beam_size=args.beam_size, max_len=args.seq_len + 2,
                )
            else:
                hyps = greedy_decode(
                    model, state.params, src_eval,
                    bos=2, eos=3, pad=PAD, max_len=args.seq_len + 2,
                )
            bleu = corpus_bleu(
                np.asarray(hyps)[:, 1:], trg_te[:n_eval, 1:], pad=PAD, eos=3
            )
            log.info("epoch %d: BLEU %.4f (beam=%d)",
                     epoch, bleu, args.beam_size)
        log.info("epoch %d: train loss %.4f token-acc %.4f | lr %.5f",
                 epoch, ep_loss.avg, ep_acc.avg, float(lr_fn(global_step)))
        if args.iters and global_step >= args.iters:
            break
    return state


if __name__ == "__main__":
    main()
