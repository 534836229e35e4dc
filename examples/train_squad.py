"""SQuAD-class BERT question-answering K-FAC finetuning harness (TPU-native).

Equivalent of /root/reference/examples/pytorch_squad_bert.py: a HuggingFace
BERT QA model finetuned with AdamW (control arm) or SGD + K-FAC over every
dense layer, with the 30522-token vocabulary projections excluded
(reference :394,450 — exclude_vocabulary_size). The model is a STOCK
HuggingFace flax module, preconditioned via interceptor tagging
(kfac_pytorch_tpu.intercept) — no model modification, matching the
reference's hook-anything ergonomics.

Data: --data-path npz with (input_ids, attention_mask, token_type_ids,
start_positions, end_positions), or --synthetic span-extraction data
(default; zero-egress environment).
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
from kfac_pytorch_tpu.capture import COL_A, COL_G
from kfac_pytorch_tpu.intercept import setup_kfac_intercepted, tagged_apply
from kfac_pytorch_tpu.preconditioner import KFACHypers
from kfac_pytorch_tpu.utils.metrics import Metric

log = logging.getLogger("train_squad")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-size", default="tiny",
                   choices=["tiny", "mini", "base"],
                   help="BERT config (tiny/mini for smoke; base = bert-base)")
    p.add_argument("--seq-len", type=int, default=384)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--optimizer", default="sgd", choices=["sgd", "adamw"],
                   help="adamw = the reference's control arm (no K-FAC)")
    p.add_argument("--lr", type=float, default=5e-6 * 8)
    p.add_argument("--kfac-name", default="eigen_dp",
                   choices=sorted(ktpu.kfac_mappers))
    p.add_argument("--kfac-update-freq", type=int, default=10)
    p.add_argument("--kfac-cov-update-freq", type=int, default=10)
    p.add_argument("--damping", type=float, default=0.03)
    p.add_argument("--kl-clip", type=float, default=0.001)
    p.add_argument("--stat-decay", type=float, default=0.95)
    p.add_argument("--data-path", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--eval-frac", type=float, default=0.25,
                   help="held-out fraction scored with SQuAD F1/EM each "
                        "epoch (reference pytorch_squad_bert.py:615-648)")
    p.add_argument("--max-answer-len", type=int, default=30)
    return p.parse_args(argv)


def build_model(size: str):
    from transformers import BertConfig
    from transformers.models.bert.modeling_flax_bert import (
        FlaxBertForQuestionAnsweringModule,
    )

    cfgs = {
        "tiny": dict(hidden_size=128, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=512),
        "mini": dict(hidden_size=256, num_hidden_layers=4,
                     num_attention_heads=4, intermediate_size=1024),
        "base": dict(hidden_size=768, num_hidden_layers=12,
                     num_attention_heads=12, intermediate_size=3072),
    }
    config = BertConfig(vocab_size=30522, max_position_embeddings=512,
                        **cfgs[size])
    return FlaxBertForQuestionAnsweringModule(config=config), config


def load_data(args):
    if args.data_path and os.path.exists(args.data_path):
        d = np.load(args.data_path)
        return {k: d[k] for k in d.files}
    rng = np.random.RandomState(args.seed)
    n, t = 256, args.seq_len
    ids = rng.randint(1000, 30000, (n, t)).astype(np.int32)
    starts = rng.randint(1, t // 2, n).astype(np.int32)
    ends = (starts + rng.randint(1, 10, n)).astype(np.int32)
    # plant a learnable marker token at the answer span boundaries
    ids[np.arange(n), starts] = 101
    ids[np.arange(n), ends] = 102
    return dict(
        input_ids=ids,
        attention_mask=np.ones((n, t), np.int32),
        token_type_ids=np.zeros((n, t), np.int32),
        start_positions=starts,
        end_positions=ends,
    )


def main(argv=None):
    from kfac_pytorch_tpu.utils.platform import ensure_platform_from_env
    ensure_platform_from_env()
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    module, config = build_model(args.model_size)
    data = load_data(args)
    n_total = len(data["input_ids"])
    n_val = int(n_total * args.eval_frac)
    n = max(n_total - n_val, 1)
    val_data = {k: v[n:] for k, v in data.items()} if n_val else None
    data = {k: v[:n] for k, v in data.items()}
    bs = args.batch_size

    rng = np.random.RandomState(args.seed)
    sample = {
        k: jnp.asarray(data[k][:bs])
        for k in ("input_ids", "attention_mask", "token_type_ids")
    }
    pos_ids = jnp.broadcast_to(jnp.arange(args.seq_len), (bs, args.seq_len))
    init_args = (
        sample["input_ids"], sample["attention_mask"],
        sample["token_type_ids"], pos_ids, None,  # head_mask
    )
    variables = module.init(jax.random.PRNGKey(args.seed), *init_args)
    params = variables["params"]

    use_kfac = args.optimizer == "sgd" and args.kfac_update_freq > 0
    kfac, perturbs, specs = None, None, ()
    if use_kfac:
        specs, perturbs = setup_kfac_intercepted(
            module, {"params": params}, *init_args,
            deterministic=True, exclude_vocabulary_size=30522,
        )
        log.info("#register modules: %d (vocab-sized dense excluded)",
                 len(specs))
        kfac = ktpu.get_kfac_module(args.kfac_name)(
            specs, damping=args.damping, kl_clip=args.kl_clip,
            factor_decay=args.stat_decay,
        )

    if args.optimizer == "adamw":
        tx = optax.adamw(args.lr, weight_decay=0.01)
    else:
        tx = optax.chain(optax.trace(0.9), optax.scale(-args.lr))
    opt_state = tx.init(params)
    kfac_state = kfac.init_state() if kfac else None

    def qa_loss(start_logits, end_logits, starts, ends):
        def ce(lo, pos):
            oh = jax.nn.one_hot(pos, lo.shape[-1])
            return -jnp.mean(jnp.sum(oh * jax.nn.log_softmax(lo), -1))

        return 0.5 * (ce(start_logits, starts) + ce(end_logits, ends))

    def apply_fn(p, pert, batch_args):
        if pert is not None:
            out, muts = tagged_apply(
                module, {"params": p, COL_G: pert}, *batch_args,
                deterministic=True, mutable=[COL_A],
                exclude_vocabulary_size=30522,
            )
            return out, muts[COL_A]
        return module.apply({"params": p}, *batch_args,
                            deterministic=True), None

    @jax.jit
    def train_step(params, opt_state, kfac_state, batch, hp):
        batch_args = (
            batch["input_ids"], batch["attention_mask"],
            batch["token_type_ids"],
            jnp.broadcast_to(
                jnp.arange(batch["input_ids"].shape[1]),
                batch["input_ids"].shape,
            ),
            None,  # head_mask
        )

        if use_kfac:
            pert = jax.tree_util.tree_map(jnp.zeros_like, perturbs)

            def loss_fn(p, pe):
                out, acts = apply_fn(p, pe, batch_args)
                return qa_loss(
                    out.start_logits, out.end_logits,
                    batch["start_positions"], batch["end_positions"],
                ), acts

            (loss, acts), (grads, gs) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, pert)
            grads, kfac_state = kfac.step(
                kfac_state, grads, acts, gs, lr=hp["lr"],
                damping=hp["damping"], fac_update_freq=hp["fac_freq"],
                kfac_update_freq=hp["inv_freq"],
            )
        else:

            def loss_fn(p):
                out, _ = apply_fn(p, None, batch_args)
                return qa_loss(
                    out.start_logits, out.end_logits,
                    batch["start_positions"], batch["end_positions"],
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)

        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, kfac_state, loss

    @jax.jit
    def eval_step(params, batch):
        batch_args = (
            batch["input_ids"], batch["attention_mask"],
            batch["token_type_ids"],
            jnp.broadcast_to(
                jnp.arange(batch["input_ids"].shape[1]),
                batch["input_ids"].shape,
            ),
            None,
        )
        out = module.apply({"params": params}, *batch_args,
                           deterministic=True)
        return out.start_logits, out.end_logits

    def evaluate(params):
        """SQuAD span F1 / exact-match over the held-out slice
        (reference eval: pytorch_squad_bert.py:615-648)."""
        from kfac_pytorch_tpu.utils.squad_metrics import (
            best_spans, span_to_text, squad_evaluate)

        preds, golds = [], []
        nv = len(val_data["input_ids"])
        for i in range(0, nv - nv % bs or nv, bs):
            batch = {k: jnp.asarray(v[i : i + bs])
                     for k, v in val_data.items()}
            if len(batch["input_ids"]) < bs:
                break
            sl, el = jax.device_get(eval_step(params, batch))
            ps, pe = best_spans(sl, el, args.max_answer_len,
                                val_data["attention_mask"][i : i + bs])
            ids = val_data["input_ids"][i : i + bs]
            gs_ = val_data["start_positions"][i : i + bs]
            ge_ = val_data["end_positions"][i : i + bs]
            for j in range(len(ids)):
                preds.append(span_to_text(ids[j], ps[j], pe[j]))
                golds.append([span_to_text(ids[j], gs_[j], ge_[j])])
        return squad_evaluate(preds, golds)

    hypers = KFACHypers(args.damping, args.kfac_cov_update_freq,
                        args.kfac_update_freq)
    steps_per_epoch = max(n // bs, 1)
    global_step = 0
    for epoch in range(args.epochs):
        perm = rng.permutation(n)
        ep_loss = Metric("loss")
        for i in range(steps_per_epoch):
            idx = perm[i * bs : (i + 1) * bs]
            batch = {k: jnp.asarray(v[idx]) for k, v in data.items()}
            hp = {
                "lr": jnp.float32(args.lr),
                "damping": jnp.float32(hypers.damping),
                "fac_freq": jnp.int32(hypers.fac_update_freq),
                "inv_freq": jnp.int32(hypers.kfac_update_freq),
            }
            params, opt_state, kfac_state, loss = train_step(
                params, opt_state, kfac_state, batch, hp
            )
            ep_loss.update(loss)
            global_step += 1
            if args.iters and global_step >= args.iters:
                break
        if val_data is not None:
            m = evaluate(params)
            log.info("epoch %d: loss %.4f val_f1 %.2f val_em %.2f",
                     epoch, ep_loss.avg, m["f1"], m["exact_match"])
        else:
            log.info("epoch %d: loss %.4f", epoch, ep_loss.avg)
        if args.iters and global_step >= args.iters:
            break
    return params


if __name__ == "__main__":
    main()
