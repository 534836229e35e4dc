"""WikiText-class RNN language-model K-FAC harness (TPU-native).

Equivalent of /root/reference/examples/pytorch_wikitext_rnn.py (LSTM/GRU LM
with BPTT batching). The reference flags its K-FAC path "does not work yet"
(it calls a defunct API, pytorch_wikitext_rnn.py:6,196-202); here the
decoder dense layer is preconditioned through the working seq-mean factor
path, with --kfac-update-freq 0 giving the SGD control arm.

Data: --data-path npz with int32 'tokens' array, or --synthetic (default:
a Markov-chain corpus with learnable structure).
"""

from __future__ import annotations

import argparse
import logging
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp
import optax

import kfac_pytorch_tpu as ktpu
from kfac_pytorch_tpu.models import RNNLM
from kfac_pytorch_tpu.preconditioner import KFACHypers
from kfac_pytorch_tpu.training.loop import KFACScalars, TrainState, make_train_step
from kfac_pytorch_tpu.utils.metrics import Metric

log = logging.getLogger("train_wikitext")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cell", default="lstm", choices=["lstm", "gru"])
    p.add_argument("--vocab", type=int, default=1000)
    p.add_argument("--emb-dim", type=int, default=200)
    p.add_argument("--hidden-dim", type=int, default=200)
    p.add_argument("--n-layers", type=int, default=2)
    p.add_argument("--bptt", type=int, default=35)
    p.add_argument("--batch-size", type=int, default=20)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=1.0)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--clip", type=float, default=0.25)
    p.add_argument("--kfac-update-freq", type=int, default=1)
    p.add_argument("--kfac-cov-update-freq", type=int, default=1)
    p.add_argument("--damping", type=float, default=0.03)
    p.add_argument("--data-path", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def load_tokens(args) -> np.ndarray:
    if args.data_path and os.path.exists(args.data_path):
        return np.load(args.data_path)["tokens"].astype(np.int32)
    # synthetic Markov chain over the vocab
    rng = np.random.RandomState(args.seed)
    trans = rng.dirichlet(np.ones(50) * 0.1, size=args.vocab)
    nbrs = np.stack([rng.choice(args.vocab, 50) for _ in range(args.vocab)])
    n = 200_000
    toks = np.zeros(n, np.int32)
    for i in range(1, n):
        toks[i] = nbrs[toks[i - 1], rng.choice(50, p=trans[toks[i - 1]])]
    return toks


def batchify(tokens: np.ndarray, bs: int) -> np.ndarray:
    n = len(tokens) // bs
    return tokens[: n * bs].reshape(bs, n)


def main(argv=None):
    from kfac_pytorch_tpu.utils.platform import ensure_platform_from_env
    ensure_platform_from_env()
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    data = batchify(load_tokens(args), args.batch_size)

    model = RNNLM(
        vocab_size=args.vocab, emb_dim=args.emb_dim,
        hidden_dim=args.hidden_dim, n_layers=args.n_layers, cell=args.cell,
        dropout=args.dropout,
    )
    rng = jax.random.PRNGKey(args.seed)
    sample = jnp.asarray(data[:, : args.bptt])
    variables = model.init(rng, sample)
    params = variables["params"]

    use_kfac = args.kfac_update_freq > 0
    kfac, perturbs = None, None
    if use_kfac:
        specs, perturbs = ktpu.setup_kfac(model, {"params": params}, sample)
        log.info("#register modules: %d", len(specs))
        kfac = ktpu.DP_KFAC(specs, damping=args.damping)

    tx = optax.chain(
        optax.clip_by_global_norm(args.clip),
        optax.sgd(args.lr),
    )
    state = TrainState(
        params=params, opt_state=tx.init(params),
        kfac_state=kfac.init_state() if kfac else None, model_state={},
    )

    def lm_loss(logits, labels):
        oh = jax.nn.one_hot(labels, logits.shape[-1])
        return -jnp.mean(jnp.sum(oh * jax.nn.log_softmax(logits), axis=-1))

    step = jax.jit(
        make_train_step(model, tx, kfac, loss_fn=lm_loss,
                        perturb_template=perturbs)
    )
    hypers = KFACHypers(args.damping, args.kfac_cov_update_freq,
                        args.kfac_update_freq)

    n_batches = (data.shape[1] - 1) // args.bptt
    global_step = 0
    for epoch in range(args.epochs):
        ep_loss = Metric("loss")
        for i in range(n_batches):
            x = jnp.asarray(data[:, i * args.bptt : (i + 1) * args.bptt])
            y = jnp.asarray(
                data[:, i * args.bptt + 1 : (i + 1) * args.bptt + 1]
            )
            scalars = KFACScalars.create(
                lr=args.lr, damping=hypers.damping,
                fac_update_freq=hypers.fac_update_freq,
                kfac_update_freq=hypers.kfac_update_freq,
            )
            state, m = step(state, (x, y), scalars)
            ep_loss.update(m["loss"])
            global_step += 1
            if args.iters and global_step >= args.iters:
                break
        ppl = math.exp(min(ep_loss.avg, 20))
        log.info("epoch %d: loss %.4f ppl %.2f", epoch, ep_loss.avg, ppl)
        if args.iters and global_step >= args.iters:
            break
    return state


if __name__ == "__main__":
    main()
