"""Convergence-arm validation: K-FAC vs SGD on a structured synthetic task.

The reference validates the algorithm by full CIFAR/ImageNet convergence
runs against known accuracy targets (batch.sh "Convergence performance").
With no datasets in this environment, this script builds a *learnable*
synthetic image-classification task (a frozen random teacher CNN labels
random images) and trains ResNet-20 with each optimizer arm, reporting
final train/val metrics — K-FAC should dominate SGD at equal step budget.

Usage: python tools/convergence_check.py [--steps 300] [--variants ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

import kfac_pytorch_tpu as ktpu
from kfac_pytorch_tpu.models import get_model
from kfac_pytorch_tpu.training.loop import (
    KFACScalars,
    TrainState,
    make_eval_step,
    make_train_step,
)


class TeacherCNN(nn.Module):
    classes: int = 10

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(16, (5, 5), strides=(2, 2))(x)
        x = nn.tanh(x)
        x = nn.Conv(32, (3, 3), strides=(2, 2))(x)
        x = nn.tanh(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.classes)(x)


def make_dataset(n, classes, seed):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, 32, 32, 3).astype(np.float32)
    teacher = TeacherCNN(classes)
    tp = teacher.init(jax.random.PRNGKey(seed), jnp.asarray(x[:2]))
    logits = teacher.apply(tp, jnp.asarray(x))
    y = np.asarray(jnp.argmax(logits, -1)).astype(np.int32)
    return x, y


def run_arm(variant, x, y, xv, yv, steps, batch, lr, damping, seed,
            eval_every=0):
    model = get_model("resnet20", num_classes=10)
    sample = jnp.asarray(x[:batch])
    variables = model.init(jax.random.PRNGKey(seed), sample, train=True)
    params = variables["params"]
    model_state = {"batch_stats": variables["batch_stats"]}

    kfac, perturbs = None, None
    if variant != "sgd":
        specs, perturbs = ktpu.setup_kfac(
            model, {"params": params, **model_state}, sample, train=True
        )
        # 'tracking_dp': eigen_dp with the online eigenbasis-tracking
        # refresh (ops/blocked_symeig.tracking_symeig_update)
        if variant == "tracking_dp":
            kfac = ktpu.get_kfac_module("eigen_dp")(
                specs, damping=damping, symeig_impl="tracking"
            )
        else:
            kfac = ktpu.get_kfac_module(variant)(specs, damping=damping)
    tx = optax.chain(
        optax.add_decayed_weights(5e-4),
        optax.trace(0.9),
        optax.scale(-lr),
    )
    state = TrainState(
        params=params, opt_state=tx.init(params),
        kfac_state=kfac.init_state() if kfac else None,
        model_state=model_state,
    )
    step = jax.jit(
        make_train_step(model, tx, kfac, perturb_template=perturbs,
                        train_kwargs={"train": True})
    )
    eval_step = jax.jit(make_eval_step(model))
    scalars = KFACScalars.create(lr=lr, damping=damping)
    data_rng = np.random.RandomState(seed)
    n = len(x)
    m = None
    curve = []  # (step, val_loss, val_acc) trajectory
    for s in range(steps):
        idx = data_rng.randint(0, n, batch)
        state, m = step(state, (jnp.asarray(x[idx]), jnp.asarray(y[idx])),
                        scalars)
        if eval_every and (s + 1) % eval_every == 0:
            em = eval_step(state.params, state.model_state,
                           (jnp.asarray(xv), jnp.asarray(yv)))
            curve.append((s + 1, round(float(em["loss"]), 4),
                          round(float(em["accuracy"]), 4)))
    em = eval_step(state.params, state.model_state,
                   (jnp.asarray(xv), jnp.asarray(yv)))
    out = {
        "train_loss": float(m["loss"]),
        "train_acc": float(m["accuracy"]),
        "val_loss": float(em["loss"]),
        "val_acc": float(em["accuracy"]),
    }
    if curve:
        out["val_curve"] = curve
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--n-train", type=int, default=4096)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--damping", type=float, default=0.03)
    p.add_argument("--variants", nargs="+",
                   default=["sgd", "eigen_dp", "inverse_dp"])
    p.add_argument("--eval-every", type=int, default=0,
                   help="record a val-accuracy curve every N steps")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    from kfac_pytorch_tpu.utils.platform import ensure_platform_from_env
    ensure_platform_from_env()

    x, y = make_dataset(args.n_train + 512, 10, args.seed)
    xv, yv = x[-512:], y[-512:]
    x, y = x[: args.n_train], y[: args.n_train]
    print(f"# teacher-task label balance: "
          f"{np.bincount(y, minlength=10).tolist()}")
    results = {}
    for v in args.variants:
        results[v] = run_arm(
            v, x, y, xv, yv, args.steps, args.batch, args.lr, args.damping,
            args.seed, eval_every=args.eval_every,
        )
        print(v, json.dumps(results[v]))
    if "sgd" in results and "eigen_dp" in results:
        assert (
            results["eigen_dp"]["train_loss"] <= results["sgd"]["train_loss"]
        ), "eigen_dp should fit at least as fast as SGD"
        print("# PASS: eigen_dp >= sgd at equal step budget")
    return results


if __name__ == "__main__":
    main()
