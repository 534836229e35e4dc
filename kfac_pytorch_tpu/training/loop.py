"""Training-step assembly: capture + K-FAC preconditioning + first-order update.

Functional equivalent of the reference train loops
(/root/reference/examples/pytorch_cifar10_resnet.py:226-344): SGD (optax)
wrapped with gradient data-parallelism, K-FAC preconditioning between the
gradient computation and the optimizer update, and the SGD/Adam control arm
(``kfac_update_freq=0`` disables K-FAC entirely, reference README.md:80).

The whole step — forward, backward (capturing a/g), factor update,
eigendecomposition, preconditioning, kl-clip, SGD — is one traced program;
under pjit with a sharded batch the gradient mean over devices is inserted
automatically by GSPMD (the Horovod allreduce equivalent).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from kfac_pytorch_tpu import capture
from kfac_pytorch_tpu.capture import COL_A, COL_G
from kfac_pytorch_tpu.preconditioner import KFAC


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    kfac_state: Any  # None when K-FAC disabled
    model_state: Any = struct.field(default_factory=dict)  # e.g. batch_stats


@struct.dataclass
class KFACScalars:
    """Dynamic hyper-parameters fed into the traced step (no recompiles)."""

    lr: jax.Array
    damping: jax.Array
    fac_update_freq: jax.Array
    kfac_update_freq: jax.Array

    @classmethod
    def create(cls, lr, damping=0.003, fac_update_freq=1, kfac_update_freq=1):
        return cls(
            lr=jnp.asarray(lr, jnp.float32),
            damping=jnp.asarray(damping, jnp.float32),
            fac_update_freq=jnp.asarray(fac_update_freq, jnp.int32),
            kfac_update_freq=jnp.asarray(kfac_update_freq, jnp.int32),
        )


def softmax_cross_entropy(
    logits: jax.Array, labels: jax.Array, label_smoothing: float = 0.0
) -> jax.Array:
    """Batch-mean CE with optional label smoothing (reference
    examples/utils.py:20-32 LabelSmoothLoss)."""
    num_classes = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    if label_smoothing > 0.0:
        one_hot = (
            one_hot * (1.0 - label_smoothing) + label_smoothing / num_classes
        )
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.sum(one_hot * logp, axis=-1))


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    kfac: Optional[KFAC] = None,
    *,
    loss_fn: Optional[Callable] = None,
    label_smoothing: float = 0.0,
    perturb_template=None,
    train_kwargs: Optional[Dict[str, Any]] = None,
    fisher_type: str = "Femp",
):
    """Build a jittable train_step.

    Args:
      model: a flax module whose K-FAC layers are KFACDense/KFACConv.
      tx: the first-order optimizer (e.g. optax SGD+momentum+wd chain).
      kfac: the preconditioner, or None for the pure-SGD control arm.
      loss_fn: (logits, labels) -> scalar batch-mean loss. Defaults to CE.
      label_smoothing: used by the default loss.
      perturb_template: zero-perturbation pytree (shapes fixed per batch
        size) from capture.make_zero_perturbations; required when kfac is
        given.
      train_kwargs: extra kwargs for model.apply (e.g. {'train': True}).
      fisher_type: 'Femp' (empirical Fisher: cotangents from the real-label
        loss) or 'F1mc' (true-Fisher Monte Carlo: the G-factor cotangents
        come from a second backward against labels sampled from the model's
        own predictive distribution — the reference's --kfac-type flag,
        pytorch_cifar10_resnet.py:74-75 / examples/utils.py:83-90, which is
        defined but never wired up there; here it works). F1mc requires an
        ``rng`` passed to the step.

    Returns:
      train_step(state, batch, scalars, rng=None) -> (state, metrics)
    """
    if fisher_type not in ("Femp", "F1mc"):
        raise ValueError(f"unknown fisher_type {fisher_type}")
    train_kwargs = dict(train_kwargs or {})
    if loss_fn is None:
        loss_fn = lambda logits, labels: softmax_cross_entropy(
            logits, labels, label_smoothing
        )
    if kfac is not None and perturb_template is None:
        raise ValueError("kfac given but perturb_template missing")
    perturb_shapes = (
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), perturb_template
        )
        if perturb_template is not None
        else None
    )

    def _loss_with_capture(params, perturbs, model_state, batch):
        x, y = batch
        xs = x if isinstance(x, tuple) else (x,)  # multi-input models
        variables = {"params": params, **model_state}
        mutable = list(model_state.keys())
        if perturbs is not None:
            variables[COL_G] = perturbs
            mutable = [COL_A] + mutable
        out = model.apply(
            variables, *xs, mutable=mutable if mutable else False,
            **train_kwargs
        )
        if mutable:
            logits, muts = out
            acts = muts.get(COL_A)
            new_model_state = {k: v for k, v in muts.items() if k != COL_A}
        else:
            logits, acts, new_model_state = out, None, model_state
        loss = loss_fn(logits, y)
        return loss, (logits, acts, new_model_state)

    def train_step(state: TrainState, batch, scalars: KFACScalars, rng=None):
        if kfac is not None:
            perturbs = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), perturb_shapes
            )
            (loss, (logits, acts, model_state)), (grads, gs) = jax.value_and_grad(
                _loss_with_capture, argnums=(0, 1), has_aux=True
            )(state.params, perturbs, state.model_state, batch)
            if fisher_type == "F1mc":
                if rng is None:
                    raise ValueError("fisher_type='F1mc' needs an rng")
                # true-Fisher MC: resample labels from the model's own
                # predictive distribution and take the capture cotangents
                # from that backward instead (params grads stay real-label)
                pseudo = jax.random.categorical(rng, logits, axis=-1)
                (_, (_, acts, _)), gs = jax.value_and_grad(
                    lambda p, pe: _loss_with_capture(
                        p, pe, state.model_state, (batch[0], pseudo)
                    ),
                    argnums=1,
                    has_aux=True,
                )(state.params, perturbs)
            precond_grads, kfac_state = kfac.step(
                state.kfac_state,
                grads,
                acts,
                gs,
                lr=scalars.lr,
                damping=scalars.damping,
                fac_update_freq=scalars.fac_update_freq,
                kfac_update_freq=scalars.kfac_update_freq,
            )
        else:
            (loss, (logits, _, model_state)), grads = jax.value_and_grad(
                lambda p, ms, b: _loss_with_capture(p, None, ms, b),
                has_aux=True,
            )(state.params, state.model_state, batch)
            precond_grads, kfac_state = grads, state.kfac_state

        updates, opt_state = tx.update(
            precond_grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "accuracy": jnp.mean(
                (jnp.argmax(logits, axis=-1) == batch[1]).astype(jnp.float32)
            ),
        }
        return (
            TrainState(
                params=params,
                opt_state=opt_state,
                kfac_state=kfac_state,
                model_state=model_state,
            ),
            metrics,
        )

    return train_step


def make_grad_accum_train_step(
    model,
    tx: optax.GradientTransformation,
    kfac: Optional[KFAC],
    n_accum: int,
    *,
    loss_fn: Optional[Callable] = None,
    label_smoothing: float = 0.0,
    perturb_template=None,
    train_kwargs: Optional[Dict[str, Any]] = None,
):
    """Gradient-accumulation train step (the reference's
    ``--batches-per-allreduce``, pytorch_imagenet_resnet.py:355-367).

    The batch's leading dim must be ``n_accum * micro_batch``. Raw gradients
    are accumulated (averaged) across the micro-batches with ``lax.scan``;
    K-FAC preconditioning and the optimizer update run ONCE on the
    accumulated gradient — matching the reference, where backward() sums
    into ``.grad`` across sub-batches and preconditioner.step() +
    optimizer.step() run once per outer iteration. K-FAC curvature
    statistics (a, g) come from the last micro-batch, exactly like the
    reference's hooks (each forward overwrites ``m_a``/``m_g``,
    base.py:142-149, so only the final sub-batch's tensors survive to
    step()). ``perturb_template`` must be shaped for the MICRO batch.
    """
    if n_accum < 1:
        raise ValueError("n_accum must be >= 1")
    inner = make_train_step(
        model, tx, kfac, loss_fn=loss_fn, label_smoothing=label_smoothing,
        perturb_template=perturb_template, train_kwargs=train_kwargs,
    )
    if n_accum == 1:
        return inner

    train_kwargs = dict(train_kwargs or {})
    if loss_fn is None:
        loss_fn = lambda logits, labels: softmax_cross_entropy(
            logits, labels, label_smoothing
        )
    if kfac is not None and perturb_template is None:
        raise ValueError("kfac given but perturb_template missing")
    perturb_shapes = (
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), perturb_template
        )
        if perturb_template is not None
        else None
    )

    def _loss(params, perturbs, model_state, batch):
        x, y = batch
        xs = x if isinstance(x, tuple) else (x,)
        variables = {"params": params, **model_state}
        mutable = list(model_state.keys())
        if perturbs is not None:
            variables[capture.COL_G] = perturbs
            mutable = [COL_A] + mutable
        out = model.apply(
            variables, *xs, mutable=mutable if mutable else False,
            **train_kwargs
        )
        if mutable:
            logits, muts = out
            acts = muts.get(COL_A)
            new_model_state = {k: v for k, v in muts.items() if k != COL_A}
        else:
            logits, acts, new_model_state = out, None, model_state
        loss = loss_fn(logits, y)
        return loss, (logits, acts, new_model_state)

    def train_step(state: TrainState, batch, scalars: KFACScalars, rng=None):
        x, y = batch
        micro = x.shape[0] // n_accum
        xs = x.reshape((n_accum, micro) + x.shape[1:])
        ys = y.reshape((n_accum, micro) + y.shape[1:])

        def body(carry, chunk):
            acc_grads, _, model_state = carry
            cx, cy = chunk
            if kfac is not None:
                perturbs = jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), perturb_shapes
                )
                (loss, (logits, acts, model_state)), (grads, gs) = (
                    jax.value_and_grad(_loss, argnums=(0, 1), has_aux=True)(
                        state.params, perturbs, model_state, (cx, cy)
                    )
                )
                cap = (acts, gs)
            else:
                (loss, (logits, _, model_state)), grads = jax.value_and_grad(
                    lambda p, ms, b: _loss(p, None, ms, b), has_aux=True
                )(state.params, model_state, (cx, cy))
                cap = carry[1]
            acc_grads = jax.tree_util.tree_map(
                lambda a, g: a + g / n_accum, acc_grads, grads
            )
            metrics = {
                "loss": loss,
                "accuracy": jnp.mean(
                    (jnp.argmax(logits, -1) == cy).astype(jnp.float32)
                ),
            }
            return (acc_grads, cap, model_state), metrics

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        if kfac is not None:
            cap0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), perturb_shapes
            )
            # acts template from one abstract chunk apply
            acts0 = jax.eval_shape(
                lambda: _loss(
                    state.params, cap0, state.model_state, (xs[0], ys[0])
                )
            )[1][1]
            acts0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), acts0
            )
            carry0 = (zero_grads, (acts0, cap0), state.model_state)
        else:
            carry0 = (zero_grads, None, state.model_state)
        (grads, cap, model_state), metrics = jax.lax.scan(
            body, carry0, (xs, ys)
        )

        if kfac is not None:
            acts, gs = cap
            precond_grads, kfac_state = kfac.step(
                state.kfac_state, grads, acts, gs,
                lr=scalars.lr, damping=scalars.damping,
                fac_update_freq=scalars.fac_update_freq,
                kfac_update_freq=scalars.kfac_update_freq,
            )
        else:
            precond_grads, kfac_state = grads, state.kfac_state

        updates, opt_state = tx.update(
            precond_grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                params=params, opt_state=opt_state, kfac_state=kfac_state,
                model_state=model_state,
            ),
            jax.tree_util.tree_map(jnp.mean, metrics),
        )

    return train_step


def make_eval_step(model, *, loss_fn=None, eval_kwargs=None):
    eval_kwargs = dict(eval_kwargs or {})
    if loss_fn is None:
        loss_fn = softmax_cross_entropy

    def eval_step(params, model_state, batch):
        x, y = batch
        logits = model.apply({"params": params, **model_state}, x, **eval_kwargs)
        return {
            "loss": loss_fn(logits, y),
            "accuracy": jnp.mean(
                (jnp.argmax(logits, axis=-1) == y).astype(jnp.float32)
            ),
        }

    return eval_step
