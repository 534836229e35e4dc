"""Distributed training step: data-parallel SGD + mesh-sharded K-FAC.

The whole step runs inside one ``shard_map`` over the data axis, which gives
exactly the reference's execution model (/root/reference/examples/
pytorch_cifar10_resnet.py:292-331 with Horovod):

  local forward/backward on the device-local batch shard
  -> lax.pmean of gradients                (Horovod allreduce, boundary #1)
  -> BlockKFAC.step(axis='data')           (factor schedule per strategy;
                                            pred all-gather, boundary #2)
  -> first-order optimizer update          (replicated, consistent)

BatchNorm batch statistics are computed per-device (matching DDP semantics)
and pmean-synchronized into the stored running stats.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from kfac_pytorch_tpu.capture import COL_A, COL_G
from kfac_pytorch_tpu.parallel.mesh import DATA_AXIS
from kfac_pytorch_tpu.parallel.strategies import BlockKFAC
from kfac_pytorch_tpu.training.loop import KFACScalars, TrainState, softmax_cross_entropy


def make_sharded_train_step(
    model,
    tx: optax.GradientTransformation,
    kfac: Optional[BlockKFAC],
    mesh: Mesh,
    state_template: TrainState,
    local_perturb_template=None,
    *,
    axis: str = DATA_AXIS,
    loss_fn: Optional[Callable] = None,
    label_smoothing: float = 0.0,
    train_kwargs: Optional[Dict[str, Any]] = None,
    n_accum: int = 1,
    grad_compression: Optional[str] = None,
):
    """Build a jitted shard_map train step over ``mesh``.

    ``local_perturb_template`` must be shaped for the *device-local MICRO
    batch* (global_batch / mesh_size / n_accum); required when kfac is
    given. ``state_template`` (e.g. the initial TrainState) supplies the
    pytree structure for sharding specs: params/opt_state/model_state
    replicated, K-FAC bucket arrays sharded on their stacked-layer axis.

    ``n_accum > 1`` is the reference's --batches-per-allreduce
    (pytorch_imagenet_resnet.py:355-367): each device scans over n_accum
    micro-batches of its local shard accumulating raw gradients; the
    gradient pmean, K-FAC preconditioning, and optimizer update run ONCE on
    the accumulated gradient (curvature statistics come from the last
    micro-batch, matching the reference's overwrite-on-forward hooks).

    ``grad_compression='bf16'`` casts gradients to bfloat16 for the
    data-parallel allreduce and back (halved ICI/DCN traffic) — the
    reference's hvd.Compression.fp16 option
    (pytorch_cifar10_resnet.py:252-254, --fp16-allreduce).
    """
    if grad_compression not in (None, "bf16"):
        raise ValueError(f"unknown grad_compression {grad_compression}")
    train_kwargs = dict(train_kwargs or {})
    if loss_fn is None:
        loss_fn = lambda logits, labels: softmax_cross_entropy(
            logits, labels, label_smoothing
        )
    if kfac is not None and local_perturb_template is None:
        raise ValueError("kfac given but local_perturb_template missing")
    perturb_shapes = (
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            local_perturb_template,
        )
        if local_perturb_template is not None
        else None
    )

    # sharding specs for the TrainState pytree
    def _replicated_like(tree):
        return jax.tree_util.tree_map(lambda _: P(), tree)

    state_specs = TrainState(
        params=_replicated_like(state_template.params),
        opt_state=_replicated_like(state_template.opt_state),
        kfac_state=(
            kfac.state_pspecs(axis)
            if kfac is not None
            else _replicated_like(state_template.kfac_state)
        ),
        model_state=_replicated_like(state_template.model_state),
    )
    batch_specs = (P(axis), P(axis))
    scalar_specs = _replicated_like(
        KFACScalars.create(0.0)
    )  # all replicated
    metric_specs = {"loss": P(), "accuracy": P()}

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
        return loss_fn(logits, y), (logits, acts, new_model_state)

    def _grad_one(params, model_state, batch):
        """One micro-batch forward/backward; returns grads + capture."""
        if kfac is not None:
            perturbs = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), perturb_shapes
            )
            (loss, (logits, acts, model_state)), (grads, gs) = (
                jax.value_and_grad(
                    _loss_with_capture, argnums=(0, 1), has_aux=True
                )(params, perturbs, model_state, batch)
            )
        else:
            (loss, (logits, _, model_state)), grads = jax.value_and_grad(
                lambda p, ms, b: _loss_with_capture(p, None, ms, b),
                has_aux=True,
            )(params, model_state, batch)
            gs, acts = None, None
        return loss, logits, grads, acts, gs, model_state

    def _local_step(state: TrainState, batch, scalars: KFACScalars):
        if n_accum <= 1:
            loss, logits, grads, acts, gs, model_state = _grad_one(
                state.params, state.model_state, batch
            )
            acc = jnp.mean(
                (jnp.argmax(logits, -1) == batch[1]).astype(jnp.float32)
            )
        else:
            x, y = batch
            micro = x.shape[0] // n_accum
            xs = x.reshape((n_accum, micro) + x.shape[1:])
            ys = y.reshape((n_accum, micro) + y.shape[1:])

            def body(carry, chunk):
                acc_grads, _, _, model_state = carry
                loss, logits, grads, acts, gs, model_state = _grad_one(
                    state.params, model_state, chunk
                )
                acc_grads = jax.tree_util.tree_map(
                    lambda a, g: a + g / n_accum, acc_grads, grads
                )
                m = {
                    "loss": loss,
                    "acc": jnp.mean(
                        (jnp.argmax(logits, -1) == chunk[1]).astype(
                            jnp.float32
                        )
                    ),
                }
                return (acc_grads, acts, gs, model_state), m

            zero_grads = jax.tree_util.tree_map(
                jnp.zeros_like, state.params
            )
            shapes = jax.eval_shape(
                lambda: _grad_one(
                    state.params, state.model_state, (xs[0], ys[0])
                )
            )
            zeros_of = lambda t: jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), t
            )
            carry0 = (
                zero_grads, zeros_of(shapes[3]), zeros_of(shapes[4]),
                state.model_state,
            )
            (grads, acts, gs, model_state), ms = jax.lax.scan(
                body, carry0, (xs, ys)
            )
            loss, acc = jnp.mean(ms["loss"]), jnp.mean(ms["acc"])
            logits = None

        # gradient data-parallel allreduce (Horovod equivalent)
        if grad_compression == "bf16":
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.pmean(
                    g.astype(jnp.bfloat16), axis
                ).astype(g.dtype),
                grads,
            )
        else:
            grads = jax.lax.pmean(grads, axis)
        model_state = jax.lax.pmean(model_state, axis)

        if kfac is not None:
            precond_grads, kfac_state = kfac.step(
                state.kfac_state,
                grads,
                acts,
                gs,
                lr=scalars.lr,
                damping=scalars.damping,
                fac_update_freq=scalars.fac_update_freq,
                kfac_update_freq=scalars.kfac_update_freq,
                axis=axis,
            )
        else:
            precond_grads, kfac_state = grads, state.kfac_state

        updates, opt_state = tx.update(
            precond_grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": jax.lax.pmean(loss, axis),
            "accuracy": jax.lax.pmean(acc, axis),
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

    sharded = shard_map(
        _local_step,
        mesh=mesh,
        in_specs=(state_specs, batch_specs, scalar_specs),
        out_specs=(state_specs, metric_specs),
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_train_state(
    mesh: Mesh, kfac: Optional[BlockKFAC], state: TrainState,
    axis: str = DATA_AXIS,
) -> TrainState:
    """Place a TrainState on the mesh: everything replicated except the
    K-FAC bucket arrays (sharded on their layer axis)."""
    repl = NamedSharding(mesh, P())
    put_repl = lambda t: jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), t
    )
    return TrainState(
        params=put_repl(state.params),
        opt_state=put_repl(state.opt_state),
        kfac_state=(
            kfac.shard_state(mesh, state.kfac_state, axis)
            if kfac is not None and state.kfac_state is not None
            else put_repl(state.kfac_state)
        ),
        model_state=put_repl(state.model_state),
    )
