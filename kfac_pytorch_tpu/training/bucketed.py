"""Bucket-resident training step: K-FAC + SGD momentum in stacked form.

Round-1 profiling (BENCH_NOTES.md) showed the K-FAC step overhead was
dominated by a per-layer op tail: stack/unstack of every layer gradient,
per-layer optimizer updates, and per-bucket conds — ~6000 dispatches of
~15us. This trainer keeps gradients BUCKET-RESIDENT across the whole step:

  forward/backward (capture a, g)
  -> stack grads into buckets            ONE batched op per equal-shape run
  -> K-FAC factors/inverse/precond/kl    batched per bucket (BlockKFAC
                                         .step_buckets, stage-major conds)
  -> SGD momentum (+ weight decay)       in bucket form: 2-3 ops per BUCKET
                                         instead of 2-3 ops per PARAMETER
  -> apply deltas to params              one batched slice/reshape per run,
                                         one subtract per parameter leaf

Non-K-FAC parameters (BatchNorm scales/biases, excluded layers) go through
a plain momentum-SGD tree update, exactly like the SGD control arm.

Semantics parity: the composite update equals
``optax.sgd(lr, momentum)`` (reference torch.optim.SGD,
examples/pytorch_cifar10_resnet.py:226-231) applied to the kl-clipped
preconditioned gradients — the reference pipeline where KFAC.step overwrites
``.grad`` and optimizer.step() consumes it (base.py:185-230) — verified
against the unbucketed trainer in tests/test_bucketed.py.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import struct

from kfac_pytorch_tpu.capture import COL_A, COL_G
from kfac_pytorch_tpu.parallel.strategies import BlockKFAC
from kfac_pytorch_tpu.training.loop import KFACScalars, softmax_cross_entropy


@struct.dataclass
class BucketedTrainState:
    params: Any
    mom_buckets: List[jax.Array]  # SGD momentum, stacked bucket form
    other_mom: Any  # momentum tree for non-K-FAC leaves (scalars elsewhere)
    kfac_state: Any
    model_state: Any = struct.field(default_factory=dict)


def kfac_leaf_mask(kfac: BlockKFAC, params) -> Any:
    """Pytree of Python bools over params leaves: True where the leaf is a
    K-FAC-preconditioned kernel/bias (static — resolved at trace time)."""
    owned = kfac.kfac_param_paths()

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return path[:-1] in owned

    return walk(params, ())


def init_bucketed_state(
    kfac: BlockKFAC, params, kfac_state=None, model_state=None
) -> BucketedTrainState:
    mask = kfac_leaf_mask(kfac, params)
    mom_buckets = [
        jnp.zeros((b.n_rows, b.dg, b.da)) for b in kfac.buckets
    ]
    other_mom = jax.tree_util.tree_map(
        lambda p, k: jnp.zeros(()) if k else jnp.zeros_like(p), params, mask
    )
    return BucketedTrainState(
        params=params,
        mom_buckets=mom_buckets,
        other_mom=other_mom,
        kfac_state=kfac_state if kfac_state is not None else kfac.init_state(),
        model_state=model_state or {},
    )


def bucketed_state_pspecs(kfac: BlockKFAC, state: BucketedTrainState,
                          axis: str = "data"):
    """PartitionSpec pytree for a BucketedTrainState: params/other replicated,
    K-FAC bucket arrays and bucket momentum sharded on the stacked-layer
    axis."""
    from jax.sharding import PartitionSpec as P

    repl = lambda t: jax.tree_util.tree_map(lambda _: P(), t)
    return BucketedTrainState(
        params=repl(state.params),
        mom_buckets=[P(axis) for _ in kfac.buckets],
        other_mom=repl(state.other_mom),
        kfac_state=kfac.state_pspecs(axis),
        model_state=repl(state.model_state),
    )


def shard_bucketed_state(mesh, kfac: BlockKFAC, state: BucketedTrainState,
                         axis: str = "data") -> BucketedTrainState:
    """Place a BucketedTrainState on the mesh per bucketed_state_pspecs."""
    from jax.sharding import NamedSharding

    specs = bucketed_state_pspecs(kfac, state, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state,
        specs,
    )


def make_sharded_bucketed_train_step(
    model,
    kfac: BlockKFAC,
    mesh,
    state_template: BucketedTrainState,
    local_perturb_template,
    *,
    axis: str = "data",
    **step_kwargs,
):
    """shard_map-wrapped bucket-resident train step over ``mesh``.

    ``local_perturb_template`` must be shaped for the device-local batch.
    Returns a jitted step(state, batch, scalars) — the distributed
    counterpart of make_bucketed_train_step (batch sharded over ``axis``,
    gradient pmean inside, K-FAC buckets and momentum sharded on their
    layer axis).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    local = make_bucketed_train_step(
        model, kfac, perturb_template=local_perturb_template, axis=axis,
        **step_kwargs,
    )
    state_specs = bucketed_state_pspecs(kfac, state_template, axis)
    scalar_specs = jax.tree_util.tree_map(
        lambda _: P(), KFACScalars.create(0.0)
    )
    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(state_specs, (P(axis), P(axis)), scalar_specs),
        out_specs=(state_specs, {"loss": P(), "accuracy": P()}),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_bucketed_train_step(
    model,
    kfac: BlockKFAC,
    *,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    nesterov: bool = False,
    loss_fn: Optional[Callable] = None,
    label_smoothing: float = 0.0,
    perturb_template=None,
    train_kwargs: Optional[Dict[str, Any]] = None,
    axis: Optional[str] = None,
    n_accum: int = 1,
    grad_compression: Optional[str] = None,
    delta_gather_compression: Optional[str] = None,
):
    """Build the bucket-resident train step.

    Returns ``train_step(state, batch, scalars) -> (state, metrics)``.
    With ``axis`` set the step must run inside shard_map over that mesh
    axis (gradients are pmean'd over it; K-FAC runs sharded).

    ``n_accum > 1`` is the reference's ``--batches-per-allreduce`` gradient
    accumulation (pytorch_imagenet_resnet.py:355-367): the (device-local)
    batch is split into n_accum micro-batches scanned with raw-gradient
    accumulation; curvature statistics (a, g) come from the LAST
    micro-batch, matching the reference where hooks overwrite m_a/m_g each
    backward and the preconditioner reads the final ones. The
    ``perturb_template`` must then be shaped for the MICRO-batch.

    NOTE: with ``kfac.config.static_schedule`` the scalars'
    fac/kfac_update_freq are IGNORED — gating is compiled from the config's
    static freqs (the bench fast path). Drive dynamic schedules
    (KFACParamScheduler) with static_schedule=False.

    ``grad_compression='bf16'`` casts gradients to bfloat16 for the
    data-parallel pmean (the reference's ``--fp16-allreduce``,
    hvd.Compression.fp16, pytorch_cifar10_resnet.py:254) and back; it only
    applies under ``axis`` (single-program runs have no gradient
    collective).

    ``delta_gather_compression='bf16'`` casts the post-momentum delta
    buckets to bfloat16 for the final all-gather (the reference's pred
    broadcast, inv.py:164-175) and back — halves the gather's exposed
    wire time (the v5e toolchain schedules it sync; tools/overlap_check
    evidence, BENCH_NOTES round 5). The bf16 rounding perturbs only the
    OTHER devices' view of a delta (~1e-3 relative, same class as the
    grad-allreduce compression); the local block's contribution to the
    carried momentum state stays exact.
    """
    train_kwargs = dict(train_kwargs or {})
    if grad_compression not in (None, "bf16"):
        raise ValueError(f"unknown grad_compression {grad_compression}")
    if delta_gather_compression not in (None, "bf16"):
        raise ValueError(
            f"unknown delta_gather_compression {delta_gather_compression}"
        )
    if loss_fn is None:
        loss_fn = lambda logits, labels: softmax_cross_entropy(
            logits, labels, label_smoothing
        )
    if perturb_template is None:
        raise ValueError("perturb_template is required")
    perturb_shapes = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), perturb_template
    )
    mask_cache = {}

    def _loss_with_capture(params, perturbs, model_state, batch):
        x, y = batch
        xs = x if isinstance(x, tuple) else (x,)
        variables = {"params": params, **model_state, COL_G: perturbs}
        mutable = [COL_A] + list(model_state.keys())
        logits, muts = model.apply(
            variables, *xs, mutable=mutable, **train_kwargs
        )
        acts = muts.get(COL_A)
        new_model_state = {k: v for k, v in muts.items() if k != COL_A}
        return loss_fn(logits, y), (logits, acts, new_model_state)

    def _grad_one(params, model_state, chunk):
        perturbs = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), perturb_shapes
        )
        (loss, (logits, acts, new_ms)), (grads, gs) = jax.value_and_grad(
            _loss_with_capture, argnums=(0, 1), has_aux=True
        )(params, perturbs, model_state, chunk)
        return loss, logits, grads, acts, gs, new_ms

    def train_step(state: BucketedTrainState, batch, scalars: KFACScalars):
        mask = mask_cache.setdefault(
            "mask", kfac_leaf_mask(kfac, state.params)
        )
        if n_accum <= 1:
            loss, logits, grads, acts, gs, model_state = _grad_one(
                state.params, state.model_state, batch
            )
            accuracy = jnp.mean(
                (jnp.argmax(logits, axis=-1) == batch[1]).astype(jnp.float32)
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

            shapes = jax.eval_shape(
                lambda: _grad_one(
                    state.params, state.model_state, (xs[0], ys[0])
                )
            )
            zeros_of = lambda t: jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), t
            )
            carry0 = (
                jax.tree_util.tree_map(jnp.zeros_like, state.params),
                zeros_of(shapes[3]), zeros_of(shapes[4]),
                state.model_state,
            )
            (grads, acts, gs, model_state), ms = jax.lax.scan(
                body, carry0, (xs, ys)
            )
            loss, accuracy = jnp.mean(ms["loss"]), jnp.mean(ms["acc"])

        if axis is not None:
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

        # one stack per step; everything below is bucket-resident.
        # Sharded mode: K-FAC returns each device's LOCAL preconditioned
        # block (gather_preds=False), momentum runs on the sharded blocks
        # (state.mom_buckets are local under shard_map), and the final
        # DELTAS all-gather once — the reference's pred broadcast
        # (inv.py:164-175) moved after the momentum update, same collective
        # bytes, momentum state sharded L/world_size per device.
        g_buckets = kfac.stack_grads(grads)
        static = kfac.config.static_schedule
        preds, kfac_state = kfac.step_buckets(
            state.kfac_state,
            g_buckets,
            acts,
            gs,
            lr=scalars.lr,
            damping=scalars.damping,
            fac_update_freq=None if static else scalars.fac_update_freq,
            kfac_update_freq=None if static else scalars.kfac_update_freq,
            axis=axis,
            gather_preds=False,
        )

        # SGD with momentum (+ optional weight decay), bucket form.
        # torch.optim.SGD semantics: d = v + wd*p; m = mu*m + d;
        # update = m (or d + mu*m for nesterov); p -= lr*update.
        if weight_decay:
            p_buckets = [
                kfac._stack_bucket(b, state.params) for b in kfac.buckets
            ]
            if axis is not None:
                idx = jax.lax.axis_index(axis)
                p_buckets = [
                    jax.lax.dynamic_slice_in_dim(
                        p, idx * (b.n_rows // kfac.world_size),
                        b.n_rows // kfac.world_size,
                    )
                    for p, b in zip(p_buckets, kfac.buckets)
                ]
            preds = [
                v + weight_decay * p for v, p in zip(preds, p_buckets)
            ]
        mom_buckets = [
            momentum * m + v for m, v in zip(state.mom_buckets, preds)
        ]
        if nesterov:
            deltas = [
                v + momentum * m for v, m in zip(preds, mom_buckets)
            ]
        else:
            deltas = mom_buckets
        if axis is not None:
            if delta_gather_compression == "bf16":
                deltas = [
                    jax.lax.all_gather(
                        d.astype(jnp.bfloat16), axis, axis=0, tiled=True
                    ).astype(d.dtype)
                    for d in deltas
                ]
            else:
                deltas = [
                    jax.lax.all_gather(d, axis, axis=0, tiled=True)
                    for d in deltas
                ]
        params = kfac.apply_deltas(state.params, deltas, scalars.lr)

        # non-K-FAC leaves: plain momentum SGD (mask is static, so K-FAC
        # leaves trace straight through with zero added ops)
        def mom_upd(g, p, m, is_kfac):
            if is_kfac:
                return m
            if weight_decay:
                g = g + weight_decay * p
            return momentum * m + g

        other_mom = jax.tree_util.tree_map(
            mom_upd, grads, state.params, state.other_mom, mask
        )

        def par_upd(p, g, m, is_kfac):
            if is_kfac:
                return p  # already updated via apply_deltas
            if nesterov:
                if weight_decay:
                    g = g + weight_decay * p
                d = g + momentum * m
            else:
                d = m
            return p - scalars.lr * d

        params = jax.tree_util.tree_map(
            par_upd, params, grads, other_mom, mask
        )

        metrics = {
            "loss": loss,
            "accuracy": accuracy,
        }
        if axis is not None:
            metrics = jax.tree_util.tree_map(
                lambda x: jax.lax.pmean(x, axis), metrics
            )
        return (
            BucketedTrainState(
                params=params,
                mom_buckets=mom_buckets,
                other_mom=other_mom,
                kfac_state=kfac_state,
                model_state=model_state,
            ),
            metrics,
        )

    return train_step


def build_bucketed_trainer(
    model,
    kfac: BlockKFAC,
    params,
    model_state,
    sample,
    *,
    mesh=None,
    micro_batch: int,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    label_smoothing: float = 0.0,
    n_accum: int = 1,
    grad_compression=None,
    delta_gather_compression=None,
    train_kwargs=None,
    state: "BucketedTrainState" = None,
):
    """One-call harness wiring for the bucket-resident flagship pipeline.

    Builds the BucketedTrainState and the jitted train step — the shared
    glue of `examples/train_cifar.py --trainer bucketed` and
    `examples/train_imagenet.py --trainer bucketed` (single-program when
    ``mesh`` is None, shard_map over the mesh otherwise).

    ``micro_batch``: rows the capture templates are sized for — the
    device-local batch divided by ``n_accum`` (see make_bucketed_train_step:
    the perturb template is per MICRO-batch).

    Returns ``(train_step, state)`` with
    ``train_step(state, batch, scalars) -> (state, metrics)``.
    """
    import kfac_pytorch_tpu as ktpu

    train_kwargs = dict(train_kwargs or {"train": True})
    if state is None:
        state = init_bucketed_state(kfac, params, model_state=model_state)
    else:
        # caller-provided state (e.g. restored from a checkpoint against
        # an init_bucketed_state template) — wire, don't re-init
        params = state.params
        model_state = state.model_state
    pert = ktpu.make_zero_perturbations(
        model, {"params": params, **model_state}, sample[:micro_batch],
        **train_kwargs,
    )
    common = dict(
        momentum=momentum, weight_decay=weight_decay,
        label_smoothing=label_smoothing, train_kwargs=train_kwargs,
        n_accum=n_accum,
    )
    if mesh is not None:
        step = make_sharded_bucketed_train_step(
            model, kfac, mesh, state, pert,
            grad_compression=grad_compression,
            delta_gather_compression=delta_gather_compression, **common,
        )
        state = shard_bucketed_state(mesh, kfac, state)
    else:
        step = jax.jit(make_bucketed_train_step(
            model, kfac, perturb_template=pert, **common,
        ))
    return step, state
