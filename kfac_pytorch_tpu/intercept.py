"""K-FAC tagging for arbitrary flax models via method interception.

The reference preconditions any PyTorch model by walking its modules and
hooking every nn.Linear / nn.Conv2d (kfac_preconditioner_base.py:132-147) —
no model changes needed. This module provides the same ergonomics for flax:
``tagged_apply`` wraps ``model.apply`` in ``nn.intercept_methods`` so every
``nn.Dense`` / ``nn.Conv`` call is tagged exactly like a KFACDense/KFACConv
(input sown to 'kfac_a', zero perturbation added to the output for cotangent
capture), letting K-FAC precondition third-party models — e.g. HuggingFace
FlaxBert for the SQuAD workload (reference pytorch_squad_bert.py) — without
modification.

``exclude_vocabulary_size`` reproduces the reference's pre-softmax
vocabulary-projection exclusion (base.py:139-140).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from kfac_pytorch_tpu import capture
from kfac_pytorch_tpu.capture import (
    COL_A,
    COL_G,
    CONV,
    DENSE,
    LayerSpec,
    _record_spec,
    _overwrite,
)
from kfac_pytorch_tpu.ops.factors import resolve_conv_padding


def _tap_intercepted(mod: nn.Module, x: jax.Array, y: jax.Array,
                     spec: LayerSpec) -> jax.Array:
    _record_spec(spec)
    mod.sow(COL_A, "a", x, reduce_fn=_overwrite, init_fn=lambda: None)
    if mod.has_variable(COL_G, "p"):
        y = y + mod.get_variable(COL_G, "p")
    else:
        mod.sow(
            COL_G, "p", jnp.zeros(y.shape, y.dtype),
            reduce_fn=_overwrite, init_fn=lambda: None,
        )
    return y


def make_kfac_interceptor(
    exclude_vocabulary_size: Optional[int] = None,
    exclude_paths: Sequence[Tuple[str, ...]] = (),
) -> Callable:
    """Build an nn.intercept_methods interceptor that K-FAC-tags every
    nn.Dense and nn.Conv (2-D) call."""
    excluded = {tuple(p) for p in exclude_paths}

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name != "__call__" or mod.path in excluded:
            return next_fun(*args, **kwargs)

        if type(mod) is nn.Dense:
            if (
                exclude_vocabulary_size is not None
                and mod.features == exclude_vocabulary_size
            ):
                return next_fun(*args, **kwargs)
            x = args[0]
            y = next_fun(*args, **kwargs)
            spec = LayerSpec(
                path=mod.path,
                kind=DENSE,
                in_dim=x.shape[-1],
                out_dim=mod.features,
                has_bias=mod.use_bias,
                param_path=mod.path,
            )
            return _tap_intercepted(mod, x, y, spec)

        if type(mod) is nn.Conv:
            x = args[0]
            if x.ndim != 4:  # only 2-D convs (reference supports Conv2d)
                return next_fun(*args, **kwargs)
            y = next_fun(*args, **kwargs)
            ks = tuple(mod.kernel_size)
            if len(ks) != 2:
                return y
            strides = mod.strides or (1, 1)
            if isinstance(strides, int):
                strides = (strides, strides)
            try:
                pad = resolve_conv_padding(
                    mod.padding, (x.shape[1], x.shape[2]), ks, tuple(strides)
                )
            except (ValueError, TypeError):
                return y  # exotic padding spec: leave untagged
            dil = mod.kernel_dilation
            if dil is None:
                dil = (1,)
            elif isinstance(dil, int):
                dil = (dil,)
            if any(d != 1 for d in dil):
                return y  # dilated convs unsupported (as in reference)
            g = mod.feature_group_count
            specs = [
                LayerSpec(
                    path=mod.path,
                    kind=CONV,
                    in_dim=(x.shape[-1] // g) * ks[0] * ks[1],
                    out_dim=mod.features // g,
                    has_bias=mod.use_bias,
                    param_path=mod.path,
                    kernel_size=ks,
                    strides=tuple(strides),
                    padding=pad,
                    n_groups=g,
                    group_idx=j,
                )
                for j in range(g)
            ]
            y = _tap_intercepted(mod, x, y, specs[0])
            for sp in specs[1:]:
                _record_spec(sp)
            return y

        return next_fun(*args, **kwargs)

    return interceptor


def tagged_apply(
    model: nn.Module,
    variables,
    *args,
    exclude_vocabulary_size: Optional[int] = None,
    exclude_paths: Sequence[Tuple[str, ...]] = (),
    **kwargs,
):
    """model.apply with K-FAC tagging of all stock Dense/Conv layers."""
    with nn.intercept_methods(
        make_kfac_interceptor(exclude_vocabulary_size, exclude_paths)
    ):
        return model.apply(variables, *args, **kwargs)


def setup_kfac_intercepted(
    model: nn.Module,
    variables,
    *args,
    exclude_vocabulary_size: Optional[int] = None,
    exclude_paths: Sequence[Tuple[str, ...]] = (),
    **kwargs,
):
    """(specs, zero perturbations) for an un-modified flax model — the
    interceptor-based counterpart of capture.setup_kfac."""
    def run(v):
        return tagged_apply(
            model, v, *args, mutable=True,
            exclude_vocabulary_size=exclude_vocabulary_size,
            exclude_paths=exclude_paths, **kwargs,
        )

    shapes = jax.eval_shape(lambda v: run(v)[1].get(COL_G, {}), variables)
    perturbs = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes
    )
    specs = capture.collect_layer_specs(lambda: run(variables))
    return specs, perturbs
