"""Functional capture of per-layer K-FAC statistics (a, g) — no hooks.

The reference attaches PyTorch module hooks to save the layer input ``a``
(forward_pre_hook) and the output cotangent ``g`` (full_backward_hook)
(/root/reference/kfac/kfac_preconditioner_base.py:122-149). JAX has no
mutation or hooks; instead this module provides *taggable flax layers* and a
pure capture transform:

  * ``a`` is recorded with ``Module.sow`` into the ``'kfac_a'`` collection —
    a functional output of ``apply`` (mutable collection), traced and
    jit-compatible.
  * ``g`` is obtained by the zero-perturbation trick: each tagged layer adds
    a caller-supplied zero array ``p`` to its pre-activation output
    (``y + p``). The gradient of the loss w.r.t. ``p`` is exactly dL/dy — the
    same tensor PyTorch's full_backward_hook delivers. Differentiating the
    loss w.r.t. ``(params, perturbations)`` therefore yields both the
    parameter gradients and every layer's ``g`` in one backward pass, fully
    compatible with jit / pjit / remat / scan.

Static layer metadata (kind, dims, conv geometry, flax paths) is collected
during a single abstract trace (``jax.eval_shape``) via a thread-local sink —
the functional analogue of the reference's ``_register_module_hooks`` walk.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from flax.core import FrozenDict

from kfac_pytorch_tpu.ops.factors import resolve_conv_padding

# Collection names.
COL_A = "kfac_a"  # sown layer inputs
COL_G = "kfac_perturb"  # zero perturbations added to layer outputs

DENSE = "dense"
CONV = "conv"


@dataclass(frozen=True)
class LayerSpec:
    """Static description of one K-FAC-registered layer (or layer group).

    ``path`` is the flax scope path of the tagging module (also the key into
    the captured a/g trees); ``param_path`` locates the inner kernel/bias in
    the params pytree.

    Grouped convolutions get ONE spec PER GROUP (``n_groups``/``group_idx``):
    the curvature is block-diagonal over groups, each with its own A over
    the group's input-channel patches and G over its output channels. (The
    reference registers grouped Conv2d modules but its factor math assumes
    dense connectivity — mathematically wrong for groups; per-group specs
    are the correct treatment.)
    """

    path: Tuple[str, ...]
    kind: str  # DENSE | CONV
    in_dim: int  # dense: features_in; conv: (cin/groups)*kh*kw
    out_dim: int  # dense: features_out; conv: cout/groups
    has_bias: bool
    param_path: Tuple[str, ...] = ()
    kernel_size: Tuple[int, int] = (0, 0)
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))
    n_groups: int = 1
    group_idx: int = 0

    @property
    def name(self) -> str:
        base = "/".join(self.path)
        if self.n_groups > 1:
            return f"{base}[g{self.group_idx}]"
        return base

    @property
    def grad_in_dim(self) -> int:
        """Width of the canonical 2-D gradient (bias appended as a column)."""
        return self.in_dim + (1 if self.has_bias else 0)


class _SpecSink(threading.local):
    def __init__(self):
        self.active: Optional[list] = None


_SINK = _SpecSink()


def _record_spec(spec: LayerSpec) -> None:
    if _SINK.active is not None:
        _SINK.active.append(spec)


def _overwrite(prev, new):
    return new


def _tap(module: nn.Module, x: jax.Array, y: jax.Array, spec: LayerSpec):
    """Record input `a`; add the output perturbation for `g` capture."""
    _record_spec(spec)
    module.sow(COL_A, "a", x, reduce_fn=_overwrite, init_fn=lambda: None)
    if module.has_variable(COL_G, "p"):
        y = y + module.get_variable(COL_G, "p")
    else:
        # Shape-discovery pass: record a zero of the output shape so callers
        # can build the perturbation pytree via eval_shape.
        module.sow(
            COL_G,
            "p",
            jnp.zeros(y.shape, y.dtype),
            reduce_fn=_overwrite,
            init_fn=lambda: None,
        )
    return y


class KFACDense(nn.Module):
    """Dense layer registered for K-FAC preconditioning.

    Equivalent to the reference registering an ``nn.Linear`` module
    (kfac_preconditioner_base.py:132-147). ``exclude=True`` opts the layer
    out (the reference's ``exclude_vocabulary_size`` mechanism,
    base.py:139-140, is applied at this level by the model builder).
    """

    features: int
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    exclude: bool = False

    @nn.compact
    def __call__(self, x):
        dense = nn.Dense(
            self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            name="layer",
        )
        y = dense(x)
        if self.exclude:
            return y
        spec = LayerSpec(
            path=self.path,
            kind=DENSE,
            in_dim=x.shape[-1],
            out_dim=self.features,
            has_bias=self.use_bias,
            param_path=self.path + ("layer",),
        )
        return _tap(self, x, y, spec)


class KFACConv(nn.Module):
    """2-D convolution registered for K-FAC preconditioning (NHWC).

    ``feature_group_count > 1`` (grouped / depthwise convs — the ResNeXt /
    MobileNet building block) registers one spec PER GROUP: the curvature is
    block-diagonal over groups, each with its own factors.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: Any = None
    param_dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    exclude: bool = False

    @nn.compact
    def __call__(self, x):
        pad = resolve_conv_padding(
            self.padding, (x.shape[1], x.shape[2]), self.kernel_size, self.strides
        )
        conv = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=pad,
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            name="layer",
        )
        y = conv(x)
        if self.exclude:
            return y
        kh, kw = self.kernel_size
        g = self.feature_group_count
        specs = [
            LayerSpec(
                path=self.path,
                kind=CONV,
                in_dim=(x.shape[-1] // g) * kh * kw,
                out_dim=self.features // g,
                has_bias=self.use_bias,
                param_path=self.path + ("layer",),
                kernel_size=(kh, kw),
                strides=tuple(self.strides),
                padding=pad,
                n_groups=g,
                group_idx=j,
            )
            for j in range(g)
        ]
        y = _tap(self, x, y, specs[0])
        for sp in specs[1:]:
            _record_spec(sp)
        return y


def collect_layer_specs(
    apply_fn: Callable, *args, **kwargs
) -> Tuple[LayerSpec, ...]:
    """Collect LayerSpecs from one abstract trace of ``apply_fn``.

    ``apply_fn`` should invoke the model (e.g. ``lambda: model.apply(vars, x,
    mutable=[COL_A, COL_G])``). Runs under ``jax.eval_shape`` — no FLOPs.
    """
    sink: list = []
    prev = _SINK.active
    _SINK.active = sink
    try:
        jax.eval_shape(lambda: apply_fn(*args, **kwargs))
    finally:
        _SINK.active = prev
    # Deduplicate while preserving call order (shared modules tap once;
    # grouped convs contribute one spec per group at the same path).
    seen = set()
    out = []
    for s in sink:
        key = (s.path, s.group_idx)
        if key not in seen:
            seen.add(key)
            out.append(s)
    return tuple(out)


def make_zero_perturbations(model: nn.Module, variables, *args, **kwargs):
    """Build the zero perturbation pytree for a given batch shape.

    Uses an abstract trace with the COL_G collection mutable, so each tagged
    layer sows a zero of its output shape; returns concrete zeros.
    """
    shapes = jax.eval_shape(
        lambda v: model.apply(v, *args, mutable=True, **kwargs)[1][COL_G],
        variables,
    )
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes
    )


def setup_kfac(model, variables, *args, **kwargs):
    """One-call setup: returns (layer_specs, zero_perturbations).

    ``variables`` are the model's non-perturbation collections (params,
    batch_stats, ...); args/kwargs are a sample batch + apply kwargs (e.g.
    ``train=True``). Both passes are abstract (eval_shape) — no FLOPs.
    """
    perturbs = make_zero_perturbations(model, variables, *args, **kwargs)
    specs = collect_layer_specs(
        lambda: model.apply(
            {**variables, COL_G: perturbs}, *args, mutable=True, **kwargs
        )
    )
    return specs, perturbs


def _get_path(tree, path: Tuple[str, ...]):
    node = tree
    for k in path:
        node = node[k]
    return node


def captured_a(mutated_collections, spec: LayerSpec) -> jax.Array:
    """Fetch the sown activation for ``spec`` from apply()'s mutated vars."""
    return _get_path(mutated_collections[COL_A], spec.path)["a"]


def captured_g(perturb_grads, spec: LayerSpec) -> jax.Array:
    """Fetch dL/dy for ``spec`` from the perturbation gradient pytree."""
    return _get_path(perturb_grads, spec.path)["p"]
