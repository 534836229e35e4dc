"""TPU-native distributed K-FAC preconditioning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
lzhangbv/kfac_pytorch (distributed K-FAC second-order gradient
preconditioning: MPD-KFAC [CVPR'19], eigen MPD-KFAC [SC'20], and DP-KFAC
[IEEE TCC'22]), built for SPMD TPU meshes.

Public API parity (reference /root/reference/kfac/__init__.py:8-16):

    kfac_mappers / get_kfac_module(name)  name in
        {'inverse', 'eigen', 'inverse_dp', 'eigen_dp'}
    DP_KFAC(specs, inv_type='eigen'|'inverse', ...)
    KFAC, KFACConfig, KFACParamScheduler, KFACHypers
"""

from functools import partial

from kfac_pytorch_tpu.capture import (
    COL_A,
    COL_G,
    KFACConv,
    KFACDense,
    LayerSpec,
    collect_layer_specs,
    make_zero_perturbations,
    setup_kfac,
)
from kfac_pytorch_tpu.preconditioner import (
    KFAC,
    KFACConfig,
    KFACHypers,
    KFACParamScheduler,
)
from kfac_pytorch_tpu.intercept import (
    setup_kfac_intercepted,
    tagged_apply,
)


def _builder(inv_type: str, strategy: str):
    def build(specs, **overrides) -> KFAC:
        cfg = KFACConfig(inv_type=inv_type, strategy=strategy, **overrides)
        return KFAC(specs, cfg)

    build.__name__ = f"KFAC_{inv_type}_{strategy}"
    return build


# name -> constructor, mirroring reference kfac/__init__.py:8-13
kfac_mappers = {
    "inverse": _builder("inverse", "mpd"),
    "eigen": _builder("eigen", "mpd"),
    "inverse_dp": _builder("inverse", "dp"),
    "eigen_dp": _builder("eigen", "dp"),
    # TPU-native additions: the eigen-variant update computed as an exact
    # damped Kronecker solve by batched PCG (no eigendecomposition at all;
    # Cholesky + MXU matmuls only)
    "pcg": _builder("pcg", "mpd"),
    "pcg_dp": _builder("pcg", "dp"),
}


def get_kfac_module(kfac: str = "eigen_dp"):
    """Look up a K-FAC variant constructor by name
    (reference get_kfac_module, kfac/__init__.py:15-16)."""
    return kfac_mappers[kfac]


def DP_KFAC(specs, inv_type: str = "eigen", **overrides) -> KFAC:
    """Convenience factory for the distributed-preconditioning variants
    (reference kfac/dp_kfac.py:4-39)."""
    if inv_type not in ("eigen", "inverse"):
        raise ValueError(f"unknown inv_type: {inv_type}")
    return kfac_mappers[f"{inv_type}_dp"](specs, **overrides)


__all__ = [
    "KFAC",
    "KFACConfig",
    "KFACHypers",
    "KFACParamScheduler",
    "KFACDense",
    "KFACConv",
    "LayerSpec",
    "COL_A",
    "COL_G",
    "collect_layer_specs",
    "make_zero_perturbations",
    "setup_kfac",
    "kfac_mappers",
    "get_kfac_module",
    "DP_KFAC",
    "setup_kfac_intercepted",
    "tagged_apply",
]
