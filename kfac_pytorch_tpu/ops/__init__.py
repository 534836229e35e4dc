"""Math ops for K-FAC factors: statistics, linalg, preconditioning."""

from kfac_pytorch_tpu.ops.factors import (
    compute_a_conv,
    compute_a_dense,
    compute_g_conv,
    compute_g_dense,
    ema_update,
    extract_patches,
    resolve_conv_padding,
)
from kfac_pytorch_tpu.ops.linalg import (
    add_diag,
    cholesky_inverse,
    damped_inverse,
    pi_trace_norm,
    symeig,
)
from kfac_pytorch_tpu.ops.precond import (
    kl_clip_nu,
    precond_eigen,
    precond_inverse,
)

__all__ = [
    "compute_a_conv",
    "compute_a_dense",
    "compute_g_conv",
    "compute_g_dense",
    "ema_update",
    "extract_patches",
    "resolve_conv_padding",
    "add_diag",
    "cholesky_inverse",
    "damped_inverse",
    "pi_trace_norm",
    "symeig",
    "kl_clip_nu",
    "precond_eigen",
    "precond_inverse",
]
