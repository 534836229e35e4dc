"""Preconditioned-gradient formulas and KL-clip rescaling (pure JAX).

Parity references:
  * eigen path:    /root/reference/kfac/kfac_preconditioner_eigen.py:137-144
  * inverse path:  /root/reference/kfac/kfac_preconditioner_inv.py:156-161
  * kl_clip:       /root/reference/kfac/kfac_preconditioner_inv.py:188-217

Gradients are handled in canonical 2-D form ``(out_dim, in_dim[+1])`` with the
bias gradient appended as the last column (reference _get_grad,
kfac_preconditioner_inv.py:145-154).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def precond_eigen(
    grad2d: jax.Array,
    qa: jax.Array,
    da: jax.Array,
    qg: jax.Array,
    dg: jax.Array,
    damping,
    *,
    precision=None,
) -> jax.Array:
    """QG [ (QG^T grad QA) / (dG dA^T + damping) ] QA^T.

    Shapes: grad2d (..., dg_dim, da_dim); qa (..., da_dim, da_dim);
    da (..., da_dim); qg (..., dg_dim, dg_dim); dg (..., dg_dim).
    """
    mm = lambda a, b: jnp.matmul(a, b, precision=precision)
    v1 = mm(mm(jnp.swapaxes(qg, -2, -1), grad2d), qa)
    denom = dg[..., :, None] * da[..., None, :] + damping
    v2 = v1 / denom
    return mm(mm(qg, v2), jnp.swapaxes(qa, -2, -1))


def precond_inverse(
    grad2d: jax.Array,
    inv_a: jax.Array,
    inv_g: jax.Array,
    *,
    precision=None,
) -> jax.Array:
    """inv_G @ grad @ inv_A."""
    mm = lambda a, b: jnp.matmul(a, b, precision=precision)
    return mm(mm(inv_g, grad2d), inv_a)


def kl_clip_nu(vg_sum: jax.Array, kl_clip: float) -> jax.Array:
    """nu = min(1, sqrt(kl_clip / |vg_sum|)).

    vg_sum = sum over layers of (precond_grad * grad * lr^2)
    (reference kfac_preconditioner_inv.py:196-212).
    """
    return jnp.minimum(
        jnp.asarray(1.0, dtype=vg_sum.dtype),
        jnp.sqrt(kl_clip / jnp.maximum(jnp.abs(vg_sum), 1e-30)),
    )
