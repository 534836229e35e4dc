"""Damped Kronecker solve via preconditioned conjugate gradient (MXU-only).

The eigen K-FAC update is the exact solve (G (x) A + lambda I) v = grad
(reference kfac_preconditioner_eigen.py:137-144 computes it via two
eigendecompositions). On TPU, eigh is the bottleneck (~1s at dim 4608 on a
v5e) while Cholesky and matmuls are nearly free; this module computes the
same solve iteratively:

  * operator application  Op(V) = G V A + lambda V      (two MXU matmuls)
  * split preconditioner  M = (G + sqrt(l)/pi I) (x) (A + sqrt(l) pi I)
    — the explicit-inverse variant's approximation (inv.py:121-128) —
    applied via cached Cholesky factors (four triangular solves)
  * a fixed number of batched PCG iterations (each layer runs its own CG;
    everything is batched over the bucket's stacked-layer axis)

With 8-16 iterations this matches the eigen update to ~1e-4..1e-6 relative
accuracy at a tiny fraction of the eigh cost, and the only factorization
work at TInv steps is two batched Choleskys.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from kfac_pytorch_tpu.ops import linalg as lops


def _masked_diag_mean(m: jax.Array, real_d) -> jax.Array:
    """Mean of the first ``real_d`` diagonal entries of each (d, d) block —
    the identity-padding-exact form of trace(real block)/real_d."""
    # f32 sum regardless of storage dtype (bf16-stored factors would
    # otherwise accumulate the trace in a bf16 reduce)
    diag = jnp.diagonal(m, axis1=-2, axis2=-1).astype(jnp.float32)
    idx = jnp.arange(m.shape[-1])
    mask = idx < jnp.asarray(real_d)[..., None]
    return jnp.sum(jnp.where(mask, diag, 0.0), axis=-1) / real_d


def _pi_shifts(a, g, damping, real_da=None, real_dg=None):
    """Per-layer pi-split damping shifts (s_a, s_g) from masked real-block
    traces (reference inv.py:121-128; identity-padding-exact)."""
    da, dg = a.shape[-1], g.shape[-1]
    if real_da is None:
        tr_a = jnp.sum(
            jnp.diagonal(a, axis1=-2, axis2=-1).astype(jnp.float32), axis=-1
        ) / da
        tr_g = jnp.sum(
            jnp.diagonal(g, axis1=-2, axis2=-1).astype(jnp.float32), axis=-1
        ) / dg
    else:
        tr_a = _masked_diag_mean(a, real_da)
        tr_g = _masked_diag_mean(g, real_dg)
    tr_a = jnp.maximum(tr_a, 1e-10)
    tr_g = jnp.maximum(tr_g, 1e-10)
    pi = jnp.sqrt(tr_a / tr_g)
    sd = jnp.sqrt(damping)
    return sd * pi, sd / pi


def ns_inverse_refresh(
    m: jax.Array, x0: jax.Array, iters: int = 3, precision=None,
) -> Tuple[jax.Array, jax.Array]:
    """Newton-Schulz inverse refresh: X <- X (2I - M X), warm-started.

    Converges quadratically to M^-1 when ||I - M X0|| < 1 — which holds
    between K-FAC preconditioner refreshes because the factors drift only
    by the EMA rate (a few % per step) and X0 is the previous inverse.
    All matmuls: ~2*iters GEMMs per factor vs a batched Cholesky +
    triangular-solve inverse that runs ~17x above its flop floor on TPU
    (11.5 ms at 4608 vs a ~0.7 ms GEMM-rate floor, BENCH_NOTES round 1) —
    the refresh is the single largest amortized term of the pcg headline
    (~8 ms/step at prec_freq=10, inferred from the prec_freq 10 vs 50
    arms). Returns (X, r_norm) with r_norm = per-matrix infinity norm of
    the LAST loop residual I - M X (squares once more by the final
    update), for the caller's convergence safeguard.
    """
    mm = lambda x, y: jnp.matmul(x, y, precision=precision,
                                 preferred_element_type=jnp.float32)
    n = m.shape[-1]
    eye = jnp.eye(n, dtype=jnp.float32)
    x = x0.astype(jnp.float32)
    mf = m.astype(jnp.float32)
    r_norm = None
    for _ in range(iters):
        # 2 matmuls/iteration: R = I - M X, X <- X (I + R)
        r = eye - mm(mf, x)
        # infinity norm (max row sum) BOUNDS the spectral norm (an
        # elementwise max does not — it under-reads by up to n and let a
        # divergent refresh through the safeguard in testing). The update
        # squares the residual exactly (R_new = R^2), so the LAST loop
        # residual certifies the final one at no extra matmul: quadratic
        # convergence makes it either tiny or astronomically large.
        r_norm = jnp.max(jnp.sum(jnp.abs(r), axis=-1), axis=-1)
        x = x + mm(x, r)
    # exact symmetrization: M^-1 is symmetric; NS rounding breaks it at
    # ~1e-7, and the fused CG algebra assumes symmetric inverses
    x = 0.5 * (x + jnp.swapaxes(x, -2, -1))
    return x, r_norm


def damped_ns_factors(
    a: jax.Array, g: jax.Array, damping, prev_inv_a, prev_inv_g,
    real_da=None, real_dg=None, dtype=None, iters: int = 3,
    precision=None, safe_threshold: float = 0.7,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Newton-Schulz warm-started replacement for damped_cholesky_factors.

    Same contract (dense inverses of the pi-split damped factors + shifts),
    but refreshed from the PREVIOUS inverses with matmuls only. A
    bucket-level lax.cond falls back to the exact Cholesky path whenever
    any matrix's last-iterate residual norm ||I - M X||_inf exceeds
    ``safe_threshold`` (warm start outside NS's convergence ball — e.g.
    after a resume with cold state, or a drift spike); the steady-state
    path never pays the Cholesky cost.
    """
    s_a, s_g = _pi_shifts(a, g, damping, real_da, real_dg)
    da, dg = a.shape[-1], g.shape[-1]
    m_a = a + s_a[..., None, None] * jnp.eye(da, dtype=a.dtype)
    m_g = g + s_g[..., None, None] * jnp.eye(dg, dtype=g.dtype)

    inv_a, r_a = ns_inverse_refresh(m_a, prev_inv_a, iters, precision)
    inv_g, r_g = ns_inverse_refresh(m_g, prev_inv_g, iters, precision)
    # accept iff the last-iterate residual certifies convergence (the
    # final residual is its square); 0.7^2 < 0.5
    ok = (jnp.max(r_a) < safe_threshold) & (jnp.max(r_g) < safe_threshold)

    def exact():
        return (
            lops.cholesky_inverse(m_a).astype(jnp.float32),
            lops.cholesky_inverse(m_g).astype(jnp.float32),
        )

    inv_a, inv_g = jax.lax.cond(ok, lambda: (inv_a, inv_g), exact)
    if dtype is not None:
        inv_a = inv_a.astype(dtype)
        inv_g = inv_g.astype(dtype)
    return inv_a, inv_g, s_a, s_g


def damped_cholesky_factors(
    a: jax.Array, g: jax.Array, damping, real_da=None, real_dg=None,
    dtype=None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Explicit inverses of the pi-split damped factors (batched).

    a: (..., da, da), g: (..., dg, dg). real_da/real_dg correct the traces
    for identity padding (see parallel/strategies.py).

    Returns (invA, invG, sA, sG): DENSE INVERSES of (A + sA I) / (G + sG I)
    — not triangular factors: applying the preconditioner costs two MXU
    matmuls per PCG iteration instead of four triangular solves, which are
    sequential and slow on TPU — plus the per-layer damping shifts
    sA = sqrt(damping)*pi, sG = sqrt(damping)/pi. The shifts let the solve
    fuse operator and preconditioner applications algebraically
    (pcg_kron_solve's 3-matmul iteration). (Name kept for API continuity.)
    """
    da, dg = a.shape[-1], g.shape[-1]
    if real_da is None:
        tr_a = jnp.sum(
            jnp.diagonal(a, axis1=-2, axis2=-1).astype(jnp.float32), axis=-1
        ) / da
        tr_g = jnp.sum(
            jnp.diagonal(g, axis1=-2, axis2=-1).astype(jnp.float32), axis=-1
        ) / dg
    else:
        # real-block trace via a masked diagonal sum — NOT trace(padded) -
        # pad_count: the f32 factor EMA drifts pad-diagonal entries off
        # exactly 1.0 (0.95 + 0.05 != 1 in f32), and with merged buckets
        # (pad counts in the thousands) that correction noise swamps a
        # near-converged factor's tiny real trace and drives it NEGATIVE
        # -> sqrt -> NaN at the preconditioner refresh (the merge-NaN
        # root cause, BENCH_NOTES round 2)
        tr_a = _masked_diag_mean(a, real_da)
        tr_g = _masked_diag_mean(g, real_dg)
    # eps floor: a genuinely zero-curvature factor (e.g. loss memorized to
    # ~0 on a fixed benchmark batch) must damp heavily, not divide by zero
    tr_a = jnp.maximum(tr_a, 1e-10)
    tr_g = jnp.maximum(tr_g, 1e-10)
    pi = jnp.sqrt(tr_a / tr_g)
    sd = jnp.sqrt(damping)
    s_a = sd * pi
    s_g = sd / pi
    shift_a = s_a[..., None, None] * jnp.eye(da, dtype=a.dtype)
    shift_g = s_g[..., None, None] * jnp.eye(dg, dtype=g.dtype)
    inv_a = lops.cholesky_inverse(a + shift_a)
    inv_g = lops.cholesky_inverse(g + shift_g)
    if dtype is not None:
        # bf16 storage halves the state carried through the refresh cond and
        # the preconditioner matmul traffic; preconditioner precision only
        # affects CG convergence rate, not the solution
        inv_a = inv_a.astype(dtype)
        inv_g = inv_g.astype(dtype)
    return inv_a, inv_g, s_a, s_g


def pcg_kron_solve(
    grad2d: jax.Array,
    a: jax.Array,
    g: jax.Array,
    la: jax.Array,
    lg: jax.Array,
    damping,
    *,
    iters: int = 12,
    precision=None,
    s_a: jax.Array = None,
    s_g: jax.Array = None,
    fused: str = "auto",
    x0: jax.Array = None,
    gxa0: jax.Array = None,
    return_gxa: bool = False,
) -> jax.Array:
    """Solve (G (x) A + damping I) v = grad2d by batched PCG.

    grad2d: (..., dg, da); a: (..., da, da); g: (..., dg, dg);
    la/lg: the cached damped factor INVERSES from damped_cholesky_factors,
    s_a/s_g: the per-layer damping shifts they were built with.

    Two iteration forms with DIFFERENT STALENESS SEMANTICS:

    * fused (3 MXU matmuls/iter): with Lg = (G' + s_g I)^-1 for the
      factors G'/A' the inverses were built from, the operator collapses
      algebraically — G' Lg = I - s_g Lg, La A' = I - s_a La — so

        op(prec(r)) = (I - s_g Lg) r (I - s_a La) + damping * prec(r)

      needs only u = Lg r, w = r La, z = u La (z IS prec(r)); op(p)
      follows from the CG recurrence p = z + beta p => op(p) = op(z) +
      beta op(p_prev) with no extra matmuls. NOTE the collapsed operator
      is G'/A' — the factors AT THE LAST PRECONDITIONER REFRESH. Between
      refreshes this solves the stale-factor system EXACTLY: the update
      equals the reference's eigen variant with
      --kfac-update-freq = pcg_precond_freq (eigen.py:137-144 reads its
      own refresh-stale eigendecompositions the same way). The current
      a/g arguments are unused in this form.

    * operator (4 matmuls/iter): applies the CURRENT a/g as the operator;
      la/lg act only as the preconditioner, so staleness (or bf16
      storage) only slows CG convergence and never changes the solution —
      the exact TInv=1 update given enough iterations.

    fused='auto' picks the 3-matmul form when the shifts are available
    and the inverses are stored f32 (a bf16 collapsed operator would
    perturb the solution, not just the rate); 'never' forces the
    operator form.

    x0: optional warm-start iterate (same shape as grad2d). Gradients are
    strongly correlated step to step (momentum SGD trajectories), so the
    previous step's solution is a far better initial guess than zero —
    the residual after warm start is |grad_t - Op x_{t-1}| ~ |grad_t -
    grad_{t-1}|, and CG needs only to correct the delta. The fixed point
    is unchanged: as iters -> inf the solution is the same.

    Two warm-start modes:

    * x0 alone: forces the operator (4-matmul) form — the initial
      residual b - Op(x0) is computed with the CURRENT factors (2 extra
      matmuls), consistent with that form's TInv=1 semantics. The fused
      form's collapsed algebra cannot apply the operator to an arbitrary
      vector, so it cannot form this residual.

    * x0 + gxa0 (fused warm start): gxa0 must be G' x0 A' — the
      dampingless stale-operator image of x0, as returned by a previous
      call with return_gxa=True (the CG recurrence accumulates it for
      free: G' x A' = sum_i alpha_i (op_p_i - damping p_i)). The initial
      residual b - (gxa0 + damping x0) then costs ZERO matmuls and is
      exactly consistent with the fused form's stale-system semantics.
      Callers must recompute gxa0 = G x_prev A exactly whenever the
      preconditioner refreshes (the stale operator changes there), which
      also bounds accumulation round-off to one refresh period.

    return_gxa: also return the accumulated G' x A' of the returned
    solution (fused form only), for carrying into the next call.
    """
    mm = lambda x, y: jnp.matmul(x, y, precision=precision)

    def dot(x, y):
        return jnp.sum(
            x * y, axis=(-2, -1), keepdims=True
        )  # (..., 1, 1) per layer

    def prec(r):
        return mm(mm(lg, r), la)

    if iters == 0:
        # degenerate mode: single preconditioner application (the split
        # damped inverse — equivalent to the 'inverse' variant update);
        # used for diagnostics and as the cheapest approximation
        if return_gxa:
            raise ValueError("return_gxa requires iters >= 1")
        return prec(grad2d)

    if fused not in ("auto", "never", "force"):
        raise ValueError(
            f"pcg_fused must be 'auto', 'never' or 'force', got {fused}"
        )
    # 'force': take the fused form even with bf16-stored inverses. The
    # collapsed operator is then the stale operator perturbed at bf16
    # precision (~1e-3 relative) — a *different nearby system* solved
    # exactly, not a slower solve of the same system. K-FAC's own damping
    # and EMA staleness dwarf that perturbation; the payoff is HALF the
    # CG stage's dominant HBM traffic (the per-iteration re-read of every
    # layer's (da^2 + dg^2) preconditioner matrices). Measured/validated
    # by the pcg_bf16_dp convergence arm before becoming any default.
    fused = (
        (fused == "force"
         or (fused == "auto"
             and la.dtype == jnp.float32
             and lg.dtype == jnp.float32))
        and (x0 is None or gxa0 is not None)
        and s_a is not None
        and s_g is not None
    )
    if return_gxa and not fused:
        raise ValueError(
            "return_gxa requires the fused iteration form (f32 inverses "
            "with shifts; gxa0 alongside x0 when warm-starting)"
        )

    if fused:
        sa = s_a[..., None, None]
        sg = s_g[..., None, None]
        dg = grad2d.shape[-2]

        def prec_and_op(r):
            """z = prec(r) and op(z), sharing GEMMs (3 matmuls total).

            w = r La and z = u La share the SAME right operand — the
            A-side inverses, the dominant CG-stage bytes (sum da^2 per
            layer, ~10x the G side on conv nets where da = c*kh*kw).
            Stacking [r; u] on the row axis computes both in ONE matmul
            that reads La once instead of twice: per-iteration
            preconditioner traffic drops from Lg + 2 La to Lg + La
            (bitwise-identical rows — batched matmul is row-independent).
            """
            u = mm(lg, r)  # Lg r
            wz = mm(jnp.concatenate([r, u], axis=-2), la)
            w = wz[..., :dg, :]   # r La
            z = wz[..., dg:, :]   # Lg r La = prec(r)
            opz = r - sg * u - sa * w + (sg * sa + damping) * z
            return z, opz

    else:

        def prec_and_op(r):
            z = prec(r)
            opz = mm(mm(g, z), a) + damping * z
            return z, opz

    gxa = None
    if x0 is None:
        x = jnp.zeros_like(grad2d)
        r = grad2d
        if return_gxa:
            gxa = jnp.zeros_like(grad2d)
    elif fused:
        # zero-matmul warm residual against the stale system
        x = x0
        if return_gxa:
            gxa = gxa0
        r = grad2d - (gxa0 + damping * x0)
    else:
        x = x0
        r = grad2d - (mm(mm(g, x0), a) + damping * x0)
    z, op_p = prec_and_op(r)
    p = z
    rz = dot(r, z)

    # statically unrolled: TPU while-loop iterations carry scheduling
    # barriers; unrolling lets XLA fuse and pipeline across iterations
    for _ in range(iters):
        denom = dot(p, op_p)
        # SIGN-AWARE guards: for the SPD system both denom = <p, op p> and
        # rz = <r, prec r> are positive in exact arithmetic; a zero or
        # NEGATIVE value is pure floating-point noise on a (near-)converged
        # or degenerate layer. Freeze that layer's iteration (alpha = beta
        # = 0 keeps x, and p resets toward z) instead of stepping along a
        # noise direction — a negative alpha passed through the old
        # magnitude-only guard amplifies exponentially across the unrolled
        # iterations.
        ok_d = denom > 1e-30
        alpha = jnp.where(ok_d, rz / jnp.where(ok_d, denom, 1.0), 0.0)
        x = x + alpha * p
        if gxa is not None:
            # G' p A' = op(p) - damping p: the recurrence gives the
            # operator image of the solution for free (vector FMAs only)
            gxa = gxa + alpha * (op_p - damping * p)
        r = r - alpha * op_p
        z, op_z = prec_and_op(r)
        rz_new = dot(r, z)
        ok_r = rz > 1e-30
        beta = jnp.where(ok_r, rz_new / jnp.where(ok_r, rz, 1.0), 0.0)
        p = z + beta * p
        op_p = op_z + beta * op_p  # CG recurrence: no operator matmuls
        rz = rz_new
    if return_gxa:
        return x, gxa
    return x
