"""K-FAC preconditioner core: pure-functional state + step pipeline.

This is the TPU-native re-design of the reference preconditioner family
(/root/reference/kfac/kfac_preconditioner_{base,inv,eigen,inv_dp,eigen_dp}.py).
Design deltas:

  * PyTorch ``optim.Optimizer`` subclass with per-module dict state →
    a plain pytree ``KFACState`` threaded through a pure ``step`` function
    (jit/pjit-compatible; checkpointable with orbax, which the reference's
    factor state was not).
  * The 5-stage step() pipeline (base.py:185-230) becomes a traced program:
    update-frequency gating uses ``lax.cond`` on a dynamic step counter, so
    changing ``fac_update_freq``/``kfac_update_freq`` never recompiles.
  * Rank round-robin + NCCL broadcast scheduling lives in
    ``kfac_pytorch_tpu.parallel`` (GSPMD layer sharding); this module is the
    mathematical single-program core which the distributed strategies reuse.

Variant map (reference kfac/__init__.py:8-16):
  'inverse'    → inv_type='inverse', strategy='mpd'
  'eigen'      → inv_type='eigen',   strategy='mpd'
  'inverse_dp' → inv_type='inverse', strategy='dp'
  'eigen_dp'   → inv_type='eigen',   strategy='dp'   (default everywhere)

On a single device 'mpd' and 'dp' are numerically identical; they differ in
the distributed factor/communication schedule.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from kfac_pytorch_tpu import capture
from kfac_pytorch_tpu.capture import CONV, DENSE, LayerSpec
from kfac_pytorch_tpu.ops import factors as fops
from kfac_pytorch_tpu.ops import linalg as lops
from kfac_pytorch_tpu.ops import pcg as pcg_ops
from kfac_pytorch_tpu.ops import precond as pops

EIGEN = "eigen"
INVERSE = "inverse"
PCG = "pcg"  # eigen-equivalent damped Kronecker solve via batched PCG


# --------------------------------------------------------------------------
# Gradient <-> canonical 2-D mapping
# --------------------------------------------------------------------------


def grad_to_2d(spec: LayerSpec, layer_grads: Dict[str, jax.Array]) -> jax.Array:
    """Map a layer's param grads to canonical (out_dim, in_dim[+1]) form.

    Reference equivalent: _get_grad (kfac_preconditioner_inv.py:145-154),
    with the flax kernel layouts — dense (din, dout), conv (kh, kw, cin,
    cout) — transposed/reshaped so the trailing feature ordering matches the
    A-factor's patch ordering. Grouped convs take the spec's output-channel
    slice of the (kh, kw, cin/groups, cout) kernel.
    """
    kernel = layer_grads["kernel"]
    bias = layer_grads.get("bias")
    if kernel.ndim == 2:  # dense: (din, dout) -> (dout, din)
        g2d = kernel.T
    else:  # conv: (kh, kw, cin/groups, cout) -> (out_slice, kh*kw*cin_g)
        if spec.n_groups > 1:
            sl = slice(
                spec.group_idx * spec.out_dim,
                (spec.group_idx + 1) * spec.out_dim,
            )
            kernel = kernel[..., sl]
            if bias is not None:
                bias = bias[sl]
        g2d = kernel.reshape(-1, kernel.shape[-1]).T
    if spec.has_bias:
        g2d = jnp.concatenate([g2d, bias[:, None]], axis=1)
    return g2d


def grad_from_2d(
    spec: LayerSpec, g2d: jax.Array, kernel_shape: Tuple[int, ...]
) -> Dict[str, jax.Array]:
    """Inverse of grad_to_2d (reference _reshape_preconditioned_grad,
    kfac_preconditioner_inv.py:178-186). Non-grouped layers only."""
    out: Dict[str, jax.Array] = {}
    if spec.has_bias:
        out["bias"] = g2d[:, -1]
        g2d = g2d[:, :-1]
    if len(kernel_shape) == 2:
        out["kernel"] = g2d.T
    else:
        out["kernel"] = g2d.T.reshape(kernel_shape)
    return out


def write_grad_2d(node: Dict[str, jax.Array], spec: LayerSpec,
                  g2d: jax.Array) -> None:
    """Write a preconditioned 2-D gradient back into a mutable params-tree
    node. For grouped convs each group overwrites only its output-channel
    slice of the shared kernel/bias."""
    if spec.n_groups == 1:
        node.update(grad_from_2d(spec, g2d, node["kernel"].shape))
        return
    sl = slice(spec.group_idx * spec.out_dim,
               (spec.group_idx + 1) * spec.out_dim)
    if spec.has_bias:
        node["bias"] = node["bias"].at[sl].set(g2d[:, -1])
        g2d = g2d[:, :-1]
    kh, kw, cin_g, _ = node["kernel"].shape
    block = g2d.T.reshape(kh, kw, cin_g, spec.out_dim)
    node["kernel"] = node["kernel"].at[..., sl].set(block)


def compute_factor_a(spec: LayerSpec, a: jax.Array, precision=None,
                     dtype=jnp.float32, impl: str = "xla",
                     spatial_stride: int = 1) -> jax.Array:
    """Kronecker A factor for one layer (dense or conv) from its input.

    Grouped convs use only the group's input-channel slice (block-diagonal
    curvature over groups)."""
    if spec.kind == DENSE:
        return fops.compute_a_dense(a, spec.has_bias, precision=precision,
                                    dtype=dtype)
    if spec.n_groups > 1:
        cg = a.shape[-1] // spec.n_groups
        a = a[..., spec.group_idx * cg : (spec.group_idx + 1) * cg]
    return fops.compute_a_conv(
        a, spec.kernel_size, spec.strides, spec.padding, spec.has_bias,
        precision=precision, dtype=dtype, impl=impl,
        spatial_stride=spatial_stride,
    )


def compute_factor_g(spec: LayerSpec, g: jax.Array, precision=None,
                     dtype=jnp.float32, spatial_stride: int = 1) -> jax.Array:
    """Kronecker G factor for one layer from its output cotangent."""
    if spec.kind == DENSE:
        return fops.compute_g_dense(g, batch_averaged=True,
                                    precision=precision, dtype=dtype)
    if spec.n_groups > 1:
        og = spec.out_dim
        g = g[..., spec.group_idx * og : (spec.group_idx + 1) * og]
    return fops.compute_g_conv(g, batch_averaged=True, precision=precision,
                               dtype=dtype, spatial_stride=spatial_stride)


def _get_path(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return node


def _set_path(tree: dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


# --------------------------------------------------------------------------
# Preconditioner
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class KFACConfig:
    """Static configuration (mirrors the reference constructor flags,
    kfac_preconditioner_base.py:66-99)."""

    inv_type: str = EIGEN  # 'eigen' | 'inverse'
    strategy: str = "dp"  # 'dp' | 'mpd' (distributed schedule; see parallel/)
    # dp mode: each device computes ONLY its owned rows' factor GEMMs (one
    # lax.switch branch per shard with a static row subset) instead of every
    # row everywhere + dynamic_slice. This is what makes DP-KFAC's factor
    # work actually shard N ways, matching the reference's rank-filtered
    # hooks (kfac_preconditioner_inv_dp.py:60-90, where non-owner ranks
    # never even save a/g). Irrelevant when world_size == 1; mpd mode
    # always computes everywhere (its factors are local-batch estimates
    # averaged over the data axis — every device's batch must contribute).
    owner_only_factors: bool = True
    damping: float = 0.001
    fac_update_freq: int = 1
    kfac_update_freq: int = 1
    kl_clip: Optional[float] = 0.001
    factor_decay: float = 0.95
    eps: float = 1e-10
    # Static update schedule: when True, fac/kfac_update_freq (and
    # pcg_precond_freq) are treated as compile-time Python ints — a freq of
    # 1 emits NO lax.cond at all (the canonical TCov=TInv=1 configs,
    # reference train_cifar10.sh:18-20, compile to straight-line code; conds
    # measured ~27ms/step of pure overhead in round 1, BENCH_NOTES.md).
    # Dynamic (traced) freq overrides passed to step() fall back to runtime
    # gating even when this is set.
    static_schedule: bool = False
    # Stagger TInv-amortized inverse/eigen refreshes round-robin across
    # layers (per-layer KFAC) or buckets (BlockKFAC): layer/bucket i
    # refreshes when (step - i*spacing) % TInv == 0 (spacing =
    # max(TInv // n, 1)), all refresh at step 0. Same per-entry staleness
    # bound as the unstaggered schedule (TInv), but the per-step
    # eigendecomposition cost is ~1/n of a full refresh instead of a
    # one-step spike (eigen_dp at ImageNet dims pays ~955 ms for the
    # dim-4608 eigh; staggering spreads it). The reference gets the same
    # effect ACROSS RANKS by round-robining layers to workers
    # (kfac_preconditioner_eigen.py:98-119); across steps is the
    # single-program SPMD analogue. No effect when TInv <= 1.
    inv_stagger: bool = False
    # exclude_parts ablation switches (base.py:96-99)
    exclude_compute_factor: bool = False
    exclude_communicate_factor: bool = False
    exclude_compute_inverse: bool = False
    exclude_communicate_inverse: bool = False
    # matmul precision for factor/precond GEMMs
    precision: Any = None
    # input dtype of the factor-statistics GEMMs: float32 (reference
    # default) or bfloat16 — the reference's tcmm f_gemm_ex fp16
    # tensor-core path (utils.py:156,217); accumulation stays fp32 either
    # way via preferred_element_type
    factor_dtype: Any = "float32"
    # A-factor implementation: 'auto' (measured dispatch policy — the
    # fused Pallas kernel exactly where patch-materialization traffic
    # dominates, i.e. many patch rows over few channels; XLA elsewhere),
    # 'xla' (extract_patches + dot_general), 'pallas' (fused streaming
    # patch covariance, ops/pallas/patch_cov.py) or 'taps' (symmetric
    # tap-pair GEMMs, ops/pallas/tap_cov.py — no patch materialization
    # AND a 45% flop cut from block symmetry; measured: ties/loses to
    # XLA, kept as a documented negative result). Pallas paths apply to
    # supported conv geometries on TPU only; everything else falls back
    # to the XLA path.
    factor_impl: str = "xla"
    # batch consecutive same-shape layers' factor GEMMs into stacked
    # vmapped ops (BlockKFAC._fresh_bucket_factors); False = one GEMM per
    # layer. The input stack is a real HBM copy, so only runs whose per-row
    # activation+cotangent bytes fit under factor_batch_max_bytes batch
    # (measured RN50 bs32/224: batching the big early-stage activations
    # cost ~6 ms/step in copies; small late-stage/dense ops win)
    factor_batch: bool = True
    factor_batch_max_bytes: int = 4_000_000
    # fraction of the (device-local) batch used for factor STATISTICS
    # (1.0 = all of it, the reference single-device semantics). DP-KFAC's
    # own design computes factors from each owner's LOCAL batch — 1/N of
    # the global batch on an N-device mesh (inv_dp.py:75-90; the TCC'22
    # paper's estimator argument: local-batch factors are unbiased and the
    # 0.95 EMA averages ~20 of them). factor_batch_frac=1/N makes a
    # single-chip run's factor workload match the per-device workload of
    # an N-way DP-KFAC run; convergence-validated by the pcg_frac_dp arm.
    # Cotangent rows are rescaled by 1/frac so the batch-mean loss scaling
    # stays exact (the reference's local loss is a local-batch mean).
    factor_batch_frac: float = 1.0
    # Spatial-position subsampling for CONV factor statistics: compute the
    # A/G Grams from every factor_spatial_stride-th output position in each
    # spatial dim (1/ss^2 of the patch rows). The KFC estimator already
    # treats positions as samples (spatially-uncorrelated-derivatives
    # approximation, Grosse & Martens KFC); a strided subset is the same
    # estimator with fewer samples — unbiased (sampled-row scaling, see
    # ops/factors.compute_a_conv) and exact whenever the statistics are
    # position-stationary. At TCov=1 the conv factor GEMMs are ~1.28
    # TFLOP/step on RN50 bs32/224 (3x the model's own flops, MXU-bound at
    # ~190 TF/s — BENCH_NOTES round-4 attribution); ss=2 cuts that 4x.
    factor_spatial_stride: int = 1
    # Separate stride for the G (cotangent) Grams; None = follow
    # factor_spatial_stride. For 3x3 convs the A-factor Gram carries
    # ~(kh*kw)^2 = 81x the G Gram's flops, so striding A ONLY
    # (factor_spatial_stride=s, factor_g_spatial_stride=1) keeps ~99% of
    # the flop cut while leaving the G statistics exact — a strictly
    # smaller estimator perturbation at nearly the same step time.
    factor_g_spatial_stride: Optional[int] = None
    # EMA fresh factors directly into state sub-blocks (BlockKFAC, dp/
    # single-program): no identity-embedded fresh copy, no concat.
    # Mathematically identical to the concat path (pad rows satisfy
    # EMA(I, I) = I; parity-tested). Default OFF: on-chip A/B at the RN50
    # bs32/224 headline shows the per-run dynamic-update-slice chains
    # compile to a pathological schedule — 37.8x SGD vs the concat path's
    # 1.97x (five reproductions). The one run that credited it with
    # 1.90x was compiled alongside the since-removed stem polyphase
    # kernel and is not reproducible (BENCH_NOTES round 3, continued).
    factor_ema_blockwise: bool = False
    # Factor-EMA materialization strategy (BlockKFAC, dp/single-program —
    # where no factor collective needs the full fresh stack). The three
    # modes are mathematically identical on the real blocks (parity-tested,
    # tests/test_strategies.py); they differ only in HBM traffic and XLA
    # schedule:
    #   'concat'       identity-embed every fresh block, concatenate, then
    #                  one full-state EMA pass (~4 state-sized passes/step).
    #   'fused_concat' EMA each fresh block against its STATIC slice of the
    #                  old state and concatenate the results directly — one
    #                  state write, no separate fresh materialization (the
    #                  EMA fuses into the factor-GEMM epilogues), and no
    #                  update-slice chains. Pad rows/regions are re-emitted
    #                  as exact identity (the concat path lets them drift by
    #                  f32 EMA rounding — the round-2 merge-NaN source).
    #   'blockwise'    EMA blocks written into the old state via .at[].set
    #                  update-slices (measured pathological on v5e: 37.8x
    #                  SGD from a serialized schedule, BENCH_NOTES round 3
    #                  continued; kept as a parity option).
    # None resolves to 'blockwise' if factor_ema_blockwise else 'concat'
    # (back-compat with the round-3 boolean flag).
    factor_ema_mode: Optional[str] = None
    # STORAGE dtype of the factor EMA state A/G ('float32' default,
    # matching the reference's fp32 running factors, utils.py:66-71;
    # 'bfloat16' halves the dominant per-step factor-state HBM traffic).
    # With the fused CG the solve never re-reads A/G (it reads the
    # pcg_dtype-stored inverses), so the state is touched by exactly the
    # paths bf16 storage is safe for: the EMA read/write (rounding noise
    # is O(bf16 eps) per step, non-compounding — the EMA is a contraction
    # toward the fresh estimate), the refresh (whose matmuls already run
    # bf16 MXU passes at default precision, so bf16 operands change
    # nothing), and trace/eigen consumers which upcast to f32 at the op
    # (pi traces sum f32-cast diagonals; symeig casts its input).
    factor_state_dtype: Any = "float32"

    @property
    def _factor_ema_mode(self) -> str:
        mode = self.factor_ema_mode
        if mode is None:
            mode = "blockwise" if self.factor_ema_blockwise else "concat"
        if mode not in ("concat", "fused_concat", "blockwise"):
            raise ValueError(f"unknown factor_ema_mode {mode!r}")
        return mode

    @property
    def _factor_state_dtype(self):
        import jax.numpy as _jnp

        return _jnp.dtype(self.factor_state_dtype)

    @property
    def _g_spatial_stride(self) -> int:
        if self.factor_g_spatial_stride is None:
            return self.factor_spatial_stride
        return self.factor_g_spatial_stride

    @property
    def _factor_dtype(self):
        import jax.numpy as _jnp

        if self.factor_dtype == "auto":
            # per-layer policy resolved at the GEMM by row-matrix size
            # (ops/factors._resolve_dtype): bf16 inputs only where the
            # materialized patch buffer is large (e.g. the RN50 stem)
            return "auto"
        return _jnp.dtype(self.factor_dtype)
    # symmetric eigensolver (the tcmm f_symeig equivalents):
    #   'xla'      XLA QDWH eigh everywhere
    #   'jacobi'   Pallas one-sided Jacobi for dims <= jacobi_max_dim, XLA
    #              above (ops/pallas/symeig.py)
    #   'blocked'  Pallas for small dims, blocked one-sided Jacobi (MXU
    #              Gram/rotation GEMMs + small inner solves) for dims >=
    #              blocked_min_dim (ops/blocked_symeig.py)
    #   'tracking' online eigenbasis tracking synchronized with the factor
    #              EMA — no cold eigendecomposition at all (matmuls only;
    #              ops/blocked_symeig.tracking_symeig_update)
    symeig_impl: str = "xla"
    jacobi_sweeps: int = 10
    jacobi_max_dim: int = 512
    blocked_min_dim: int = 1024
    blocked_block: int = 128
    # per-outer-sweep inner solver: >0 Pallas Jacobi sweeps, 0 perturbative
    # (all-matmul), <0 batched XLA eigh; None = auto schedule scaled to
    # n/block (blocked_symeig.default_inner_schedule)
    blocked_inner_schedule: Any = None
    tracking_iters: int = 2
    # exact decompositions for the first N refreshes: the EMA transient
    # from identity to the data covariance is a large spectral excursion
    # (eigenvalue crossings) that first-order tracking cannot follow; after
    # warmup the per-step drift is ~ (1-factor_decay) and tracking holds
    tracking_warmup: int = 10
    # periodic exact re-refresh: near-degenerate eigenvalue couplings that
    # the perturbation clamp leaves unresolved accumulate slowly (~0.15%
    # reconstruction error per step measured); an exact decomposition every
    # N refreshes bounds the drift at ~1/N amortized cost
    tracking_exact_freq: int = 50
    # matmul precision of the tracking rotations: 'highest' = full-f32
    # passes (6 MXU passes per matmul on TPU), 'default' = bf16 passes with
    # f32 accumulation (~9x faster; basis error ~bf16 epsilon, bounded by
    # the periodic exact refresh). The rotations are self-correcting
    # (Newton-Schulz re-orthonormalization every update), so 'default' is
    # the production setting; 'highest' is for fidelity studies.
    tracking_precision: str = "default"

    @property
    def _tracking_precision(self):
        import jax as _jax

        if self.tracking_precision == "default":
            return None
        return _jax.lax.Precision.HIGHEST
    # 'pcg' inv_type: CG iterations for the damped Kronecker solve, and the
    # refresh period of the CG *preconditioner* (the split damped-factor
    # inverses). The preconditioner only affects CG convergence speed — not
    # the solution — so refreshing it less often than every step is exact;
    # a stale preconditioner just costs a little convergence rate.
    pcg_iters: int = 8
    pcg_precond_freq: int = 10
    # CG iteration form. 'fused' (3 MXU matmuls/iter) applies the operator
    # ALGEBRAICALLY THROUGH the cached split inverses, so between
    # preconditioner refreshes it solves the system of the factors the
    # inverses were built from — i.e. the exact eigen-variant update of
    # prec_freq-stale factors, the reference's --kfac-update-freq=
    # pcg_precond_freq semantics (TInv=prec_freq). 'operator' (4 matmuls/
    # iter) applies the CURRENT factors as the operator — the exact TInv=1
    # update, where preconditioner staleness only slows CG convergence,
    # never changes the solution. 'auto' = fused when the inverses are
    # stored f32 and shifts are available, else operator.
    pcg_fused: str = "auto"
    # storage dtype of the cached preconditioner inverses. float32 (None,
    # the default) enables the fused 3-matmul CG iteration (pcg_kron_solve
    # applies the operator algebraically through the exact inverse);
    # 'bfloat16' halves state traffic but falls back to the explicit
    # 4-matmul operator (a sloppy preconditioner only slows CG; a sloppy
    # operator would change the answer) — unless pcg_fused='force'
    pcg_precond_dtype: Any = None
    # preconditioner refresh method: 'cholesky' (exact batched Cholesky
    # inverse — 11.5 ms/matrix at 4608, ~17x its GEMM-rate flop floor on
    # TPU because triangular solves serialize) or 'ns' (Newton-Schulz
    # warm-started from the previous inverse — matmuls only, quadratic
    # convergence since factors drift by the EMA rate between refreshes,
    # with an automatic bucket-level Cholesky fallback outside the
    # convergence ball). See ops/pcg.damped_ns_factors.
    pcg_refresh: str = "cholesky"
    pcg_ns_iters: int = 3
    # warm-start CG from the previous step's solution (BlockKFAC bucketed
    # path): gradients correlate strongly across steps, so x_{t-1} leaves
    # CG only the step-to-step delta to resolve — the same accuracy at
    # fewer iterations. With the fused form (pcg_fused='auto', f32
    # inverses) the warm residual costs ZERO matmuls: the CG recurrence
    # accumulates G'xA' alongside the solution (carried as gxaPrev state,
    # re-anchored exactly at every preconditioner refresh). With
    # pcg_fused='never' the residual is recomputed against the CURRENT
    # factors (2 matmuls, exact TInv=1 semantics). Either way the update
    # becomes (weakly) history-dependent through the iteration count, like
    # any truncated-CG scheme; the fixed point is unchanged.
    pcg_warm_start: bool = False

    @property
    def _pcg_dtype(self):
        import jax.numpy as _jnp

        if self.pcg_precond_dtype is None:
            return None
        return _jnp.dtype(self.pcg_precond_dtype)

    @property
    def _pcg_fused_active(self) -> bool:
        """Whether pcg_kron_solve will take the fused 3-matmul form under
        this config (mirrors its static predicate). 'force' keeps the fused
        form even with bf16 inverse storage (the bf16-perturbed stale
        system — see pcg_kron_solve)."""
        return self.pcg_fused == "force" or (
            self.pcg_fused == "auto" and self._pcg_dtype is None
        )

    def symeig(self, x):
        import jax as _jax

        n = x.shape[-1]
        on_tpu = _jax.default_backend() == "tpu"
        if self.symeig_impl in ("jacobi", "blocked", "tracking"):
            if (
                self.symeig_impl in ("blocked", "tracking")
                and n >= self.blocked_min_dim
            ):
                from kfac_pytorch_tpu.ops.blocked_symeig import (
                    default_inner_schedule,
                    symeig_blocked_padded,
                )

                if self.blocked_inner_schedule is None:
                    step = max(2 * self.blocked_block, 256)
                    n_pad = ((n + step - 1) // step) * step
                    sched = default_inner_schedule(
                        n_pad, self.blocked_block
                    )
                else:
                    sched = tuple(self.blocked_inner_schedule)
                if not on_tpu:
                    # Pallas inner solves only lower on TPU; the XLA-eigh
                    # inner (< 0) is the exact portable fallback
                    sched = tuple(-1 if s > 0 else s for s in sched)
                return symeig_blocked_padded(
                    x, self.eps, block=self.blocked_block,
                    inner_schedule=sched,
                )
            if on_tpu:
                from kfac_pytorch_tpu.ops.pallas.symeig import symeig_auto

                return symeig_auto(
                    x, self.eps, sweeps=self.jacobi_sweeps,
                    max_pallas_dim=self.jacobi_max_dim,
                )
        from kfac_pytorch_tpu.ops.linalg import symeig

        return symeig(x, self.eps)

    @staticmethod
    def exclude_parts_flags(exclude_parts: str) -> Dict[str, bool]:
        return dict(
            exclude_compute_factor="ComputeFactor" in exclude_parts,
            exclude_communicate_factor="CommunicateFactor" in exclude_parts,
            exclude_compute_inverse="ComputeInverse" in exclude_parts,
            exclude_communicate_inverse="CommunicateInverse" in exclude_parts,
        )


def production_pcg_config(**overrides) -> "KFACConfig":
    """THE bench-validated production combo — the exact config bench.py
    ships as its headline arm (BENCH_NOTES round 3: Newton-Schulz
    warm-started refresh + bf16-stored inverses + forced fused CG,
    reproduced at 1.96-1.99x; convergence-validated by the pcg_prod_dp
    2k/10k arms). Centralized so bench.py, __graft_entry__.dryrun_multichip
    and the sharded production tests run literally the same config — the
    shipped fast path is exercised under SPMD, not a lookalike.

    Computes the reference eigen_dp update (exact damped Kronecker solve of
    prec_freq-stale factors; kfac_preconditioner_eigen_dp.py:62-93) with
    zero eigendecompositions. ``overrides`` patch any field (e.g. the
    workload's damping)."""
    base = dict(
        inv_type=PCG,
        strategy="dp",
        damping=0.002,
        kl_clip=0.001,
        pcg_iters=2,
        pcg_precond_freq=10,
        pcg_fused="force",
        pcg_precond_dtype="bfloat16",
        pcg_refresh="ns",
        pcg_ns_iters=3,
        pcg_warm_start=True,
        static_schedule=True,
        factor_impl="auto",
        # A-only spatial-position subsampling: A-factor Grams from 1/9 of
        # positions (stride 3), G Grams EXACT (the KFC estimator over a
        # position subsample — factor_spatial_stride /
        # factor_g_spatial_stride). For 3x3 convs the A Gram carries ~81x
        # the G Gram's flops, so A-only striding keeps most of the flop
        # cut with exact G statistics. Validated under the round-5
        # PRE-REGISTERED rule (BENCH_NOTES round 5): seven pooled
        # one-variable 2k seeds ALL positive vs the full-position control
        # (mean +0.024, min +0.001; sign-test p=0.008) plus the 10k
        # scheduler-engaged arm. Worth ~12% of the TCov=1 step
        # (1.98x full-position -> 1.76x). Set factor_spatial_stride=1 to
        # restore full-position statistics — preferable when the factor
        # stage is already amortized (TCov >= 10). NOTE: ss=2/G=1 FAILED
        # the same rule (a -0.032 seed) — it remains an option but is
        # not validated.
        factor_spatial_stride=3,
        factor_g_spatial_stride=1,
    )
    base.update(overrides)
    return KFACConfig(**base)


def production_block_kwargs(calibration: Optional[Dict[str, Any]] = None
                            ) -> Dict[str, Any]:
    """BlockKFAC constructor kwargs of the production headline arm:
    cost-model bucket merging with the v5e-measured rate constants
    (bench.py; 17 buckets on RN50, measured 1.96x merged vs 2.09x
    unmerged) over natural dim_align=8 buckets. ``calibration`` (the dict
    from utils.calibration.apply_calibration / tools/calibrate.py)
    overrides the merge constants with on-chip measurements."""
    kw = dict(
        dim_align=8,
        merge_flop_rate=2.0e14,
        merge_dispatch_cost=3.0e-5,
        merge_hbm_rate=8.0e11,
    )
    if calibration:
        from kfac_pytorch_tpu.utils.calibration import merge_kwargs_from

        kw.update(merge_kwargs_from(calibration))
    return kw


class KFAC:
    """Distributed K-FAC gradient preconditioner (functional core).

    Usage (single program; see training/loop.py for full assembly)::

        kfac = KFAC(specs, KFACConfig(inv_type='eigen', damping=0.003))
        state = kfac.init_state()
        ...inside jit:
        precond_grads, state = kfac.step(
            state, grads, acts, gs, lr=lr, damping=damping)
    """

    def __init__(self, specs: Sequence[LayerSpec], config: KFACConfig = KFACConfig()):
        if config.inv_type not in (EIGEN, INVERSE, PCG):
            raise ValueError(f"unknown inv_type: {config.inv_type}")
        self.specs = tuple(specs)
        self.config = config

    # ---------------------------------------------------------- state

    def init_state(self) -> Dict[str, Any]:
        """Factors initialized to identity (reference inv.py:84-90); inverse/
        eigen slots zero-initialized (inv.py:112-116, eigen.py:101-107)."""
        layers = {}
        sdt = self.config._factor_state_dtype
        for s in self.specs:
            da, dg = s.grad_in_dim, s.out_dim
            entry = {
                "A": jnp.eye(da, dtype=sdt),
                "G": jnp.eye(dg, dtype=sdt),
            }
            if self.config.inv_type == EIGEN:
                if self.config.symeig_impl == "tracking":
                    # factors start at identity: eigenbasis known exactly
                    entry.update(
                        dA=jnp.ones((da,), jnp.float32),
                        QA=jnp.eye(da, dtype=jnp.float32),
                        dG=jnp.ones((dg,), jnp.float32),
                        QG=jnp.eye(dg, dtype=jnp.float32),
                    )
                else:
                    entry.update(
                        dA=jnp.zeros((da,), jnp.float32),
                        QA=jnp.zeros((da, da), jnp.float32),
                        dG=jnp.zeros((dg,), jnp.float32),
                        QG=jnp.zeros((dg, dg), jnp.float32),
                    )
            elif self.config.inv_type == PCG:
                pdt = self.config._pcg_dtype or jnp.float32
                entry.update(
                    cholA=jnp.eye(da, dtype=pdt),
                    cholG=jnp.eye(dg, dtype=pdt),
                    sA=jnp.zeros((), jnp.float32),
                    sG=jnp.zeros((), jnp.float32),
                )
            else:
                entry.update(
                    invA=jnp.zeros((da, da), jnp.float32),
                    invG=jnp.zeros((dg, dg), jnp.float32),
                )
            layers[s.name] = entry
        return {"step": jnp.zeros((), jnp.int32), "layers": layers}

    # ---------------------------------------------------------- stats

    def _compute_a(self, spec: LayerSpec, a: jax.Array) -> jax.Array:
        return compute_factor_a(spec, a, self.config.precision,
                                self.config._factor_dtype,
                                self.config.factor_impl,
                                self.config.factor_spatial_stride)

    def _compute_g(self, spec: LayerSpec, g: jax.Array) -> jax.Array:
        return compute_factor_g(spec, g, self.config.precision,
                                self.config._factor_dtype,
                                self.config._g_spatial_stride)

    # ---------------------------------------------------------- step

    def step(
        self,
        state: Dict[str, Any],
        grads,
        acts,
        gs,
        *,
        lr,
        damping=None,
        fac_update_freq=None,
        kfac_update_freq=None,
        factor_mean_axis: Optional[str] = None,
    ):
        """One K-FAC preconditioning step (reference base.py:185-230).

        Args:
          state: pytree from init_state.
          grads: full parameter-gradient pytree (already data-averaged).
          acts: the mutated 'kfac_a' collection from model.apply (or the
            collection's inner dict).
          gs: gradient pytree w.r.t. the zero perturbations (dL/dy per layer).
          lr: learning rate (used only by kl_clip weighting, inv.py:198).
          damping / fac_update_freq / kfac_update_freq: dynamic overrides of
            the static config (the KFACParamScheduler path).
          factor_mean_axis: mesh axis name over which freshly computed
            factors are averaged (the MPD factor-allreduce, inv.py:94-103)
            when running inside shard_map. None = no factor communication
            (the DP-KFAC schedule, inv_dp.py:93-95) or single-device.

        Returns:
          (preconditioned grads pytree, new state)
        """
        cfg = self.config
        damping = cfg.damping if damping is None else damping
        fac_freq = cfg.fac_update_freq if fac_update_freq is None else fac_update_freq
        inv_freq = cfg.kfac_update_freq if kfac_update_freq is None else kfac_update_freq

        step = state["step"]
        do_fac = (step % jnp.maximum(fac_freq, 1)) == 0
        inv_freq_t = jnp.maximum(inv_freq, 1)
        do_inv = (step % inv_freq_t) == 0

        if isinstance(acts, dict) and capture.COL_A in acts:
            acts = acts[capture.COL_A]

        new_layers: Dict[str, Any] = {}
        pred2d: Dict[str, jax.Array] = {}
        vg_sum = jnp.zeros((), jnp.float32)

        def stagger_gate(i):
            """Layer i's round-robin refresh gate (KFACConfig.inv_stagger):
            phase-offset within the TInv period, all layers at step 0."""
            spacing = jnp.maximum(inv_freq_t // len(self.specs), 1)
            return (
                ((step - i * spacing) % inv_freq_t) == 0
            ) | (step == 0)

        for spec_idx, spec in enumerate(self.specs):
            st = state["layers"][spec.name]
            entry = dict(st)

            # (1) compute (and optionally communicate) factors
            if not cfg.exclude_compute_factor:
                a = _get_path(acts, spec.path)["a"]
                g = _get_path(gs, spec.path)["p"]

                if factor_mean_axis is not None and not cfg.exclude_communicate_factor:
                    # MPD factor allreduce (inv.py:94-103). Collectives must
                    # not sit under data-dependent control flow (SPMD
                    # deadlock), so the GEMMs are cond-gated to fresh-or-
                    # zeros, the pmean runs unconditionally, and the EMA is
                    # where-masked — TCov amortization still skips the GEMM
                    # cost.
                    A, G = jax.lax.cond(
                        do_fac,
                        lambda a=a, g=g, spec=spec: (
                            self._compute_a(spec, a),
                            self._compute_g(spec, g),
                        ),
                        lambda st=st: (
                            jnp.zeros_like(st["A"]),
                            jnp.zeros_like(st["G"]),
                        ),
                    )
                    A = jax.lax.pmean(A, factor_mean_axis)
                    G = jax.lax.pmean(G, factor_mean_axis)
                    entry["A"] = jnp.where(
                        do_fac,
                        fops.ema_update(A, st["A"], cfg.factor_decay),
                        st["A"],
                    )
                    entry["G"] = jnp.where(
                        do_fac,
                        fops.ema_update(G, st["G"], cfg.factor_decay),
                        st["G"],
                    )
                else:

                    def fac_update(a=a, g=g, spec=spec, st=st):
                        A = self._compute_a(spec, a)
                        G = self._compute_g(spec, g)
                        return (
                            fops.ema_update(A, st["A"], cfg.factor_decay),
                            fops.ema_update(G, st["G"], cfg.factor_decay),
                        )

                    entry["A"], entry["G"] = jax.lax.cond(
                        do_fac, fac_update, lambda: (st["A"], st["G"])
                    )

            # (2) compute inverse / eigendecomposition
            if not cfg.exclude_compute_inverse:
                if cfg.inv_type == EIGEN:

                    def inv_update(entry=entry, st=st):
                        if cfg.symeig_impl == "tracking":
                            from kfac_pytorch_tpu.ops.blocked_symeig import (
                                tracking_symeig_update,
                            )

                            # cold start (step 0): exact decomposition —
                            # the first EMA update is a jump from
                            # identity; tracking handles the small
                            # per-step drift afterwards
                            def track(entry=entry, st=st):
                                dA, QA = tracking_symeig_update(
                                    entry["A"].astype(jnp.float32), st["QA"],
                                    iters=cfg.tracking_iters, eps=cfg.eps,
                                    precision=cfg._tracking_precision,
                                )
                                dG, QG = tracking_symeig_update(
                                    entry["G"].astype(jnp.float32), st["QG"],
                                    iters=cfg.tracking_iters, eps=cfg.eps,
                                    precision=cfg._tracking_precision,
                                )
                                return dA, QA, dG, QG

                            def exact(entry=entry):
                                dA, QA = cfg.symeig(
                                    entry["A"].astype(jnp.float32))
                                dG, QG = cfg.symeig(
                                    entry["G"].astype(jnp.float32))
                                return dA, QA, dG, QG

                            use_exact = (step < cfg.tracking_warmup) | (
                                (cfg.tracking_exact_freq > 0)
                                & (step % jnp.maximum(
                                    cfg.tracking_exact_freq, 1
                                ) == 0)
                            )
                            return jax.lax.cond(use_exact, exact, track)
                        dA, QA = cfg.symeig(entry["A"].astype(jnp.float32))
                        dG, QG = cfg.symeig(entry["G"].astype(jnp.float32))
                        return dA, QA, dG, QG

                    entry["dA"], entry["QA"], entry["dG"], entry["QG"] = jax.lax.cond(
                        stagger_gate(spec_idx) if cfg.inv_stagger else do_inv,
                        inv_update,
                        lambda: (st["dA"], st["QA"], st["dG"], st["QG"]),
                    )
                elif cfg.inv_type == PCG:
                    do_prec = (
                        step % jnp.maximum(cfg.pcg_precond_freq, 1)
                    ) == 0

                    def inv_update(entry=entry):
                        return pcg_ops.damped_cholesky_factors(
                            entry["A"], entry["G"], damping,
                            dtype=cfg._pcg_dtype,
                        )

                    (
                        entry["cholA"], entry["cholG"],
                        entry["sA"], entry["sG"],
                    ) = jax.lax.cond(
                        do_prec, inv_update,
                        lambda: (st["cholA"], st["cholG"],
                                 st["sA"], st["sG"]),
                    )
                else:

                    def inv_update(entry=entry):
                        pi = lops.pi_trace_norm(entry["A"], entry["G"])
                        inv_a = lops.cholesky_inverse(
                            lops.add_diag(entry["A"], jnp.sqrt(damping) * pi)
                        )
                        inv_g = lops.cholesky_inverse(
                            lops.add_diag(entry["G"], jnp.sqrt(damping) / pi)
                        )
                        return inv_a, inv_g

                    entry["invA"], entry["invG"] = jax.lax.cond(
                        stagger_gate(spec_idx) if cfg.inv_stagger else do_inv,
                        inv_update, lambda: (st["invA"], st["invG"])
                    )

                # (3) preconditioned gradient
                layer_grads = _get_path(grads, spec.param_path)
                g2d = grad_to_2d(spec, layer_grads)
                if cfg.inv_type == EIGEN:
                    v = pops.precond_eigen(
                        g2d,
                        entry["QA"],
                        entry["dA"],
                        entry["QG"],
                        entry["dG"],
                        damping,
                        precision=cfg.precision,
                    )
                elif cfg.inv_type == PCG:
                    v = pcg_ops.pcg_kron_solve(
                        g2d, entry["A"], entry["G"], entry["cholA"],
                        entry["cholG"], damping, iters=cfg.pcg_iters,
                        precision=cfg.precision,
                        s_a=entry["sA"], s_g=entry["sG"],
                        fused=cfg.pcg_fused,
                    )
                else:
                    v = pops.precond_inverse(
                        g2d, entry["invA"], entry["invG"], precision=cfg.precision
                    )
                pred2d[spec.name] = v
                if cfg.kl_clip is not None:
                    vg_sum = vg_sum + jnp.sum(v * g2d) * (lr**2)

            new_layers[spec.name] = entry

        # (4) kl_clip rescale + write back into the grads pytree
        out = jax.tree_util.tree_map(lambda x: x, grads)  # shallow copy
        if not cfg.exclude_compute_inverse:
            if cfg.kl_clip is not None and not cfg.exclude_communicate_inverse:
                nu = pops.kl_clip_nu(vg_sum, cfg.kl_clip)
            else:
                nu = jnp.ones((), jnp.float32)  # reference inv.py:209-211
            for spec in self.specs:
                node = _get_path(out, spec.param_path)
                write_grad_2d(node, spec, pred2d[spec.name] * nu)

        new_state = {"step": step + 1, "layers": new_layers}
        return out, new_state


# --------------------------------------------------------------------------
# Hyper-parameter scheduler (reference base.py:233-301)
# --------------------------------------------------------------------------


@dataclass
class KFACHypers:
    """Dynamic K-FAC hyper-parameters, adjusted per epoch by the scheduler
    and fed to KFAC.step as traced scalars (no recompiles)."""

    damping: float
    fac_update_freq: int
    kfac_update_freq: int


class KFACParamScheduler:
    """Per-epoch multiplicative schedules for damping and update freqs.

    Parity: reference KFACParamScheduler (kfac_preconditioner_base.py:233-301)
    including ``start_epoch`` resume realignment.
    """

    def __init__(
        self,
        hypers: KFACHypers,
        damping_alpha: float = 1.0,
        damping_schedule: Optional[Sequence[int]] = None,
        update_freq_alpha: float = 1.0,
        update_freq_schedule: Optional[Sequence[int]] = None,
        start_epoch: int = 0,
    ):
        self.hypers = hypers
        self.damping_base = hypers.damping
        self.damping_alpha = damping_alpha
        self.damping_schedule = sorted(damping_schedule or [], reverse=True)
        self.fac_update_freq_base = hypers.fac_update_freq
        self.kfac_update_freq_base = hypers.kfac_update_freq
        self.update_freq_alpha = update_freq_alpha
        self.update_freq_schedule = sorted(update_freq_schedule or [], reverse=True)
        self.epoch = start_epoch

    @staticmethod
    def _factor(schedule, alpha, epoch):
        factor = 1.0
        for e in schedule:
            if epoch >= e:
                factor *= alpha
        return factor

    def step(self, epoch: Optional[int] = None) -> KFACHypers:
        if epoch is not None:
            self.epoch = epoch
        else:
            self.epoch += 1
        self.hypers.damping = self.damping_base * self._factor(
            self.damping_schedule, self.damping_alpha, self.epoch
        )
        freq_factor = self._factor(
            self.update_freq_schedule, self.update_freq_alpha, self.epoch
        )
        # clamp to >= 1 unless the user explicitly configured 0 (= K-FAC
        # disabled): update_freq_alpha < 1 with a small base would truncate
        # int(base * factor) to 0 and silently turn the preconditioner off
        # mid-run (the reference has the same latent truncation,
        # kfac_preconditioner_base.py:295-300, but treats 0 differently)
        def _scaled(base):
            return 0 if base == 0 else max(1, int(base * freq_factor))

        self.hypers.fac_update_freq = _scaled(self.fac_update_freq_base)
        self.hypers.kfac_update_freq = _scaled(self.kfac_update_freq_base)
        return self.hypers
