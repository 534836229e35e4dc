"""Distributed K-FAC strategies: bucketed, batched, mesh-sharded curvature.

This is the TPU-native replacement for the reference's rank-scheduled
communication strategies (/root/reference/kfac/kfac_preconditioner_inv.py,
_eigen.py, _inv_dp.py, _eigen_dp.py and the tcmm multiBcast pipeline,
packages/tcmm/src/communicator.cpp:75-117):

  reference (NCCL ranks)                      here (SPMD mesh)
  ------------------------------------------  ------------------------------
  per-layer round-robin rank ownership        layers stacked into same-dim
  (inv.py:62-77)                              buckets; the stacked axis is
                                              sharded over the mesh, each
                                              device owns a contiguous block
  factor allreduce (MPD, inv.py:94-103)       lax.pmean over the data axis
  no factor comm (DP-KFAC, inv_dp.py:93-95)   each device's state block is
                                              EMA'd from *its local batch*
                                              factors — zero factor traffic
  inverse/eigen broadcast (eigen.py:122-134)  not needed: preconditioned
                                              grads are all-gathered instead
  pred broadcast (inv.py:164-175)             lax.all_gather of the owner
                                              blocks (rides ICI)
  multi-stream overlap (communicator.cpp)     measured moot: the v5e
    toolchain schedules ALL step collectives sync (tools/overlap_check.py
    AOT evidence, BENCH_NOTES round 5) — exposure is wire-time-bounded
    (~1-2 ms/step at n=8), mitigated by the single post-momentum
    per-bucket delta gather + optional bf16 gather compression rather
    than stream concurrency

``BlockKFAC`` implements the same math as ``preconditioner.KFAC`` but over
padded stacked buckets: batched EMA, batched eigh/Cholesky (MXU-friendly,
one fused kernel per bucket instead of one per layer), and batched
preconditioning. With ``axis=None`` it is a drop-in single-program
implementation (tested equal to the per-layer KFAC); with ``axis='data'``
inside ``shard_map`` it becomes the distributed preconditioner.

Dispatch-tail design (round-2 restructure): the step is STAGE-MAJOR — each
update-frequency gate is ONE ``lax.cond`` spanning every bucket (instead of
one cond per bucket per stage), gradients stack/unstack as batched ops over
equal-shape layer runs (partition._shape_key orders bucket rows so layers
with identical parameter shapes are contiguous), and with
``KFACConfig.static_schedule`` the canonical TCov=TInv=1 configs compile
with no conds at all. ``step_buckets`` keeps gradients bucket-resident for
the bucketed trainer (training/bucketed.py), which also runs SGD momentum in
bucket form — the per-layer op storm of round 1 (~6000 dispatches/step,
BENCH_NOTES.md) collapses to a few ops per bucket.

Gating semantics: collectives may never sit inside data-dependent control
flow (SPMD deadlock). In mpd mode the factor GEMMs run under the cond
producing fresh-or-zero factors, the pmean runs unconditionally on the
result, and the EMA is where-masked — so --kfac-cov-update-freq amortizes
the GEMMs (round-1 ADVICE fix) while the collective stays unconditional.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kfac_pytorch_tpu.capture import COL_A, CONV, DENSE, LayerSpec
from kfac_pytorch_tpu.ops import factors as fops
from kfac_pytorch_tpu.ops import linalg as lops
from kfac_pytorch_tpu.ops import precond as pops
from kfac_pytorch_tpu.parallel.partition import Bucket, make_buckets
from kfac_pytorch_tpu.ops import pcg as pcg_ops
from kfac_pytorch_tpu.preconditioner import (
    EIGEN,
    PCG,
    KFACConfig,
    _get_path,
    compute_factor_a,
    compute_factor_g,
    grad_to_2d,
    write_grad_2d,
)


def _embed_eye(m: jax.Array, dim: int) -> jax.Array:
    """Embed a (d, d) matrix into the top-left of a (dim, dim) identity.

    Identity padding keeps eigh/Cholesky exact: eigenpairs of the padded
    block are the real ones plus unit eigenvalues on the pad axes, and
    zero-padded gradients never touch the pad subspace.
    """
    d = m.shape[-1]
    if d == dim:
        return m
    out = jnp.eye(dim, dtype=m.dtype)
    return out.at[:d, :d].set(m)


def _pad2d(m: jax.Array, rows: int, cols: int) -> jax.Array:
    if m.shape == (rows, cols):
        return m
    return jnp.zeros((rows, cols), m.dtype).at[: m.shape[0], : m.shape[1]].set(m)


def _embed_eye_batched(m: jax.Array, dim: int) -> jax.Array:
    """(g, d, d) -> (g, dim, dim) identity-embedded."""
    g, d, _ = m.shape
    if d == dim:
        return m
    out = jnp.broadcast_to(jnp.eye(dim, dtype=m.dtype), (g, dim, dim))
    return out.at[:, :d, :d].set(m)


def _pad2d_batched(m: jax.Array, rows: int, cols: int) -> jax.Array:
    g = m.shape[0]
    if m.shape[1:] == (rows, cols):
        return m
    return (
        jnp.zeros((g, rows, cols), m.dtype)
        .at[:, : m.shape[1], : m.shape[2]]
        .set(m)
    )


def _grouped_kernel_to_2d(node, spec) -> jax.Array:
    """All groups' canonical 2-D grads at once: (g, out_g, kh*kw*cin_g[+1]).

    flax grouped-conv kernel layout: (kh, kw, cin/g, g*out_g)."""
    kernel = node["kernel"]
    kh, kw, cin_g, _ = kernel.shape
    ng, og = spec.n_groups, spec.out_dim
    blk = kernel.reshape(kh, kw, cin_g, ng, og)
    blk = blk.transpose(3, 4, 0, 1, 2).reshape(ng, og, kh * kw * cin_g)
    if spec.has_bias:
        bias = node["bias"].reshape(ng, og, 1)
        blk = jnp.concatenate([blk, bias], axis=-1)
    return blk


def _grouped_2d_to_params(spec, v_block) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Inverse of _grouped_kernel_to_2d: (g, out_g, d[+1]) -> (kernel, bias)."""
    ng, og = spec.n_groups, spec.out_dim
    bias = None
    if spec.has_bias:
        bias = v_block[:, :, -1].reshape(ng * og)
        v_block = v_block[:, :, :-1]
    kh, kw = spec.kernel_size
    cin_g = v_block.shape[-1] // (kh * kw)
    blk = v_block.reshape(ng, og, kh, kw, cin_g).transpose(2, 3, 4, 0, 1)
    return blk.reshape(kh, kw, cin_g, ng * og), bias


def _write_grouped_grad_2d(node, spec, v_block) -> None:
    """Write all groups' preconditioned grads back into the shared
    kernel/bias."""
    kernel, bias = _grouped_2d_to_params(spec, v_block)
    node["kernel"] = kernel
    if bias is not None:
        node["bias"] = bias


def _cond_or_call(gate, true_fn, false_fn):
    """One hoisted lax.cond — or a direct call when the gate is statically
    always-true (static_schedule with freq == 1)."""
    if gate is None:
        return true_fn()
    return jax.lax.cond(gate, true_fn, false_fn)


class BlockKFAC:
    """Bucketed batched K-FAC preconditioner, shardable over a mesh axis.

    Same constructor surface as preconditioner.KFAC plus ``world_size``
    (number of shards of the bucket axis; 1 = single program).
    """

    def __init__(
        self,
        specs: Sequence[LayerSpec],
        config: KFACConfig = KFACConfig(),
        world_size: int = 1,
        dim_align: int = 8,
        merge_flop_rate: float = 0.0,
        merge_dispatch_cost: float = 0.0,
        merge_hbm_rate: float = 8.0e11,
    ):
        """dim_align: factor dims are padded up to multiples of this before
        bucketing. merge_flop_rate/merge_dispatch_cost (>0 to enable) turn
        on cost-model bucket packing (partition.pack_buckets): small buckets
        merge when one fewer bucket's fixed dispatch cost beats the padded
        FLOP + HBM-traffic time (merge_hbm_rate, bytes/s). Identity padding
        keeps the math exact either way."""
        self.specs = tuple(specs)
        self.config = config
        self.world_size = world_size
        self.buckets: List[Bucket] = make_buckets(
            specs, world_size, dim_align=dim_align,
            merge_flop_rate=merge_flop_rate,
            merge_dispatch_cost=merge_dispatch_cost,
            merge_hbm_rate=merge_hbm_rate,
        )
        # per-bucket static row metadata: real dims for trace corrections
        self._real_da = [
            np.array(
                [specs[r].grad_in_dim if r >= 0 else b.da for r in b.rows],
                np.float32,
            )
            for b in self.buckets
        ]
        self._real_dg = [
            np.array(
                [specs[r].out_dim if r >= 0 else b.dg for r in b.rows],
                np.float32,
            )
            for b in self.buckets
        ]

    # ------------------------------------------------------------- state

    def init_state(self) -> Dict[str, Any]:
        sdt = self.config._factor_state_dtype
        buckets = []
        for b in self.buckets:
            L, da, dg = b.n_rows, b.da, b.dg
            entry = {
                "A": jnp.broadcast_to(jnp.eye(da, dtype=sdt), (L, da, da)),
                "G": jnp.broadcast_to(jnp.eye(dg, dtype=sdt), (L, dg, dg)),
            }
            if self.config.inv_type == EIGEN:
                if self.config.symeig_impl == "tracking":
                    # factors start at identity (reference inv.py:84-90),
                    # whose eigendecomposition is known exactly — the
                    # tracking refresh then follows the EMA from here
                    entry.update(
                        dA=jnp.ones((L, da)),
                        QA=jnp.broadcast_to(jnp.eye(da), (L, da, da)),
                        dG=jnp.ones((L, dg)),
                        QG=jnp.broadcast_to(jnp.eye(dg), (L, dg, dg)),
                    )
                else:
                    entry.update(
                        dA=jnp.zeros((L, da)),
                        QA=jnp.zeros((L, da, da)),
                        dG=jnp.zeros((L, dg)),
                        QG=jnp.zeros((L, dg, dg)),
                    )
            elif self.config.inv_type == PCG:
                pdt = self.config._pcg_dtype or jnp.float32
                entry.update(
                    cholA=jnp.broadcast_to(jnp.eye(da, dtype=pdt),
                                           (L, da, da)),
                    cholG=jnp.broadcast_to(jnp.eye(dg, dtype=pdt),
                                           (L, dg, dg)),
                    sA=jnp.zeros((L,)),
                    sG=jnp.zeros((L,)),
                )
                if self.config.pcg_warm_start:
                    entry["xPrev"] = jnp.zeros((L, dg, da))
                    if self.config._pcg_fused_active:
                        # carried stale-operator image G' xPrev A'
                        # (dampingless), for the zero-matmul warm residual
                        entry["gxaPrev"] = jnp.zeros((L, dg, da))
            else:
                entry.update(
                    invA=jnp.zeros((L, da, da)), invG=jnp.zeros((L, dg, dg))
                )
            buckets.append(entry)
        return {"step": jnp.zeros((), jnp.int32), "buckets": buckets}

    def state_pspecs(self, axis: str = "data") -> Dict[str, Any]:
        """PartitionSpec pytree matching init_state: bucket arrays sharded on
        the stacked-layer axis, step replicated."""
        buckets = []
        for b, entry_template in zip(self.buckets, self.init_state()["buckets"]):
            buckets.append({k: P(axis) for k in entry_template})
        return {"step": P(), "buckets": buckets}

    def shard_state(self, mesh: Mesh, state, axis: str = "data"):
        """device_put a state pytree according to state_pspecs."""
        specs = self.state_pspecs(axis)
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            state,
            specs,
        )

    # ------------------------------------------------- row/run iteration

    def _iter_row_blocks(self, rows: Tuple[int, ...]):
        """Yield (kind, payload) over a row tuple, coalescing all groups of
        one grouped-conv module into a single block: ('pad', n) | ('single',
        spec) | ('grouped', [spec_g0..spec_gN-1]). Grouped rows of a module
        are contiguous (make_buckets orders rows by shape key); a PARTIAL
        group run (e.g. a shard-boundary cut in owner-only mode) falls back
        to per-row 'single' entries, which compute_factor_a/_g handle
        correctly by slicing the group's channels."""
        i = 0
        while i < len(rows):
            r = rows[i]
            if r < 0:
                n = 1
                while i + n < len(rows) and rows[i + n] < 0:
                    n += 1
                yield ("pad", n)
                i += n
                continue
            spec = self.specs[r]
            if spec.n_groups > 1 and spec.group_idx == 0:
                block = [spec]
                j = i + 1
                while (
                    j < len(rows)
                    and rows[j] >= 0
                    and self.specs[rows[j]].path == spec.path
                    and self.specs[rows[j]].group_idx == len(block)
                ):
                    block.append(self.specs[rows[j]])
                    j += 1
                if len(block) == spec.n_groups:
                    yield ("grouped", block)
                    i = j
                    continue
            yield ("single", spec)
            i += 1

    @staticmethod
    def _param_shape_key(spec: LayerSpec):
        return (spec.kind, spec.kernel_size, spec.in_dim, spec.out_dim,
                spec.has_bias)

    def _iter_stack_runs(self, bucket: Bucket):
        """Yield (kind, payload, pos): ('pad', n, pos) | ('grouped', specs,
        pos) | ('run', [spec...], pos) where a run is a maximal sequence of
        contiguous single layers with identical parameter shapes (stacked /
        unstacked as ONE batched op)."""
        pos = 0
        run: List[LayerSpec] = []
        run_pos = 0
        for kind, payload in self._iter_row_blocks(bucket.rows):
            if kind == "single":
                if run and self._param_shape_key(run[-1]) == self._param_shape_key(payload):
                    run.append(payload)
                else:
                    if run:
                        yield ("run", run, run_pos)
                    run = [payload]
                    run_pos = pos
                pos += 1
                continue
            if run:
                yield ("run", run, run_pos)
                run = []
            if kind == "pad":
                yield ("pad", payload, pos)
                pos += payload
            else:
                yield ("grouped", payload, pos)
                pos += len(payload)
        if run:
            yield ("run", run, run_pos)

    # ------------------------------------------------------------ factors

    @staticmethod
    def _factor_batch_key(spec: LayerSpec, a, g):
        """Rows with equal keys compute identically-shaped factor GEMMs from
        identically-shaped inputs, so the whole group runs as ONE stacked
        vmapped op (same geometry AND same activation/cotangent shapes —
        equal param shape alone is not enough: e.g. equal 3x3 convs at
        different spatial resolutions)."""
        return (
            spec.kind, spec.kernel_size, spec.strides, spec.padding,
            spec.has_bias, spec.n_groups, spec.group_idx, a.shape, g.shape,
        )

    def _collect_fresh_blocks(self, bucket: Bucket, acts, gs,
                              rows: Optional[Tuple[int, ...]] = None):
        """Fresh factor blocks for a bucket's rows, in row order, UNpadded.

        Returns a list of ``('pad', pos, n)`` | ``('block', pos, fa, fg)``
        entries where fa: (n, da_r, da_r), fg: (n, dg_r, dg_r) are the raw
        fresh factor blocks (factor GEMM outputs, f32-accumulated, not yet
        identity-embedded). ``rows``: compute only this static row subset
        (owner-only dp mode — a device's own contiguous block); defaults to
        every bucket row.

        Trace-time batching: CONSECUTIVE single rows sharing layer geometry
        and input shapes compute their factor GEMMs as one stacked vmapped
        op each for A and G. Consecutive-run grouping (make_buckets already
        sorts rows by shape key) keeps outputs in row order — no permutation
        gather, no extra factor-sized copies. Batching is traffic-gated:
        the input jnp.stack is a real HBM copy, so runs whose per-row
        activations are large skip it (measured on RN50 bs32/224: blanket
        batching cost ~6 ms/step in stack/gather copies — the per-op
        overhead it saves only wins for small inputs). Grouped-conv modules
        keep their vmapped per-group path; rows whose A factor dispatches
        to the fused Pallas patch-cov kernel stay per-row (no batching
        rule)."""
        prec = self.config.precision
        fdt = self.config._factor_dtype
        cfg = self.config
        blocks: List[tuple] = []
        pos = 0
        run: List[tuple] = []  # consecutive (spec, a, g) with equal keys
        run_key = None

        frac = cfg.factor_batch_frac
        sstride = cfg.factor_spatial_stride
        gstride = cfg._g_spatial_stride

        def sub_batch(a, g):
            """Factor statistics from the first ``frac`` of the batch
            (DP-KFAC local-batch semantics — see KFACConfig). The cotangent
            is rescaled by B/k: the loss was a FULL-batch mean, so its
            per-row cotangents carry 1/B; a k-row estimate needs 1/k."""
            if frac >= 1.0:
                return a, g
            b = a.shape[0]
            k = max(int(b * frac), 1)
            return a[:k], g[:k] * (b / k)

        def emit(fa, fg):
            nonlocal pos
            blocks.append(("block", pos, fa, fg))
            pos += fa.shape[0]

        def emit_per_row(items, a_impl):
            for s, a, g in items:
                emit(
                    compute_factor_a(s, a, prec, fdt, a_impl, sstride)[None],
                    compute_factor_g(s, g, prec, fdt, gstride)[None],
                )

        def flush():
            nonlocal run, run_key
            if not run:
                return
            items, run, run_key = run, [], None
            s0, a0, g0 = items[0]
            a_impl = cfg.factor_impl
            if s0.kind == CONV:
                a_shape = list(a0.shape)
                if s0.n_groups > 1:
                    a_shape[-1] //= s0.n_groups
                a_impl = fops.resolve_a_conv_impl(
                    tuple(a_shape), s0.kernel_size, s0.strides, s0.padding,
                    a_impl, subsample=sstride,
                )
            batchable = (
                cfg.factor_batch
                and len(items) > 1
                and a_impl not in ("pallas", "taps", "pallas_poly")
                and a0.nbytes + g0.nbytes <= cfg.factor_batch_max_bytes
            )
            if not batchable:
                emit_per_row(items, a_impl)
                return
            fa = jax.vmap(
                lambda ax: compute_factor_a(s0, ax, prec, fdt, a_impl,
                                            sstride)
            )(jnp.stack([a for _, a, _ in items]))
            fg = jax.vmap(
                lambda gx: compute_factor_g(s0, gx, prec, fdt, gstride)
            )(jnp.stack([g for _, _, g in items]))
            emit(fa, fg)

        for kind, payload in self._iter_row_blocks(
            bucket.rows if rows is None else rows
        ):
            if kind == "single":
                spec = payload
                a, g = sub_batch(
                    _get_path(acts, spec.path)["a"],
                    _get_path(gs, spec.path)["p"],
                )
                key = self._factor_batch_key(spec, a, g)
                if run and key != run_key:
                    flush()
                run.append((spec, a, g))
                run_key = key
                continue
            flush()
            if kind == "pad":
                blocks.append(("pad", pos, payload))
                pos += payload
            else:  # grouped module: vmap over the group axis
                specs = payload
                s0 = specs[0]
                ng = s0.n_groups
                a, g = sub_batch(
                    _get_path(acts, s0.path)["a"],
                    _get_path(gs, s0.path)["p"],
                )
                cg = a.shape[-1] // ng
                og = s0.out_dim
                # (B,H,W,g*cg) -> (g,B,H,W,cg); (B,oh,ow,g*og) -> (g,...,og)
                a_g = jnp.moveaxis(
                    a.reshape(a.shape[:-1] + (ng, cg)), -2, 0
                )
                g_g = jnp.moveaxis(
                    g.reshape(g.shape[:-1] + (ng, og)), -2, 0
                )
                fa = jax.vmap(
                    lambda ax: fops.compute_a_conv(
                        ax, s0.kernel_size, s0.strides, s0.padding,
                        s0.has_bias, precision=prec, dtype=fdt,
                        spatial_stride=sstride,
                    )
                )(a_g)  # grouped: per-group C is small; XLA path
                fg = jax.vmap(
                    lambda gx: fops.compute_g_conv(gx, precision=prec,
                                                   dtype=fdt,
                                                   spatial_stride=sstride)
                )(g_g)
                emit(fa, fg)
        flush()
        return blocks

    def _fresh_bucket_factors(self, bucket: Bucket, acts, gs,
                              rows: Optional[Tuple[int, ...]] = None):
        """Stacked fresh factors [L, da, da]/[L, dg, dg] (identity-embedded
        pad regions; pad rows = identity). See _collect_fresh_blocks for the
        walking/batching rules."""
        sdt = self.config._factor_state_dtype
        a_list, g_list = [], []
        for entry in self._collect_fresh_blocks(bucket, acts, gs, rows):
            if entry[0] == "pad":
                n = entry[2]
                a_list.append(jnp.broadcast_to(
                    jnp.eye(bucket.da, dtype=sdt),
                    (n, bucket.da, bucket.da),
                ))
                g_list.append(jnp.broadcast_to(
                    jnp.eye(bucket.dg, dtype=sdt),
                    (n, bucket.dg, bucket.dg),
                ))
            else:
                _, _pos, fa, fg = entry
                a_list.append(_embed_eye_batched(fa.astype(sdt), bucket.da))
                g_list.append(_embed_eye_batched(fg.astype(sdt), bucket.dg))
        fa_all = jnp.concatenate(a_list) if len(a_list) > 1 else a_list[0]
        fg_all = jnp.concatenate(g_list) if len(g_list) > 1 else g_list[0]
        return fa_all, fg_all

    def _ema_bucket_factors(self, bucket: Bucket, acts, gs, old_a, old_g,
                            decay, rows: Optional[Tuple[int, ...]] = None,
                            mode: str = "blockwise"):
        """EMA the bucket's factor state DIRECTLY from fresh per-run blocks
        (no identity-embedded fresh copy + full-state EMA pass — the
        state-traffic lever the factor_batch_frac probe pointed at,
        BENCH_NOTES round 3). Two materializations of the same math:

        ``mode='fused_concat'``: each fresh block EMAs against its STATIC
        slice of the old state and the results concatenate in row order —
        purely functional, ONE state-sized write, the EMA arithmetic fuses
        into the factor-GEMM epilogues. Pad rows/regions re-emit as exact
        identity (EMA(I, I) = I; the concat path instead lets pad entries
        drift by f32 EMA rounding — see ops/pcg._masked_diag_mean).

        ``mode='blockwise'``: blocks write into the old state via .at[].set
        update-slices (pad rows untouched). Measured pathological on v5e
        (37.8x serialized schedule, BENCH_NOTES round 3 continued); kept as
        a parity option.

        Returns (new_a, new_g)."""
        blocks = self._collect_fresh_blocks(bucket, acts, gs, rows)
        sdt = self.config._factor_state_dtype
        if mode == "fused_concat":
            a_parts, g_parts = [], []
            for entry in blocks:
                if entry[0] == "pad":
                    _, _pos, n = entry
                    a_parts.append(jnp.broadcast_to(
                        jnp.eye(bucket.da, dtype=sdt),
                        (n, bucket.da, bucket.da),
                    ))
                    g_parts.append(jnp.broadcast_to(
                        jnp.eye(bucket.dg, dtype=sdt),
                        (n, bucket.dg, bucket.dg),
                    ))
                    continue
                _, pos, fa, fg = entry
                n, da_r = fa.shape[0], fa.shape[-1]
                dg_r = fg.shape[-1]
                old_blk_a = jax.lax.slice(
                    old_a, (pos, 0, 0), (pos + n, da_r, da_r))
                old_blk_g = jax.lax.slice(
                    old_g, (pos, 0, 0), (pos + n, dg_r, dg_r))
                a_parts.append(_embed_eye_batched(
                    fops.ema_update(fa, old_blk_a, decay).astype(sdt),
                    bucket.da,
                ))
                g_parts.append(_embed_eye_batched(
                    fops.ema_update(fg, old_blk_g, decay).astype(sdt),
                    bucket.dg,
                ))
            new_a = (jnp.concatenate(a_parts) if len(a_parts) > 1
                     else a_parts[0])
            new_g = (jnp.concatenate(g_parts) if len(g_parts) > 1
                     else g_parts[0])
            return new_a, new_g
        if mode != "blockwise":
            raise ValueError(f"unknown EMA mode {mode!r}")
        new_a, new_g = old_a, old_g
        for entry in blocks:
            if entry[0] == "pad":
                continue  # pad rows: EMA(I, I) = I — untouched
            _, pos, fa, fg = entry
            n, da_r = fa.shape[0], fa.shape[-1]
            dg_r = fg.shape[-1]
            old_blk_a = jax.lax.slice(
                new_a, (pos, 0, 0), (pos + n, da_r, da_r))
            old_blk_g = jax.lax.slice(
                new_g, (pos, 0, 0), (pos + n, dg_r, dg_r))
            new_a = new_a.at[pos:pos + n, :da_r, :da_r].set(
                fops.ema_update(fa, old_blk_a, decay))
            new_g = new_g.at[pos:pos + n, :dg_r, :dg_r].set(
                fops.ema_update(fg, old_blk_g, decay))
        return new_a, new_g

    # ------------------------------------------------- stack / unstack

    def _stack_bucket(self, bucket: Bucket, tree) -> jax.Array:
        """Stack one bucket's canonical 2-D layer matrices (grads or params)
        into (L, dg, da), batching each equal-shape run as one op."""
        rows = []
        for kind, payload, _pos in self._iter_stack_runs(bucket):
            if kind == "pad":
                rows.append(jnp.zeros((payload, bucket.dg, bucket.da)))
            elif kind == "grouped":
                s0 = payload[0]
                node = _get_path(tree, s0.param_path)
                blk = _grouped_kernel_to_2d(node, s0)
                rows.append(_pad2d_batched(blk, bucket.dg, bucket.da))
            else:  # run of equal-shape singles
                specs = payload
                s0 = specs[0]
                nodes = [_get_path(tree, s.param_path) for s in specs]
                if len(specs) == 1:
                    g2d = grad_to_2d(s0, nodes[0])
                    rows.append(_pad2d(g2d, bucket.dg, bucket.da)[None])
                    continue
                kern = jnp.stack([n["kernel"] for n in nodes])
                if s0.kind == DENSE:
                    blk = jnp.swapaxes(kern, 1, 2)  # (n, dout, din)
                else:
                    n, kh, kw, cin, cout = kern.shape
                    blk = jnp.swapaxes(
                        kern.reshape(n, kh * kw * cin, cout), 1, 2
                    )
                if s0.has_bias:
                    bias = jnp.stack([n["bias"] for n in nodes])
                    blk = jnp.concatenate([blk, bias[:, :, None]], axis=2)
                rows.append(_pad2d_batched(blk, bucket.dg, bucket.da))
        return jnp.concatenate(rows) if len(rows) > 1 else rows[0]

    def stack_grads(self, grads) -> List[jax.Array]:
        """All buckets' gradients in canonical stacked form (the one
        stack per step of the bucket-resident pipeline)."""
        return [self._stack_bucket(b, grads) for b in self.buckets]

    def _run_to_params(self, specs, vb):
        """(n, dg_real, da_real) run block -> (kernels (n, ...), biases or
        None), undoing the canonical 2-D mapping in one batched op."""
        s0 = specs[0]
        biases = None
        if s0.has_bias:
            biases = vb[:, :, -1]
            vb = vb[:, :, :-1]
        if s0.kind == DENSE:
            kerns = jnp.swapaxes(vb, 1, 2)
        else:
            n = vb.shape[0]
            kh, kw = s0.kernel_size
            cin = s0.in_dim // (kh * kw)
            kerns = jnp.swapaxes(vb, 1, 2).reshape(n, kh, kw, cin, s0.out_dim)
        return kerns, biases

    def _scatter_buckets(self, out, bucket_vals, write_fn, grouped_write_fn):
        """Drive per-run batched writes of stacked values into a pytree."""
        for bucket, v_full in zip(self.buckets, bucket_vals):
            for kind, payload, pos in self._iter_stack_runs(bucket):
                if kind == "pad":
                    continue
                if kind == "grouped":
                    s0 = payload[0]
                    ng = s0.n_groups
                    vb = jax.lax.slice_in_dim(v_full, pos, pos + ng)[
                        :, : s0.out_dim, : s0.grad_in_dim
                    ]
                    grouped_write_fn(s0, vb)
                    continue
                specs = payload
                s0 = specs[0]
                vb = jax.lax.slice_in_dim(v_full, pos, pos + len(specs))[
                    :, : s0.out_dim, : s0.grad_in_dim
                ]
                kerns, biases = self._run_to_params(specs, vb)
                for i, s in enumerate(specs):
                    write_fn(s, kerns[i], biases[i] if biases is not None else None)

    def unstack_into(self, out, bucket_vals, scale=None) -> None:
        """Write stacked per-bucket values (optionally scaled) back into the
        mutable pytree ``out`` (the preconditioned-grads write-back,
        reference _update_grad_in_place inv.py:188-217)."""
        if scale is not None:
            bucket_vals = [v * scale for v in bucket_vals]

        def write(s, kern, bias):
            node = _get_path(out, s.param_path)
            node["kernel"] = kern
            if bias is not None:
                node["bias"] = bias

        def grouped_write(s0, vb):
            _write_grouped_grad_2d(_get_path(out, s0.param_path), s0, vb)

        self._scatter_buckets(out, bucket_vals, write, grouped_write)

    def apply_deltas(self, params, bucket_deltas, scale) -> Any:
        """params - scale * unstack(bucket_deltas) for every K-FAC-covered
        parameter; other leaves are returned untouched. The bucket-resident
        SGD apply: one batched slice/transpose per run, one subtract per
        parameter leaf."""
        out = jax.tree_util.tree_map(lambda x: x, params)
        scaled = [scale * v for v in bucket_deltas]

        def write(s, kern, bias):
            node = _get_path(out, s.param_path)
            node["kernel"] = node["kernel"] - kern
            if bias is not None:
                node["bias"] = node["bias"] - bias

        def grouped_write(s0, vb):
            node = _get_path(out, s0.param_path)
            kern, bias = _grouped_2d_to_params(s0, vb)
            node["kernel"] = node["kernel"] - kern
            if bias is not None:
                node["bias"] = node["bias"] - bias

        self._scatter_buckets(out, scaled, write, grouped_write)
        return out

    def kfac_param_paths(self):
        """Set of param-tree paths owned by the preconditioner (for masking
        the first-order optimizer off these leaves)."""
        return {s.param_path for s in self.specs}

    # ------------------------------------------------------------- step

    def _resolve_gates(self, step, fac_update_freq, kfac_update_freq):
        """Gate values: None = statically always-on (no cond emitted)."""
        cfg = self.config

        def gate(static_freq, dyn):
            if cfg.static_schedule and not isinstance(dyn, jax.Array):
                freq = static_freq if dyn is None else int(dyn)
                if freq <= 1:
                    return None
                return (step % freq) == 0
            freq = static_freq if dyn is None else dyn
            return (step % jnp.maximum(freq, 1)) == 0

        do_fac = gate(cfg.fac_update_freq, fac_update_freq)
        do_inv = gate(cfg.kfac_update_freq, kfac_update_freq)
        do_prec = gate(cfg.pcg_precond_freq, None)
        return do_fac, do_inv, do_prec

    def step_core(
        self,
        state,
        g_buckets: List[jax.Array],
        acts,
        gs,
        *,
        lr,
        damping=None,
        fac_update_freq=None,
        kfac_update_freq=None,
        axis: Optional[str] = None,
        gather_preds: bool = True,
    ):
        """One bucketed K-FAC step on stacked gradients.

        Returns (bucket_preds, new_state): preconditioned stacked gradients
        (kl_clip nu already applied) and the new state. ``g_buckets`` must
        be the FULL (unsharded) stacked gradients — in sharded mode each
        device preconditions its local block and all-gathers.

        ``gather_preds=False`` (sharded mode only) returns each device's
        LOCAL preconditioned block instead of all-gathering — the kl_clip
        inner product is then psum'd over the axis (same global nu). The
        bucketed trainer uses this to run SGD momentum on the sharded
        blocks and all-gather the final DELTAS once (same collective
        bytes, momentum state sharded L/world_size per device; the pred
        "broadcast" of the reference, inv.py:164-175, moves to after the
        momentum update).

        Stage-major: one hoisted cond per gated stage across all buckets.
        """
        cfg = self.config
        damping = cfg.damping if damping is None else damping
        step = state["step"]
        do_fac, do_inv, do_prec = self._resolve_gates(
            step, fac_update_freq, kfac_update_freq
        )
        if isinstance(acts, dict) and COL_A in acts:
            acts = acts[COL_A]
        n_shards = self.world_size if axis is not None else 1
        n_b = len(self.buckets)

        # static per-bucket block geometry + dynamic offsets
        blks = [b.n_rows // n_shards for b in self.buckets]
        if axis is not None:
            idx = jax.lax.axis_index(axis)
            offsets = [idx * blk for blk in blks]
        else:
            offsets = [0] * n_b
        real_da, real_dg = [], []
        for b_idx in range(n_b):
            rda = jnp.asarray(self._real_da[b_idx])
            rdg = jnp.asarray(self._real_dg[b_idx])
            if axis is not None:
                rda = jax.lax.dynamic_slice_in_dim(rda, offsets[b_idx], blks[b_idx])
                rdg = jax.lax.dynamic_slice_in_dim(rdg, offsets[b_idx], blks[b_idx])
            real_da.append(rda)
            real_dg.append(rdg)

        entries = [dict(st) for st in state["buckets"]]

        # ---- (1) factors: ONE cond across all buckets.
        if not cfg.exclude_compute_factor:
            has_comm = (
                axis is not None
                and cfg.strategy == "mpd"
                and not cfg.exclude_communicate_factor
            )

            def fresh_all():
                return [
                    self._fresh_bucket_factors(b, acts, gs)
                    for b in self.buckets
                ]

            if has_comm:
                # GEMMs cond-gated (fresh-or-zeros), pmean unconditional
                # (collectives can't live under data-dependent control
                # flow), EMA where-masked.
                def zeros_all():
                    sdt = cfg._factor_state_dtype
                    return [
                        (
                            jnp.zeros((b.n_rows, b.da, b.da), sdt),
                            jnp.zeros((b.n_rows, b.dg, b.dg), sdt),
                        )
                        for b in self.buckets
                    ]

                fresh = _cond_or_call(do_fac, fresh_all, zeros_all)
                fresh = [
                    (jax.lax.pmean(fa, axis), jax.lax.pmean(fg, axis))
                    for fa, fg in fresh
                ]
                for b_idx, (fa, fg) in enumerate(fresh):
                    fa = jax.lax.dynamic_slice_in_dim(
                        fa, offsets[b_idx], blks[b_idx]
                    )
                    fg = jax.lax.dynamic_slice_in_dim(
                        fg, offsets[b_idx], blks[b_idx]
                    )
                    st = state["buckets"][b_idx]
                    a_new = fops.ema_update(fa, st["A"], cfg.factor_decay)
                    g_new = fops.ema_update(fg, st["G"], cfg.factor_decay)
                    if do_fac is None:
                        entries[b_idx]["A"], entries[b_idx]["G"] = a_new, g_new
                    else:
                        entries[b_idx]["A"] = jnp.where(do_fac, a_new, st["A"])
                        entries[b_idx]["G"] = jnp.where(do_fac, g_new, st["G"])
            else:
                # dp (or single-program): no factor collective — the whole
                # compute sits under one cond (skipped at TCov steps).
                owner_only = (
                    axis is not None
                    and n_shards > 1
                    and cfg.owner_only_factors
                )
                ema_mode = cfg._factor_ema_mode
                direct_ema = ema_mode != "concat" and (
                    axis is None or owner_only
                )

                def fac_update_direct():
                    """Fresh factors EMA'd straight against state sub-blocks
                    (no embedded/concatenated fresh copy — see
                    _ema_bucket_factors; mode = fused_concat | blockwise)."""
                    if owner_only:
                        def make_branch(shard):
                            def branch():
                                outs = []
                                for b_idx, b in enumerate(self.buckets):
                                    blk = b.n_rows // n_shards
                                    sub = b.rows[shard * blk:(shard + 1) * blk]
                                    st = state["buckets"][b_idx]
                                    outs.append(self._ema_bucket_factors(
                                        b, acts, gs, st["A"], st["G"],
                                        cfg.factor_decay, rows=sub,
                                        mode=ema_mode))
                                return outs
                            return branch

                        return jax.lax.switch(
                            idx, [make_branch(s) for s in range(n_shards)]
                        )
                    outs = []
                    for b_idx, b in enumerate(self.buckets):
                        st = state["buckets"][b_idx]
                        outs.append(self._ema_bucket_factors(
                            b, acts, gs, st["A"], st["G"],
                            cfg.factor_decay, mode=ema_mode))
                    return outs

                def fac_update():
                    if direct_ema:
                        return fac_update_direct()
                    if owner_only:
                        # Each device computes ONLY its owned rows' factor
                        # GEMMs: one lax.switch branch per shard, each with
                        # a static contiguous row subset. This is the SPMD
                        # form of the reference's rank-filtered hooks
                        # (inv_dp.py:60-90) — per-device factor work is
                        # 1/world_size, not full-compute + slice (which XLA
                        # cannot DCE through a traced offset).
                        def make_branch(shard):
                            def branch():
                                outs = []
                                for b in self.buckets:
                                    blk = b.n_rows // n_shards
                                    sub = b.rows[shard * blk:(shard + 1) * blk]
                                    outs.append(self._fresh_bucket_factors(
                                        b, acts, gs, rows=sub))
                                return outs
                            return branch

                        fresh = jax.lax.switch(
                            idx, [make_branch(s) for s in range(n_shards)]
                        )
                    else:
                        fresh = []
                        for b_idx, b in enumerate(self.buckets):
                            fa, fg = self._fresh_bucket_factors(b, acts, gs)
                            if axis is not None:
                                fa = jax.lax.dynamic_slice_in_dim(
                                    fa, offsets[b_idx], blks[b_idx]
                                )
                                fg = jax.lax.dynamic_slice_in_dim(
                                    fg, offsets[b_idx], blks[b_idx]
                                )
                            fresh.append((fa, fg))
                    outs = []
                    for b_idx, (fa, fg) in enumerate(fresh):
                        st = state["buckets"][b_idx]
                        outs.append(
                            (
                                fops.ema_update(fa, st["A"], cfg.factor_decay),
                                fops.ema_update(fg, st["G"], cfg.factor_decay),
                            )
                        )
                    return outs

                def keep():
                    return [
                        (st["A"], st["G"]) for st in state["buckets"]
                    ]

                for b_idx, (a_new, g_new) in enumerate(
                    _cond_or_call(do_fac, fac_update, keep)
                ):
                    entries[b_idx]["A"] = a_new
                    entries[b_idx]["G"] = g_new

        # ---- (2) inverse / eigen / pcg-preconditioner refresh:
        # ONE cond across all buckets (local compute, SPMD-safe).
        if not cfg.exclude_compute_inverse:
            if cfg.inv_type == EIGEN:

                def eigen_refresh_one(b_idx, e):
                    """One bucket's eigen refresh (exact or tracking)."""
                    if cfg.symeig_impl == "tracking":
                        from kfac_pytorch_tpu.ops.blocked_symeig import (
                            tracking_symeig_update,
                        )

                        st = state["buckets"][b_idx]
                        # warmup (step < tracking_warmup): exact
                        # decompositions — the EMA transient from
                        # identity to the data covariance is a large
                        # spectral excursion; afterwards the basis
                        # drifts ~ (1-factor_decay) per step and
                        # tracking follows with matmuls only. The
                        # untaken branch costs nothing at runtime
                        # (XLA conditionals execute one branch).
                        def track(e=e, st=st):
                            da_, qa = tracking_symeig_update(
                                e["A"].astype(jnp.float32), st["QA"],
                                iters=cfg.tracking_iters, eps=cfg.eps,
                                precision=cfg._tracking_precision,
                            )
                            dg_, qg = tracking_symeig_update(
                                e["G"].astype(jnp.float32), st["QG"],
                                iters=cfg.tracking_iters, eps=cfg.eps,
                                precision=cfg._tracking_precision,
                            )
                            return da_, qa, dg_, qg

                        def exact(e=e):
                            da_, qa = cfg.symeig(e["A"].astype(jnp.float32))
                            dg_, qg = cfg.symeig(e["G"].astype(jnp.float32))
                            return da_, qa, dg_, qg

                        use_exact = (step < cfg.tracking_warmup) | (
                            (cfg.tracking_exact_freq > 0)
                            & (step % jnp.maximum(
                                cfg.tracking_exact_freq, 1
                            ) == 0)
                        )
                        return jax.lax.cond(use_exact, exact, track)
                    da_, qa = cfg.symeig(e["A"].astype(jnp.float32))
                    dg_, qg = cfg.symeig(e["G"].astype(jnp.float32))
                    return da_, qa, dg_, qg

                if cfg.inv_stagger and do_inv is not None:
                    # staggered refresh (KFACConfig.inv_stagger): bucket i
                    # refreshes at its phase offset within the TInv period
                    # — per-step eigendecomposition cost is ~n_b/TInv
                    # buckets instead of all n_b in one spike (the
                    # reference spreads the same work ACROSS RANKS,
                    # eigen.py:98-119)
                    inv_freq_t = jnp.maximum(
                        cfg.kfac_update_freq
                        if kfac_update_freq is None else kfac_update_freq,
                        1,
                    )
                    spacing = jnp.maximum(inv_freq_t // n_b, 1)
                    for b_idx, e in enumerate(entries):
                        st = state["buckets"][b_idx]
                        gate_b = (
                            ((step - b_idx * spacing) % inv_freq_t) == 0
                        ) | (step == 0)
                        e["dA"], e["QA"], e["dG"], e["QG"] = jax.lax.cond(
                            gate_b,
                            lambda b_idx=b_idx, e=e: eigen_refresh_one(
                                b_idx, e),
                            lambda st=st: (
                                st["dA"], st["QA"], st["dG"], st["QG"]),
                        )
                else:

                    def inv_all():
                        return [
                            eigen_refresh_one(b_idx, e)
                            for b_idx, e in enumerate(entries)
                        ]

                    def keep_inv():
                        return [
                            (st["dA"], st["QA"], st["dG"], st["QG"])
                            for st in state["buckets"]
                        ]

                    for e, (da_, qa, dg_, qg) in zip(
                        entries, _cond_or_call(do_inv, inv_all, keep_inv)
                    ):
                        e["dA"], e["QA"], e["dG"], e["QG"] = da_, qa, dg_, qg
            elif cfg.inv_type == PCG:
                warm_fused = cfg.pcg_warm_start and cfg._pcg_fused_active

                def prec_all():
                    outs = []
                    for b_idx, e in enumerate(entries):
                        if cfg.pcg_refresh == "ns":
                            st0 = state["buckets"][b_idx]
                            vals = pcg_ops.damped_ns_factors(
                                e["A"], e["G"], damping,
                                st0["cholA"], st0["cholG"],
                                real_da=real_da[b_idx],
                                real_dg=real_dg[b_idx],
                                dtype=cfg._pcg_dtype,
                                iters=cfg.pcg_ns_iters,
                                precision=cfg.precision,
                            )
                        else:
                            vals = pcg_ops.damped_cholesky_factors(
                                e["A"], e["G"], damping,
                                real_da=real_da[b_idx],
                                real_dg=real_dg[b_idx],
                                dtype=cfg._pcg_dtype,
                            )
                        if warm_fused:
                            # the stale operator changes at a refresh:
                            # re-anchor the carried G' xPrev A' exactly
                            # against the refreshed factors (2 matmuls per
                            # refresh, amortized over pcg_precond_freq)
                            gxa = jnp.matmul(
                                e["G"],
                                jnp.matmul(e["xPrev"], e["A"],
                                           precision=cfg.precision),
                                precision=cfg.precision,
                            )
                            vals = vals + (gxa,)
                        outs.append(vals)
                    return outs

                def keep_prec():
                    return [
                        (st["cholA"], st["cholG"], st["sA"], st["sG"])
                        + ((st["gxaPrev"],) if warm_fused else ())
                        for st in state["buckets"]
                    ]

                for e, vals in zip(
                    entries, _cond_or_call(do_prec, prec_all, keep_prec)
                ):
                    e["cholA"], e["cholG"] = vals[0], vals[1]
                    e["sA"], e["sG"] = vals[2], vals[3]
                    if warm_fused:
                        e["gxaPrev"] = vals[4]
            else:

                def inverse_refresh_one(b_idx, e):
                    from kfac_pytorch_tpu.ops.pcg import _masked_diag_mean

                    b = self.buckets[b_idx]
                    # pi from the *real* traces via masked diagonal
                    # sums (exact under identity padding; see
                    # pcg.damped_cholesky_factors for why the
                    # subtract-pad-count form NaNs on merged buckets)
                    tr_a = jnp.maximum(
                        _masked_diag_mean(e["A"], real_da[b_idx]), 1e-10
                    )
                    tr_g = jnp.maximum(
                        _masked_diag_mean(e["G"], real_dg[b_idx]), 1e-10
                    )
                    pi = jnp.sqrt(tr_a / tr_g)
                    sd = jnp.sqrt(damping)
                    inv_a = lops.cholesky_inverse(
                        e["A"]
                        + (sd * pi)[:, None, None] * jnp.eye(b.da)
                    )
                    inv_g = lops.cholesky_inverse(
                        e["G"]
                        + (sd / pi)[:, None, None] * jnp.eye(b.dg)
                    )
                    return inv_a, inv_g

                if cfg.inv_stagger and do_inv is not None:
                    inv_freq_t = jnp.maximum(
                        cfg.kfac_update_freq
                        if kfac_update_freq is None else kfac_update_freq,
                        1,
                    )
                    spacing = jnp.maximum(inv_freq_t // n_b, 1)
                    for b_idx, e in enumerate(entries):
                        st = state["buckets"][b_idx]
                        gate_b = (
                            ((step - b_idx * spacing) % inv_freq_t) == 0
                        ) | (step == 0)
                        e["invA"], e["invG"] = jax.lax.cond(
                            gate_b,
                            lambda b_idx=b_idx, e=e: inverse_refresh_one(
                                b_idx, e),
                            lambda st=st: (st["invA"], st["invG"]),
                        )
                else:

                    def inv_all():
                        return [
                            inverse_refresh_one(b_idx, e)
                            for b_idx, e in enumerate(entries)
                        ]

                    def keep_inv():
                        return [
                            (st["invA"], st["invG"])
                            for st in state["buckets"]
                        ]

                    for e, (ia, ig) in zip(
                        entries, _cond_or_call(do_inv, inv_all, keep_inv)
                    ):
                        e["invA"], e["invG"] = ia, ig

        # ---- (3) preconditioned gradients (batched per bucket) + kl_clip
        preds: Optional[List[jax.Array]] = None
        if not cfg.exclude_compute_inverse:
            preds = []
            vg_sum = jnp.zeros((), jnp.float32)
            for b_idx, e in enumerate(entries):
                g2d_full = g_buckets[b_idx]
                g2d_my = (
                    jax.lax.dynamic_slice_in_dim(
                        g2d_full, offsets[b_idx], blks[b_idx]
                    )
                    if axis is not None
                    else g2d_full
                )
                if cfg.inv_type == EIGEN:
                    v_my = pops.precond_eigen(
                        g2d_my, e["QA"], e["dA"], e["QG"], e["dG"],
                        damping, precision=cfg.precision,
                    )
                elif cfg.inv_type == PCG:
                    warm = cfg.pcg_warm_start
                    warm_fused = warm and cfg._pcg_fused_active
                    sol = pcg_ops.pcg_kron_solve(
                        g2d_my, e["A"], e["G"], e["cholA"], e["cholG"],
                        damping, iters=cfg.pcg_iters,
                        precision=cfg.precision,
                        s_a=e["sA"], s_g=e["sG"],
                        fused=cfg.pcg_fused,
                        x0=e["xPrev"] if warm else None,
                        gxa0=e["gxaPrev"] if warm_fused else None,
                        return_gxa=warm_fused,
                    )
                    if warm_fused:
                        v_my, e["gxaPrev"] = sol
                    else:
                        v_my = sol
                    if warm:
                        # carried UNclipped (kl_clip nu is a trust-region
                        # rescale of the applied update, not of the solve)
                        e["xPrev"] = v_my
                else:
                    v_my = pops.precond_inverse(
                        g2d_my, e["invA"], e["invG"],
                        precision=cfg.precision,
                    )
                if axis is not None and gather_preds:
                    # the pred "broadcast" (reference inv.py:164-175)
                    v_out = jax.lax.all_gather(v_my, axis, axis=0, tiled=True)
                else:
                    v_out = v_my
                preds.append(v_out)
                if cfg.kl_clip is not None:
                    if axis is not None and not gather_preds:
                        # local inner product; the psum below restores the
                        # global sum (local blocks tile the row axis)
                        vg_sum = vg_sum + jnp.sum(v_my * g2d_my) * (lr**2)
                    else:
                        vg_sum = vg_sum + jnp.sum(v_out * g2d_full) * (lr**2)

            # ---- (4) kl_clip rescale (reference inv.py:188-217)
            if cfg.kl_clip is not None and not cfg.exclude_communicate_inverse:
                if axis is not None and not gather_preds:
                    vg_sum = jax.lax.psum(vg_sum, axis)
                nu = pops.kl_clip_nu(vg_sum, cfg.kl_clip)
                preds = [v * nu for v in preds]

        new_state = {"step": step + 1, "buckets": entries}
        return preds, new_state

    def step_buckets(
        self, state, g_buckets, acts, gs, *, lr, damping=None,
        fac_update_freq=None, kfac_update_freq=None,
        axis: Optional[str] = None, gather_preds: bool = True,
    ):
        """Bucket-resident step: stacked grads in, preconditioned stacked
        grads out (kl-clipped). When the inverse stage is excluded the raw
        stacked grads pass through. ``gather_preds=False`` returns local
        blocks in sharded mode (see step_core); the pass-through then
        slices each device's block so the output is local either way."""
        preds, new_state = self.step_core(
            state, g_buckets, acts, gs, lr=lr, damping=damping,
            fac_update_freq=fac_update_freq,
            kfac_update_freq=kfac_update_freq, axis=axis,
            gather_preds=gather_preds,
        )
        if preds is None:
            preds = g_buckets
            if axis is not None and not gather_preds:
                idx = jax.lax.axis_index(axis)
                n_shards = self.world_size
                preds = [
                    jax.lax.dynamic_slice_in_dim(
                        v, idx * (b.n_rows // n_shards),
                        b.n_rows // n_shards,
                    )
                    for v, b in zip(preds, self.buckets)
                ]
        return preds, new_state

    def step(
        self,
        state,
        grads,
        acts,
        gs,
        *,
        lr,
        damping=None,
        fac_update_freq=None,
        kfac_update_freq=None,
        axis: Optional[str] = None,
    ):
        """One bucketed K-FAC step on a gradient pytree (stack → step_core →
        unstack; the preconditioner.KFAC-compatible API).

        With ``axis`` set, must be called inside shard_map over that mesh
        axis: acts/gs are the device-local batch shard, grads are the
        (already pmean'd) replicated gradients, and the bucket arrays in
        ``state`` are the device-local blocks (leading dim L/world_size).
        ``config.strategy`` selects 'mpd' (factors pmean-averaged over the
        axis — the reference's factor allreduce) or 'dp' (each owner uses
        its local-batch factors — DP-KFAC, zero factor communication).
        """
        g_buckets = self.stack_grads(grads)
        preds, new_state = self.step_core(
            state, g_buckets, acts, gs, lr=lr, damping=damping,
            fac_update_freq=fac_update_freq,
            kfac_update_freq=kfac_update_freq, axis=axis,
        )
        out = jax.tree_util.tree_map(lambda x: x, grads)
        if preds is not None:
            self.unstack_into(out, preds)
        return out, new_state
