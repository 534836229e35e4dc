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
  multi-stream overlap (communicator.cpp)     XLA async collectives

``BlockKFAC`` implements the same math as ``preconditioner.KFAC`` but over
padded stacked buckets: batched EMA, batched eigh/Cholesky (MXU-friendly,
one fused kernel per bucket instead of one per layer), and batched
preconditioning. With ``axis=None`` it is a drop-in single-program
implementation (tested equal to the per-layer KFAC); with ``axis='data'``
inside ``shard_map`` it becomes the distributed preconditioner.

Note on gating: factor GEMMs run unconditionally and are masked by
``jnp.where`` (the canonical configs use TCov=1 so nothing is wasted);
eigendecompositions — the expensive stage — are gated under ``lax.cond``
(no collectives inside, so conditional execution is SPMD-safe).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kfac_pytorch_tpu.capture import COL_A, LayerSpec
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


def _write_grouped_grad_2d(node, spec, v_block) -> None:
    """Inverse of _grouped_kernel_to_2d: write all groups' preconditioned
    grads (g, out_g, d[+1]) back into the shared kernel/bias."""
    kernel = node["kernel"]
    kh, kw, cin_g, _ = kernel.shape
    ng, og = spec.n_groups, spec.out_dim
    if spec.has_bias:
        node["bias"] = v_block[:, :, -1].reshape(ng * og)
        v_block = v_block[:, :, :-1]
    blk = v_block.reshape(ng, og, kh, kw, cin_g).transpose(2, 3, 4, 0, 1)
    node["kernel"] = blk.reshape(kh, kw, cin_g, ng * og)


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
    ):
        """dim_align: factor dims are padded up to multiples of this before
        bucketing; larger values merge more layers into fewer, bigger
        batched ops (fewer op dispatches, more padding FLOPs — identity
        padding keeps the math exact either way)."""
        self.specs = tuple(specs)
        self.config = config
        self.world_size = world_size
        self.buckets: List[Bucket] = make_buckets(
            specs, world_size, dim_align=dim_align
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
        buckets = []
        for b in self.buckets:
            L, da, dg = b.n_rows, b.da, b.dg
            entry = {
                "A": jnp.broadcast_to(jnp.eye(da), (L, da, da)),
                "G": jnp.broadcast_to(jnp.eye(dg), (L, dg, dg)),
            }
            if self.config.inv_type == EIGEN:
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
                )
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

    # ------------------------------------------------------------- step

    def _iter_row_blocks(self, bucket: Bucket):
        """Yield (kind, payload) over bucket rows, coalescing all groups of
        one grouped-conv module into a single block: ('pad', n) | ('single',
        spec) | ('grouped', [spec_g0..spec_gN-1]). Grouped rows of a module
        are contiguous (make_buckets preserves insertion order)."""
        i = 0
        rows = bucket.rows
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

    def _fresh_bucket_factors(self, bucket: Bucket, acts, gs):
        """Stacked fresh factors [L, da, da]/[L, dg, dg]; grouped-conv
        modules compute all their groups in ONE vmapped op (essential for
        depthwise nets where a layer contributes hundreds of rows)."""
        prec = self.config.precision
        a_list, g_list = [], []
        for kind, payload in self._iter_row_blocks(bucket):
            if kind == "pad":
                eye_a = jnp.broadcast_to(
                    jnp.eye(bucket.da), (payload, bucket.da, bucket.da)
                )
                eye_g = jnp.broadcast_to(
                    jnp.eye(bucket.dg), (payload, bucket.dg, bucket.dg)
                )
                a_list.append(eye_a)
                g_list.append(eye_g)
            elif kind == "single":
                spec = payload
                a = _get_path(acts, spec.path)["a"]
                g = _get_path(gs, spec.path)["p"]
                fdt = self.config._factor_dtype
                a_list.append(
                    _embed_eye(
                        compute_factor_a(spec, a, prec, fdt), bucket.da
                    )[None]
                )
                g_list.append(
                    _embed_eye(
                        compute_factor_g(spec, g, prec, fdt), bucket.dg
                    )[None]
                )
            else:  # grouped module: vmap over the group axis
                specs = payload
                s0 = specs[0]
                ng = s0.n_groups
                a = _get_path(acts, s0.path)["a"]
                g = _get_path(gs, s0.path)["p"]
                cg = a.shape[-1] // ng
                og = s0.out_dim
                # (B,H,W,g*cg) -> (g,B,H,W,cg); (B,oh,ow,g*og) -> (g,...,og)
                a_g = jnp.moveaxis(
                    a.reshape(a.shape[:-1] + (ng, cg)), -2, 0
                )
                g_g = jnp.moveaxis(
                    g.reshape(g.shape[:-1] + (ng, og)), -2, 0
                )
                fdt = self.config._factor_dtype
                fa = jax.vmap(
                    lambda ax: fops.compute_a_conv(
                        ax, s0.kernel_size, s0.strides, s0.padding,
                        s0.has_bias, precision=prec, dtype=fdt,
                    )
                )(a_g)
                fg = jax.vmap(
                    lambda gx: fops.compute_g_conv(gx, precision=prec,
                                                   dtype=fdt)
                )(g_g)
                a_list.append(_embed_eye_batched(fa, bucket.da))
                g_list.append(_embed_eye_batched(fg, bucket.dg))
        return jnp.concatenate(a_list), jnp.concatenate(g_list)

    def _stack_grads(self, bucket: Bucket, grads):
        rows = []
        for kind, payload in self._iter_row_blocks(bucket):
            if kind == "pad":
                rows.append(jnp.zeros((payload, bucket.dg, bucket.da)))
            elif kind == "single":
                spec = payload
                g2d = grad_to_2d(spec, _get_path(grads, spec.param_path))
                rows.append(_pad2d(g2d, bucket.dg, bucket.da)[None])
            else:
                specs = payload
                s0 = specs[0]
                node = _get_path(grads, s0.param_path)
                blk = _grouped_kernel_to_2d(node, s0)
                rows.append(_pad2d_batched(blk, bucket.dg, bucket.da))
        return jnp.concatenate(rows)

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
        """One bucketed K-FAC step.

        With ``axis`` set, must be called inside shard_map over that mesh
        axis: acts/gs are the device-local batch shard, grads are the
        (already pmean'd) replicated gradients, and the bucket arrays in
        ``state`` are the device-local blocks (leading dim L/world_size).
        ``config.strategy`` selects 'mpd' (factors pmean-averaged over the
        axis — the reference's factor allreduce) or 'dp' (each owner uses
        its local-batch factors — DP-KFAC, zero factor communication).
        """
        cfg = self.config
        damping = cfg.damping if damping is None else damping
        fac_freq = cfg.fac_update_freq if fac_update_freq is None else fac_update_freq
        inv_freq = cfg.kfac_update_freq if kfac_update_freq is None else kfac_update_freq
        step = state["step"]
        do_fac = (step % jnp.maximum(fac_freq, 1)) == 0
        do_inv = (step % jnp.maximum(inv_freq, 1)) == 0

        if isinstance(acts, dict) and COL_A in acts:
            acts = acts[COL_A]
        n_shards = self.world_size if axis is not None else 1

        new_buckets = []
        preds_full = []
        vg_sum = jnp.zeros((), jnp.float32)

        for b_idx, bucket in enumerate(self.buckets):
            st = state["buckets"][b_idx]
            entry = dict(st)
            L = bucket.n_rows
            blk = L // n_shards
            if axis is not None:
                offset = jax.lax.axis_index(axis) * blk
            else:
                offset = 0
            real_da = jnp.asarray(self._real_da[b_idx])
            real_dg = jnp.asarray(self._real_dg[b_idx])
            if axis is not None:
                real_da = jax.lax.dynamic_slice_in_dim(real_da, offset, blk)
                real_dg = jax.lax.dynamic_slice_in_dim(real_dg, offset, blk)

            # ---- (1) factors. dp has no factor collective, so the whole
            # compute is lax.cond-gated (skipped at TCov-amortized steps);
            # mpd's pmean must stay outside data-dependent control flow, so
            # it computes unconditionally and where-masks the EMA.
            if not cfg.exclude_compute_factor:
                has_comm = (
                    axis is not None
                    and cfg.strategy == "mpd"
                    and not cfg.exclude_communicate_factor
                )

                def fac_update(st=st, bucket=bucket, offset=offset, blk=blk,
                               has_comm=has_comm):
                    fresh_a, fresh_g = self._fresh_bucket_factors(
                        bucket, acts, gs
                    )
                    if has_comm:
                        fresh_a = jax.lax.pmean(fresh_a, axis)
                        fresh_g = jax.lax.pmean(fresh_g, axis)
                    if axis is not None:
                        fresh_a = jax.lax.dynamic_slice_in_dim(
                            fresh_a, offset, blk
                        )
                        fresh_g = jax.lax.dynamic_slice_in_dim(
                            fresh_g, offset, blk
                        )
                    return (
                        fops.ema_update(fresh_a, st["A"], cfg.factor_decay),
                        fops.ema_update(fresh_g, st["G"], cfg.factor_decay),
                    )

                if has_comm:
                    a_new, g_new = fac_update()
                    entry["A"] = jnp.where(do_fac, a_new, st["A"])
                    entry["G"] = jnp.where(do_fac, g_new, st["G"])
                else:
                    entry["A"], entry["G"] = jax.lax.cond(
                        do_fac, fac_update, lambda: (st["A"], st["G"])
                    )

            # ---- (2) inverse / eigendecomposition (cond-gated, local)
            if not cfg.exclude_compute_inverse:
                if cfg.inv_type == EIGEN:

                    def inv_update(entry=entry):
                        da_, qa = cfg.symeig(entry["A"])
                        dg_, qg = cfg.symeig(entry["G"])
                        return da_, qa, dg_, qg

                    entry["dA"], entry["QA"], entry["dG"], entry["QG"] = (
                        jax.lax.cond(
                            do_inv,
                            inv_update,
                            lambda: (st["dA"], st["QA"], st["dG"], st["QG"]),
                        )
                    )
                elif cfg.inv_type == PCG:
                    do_prec = (
                        step % jnp.maximum(cfg.pcg_precond_freq, 1)
                    ) == 0

                    def inv_update(entry=entry, real_da=real_da,
                                   real_dg=real_dg):
                        return pcg_ops.damped_cholesky_factors(
                            entry["A"], entry["G"], damping,
                            real_da=real_da, real_dg=real_dg,
                            dtype=cfg._pcg_dtype,
                        )

                    entry["cholA"], entry["cholG"] = jax.lax.cond(
                        do_prec, inv_update,
                        lambda: (st["cholA"], st["cholG"]),
                    )
                else:

                    def inv_update(entry=entry, real_da=real_da, real_dg=real_dg):
                        # pi from the *real* traces (identity padding adds
                        # (dim - real) to the raw trace; correct it).
                        tr_a = (
                            jnp.trace(entry["A"], axis1=-2, axis2=-1)
                            - (bucket.da - real_da)
                        ) / real_da
                        tr_g = (
                            jnp.trace(entry["G"], axis1=-2, axis2=-1)
                            - (bucket.dg - real_dg)
                        ) / real_dg
                        pi = jnp.sqrt(tr_a / tr_g)
                        sd = jnp.sqrt(damping)
                        inv_a = lops.cholesky_inverse(
                            entry["A"]
                            + (sd * pi)[:, None, None] * jnp.eye(bucket.da)
                        )
                        inv_g = lops.cholesky_inverse(
                            entry["G"]
                            + (sd / pi)[:, None, None] * jnp.eye(bucket.dg)
                        )
                        return inv_a, inv_g

                    entry["invA"], entry["invG"] = jax.lax.cond(
                        do_inv, inv_update, lambda: (st["invA"], st["invG"])
                    )

                # ---- (3) preconditioned gradients (batched)
                g2d_full = self._stack_grads(bucket, grads)
                g2d_my = (
                    jax.lax.dynamic_slice_in_dim(g2d_full, offset, blk)
                    if axis is not None
                    else g2d_full
                )
                if cfg.inv_type == EIGEN:
                    v_my = pops.precond_eigen(
                        g2d_my,
                        entry["QA"],
                        entry["dA"],
                        entry["QG"],
                        entry["dG"],
                        damping,
                        precision=cfg.precision,
                    )
                elif cfg.inv_type == PCG:
                    v_my = pcg_ops.pcg_kron_solve(
                        g2d_my, entry["A"], entry["G"], entry["cholA"],
                        entry["cholG"], damping, iters=cfg.pcg_iters,
                        precision=cfg.precision,
                    )
                else:
                    v_my = pops.precond_inverse(
                        g2d_my, entry["invA"], entry["invG"],
                        precision=cfg.precision,
                    )
                if axis is not None:
                    # the pred "broadcast" (reference inv.py:164-175)
                    v_full = jax.lax.all_gather(v_my, axis, axis=0, tiled=True)
                else:
                    v_full = v_my
                preds_full.append(v_full)
                if cfg.kl_clip is not None:
                    vg_sum = vg_sum + jnp.sum(v_full * g2d_full) * (lr**2)

            new_buckets.append(entry)

        # ---- (4) kl_clip + unstack into the grads pytree
        out = jax.tree_util.tree_map(lambda x: x, grads)
        if not cfg.exclude_compute_inverse:
            if cfg.kl_clip is not None and not cfg.exclude_communicate_inverse:
                nu = pops.kl_clip_nu(vg_sum, cfg.kl_clip)
            else:
                nu = jnp.ones((), jnp.float32)
            for bucket, v_full in zip(self.buckets, preds_full):
                pos = 0
                for kind, payload in self._iter_row_blocks(bucket):
                    if kind == "pad":
                        pos += payload
                    elif kind == "single":
                        spec = payload
                        v = v_full[pos][: spec.out_dim, : spec.grad_in_dim]
                        write_grad_2d(
                            _get_path(out, spec.param_path), spec, v * nu
                        )
                        pos += 1
                    else:  # grouped module: one batched write-back
                        s0 = payload[0]
                        ng = s0.n_groups
                        vb = v_full[pos : pos + ng][
                            :, : s0.out_dim, : s0.grad_in_dim
                        ]
                        _write_grouped_grad_2d(
                            _get_path(out, s0.param_path), s0, vb * nu
                        )
                        pos += ng

        return out, {"step": step + 1, "buckets": new_buckets}
