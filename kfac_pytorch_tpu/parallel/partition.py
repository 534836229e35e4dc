"""Layer -> device-block partitioning and factor bucketing.

Two pieces:

1. ``block_partition``: optimal contiguous assignment of N weighted tasks to
   P workers minimizing the bottleneck (max per-worker load). The reference
   ships this as an offline prototype (/root/reference/scripts/
   dp_block_partition.py:11-76, an O(N*P) dynamic program); here it is a
   production scheduler implemented instead via binary search on the
   bottleneck + greedy feasibility (O(N log(sum/eps))), used to pack
   heterogeneous factor buckets onto the mesh.

2. ``make_buckets``: groups K-FAC layers into same-(padded-)dimension
   buckets so factor EMAs, eigendecompositions, and preconditioning run as
   *batched* ops over a stacked leading axis — the axis that is sharded over
   the mesh (the TPU-native replacement for the reference's per-layer rank
   round-robin, kfac_preconditioner_inv.py:62-77). Within a bucket all rows
   cost the same (dims padded to the bucket max), so load balance is exact
   by construction; the row count is padded to a multiple of the shard count.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple

import numpy as np

from kfac_pytorch_tpu.capture import LayerSpec

# optional native implementation (C++: native/partition.cpp)
try:  # pragma: no cover - exercised when the native lib is built
    from kfac_pytorch_tpu.parallel import _native_partition

    _HAVE_NATIVE = _native_partition.available()
except Exception:  # pragma: no cover
    _native_partition = None
    _HAVE_NATIVE = False


def _feasible(weights: np.ndarray, cap: float, p: int) -> bool:
    """Can the sequence be split into <= p contiguous blocks of sum <= cap?"""
    blocks, load = 1, 0.0
    for w in weights:
        if w > cap:
            return False
        if load + w > cap:
            blocks += 1
            load = w
            if blocks > p:
                return False
        else:
            load += w
    return True


def block_partition(weights: Sequence[float], p: int) -> np.ndarray:
    """Optimal contiguous block partition: returns worker id per task.

    Minimizes the bottleneck (max per-worker total weight) over contiguous
    assignments; same objective as the reference's DP prototype, different
    algorithm (parametric binary search).
    """
    w = np.asarray(weights, dtype=np.float64)
    n = len(w)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if n <= p:
        return np.arange(n, dtype=np.int64)
    if _HAVE_NATIVE:
        return _native_partition.block_partition(w, p)

    lo, hi = float(w.max()), float(w.sum())
    # binary search to within a relative tolerance, then tighten exactly:
    # candidate bottlenecks are partial sums, so refine with a final greedy.
    for _ in range(64):
        mid = 0.5 * (lo + hi)
        if _feasible(w, mid, p):
            hi = mid
        else:
            lo = mid
    cap = hi * (1 + 1e-12)

    placement = np.zeros(n, dtype=np.int64)
    worker, load = 0, 0.0
    for i in range(n):
        if load + w[i] > cap and load > 0.0:
            worker += 1
            load = 0.0
        placement[i] = min(worker, p - 1)
        load += w[i]
    # spread trailing tasks if workers are left idle (mirrors the reference's
    # fill-in pass, dp_block_partition.py:68-74)
    used = placement[-1] + 1
    if used < p:
        for i in range(n - 1, 0, -1):
            if used >= p:
                break
            if placement[i] == placement[i - 1]:
                placement[i:] += 1
                used += 1
    return placement


def per_worker_load(weights, placement, p: int) -> np.ndarray:
    load = np.zeros(p)
    for w_i, r in zip(weights, placement):
        load[r] += w_i
    return load


# --------------------------------------------------------------------------
# Factor bucketing
# --------------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class Bucket:
    """A group of K-FAC layers processed as one batched, shard-able block.

    rows: L_pad entries; entry i is a spec index or -1 (padding row).
    da/dg: padded factor dims (A includes the bias column when present).
    """

    rows: Tuple[int, ...]
    da: int
    dg: int

    @property
    def n_rows(self) -> int:
        return len(self.rows)


def _shape_key(s: LayerSpec):
    """Rows with equal keys have identically-shaped parameter arrays, so the
    gradient stack/unstack can run as ONE batched op over the run instead of
    per-layer ops (the dispatch-tail fix, BENCH_NOTES round 1). Grouped-conv
    rows of one module sort contiguously in group order (required by
    _iter_row_blocks)."""
    return (
        s.kind,
        s.kernel_size,
        s.in_dim,
        s.out_dim,
        int(s.has_bias),
        s.n_groups,
        s.path,
        s.group_idx,
    )


def make_buckets(
    specs: Sequence[LayerSpec],
    world_size: int,
    dim_align: int = 8,
    merge_flop_rate: float = 0.0,
    merge_dispatch_cost: float = 0.0,
    merge_hbm_rate: float = 8.0e11,
) -> List[Bucket]:
    """Group layers into same-padded-dim buckets, row-padded to world_size.

    Grouping key is the (aligned dA, aligned dG) pair — ResNet-family models
    repeat a handful of factor shapes many times, so buckets are large and
    identity-padding waste is small. Rows within a bucket are interchangeable
    (uniform cost), so the contiguous device blocks are balanced exactly.
    Within a bucket rows are ordered by parameter shape so equal-shape runs
    stack/unstack as single batched ops.

    merge_flop_rate / merge_dispatch_cost (both > 0 to enable) turn on
    cost-model bucket packing: buckets are greedily merged (padding rows up
    to the merged dims — identity padding keeps the math exact) whenever the
    estimated per-step dispatch saving of one fewer bucket exceeds the extra
    padded-matmul FLOP time. This is the production version of the
    reference's offline bottleneck partitioner idea
    (/root/reference/scripts/dp_block_partition.py:11-76): a measured cost
    model deciding how curvature work is packed, instead of uniform
    round-robin. See pack_buckets for the model.
    """
    groups: Dict[Tuple[int, int], List[int]] = {}
    for i, s in enumerate(specs):
        key = (_round_up(s.grad_in_dim, dim_align), _round_up(s.out_dim, dim_align))
        groups.setdefault(key, []).append(i)

    buckets = []
    for (da, dg), idxs in sorted(groups.items()):
        idxs = sorted(idxs, key=lambda i: _shape_key(specs[i]))
        n_pad = _round_up(len(idxs), world_size)
        rows = tuple(idxs) + (-1,) * (n_pad - len(idxs))
        buckets.append(Bucket(rows=rows, da=da, dg=dg))
    if merge_flop_rate > 0.0 and merge_dispatch_cost > 0.0:
        buckets = pack_buckets(
            buckets, specs, world_size,
            flop_rate=merge_flop_rate,
            dispatch_cost=merge_dispatch_cost,
            hbm_rate=merge_hbm_rate,
        )
    return buckets


def _bucket_real_rows(bucket: Bucket) -> int:
    return sum(1 for r in bucket.rows if r >= 0)


def _precond_flops(n_rows: int, da: int, dg: int,
                   iters: float = 6.0) -> float:
    """Per-STEP preconditioning matmul FLOPs of one bucket: ~2 GEMM
    applications of (dg x dg)(dg x da) + (dg x da)(da x da) per row per CG
    iteration, times the iteration count — the same horizon the per-bucket
    dispatch cost is calibrated over (round-2 fix: counting flops for one
    iteration against a whole-step dispatch cost over-merged 6x)."""
    return 4.0 * n_rows * da * dg * (da + dg) * iters


def _precond_bytes(n_rows: int, da: int, dg: int,
                   iters: float = 6.0) -> float:
    """Per-STEP HBM traffic of one bucket's CG stage (f32): each iteration
    re-reads the two per-row preconditioner matrices (da^2 + dg^2) and
    streams ~2 copies of the (dg x da) iterate. The batched per-row GEMMs
    have low arithmetic intensity (~min(da,dg) flops/byte), so small-dim
    buckets are bandwidth-bound — a pure-FLOP model calls padded merges
    free when they triple the traffic (the round-1 'blanket merging loses'
    measurement)."""
    return 4.0 * n_rows * (da * da + dg * dg + 2.0 * da * dg) * iters


def pack_buckets(
    buckets: List[Bucket],
    specs: Sequence[LayerSpec],
    world_size: int,
    *,
    flop_rate: float,
    dispatch_cost: float,
    iters: float = 6.0,
    hbm_rate: float = 8.0e11,
) -> List[Bucket]:
    """Greedy cost-model bucket merging.

    Each bucket costs ``dispatch_cost`` seconds of fixed per-step overhead
    (the measured per-bucket op-dispatch tail: conds, CG bookkeeping, EMA,
    stack bookkeeping) plus its matmul FLOPs at ``flop_rate`` FLOP/s.
    Merging two buckets pads every row to the elementwise-max dims; merge is
    taken when the dispatch saving exceeds the padded-FLOP cost. Small
    (1x1-conv-sized) buckets merge; large natural buckets stay separate —
    exactly the behavior round-1 measurement demanded (BENCH_NOTES:
    dim_align=512 blanket merging lost to padding FLOPs).
    """
    buckets = list(buckets)
    while len(buckets) > 1:
        best = None
        for i in range(len(buckets)):
            for j in range(i + 1, len(buckets)):
                bi, bj = buckets[i], buckets[j]
                da, dg = max(bi.da, bj.da), max(bi.dg, bj.dg)
                ni, nj = _bucket_real_rows(bi), _bucket_real_rows(bj)
                cost_now = (
                    (_precond_flops(ni, bi.da, bi.dg, iters)
                     + _precond_flops(nj, bj.da, bj.dg, iters)) / flop_rate
                    + (_precond_bytes(ni, bi.da, bi.dg, iters)
                       + _precond_bytes(nj, bj.da, bj.dg, iters)) / hbm_rate
                    + 2 * dispatch_cost
                )
                cost_merged = (
                    _precond_flops(ni + nj, da, dg, iters) / flop_rate
                    + _precond_bytes(ni + nj, da, dg, iters) / hbm_rate
                    + dispatch_cost
                )
                gain = cost_now - cost_merged
                if gain > 0 and (best is None or gain > best[0]):
                    best = (gain, i, j, da, dg)
        if best is None:
            break
        _, i, j, da, dg = best
        rows = tuple(
            r for r in buckets[i].rows + buckets[j].rows if r >= 0
        )
        rows = tuple(sorted(rows, key=lambda r: _shape_key(specs[r])))
        n_pad = _round_up(len(rows), world_size)
        rows = rows + (-1,) * (n_pad - len(rows))
        merged = Bucket(rows=rows, da=da, dg=dg)
        buckets = [
            b for k, b in enumerate(buckets) if k not in (i, j)
        ] + [merged]
    return sorted(buckets, key=lambda b: (b.da, b.dg))


def bucket_eigh_cost(bucket: Bucket) -> float:
    """Relative eigendecomposition cost of one bucket row (d^3 model, the
    same cost model the reference fits offline, scripts/inverse_model.py)."""
    return float(bucket.da**3 + bucket.dg**3)
