"""Tests for the block partitioner and factor bucketing."""

import importlib.util
import itertools
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import kfac_pytorch_tpu as ktpu
from kfac_pytorch_tpu.models import get_model
from kfac_pytorch_tpu.parallel.partition import (
    block_partition,
    make_buckets,
    per_worker_load,
)


def _brute_force_bottleneck(weights, p):
    """Optimal contiguous-partition bottleneck by exhaustive cut search."""
    n = len(weights)
    best = float("inf")
    for cuts in itertools.combinations(range(1, n), min(p, n) - 1):
        bounds = [0, *cuts, n]
        bn = max(
            sum(weights[a:b]) for a, b in zip(bounds[:-1], bounds[1:])
        )
        best = min(best, bn)
    return best


@pytest.mark.parametrize("seed,n,p", [(0, 10, 3), (1, 12, 4), (2, 8, 5), (3, 15, 2)])
def test_block_partition_is_optimal(seed, n, p):
    rng = np.random.RandomState(seed)
    w = rng.rand(n) * 10
    placement = block_partition(w, p)
    # contiguity + validity
    assert placement.min() >= 0 and placement.max() < p
    assert (np.diff(placement) >= 0).all()
    got = per_worker_load(w, placement, p).max()
    want = _brute_force_bottleneck(list(w), p)
    assert got <= want + 1e-9


def test_block_partition_matches_reference_bottleneck():
    """Same optimal bottleneck as the reference's DP prototype on its
    ResNet-50 demo workload (scripts/dp_block_partition.py:89-98)."""
    path = "/root/reference/scripts/dp_block_partition.py"
    if not os.path.isfile(path):
        pytest.skip("reference unavailable")
    spec = importlib.util.spec_from_file_location("_ref_dp", path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    rng = np.random.RandomState(0)
    for n, p in [(108, 32), (54, 8), (40, 7)]:
        w = rng.rand(n) * 100
        ref_placement = ref.get_optimal_block_partition(n, p, w)
        ref_bn = per_worker_load(w, ref_placement, p).max()
        got_bn = per_worker_load(w, block_partition(w, p), p).max()
        assert got_bn <= ref_bn + 1e-6


def test_block_partition_edge_cases():
    assert list(block_partition([], 4)) == []
    assert list(block_partition([1.0, 2.0], 4)) == [0, 1]
    p = block_partition([5, 5, 5, 5], 2)
    assert per_worker_load([5, 5, 5, 5], p, 2).max() == 10


def test_native_partition_matches_python():
    """C++ scheduler (native/partition.cpp via ctypes) must match the pure
    Python optimum. Skipped when the shared lib isn't built."""
    from kfac_pytorch_tpu.parallel import _native_partition as nat
    import kfac_pytorch_tpu.parallel.partition as pp

    if not nat.available():
        pytest.skip("native partition lib not built (make -C native)")
    rng = np.random.RandomState(7)
    for n, p in [(54, 8), (108, 32), (20, 6)]:
        w = rng.rand(n) * 100
        nat_bn = per_worker_load(w, nat.block_partition(w, p), p).max()
        old = pp._HAVE_NATIVE
        pp._HAVE_NATIVE = False
        try:
            py_bn = per_worker_load(w, pp.block_partition(w, p), p).max()
        finally:
            pp._HAVE_NATIVE = old
        assert abs(nat_bn - py_bn) < 1e-6


def test_make_buckets_covers_all_layers():
    model = get_model("imagenet-resnet50")
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    specs, _ = ktpu.setup_kfac(
        model,
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        x, train=True,
    )
    for ws in (1, 8):
        buckets = make_buckets(specs, world_size=ws)
        seen = [r for b in buckets for r in b.rows if r >= 0]
        assert sorted(seen) == list(range(len(specs)))
        for b in buckets:
            assert b.n_rows % ws == 0
            for r in b.rows:
                if r >= 0:
                    assert specs[r].grad_in_dim <= b.da
                    assert specs[r].out_dim <= b.dg


def test_pack_buckets_merges_small_keeps_large():
    """Cost-model merging: dispatch-floor buckets merge; merging small
    buckets into a 4608-wide block is rejected (padded FLOPs + HBM traffic
    exceed the dispatch saving — the round-1 'blanket merging loses'
    measurement, BENCH_NOTES.md)."""
    from kfac_pytorch_tpu.capture import LayerSpec
    from kfac_pytorch_tpu.parallel.partition import pack_buckets

    def spec(d_in, d_out):
        return LayerSpec(
            path=(f"l{d_in}x{d_out}",), kind="DENSE", in_dim=d_in,
            out_dim=d_out, has_bias=False,
        )

    # several tiny shapes + one large shape (RN50's 4608/512 block)
    specs = (
        [spec(64, 64) for _ in range(3)]
        + [spec(64, 128), spec(128, 64), spec(144, 64)]
        + [spec(4608, 512) for _ in range(3)]
    )
    buckets = make_buckets(specs, world_size=1, dim_align=8)
    n_before = len(buckets)
    assert n_before >= 5
    packed = pack_buckets(
        buckets, specs, world_size=1,
        flop_rate=2.0e14, dispatch_cost=1.0e-4, iters=5.0,
        hbm_rate=8.0e11,
    )
    # coverage preserved
    seen = sorted(r for b in packed for r in b.rows if r >= 0)
    assert seen == list(range(len(specs)))
    # small buckets merged...
    assert len(packed) < n_before
    # ...but nothing merged INTO the 4608-dim bucket (it stays 3 rows)
    big = [b for b in packed if b.da >= 4608]
    assert len(big) == 1 and sum(1 for r in big[0].rows if r >= 0) == 3
    # and no small bucket was padded anywhere near the large dims
    for b in packed:
        if b is not big[0]:
            assert b.da <= 1024


def test_pack_buckets_hbm_term_blocks_bandwidth_bound_merge():
    """With a pure-FLOP model (hbm_rate=inf) a merge can look free even
    when it multiplies HBM traffic; the bandwidth term must veto it."""
    from kfac_pytorch_tpu.capture import LayerSpec
    from kfac_pytorch_tpu.parallel.partition import pack_buckets

    def spec(d_in, d_out):
        return LayerSpec(
            path=(f"s{d_in}x{d_out}",), kind="DENSE", in_dim=d_in,
            out_dim=d_out, has_bias=False,
        )

    # many rows of a small shape + a medium shape: merging pads 40 rows of
    # 64x64 (traffic ~40*3*512^2 bytes) for one saved dispatch
    specs = [spec(64, 64) for _ in range(40)] + [spec(512, 512)] * 2
    buckets = make_buckets(specs, world_size=1, dim_align=8)
    assert len(buckets) == 2
    # generous dispatch saving but finite bandwidth: traffic veto expected
    packed = pack_buckets(
        buckets, specs, world_size=1,
        flop_rate=1.0e18, dispatch_cost=2.0e-5, iters=5.0,
        hbm_rate=8.0e11,
    )
    assert len(packed) == 2
    # with infinite bandwidth the same merge goes through
    packed_inf = pack_buckets(
        buckets, specs, world_size=1,
        flop_rate=1.0e18, dispatch_cost=2.0e-5, iters=5.0,
        hbm_rate=1.0e30,
    )
    assert len(packed_inf) == 1
