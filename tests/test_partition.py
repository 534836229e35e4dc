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
