"""Collective-traffic analysis (tools/comm_volume.py).

Parsing is unit-tested on hand-written HLO; the integration test compiles
the sharded step on the simulated mesh and checks the DP-KFAC comm claim —
dp's K-FAC-added traffic (pred all-gather only) is several times smaller
than mpd's (factor allreduce), reference inv_dp.py:93-95 vs inv.py:94-103.
"""

import numpy as np

from tools.comm_volume import _shape_bytes, build_step, collective_stats


HLO_SNIPPET = """
ENTRY %main {
  %x = f32[8,16]{1,0} parameter(0)
  %ar = f32[8,16]{1,0} all-reduce(%x), replica_groups={}, to_apply=%add
  %t = (f32[4]{0}, bf16[2,2]{1,0}) all-reduce.1(%a, %b), to_apply=%add
  %ag = f32[64,16]{1,0} all-gather(%x), dimensions={0}
  %s = f32[8,16]{1,0} all-reduce-start(%x), to_apply=%add
  %d = f32[8,16]{1,0} all-reduce-done(%s)
  %gte = f32[4]{0} get-tuple-element(%t), index=0
}
"""


def test_shape_bytes():
    assert _shape_bytes("f32[8,16]{1,0}") == 8 * 16 * 4
    assert _shape_bytes("(f32[4]{0}, bf16[2,2]{1,0})") == 16 + 8
    assert _shape_bytes("f32[]") == 4


def test_collective_stats_parses_variadic_and_async():
    stats = collective_stats(HLO_SNIPPET)
    # three counted all-reduces (sync, variadic, -start); -done excluded
    cnt, byt = stats["all-reduce"]
    assert cnt == 3
    assert byt == 512 + (16 + 8) + 512
    cnt, byt = stats["all-gather"]
    assert cnt == 1 and byt == 64 * 16 * 4


def test_dp_kfac_moves_less_than_mpd():
    import jax

    results = {}
    for strategy in ("sgd", "dp", "mpd"):
        step, state, data, scalars = build_step(
            "resnet20", strategy, 8, batch=2, image=16, classes=10
        )
        hlo = jax.jit(step).lower(state, data, scalars).compile().as_text()
        results[strategy] = sum(
            b for _, b in collective_stats(hlo).values()
        )
    sgd, dp, mpd = results["sgd"], results["dp"], results["mpd"]
    assert sgd > 0  # the gradient allreduce exists
    added_dp, added_mpd = dp - sgd, mpd - sgd
    assert 0 < added_dp  # the pred all-gather exists
    # the factor allreduce dominates mpd's added traffic
    assert added_mpd > 3 * added_dp
