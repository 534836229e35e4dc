"""Unit tests of the pod-projection model (tools/project_pod.py) on
synthetic fits — the VERDICT-required validation layer for the projected
v5p north-star number (the reference's own modeling layer is
scripts/comm_models.py:8-50, equally fit-based)."""

import numpy as np
import pytest

from tools.project_pod import (
    comm_time_s,
    fit_inverse_scaling,
    fit_scaling,
    predict_inverse_scaling,
    predict_scaling,
    project,
    wire_bytes,
)


def test_fit_scaling_recovers_ring_law():
    ns = [2, 4, 8]
    c0, c1 = 3.0e6, 2.0e6
    vals = [c0 + c1 * (n - 1) / n for n in ns]
    f0, f1 = fit_scaling(ns, vals)
    assert np.isclose(f0, c0) and np.isclose(f1, c1)
    assert np.isclose(predict_scaling(f0, f1, 32), c0 + c1 * 31 / 32)


def test_fit_inverse_scaling_recovers_owner_only_law():
    ns = [1, 2, 4, 8]
    c0, c1 = 1.0e9, 8.0e9  # replicated remainder + 1/n-sharded factor work
    vals = [c0 + c1 / n for n in ns]
    f0, f1 = fit_inverse_scaling(ns, vals)
    assert np.isclose(f0, c0) and np.isclose(f1, c1)
    assert np.isclose(predict_inverse_scaling(f0, f1, 32), c0 + c1 / 32)


def test_wire_bytes_ring_factors():
    # ring all-reduce moves 2B(n-1)/n per device; gather/scatter B(n-1)/n
    assert wire_bytes("all-reduce", 1000, 4) == pytest.approx(1500.0)
    assert wire_bytes("all-gather", 1000, 4) == pytest.approx(750.0)
    assert wire_bytes("reduce-scatter", 1000, 4) == pytest.approx(750.0)
    assert wire_bytes("all-reduce", 1000, 1) == 0.0


def test_comm_time_alpha_beta():
    stats = {"all-reduce": (2, 1.0e9)}
    # 2 launches * 10us + 2*1GB*(7/8) / 100GB/s = 20us + 17.5ms
    t = comm_time_s(stats, 8, alpha_s=1e-5, bw_bytes_s=1e11)
    assert t == pytest.approx(2e-5 + 2 * 1.0e9 * (7 / 8) / 1e11)


def _synthetic_measured():
    """dp: owner-only factor flops (1/n) + constant pred all-gather bytes
    law; mpd: replicated inverse flops at 1/n but a big factor allreduce."""
    grad_bytes = 100e6  # grad allreduce payload (n-independent)
    factor_bytes = 300e6
    pred_full = 25e6  # gathered output payload (n-independent in HLO form)
    sgd_flops = 4e9
    kfac_flops = 12e9  # single-device K-FAC-added dot flops

    def sgd(n):
        c = {"all-reduce": [1, grad_bytes]} if n > 1 else {}
        return {"collectives": c, "dot_flops": sgd_flops}

    def dp(n):
        c = {}
        if n > 1:
            c = {"all-reduce": [1, grad_bytes],
                 "all-gather": [1, pred_full]}
        return {"collectives": c,
                "dot_flops": sgd_flops + kfac_flops / n}

    def mpd(n):
        c = {}
        if n > 1:
            c = {"all-reduce": [2, grad_bytes + factor_bytes],
                 "all-gather": [1, pred_full]}
        # factor compute replicated (local-batch Grams on every device),
        # inverse round-robined: model as half replicated, half 1/n
        return {"collectives": c,
                "dot_flops": sgd_flops + kfac_flops * (0.5 + 0.5 / n)}

    ns = [1, 2, 4, 8]
    return {
        "sgd": {n: sgd(n) for n in ns},
        "dp": {n: dp(n) for n in ns},
        "mpd": {n: mpd(n) for n in ns},
    }


def test_project_dp_beats_mpd_and_amortizes_with_n():
    rows = project(
        _synthetic_measured(),
        t_sgd_1dev=0.024, t_kfac_1dev=0.040, t_fixed=0.004,
        alpha_s=3e-6, bw_bytes_s=1e11, targets=(8, 16, 32),
    )
    by = {(r["strategy"], r["n"]): r for r in rows}
    # dp's overhead must beat mpd's at every n (no factor allreduce AND
    # fully sharded factor flops — the TCC'22 claim in model form)
    for n in (8, 16, 32):
        assert by[("dp", n)]["overhead"] < by[("mpd", n)]["overhead"]
    # owner-only sharding amortizes the added compute as n grows
    assert (by[("dp", 32)]["kfac_added_comp_ms"]
            < by[("dp", 8)]["kfac_added_comp_ms"])
    # hand-check dp@8: flops ratio (12e9/8)/12e9 = 1/8;
    # comp = 4ms fixed + 12ms*(1/8); comm = 2a + wire/bw
    wire = (2 * 100e6 * (7 / 8) + 25e6 * (7 / 8)) / 1e11
    t_kfac = 0.024 + 0.004 + 0.012 / 8 + 2 * 3e-6 + wire
    t_sgd = 0.024 + 1 * 3e-6 + 2 * 100e6 * (7 / 8) / 1e11
    assert by[("dp", 8)]["overhead"] == pytest.approx(
        t_kfac / t_sgd, rel=1e-3)


def test_project_requires_single_device_anchor():
    m = _synthetic_measured()
    del m["dp"][1]
    with pytest.raises(ValueError):
        project(m, 0.024, 0.040, 0.004, 3e-6, 1e11)
