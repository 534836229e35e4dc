"""Tests for the analysis tools (log parser, cost models)."""

import json

import numpy as np

from tools.cost_models import fit_alpha_beta, fit_cubic, predict_cubic
from tools.parse_logs import EPOCH_RE, ITER_RE, parse


def test_fit_alpha_beta_recovers_model():
    rng = np.random.RandomState(0)
    sizes = np.array([1e3, 1e4, 1e5, 1e6, 1e7])
    alpha, beta = 5e-5, 2e-9
    times = alpha + beta * sizes + rng.randn(5) * 1e-7
    a, b = fit_alpha_beta(sizes, times)
    assert abs(a - alpha) / alpha < 0.1
    assert abs(b - beta) / beta < 0.01


def test_fit_cubic_recovers_model():
    dims = np.array([128, 256, 512, 1024, 2048])
    alpha, gamma = 1e-3, 2e-12
    times = alpha + gamma * dims.astype(float) ** 3
    a, g = fit_cubic(dims, times)
    assert abs(predict_cubic(a, g, 4608) - (alpha + gamma * 4608**3)) < 1e-4


def test_parse_logs(tmp_path):
    log = tmp_path / "run.log"
    log.write_text(
        "2026-01-01 x train_cifar iter 10: io 0.0030s step 0.1200s\n"
        "2026-01-01 x train_cifar iter 20: io 0.0031s step 0.0450s\n"
        "2026-01-01 x train_cifar epoch 0: train loss 1.5000 acc 0.4500 | "
        "val loss 1.6000 acc 0.4200 | lr 0.1000 damping 0.03\n"
        "2026-01-01 x train_cifar epoch 1: train loss 1.1000 acc 0.6000 | "
        "val loss 1.2000 acc 0.5800 | lr 0.1000 damping 0.03\n"
        "2026-01-01 x timer summary: {'io': 0.003, 'step': 0.05}\n"
    )
    parsed = parse(str(log))
    assert len(parsed["epochs"]) == 2
    assert parsed["epochs"][1]["val_acc"] == 0.58
    assert len(parsed["iters"]) == 2
    assert parsed["iters"][0]["step"] == 0.12
    assert parsed["summary"]["step"] == 0.05
