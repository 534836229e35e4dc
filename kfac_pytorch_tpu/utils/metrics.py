"""Metrics and stage timers.

Parity: the reference's allreduce-averaged Metric (examples/utils.py:39-52)
and the manual per-phase wall-clock timers printed under SPEED mode
(pytorch_cifar10_resnet.py:289-343).
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


class Metric:
    """Running average of a scalar; mean-reduced over a mesh axis when the
    value is produced inside pjit (the allreduce happens in the traced
    program — callers just feed device arrays)."""

    def __init__(self, name: str):
        self.name = name
        self.total = 0.0
        self.n = 0

    def update(self, value, weight: int = 1):
        self.total += float(value) * weight
        self.n += weight

    @property
    def avg(self) -> float:
        return self.total / max(self.n, 1)


class StageTimers:
    """Wall-clock timers for the reference's IO/FW-BW/COMM/KFAC/UPDATE
    breakdown. ``block=True`` inserts a device sync (block_until_ready) so
    the timing is honest on an async backend."""

    def __init__(self, block: bool = True):
        self.block = block
        self.times: Dict[str, list] = defaultdict(list)
        self._t0: Dict[str, float] = {}

    def start(self, key: str):
        self._t0[key] = time.perf_counter()

    def stop(self, key: str, sync_on=None):
        if self.block and sync_on is not None:
            jax.block_until_ready(sync_on)
        self.times[key].append(time.perf_counter() - self._t0[key])

    def summary(self, last_n: Optional[int] = None) -> Dict[str, float]:
        out = {}
        for k, v in self.times.items():
            vals = v[-last_n:] if last_n else v
            out[k] = float(np.mean(vals)) if vals else 0.0
        return out

    def reset(self):
        self.times.clear()


def topk_accuracy(logits, labels, k: int = 1):
    """Top-k accuracy (reference examples/utils.py:6-9 is top-1)."""
    if k == 1:
        return jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
    topk = jax.lax.top_k(logits, k)[1]
    hit = jnp.any(topk == labels[:, None], axis=-1)
    return jnp.mean(hit.astype(jnp.float32))
