"""Load and apply on-chip calibration of the measured dispatch constants.

The 'auto' dispatch policies and the bucket-merge cost model carry
constants measured on a v5e (the development chip): the Pallas patch-cov
crossover ``rows >= 70*c`` (ops/factors.resolve_a_conv_impl), the auto-bf16
im2col byte threshold (ops/factors._AUTO_BF16_MIN_BYTES), and the
merge-rate constants (preconditioner.production_block_kwargs). On a
different TPU generation those numbers shift with the MXU/HBM balance.
``tools/calibrate.py`` re-measures them on the current chip and writes a
JSON; this module applies it.

The reference's analogue is the offline alpha-beta cost-model fitting of
NCCL/compute logs (/root/reference/scripts/comm_models.py:8-50) — there the
constants lived in scripts and were pasted by hand; here they round-trip
through one file.

JSON schema (all keys optional):
  {"pallas_rows_per_c": float, "auto_bf16_min_bytes": float,
   "merge_flop_rate": float, "merge_dispatch_cost": float,
   "merge_hbm_rate": float,
   "meta": {...measurement provenance, ignored...}}

Default search path: $KFAC_CALIBRATION, else ./calibration.json relative
to the current working directory. bench.py and the harnesses call
``apply_calibration()`` at startup.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

MERGE_KEYS = ("merge_flop_rate", "merge_dispatch_cost", "merge_hbm_rate")


def find_calibration(path: Optional[str] = None) -> Optional[str]:
    cand = path or os.environ.get("KFAC_CALIBRATION") or "calibration.json"
    return cand if os.path.isfile(cand) else None


def load_calibration(path: Optional[str] = None) -> Dict[str, Any]:
    found = find_calibration(path)
    if not found:
        return {}
    with open(found) as f:
        data = json.load(f)
    if not isinstance(data, dict):
        raise ValueError(f"calibration file {found} must hold a JSON object")
    return data


def apply_calibration(path: Optional[str] = None) -> Dict[str, Any]:
    """Apply a calibration file (if present) to the dispatch constants and
    return its contents (incl. merge-rate overrides for BlockKFAC). Absent
    file = no-op, returns {} — the v5e-measured defaults stand."""
    data = load_calibration(path)
    if data:
        from kfac_pytorch_tpu.ops import factors as fops

        fops.set_dispatch_constants(
            rows_per_c=data.get("pallas_rows_per_c"),
            auto_bf16_bytes=data.get("auto_bf16_min_bytes"),
        )
    return data


def merge_kwargs_from(data: Dict[str, Any]) -> Dict[str, float]:
    """The BlockKFAC merge-constant overrides present in a calibration."""
    return {k: float(data[k]) for k in MERGE_KEYS if k in data}
