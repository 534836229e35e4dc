#!/usr/bin/env python
"""Measure the 'auto' dispatch + bucket-merge cost-model constants on the
CURRENT chip and emit a calibration JSON.

The framework ships v5e-measured defaults for three families of constants
(round-3 VERDICT: "single-chip magic numbers"):

  * pallas_rows_per_c — the fused Pallas patch-covariance kernel wins
    where patch-materialization traffic dominates (many patch rows over
    few channels); dispatch gate rows >= K*c (ops/factors.py).
  * auto_bf16_min_bytes — factor_dtype='auto' casts covariance-GEMM inputs
    to bf16 only when the materialized row matrix is large enough that the
    halved traffic beats the extra cast op.
  * merge_flop_rate / merge_dispatch_cost / merge_hbm_rate — the bucket
    merge model (parallel/partition.pack_buckets): merge two buckets when
    one fewer bucket's fixed per-kernel cost beats the padded FLOP + HBM
    time.

Run ON THE TARGET CHIP (the measurements are meaningless on CPU, though
the tool runs there for plumbing tests):

    python tools/calibrate.py -o calibration.json

bench.py and production_block_kwargs() pick the file up automatically
(utils/calibration.py; $KFAC_CALIBRATION overrides the path). Reference
analogue: the offline alpha-beta cost-model fits of
/root/reference/scripts/comm_models.py:8-50.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _setup_jax():
    import jax

    from kfac_pytorch_tpu.utils.platform import ensure_platform_from_env

    ensure_platform_from_env()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def measure_pallas_crossover(jax, batch=32, quick=False):
    """Time XLA vs Pallas A-factor covariance over rows/c regimes; return
    the geometric-middle rows/c crossover (None when Pallas never wins or
    is unsupported on this backend)."""
    import jax.numpy as jnp

    from kfac_pytorch_tpu.ops import factors as fops
    from tools.bench_ops import _timeit

    geoms = [(56, 64), (28, 128), (14, 256)] if quick else [
        (56, 64), (28, 128), (14, 256), (7, 512)
    ]
    rng = np.random.RandomState(0)
    rows_c = []
    for hw, c in geoms:
        a = jnp.asarray(rng.randn(batch, hw, hw, c).astype(np.float32))
        rc = batch * hw * hw / c  # SAME-padded 3x3 stride-1: oh*ow = hw*hw
        times = {}
        for impl in ("xla", "pallas"):
            resolved = fops.resolve_a_conv_impl(
                a.shape, (3, 3), (1, 1), ((1, 1), (1, 1)), impl
            )
            if impl == "pallas" and resolved != "pallas":
                times[impl] = None
                continue
            times[impl] = _timeit(
                lambda x: fops.compute_a_conv(
                    x, (3, 3), (1, 1), ((1, 1), (1, 1)), True,
                    impl=resolved,
                ),
                a,
            )
        win = times["pallas"] is not None and times["pallas"] < times["xla"]
        rows_c.append((rc, win, times))
        print(f"#   hw={hw} c={c} rows/c={rc:.1f} xla={times['xla']}"
              f" pallas={times['pallas']} -> {'pallas' if win else 'xla'}",
              file=sys.stderr)
    wins = [rc for rc, w, _ in rows_c if w]
    losses = [rc for rc, w, _ in rows_c if not w]
    if not wins:
        return None, rows_c
    lo = max(min(wins), max((r for r in losses if r < min(wins)),
                            default=min(wins) / 8))
    # geometric middle between the smallest winning and largest losing
    # ratio below it (the measured regimes are ~8x apart)
    hi = min(wins)
    return float(np.sqrt(lo * hi)), rows_c


def measure_auto_bf16_threshold(jax, cols=147, quick=False):
    """Smallest row-matrix bytes where bf16 GEMM inputs beat f32 by >10%."""
    import jax.numpy as jnp

    from tools.bench_ops import _timeit

    sizes = [16e6, 64e6] if quick else [8e6, 32e6, 64e6, 128e6, 256e6]
    rng = np.random.RandomState(1)
    first_win, last_loss = None, None
    for bytes_ in sizes:
        rows = int(bytes_ / 4 / cols)
        v = jnp.asarray(rng.randn(rows, cols).astype(np.float32))

        def gram(x, dt):
            xc = x.astype(dt)
            return jnp.matmul(xc.T, xc,
                              preferred_element_type=jnp.float32)

        t32 = _timeit(lambda x: gram(x, jnp.float32), v)
        t16 = _timeit(lambda x: gram(x, jnp.bfloat16), v)
        win = t16 < 0.9 * t32
        print(f"#   bytes={bytes_:.0e} rows={rows} f32={t32:.4f}"
              f" bf16={t16:.4f} -> {'bf16' if win else 'f32'}",
              file=sys.stderr)
        if win and first_win is None:
            first_win = bytes_
        if not win:
            last_loss = bytes_
    if first_win is None:
        return None
    if last_loss is not None and last_loss < first_win:
        return float(np.sqrt(last_loss * first_win))
    return float(first_win)


def measure_merge_constants(jax, quick=False):
    """Achieved batched-GEMM FLOP rate, per-kernel fixed cost, HBM rate."""
    import functools
    import time

    import jax.numpy as jnp

    from tools.bench_ops import _timeit

    rng = np.random.RandomState(2)
    # FLOP rate: bucket-shaped batched matmul (default precision = the
    # merge model's regime)
    n = 1024 if quick else 2048
    m = jnp.asarray(rng.randn(4, n, n).astype(np.float32))
    t = _timeit(lambda x: jnp.matmul(x, x), m)
    flop_rate = 2 * 4 * n**3 / t

    # HBM rate: elementwise pass over a large buffer (read + write)
    big = jnp.asarray(
        rng.randn(8_000_000 if quick else 64_000_000).astype(np.float32)
    )
    t = _timeit(lambda x: x * 1.000001 + 1e-9, big)
    hbm_rate = 2 * big.nbytes / t

    # per-kernel fixed cost: slope of program time in op count for small
    # independent matmuls (they cannot fuse — distinct operands)
    def many(k):
        ops = [
            jnp.asarray(rng.randn(64, 64).astype(np.float32))
            for _ in range(k)
        ]

        @jax.jit
        def run(xs):
            return sum(jnp.sum(jnp.matmul(x, x)) for x in xs)

        run(ops)  # compile
        t0 = time.perf_counter()
        for _ in range(20):
            float(jax.device_get(run(ops)))
        return (time.perf_counter() - t0) / 20

    k_lo, k_hi = (8, 32) if quick else (16, 96)
    dispatch = max((many(k_hi) - many(k_lo)) / (k_hi - k_lo), 1e-7)
    return flop_rate, dispatch, hbm_rate


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("-o", "--out", default="calibration.json")
    p.add_argument("--quick", action="store_true",
                   help="small sizes / few geometries (plumbing smoke)")
    p.add_argument("--skip", nargs="*", default=[],
                   choices=["pallas", "bf16", "merge"])
    args = p.parse_args(argv)
    jax = _setup_jax()
    backend = jax.default_backend()
    dev = str(jax.devices()[0])
    print(f"# calibrating on {dev} ({backend})", file=sys.stderr)

    out = {"meta": {"device": dev, "backend": backend,
                    "quick": bool(args.quick)}}
    if "pallas" not in args.skip:
        rows_per_c, _ = measure_pallas_crossover(jax, quick=args.quick)
        if rows_per_c is not None:
            out["pallas_rows_per_c"] = round(rows_per_c, 2)
        else:
            # Pallas never won (or unsupported backend): push the gate out
            # of reach so 'auto' stays on XLA
            out["pallas_rows_per_c"] = 1e12
    if "bf16" not in args.skip:
        thr = measure_auto_bf16_threshold(jax, quick=args.quick)
        out["auto_bf16_min_bytes"] = (
            float(thr) if thr is not None else 1e18
        )
    if "merge" not in args.skip:
        fr, dc, hr = measure_merge_constants(jax, quick=args.quick)
        out["merge_flop_rate"] = float(f"{fr:.3e}")
        out["merge_dispatch_cost"] = float(f"{dc:.3e}")
        out["merge_hbm_rate"] = float(f"{hr:.3e}")
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
