"""Op-level microbenchmarks: symeig, Cholesky, factor GEMMs, patch extract.

TPU-native counterpart of the reference's microbenchmark suite
(/root/reference/scripts/bench_ops.py, bench_extract_patches.py): sweeps the
eigendecomposition across K-FAC factor sizes, compares fp32-vs-bf16 factor
GEMMs (the tensor-core comparison, scripts/bench_ops.py:50-70), and times
patch extraction over the real ResNet-50 conv shapes.

Usage:
  python tools/bench_ops.py [--op symeig|cholesky|gemm|patches|all]
                            [--sizes 128 512 1024 ...] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _timeit(fn, *args, iters=6, warmup=None):
    """Scan-chained timing: iters executions inside one compiled loop with a
    data dependency between them, scalar fetch at the end. Plain
    block_until_ready timing is unreliable over this environment's remote
    TPU tunnel (async dispatch; per-call transfers)."""
    import functools

    import jax
    import jax.numpy as jnp

    x0, rest = args[0], args[1:]

    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(x, k):
        def body(i, x):
            out = fn(x, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            # sum over the WHOLE output: anything less lets XLA dead-code
            # the unused portion of the op being measured
            probe = (jnp.sum(leaf) * 1e-30).astype(x.dtype)
            return x + probe

        return jax.lax.fori_loop(0, k, body, x)

    def run(k):
        t0 = time.perf_counter()
        r = loop(x0, k)
        float(jax.device_get(r.ravel()[0]))
        return time.perf_counter() - t0

    run(1)
    while True:
        run(iters)
        t1 = min(run(1) for _ in range(2))
        tk = min(run(iters) for _ in range(2))
        # sub-ms ops sit below the tunnel's dispatch jitter at small k:
        # escalate the chain length until the delta is resolvable
        if tk - t1 > 2e-3 or iters >= 512:
            return max((tk - t1) / (iters - 1), 1e-9)
        iters *= 8


def _spd(rng, n):
    m = rng.randn(n, n).astype(np.float32)
    return m @ m.T / n + np.eye(n, dtype=np.float32)


def bench_symeig(sizes, results):
    import jax
    import jax.numpy as jnp
    from kfac_pytorch_tpu.ops import linalg as L

    rng = np.random.RandomState(0)
    f = jax.jit(lambda x: L.symeig(x))
    for n in sizes:
        m = jnp.asarray(_spd(rng, n))
        t = _timeit(f, m)
        # QDWH-ish flop model ~ 60 n^3 (order of magnitude for GFLOP/s)
        gflops = 60 * n**3 / t / 1e9
        results.append({"op": "symeig", "n": n, "time_s": t, "gflops": gflops})
        print(f"symeig   n={n:5d}  {t*1e3:9.2f} ms  ~{gflops:8.1f} GF/s")


def bench_jacobi(sizes, results, batch=8):
    """Pallas one-sided Jacobi vs XLA QDWH eigh on batched factor buckets."""
    import jax
    import jax.numpy as jnp
    from kfac_pytorch_tpu.ops import linalg as L
    from kfac_pytorch_tpu.ops.pallas import symeig as psym

    rng = np.random.RandomState(0)
    for n in sizes:
        if n > psym.MAX_PALLAS_DIM or n % 256 != 0:
            continue
        m = rng.randn(batch, n, n).astype(np.float32)
        m = m @ m.transpose(0, 2, 1) / n + np.eye(n, dtype=np.float32)
        m = jnp.asarray(m)
        fj = jax.jit(lambda x: psym.jacobi_symeig(x, sweeps=10))
        fx = jax.jit(lambda x: L.symeig(x))
        tj, tx = _timeit(fj, m), _timeit(fx, m)
        w, v = fj(m)
        recon = jnp.einsum("bij,bj,bkj->bik", v, w, v)
        err = float(jnp.max(jnp.abs(recon - m)) / jnp.max(jnp.abs(m)))
        results.append(
            {"op": "jacobi_vs_xla", "n": n, "batch": batch,
             "jacobi_s": tj, "xla_s": tx, "rel_err": err}
        )
        print(
            f"symeig   [{batch}x{n}]  jacobi {tj*1e3:8.2f} ms | xla "
            f"{tx*1e3:8.2f} ms | speedup {tx/tj:5.2f}x | err {err:.1e}"
        )


def bench_blocked(sizes, results, schedules=None):
    """Blocked one-sided Jacobi (ops/blocked_symeig.py) vs XLA QDWH eigh on
    large single factors — the large-dim half of the tcmm f_symeig story
    (cuSOLVER syevd served all sizes; XLA eigh collapses above ~2048)."""
    import jax
    import jax.numpy as jnp
    from kfac_pytorch_tpu.ops import linalg as L
    from kfac_pytorch_tpu.ops.blocked_symeig import symeig_blocked_padded

    from kfac_pytorch_tpu.ops.blocked_symeig import default_inner_schedule

    on_tpu = jax.default_backend() == "tpu"
    if schedules is None:
        if on_tpu:
            schedules = [("auto", None)]
        else:
            schedules = [("xauto", "x")]  # auto length, xla inner
    rng = np.random.RandomState(0)
    for n in sizes:
        if n < 1024:
            continue
        m = jnp.asarray(_spd(rng, n))
        fx = jax.jit(lambda x: L.symeig(x))
        tx = _timeit(fx, m, iters=3)
        print(f"blocked  n={n:5d}  xla eigh {tx*1e3:9.2f} ms")
        for name, sched in schedules:
            if sched == "x":  # auto-length schedule with XLA-eigh inner
                sched = tuple(
                    -1 if s > 0 else s
                    for s in default_inner_schedule(n, 128)
                )
            fb = jax.jit(
                lambda x, s=sched: symeig_blocked_padded(
                    x, inner_schedule=s
                )
            )
            tb = _timeit(fb, m, iters=3)
            w, v = fb(m)
            recon = jnp.einsum("ij,j,kj->ik", v, w, v)
            err = float(jnp.linalg.norm(recon - m) / jnp.linalg.norm(m))
            orth = float(jnp.linalg.norm(
                v.T @ v - jnp.eye(n)) / np.sqrt(n))
            results.append(
                {"op": "blocked_vs_xla", "n": n, "sched": name,
                 "blocked_s": tb, "xla_s": tx, "rel_err": err,
                 "orth_err": orth}
            )
            print(
                f"blocked  n={n:5d}  {name:>12s} {tb*1e3:9.2f} ms | "
                f"speedup {tx/tb:5.2f}x | recon {err:.1e} | orth {orth:.1e}"
            )


def bench_tracking(sizes, results, drift_steps=20):
    """Online eigenbasis tracking (ops/blocked_symeig.tracking_symeig_update):
    per-refresh cost vs one XLA eigh, plus basis fidelity after
    ``drift_steps`` EMA updates (new = 0.05*fresh + 0.95*old, the K-FAC
    factor drift the tracker follows in production)."""
    import jax
    import jax.numpy as jnp
    from kfac_pytorch_tpu.ops import linalg as L
    from kfac_pytorch_tpu.ops.blocked_symeig import tracking_symeig_update

    rng = np.random.RandomState(0)
    for n in sizes:
        a0 = jnp.asarray(_spd(rng, n))
        # fresh per-step covariances: minibatch-style estimates of one
        # underlying covariance (fluctuation ~1/sqrt(bs) ~ 10% for the
        # bs=128 canonical configs) — the EMA then drifts toward the
        # common mean with stochastic wobble, which is what the tracker
        # follows in production (with an exact refresh every
        # tracking_exact_freq=50 steps bounding accumulation)
        base = _spd(rng, n)
        fresh = jnp.asarray(
            np.stack([0.9 * base + 0.1 * _spd(rng, n) for _ in range(4)])
        )
        w0, v0 = jax.jit(lambda x: L.symeig(x))(a0)

        for prec_name, prec in (
            ("default", None),
            ("highest", jax.lax.Precision.HIGHEST),
        ):
            @jax.jit
            def drift(a, v, fr, k=drift_steps):
                # fr is an ARGUMENT: a closure-captured (4, n, n) array
                # becomes a program constant, which breaks remote compile
                # at n=4608 (oversized HLO)
                def refresh(carry, i):
                    a, v = carry
                    a = 0.05 * fr[i % 4] + 0.95 * a
                    w, v = tracking_symeig_update(a, v, precision=prec)
                    return (a, v), w

                (a, v), ws = jax.lax.scan(refresh, (a, v), jnp.arange(k))
                return a, v, ws

            a_end, v_end, _ = map(np.asarray, drift(a0, v0, fresh))
            # fidelity: PRECONDITIONER-APPLICATION error — what K-FAC
            # actually consumes is V f(w) V^T with f(x)=1/(x+damping).
            # Raw off-diagonal mass over-penalizes within-cluster
            # couplings of near-degenerate eigenvalues (dense Wishart-like
            # spectra here), which f() is insensitive to.
            b = v_end.T @ a_end @ v_end
            w_tr = np.diag(b)
            lam = 1e-2 * float(np.trace(a_end)) / n
            approx = (v_end / (w_tr + lam)) @ v_end.T
            exact = np.linalg.inv(a_end + lam * np.eye(n, dtype=a_end.dtype))
            rel = np.linalg.norm(approx - exact) / np.linalg.norm(exact)
            # timing: chained refreshes (amortized per-refresh cost)
            def chained(k):
                @jax.jit
                def f(a, v):
                    def body(c, _):
                        a, v = c
                        w, v = tracking_symeig_update(a, v, precision=prec)
                        return (a, v), w[0]
                    (_, v), ws = jax.lax.scan(body, (a, v), None, length=k)
                    return ws[-1] + jnp.sum(v) * 1e-30
                return f

            import time as _t
            f1, f8 = chained(1), chained(8)
            float(f1(a0, v0)); float(f8(a0, v0))  # compile
            def tm(f):
                t0 = _t.perf_counter(); float(f(a0, v0))
                return _t.perf_counter() - t0
            t1 = min(tm(f1) for _ in range(2))
            t8 = min(tm(f8) for _ in range(2))
            tr = max((t8 - t1) / 7, 1e-9)
            fx = jax.jit(lambda x: L.symeig(x))
            tx = _timeit(fx, a0, iters=3)
            results.append(
                {"op": "tracking", "n": n, "precision": prec_name,
                 "refresh_s": tr, "eigh_s": tx,
                 "precond_rel_after_drift": float(rel)}
            )
            print(
                f"tracking n={n:5d} prec={prec_name:7s} refresh "
                f"{tr*1e3:8.2f} ms | eigh {tx*1e3:8.2f} ms | speedup "
                f"{tx/tr:6.1f}x | precond_err(after {drift_steps} EMA "
                f"steps) {rel:.2e}"
            )


def bench_tracking_drift(sizes, results, steps=500, probe_every=100):
    """LONG-HORIZON tracking fidelity (VERDICT round-2 item 3): run the
    production EMA + tracking refresh for ``steps`` refreshes with NO exact
    re-refresh at all, probing the preconditioner-application error every
    ``probe_every`` steps. If the error stays bounded at the horizon, the
    default tracking_exact_freq can rise to >= that horizon (or warmup-only)
    and the arm's amortized eigh cost goes to ~zero — closing the accounting
    hole (one exact eigh refresh ~6.3s across RN50's buckets, BENCH_NOTES).
    """
    import jax
    import jax.numpy as jnp
    from kfac_pytorch_tpu.ops import linalg as L
    from kfac_pytorch_tpu.ops.blocked_symeig import tracking_symeig_update

    rng = np.random.RandomState(0)
    for n in sizes:
        a0 = jnp.asarray(_spd(rng, n))
        base = _spd(rng, n)
        fresh = jnp.asarray(
            np.stack([0.9 * base + 0.1 * _spd(rng, n) for _ in range(4)])
        )
        w0, v0 = jax.jit(lambda x: L.symeig(x))(a0)

        @jax.jit
        def segment(a, v, fr, k=probe_every):
            def refresh(carry, i):
                a, v = carry
                a = 0.05 * fr[i % 4] + 0.95 * a
                w, v = tracking_symeig_update(a, v, precision=None)
                return (a, v), ()

            (a, v), _ = jax.lax.scan(refresh, (a, v), jnp.arange(k))
            return a, v

        @jax.jit
        def precond_err(a, v):
            # what K-FAC consumes: V f(w) V^T, f = 1/(x + damping)
            b = jnp.swapaxes(v, -2, -1) @ a @ v
            w_tr = jnp.diagonal(b)
            lam = 1e-2 * jnp.trace(a) / n
            approx = (v / (w_tr + lam)) @ jnp.swapaxes(v, -2, -1)
            exact = L.cholesky_inverse(
                a + lam * jnp.eye(n, dtype=a.dtype)
            )
            return (jnp.linalg.norm(approx - exact)
                    / jnp.linalg.norm(exact))

        a, v = a0, v0
        errs = []
        for seg in range(steps // probe_every):
            a, v = segment(a, v, fresh)
            errs.append(float(precond_err(a, v)))
        row = {"op": "tracking_drift", "n": n, "steps": steps,
               "probe_every": probe_every, "precond_rel_errs": errs}
        results.append(row)
        curve = " ".join(
            f"@{(i+1)*probe_every}:{e:.2e}" for i, e in enumerate(errs)
        )
        print(f"tracking_drift n={n:5d} (no exact refresh) {curve}")


def bench_cholesky(sizes, results):
    import jax
    import jax.numpy as jnp
    from kfac_pytorch_tpu.ops import linalg as L

    rng = np.random.RandomState(0)
    f = jax.jit(lambda x: L.damped_inverse(x, 0.01))
    for n in sizes:
        m = jnp.asarray(_spd(rng, n))
        t = _timeit(f, m)
        gflops = (4 / 3) * n**3 / t / 1e9
        results.append(
            {"op": "cholesky_inv", "n": n, "time_s": t, "gflops": gflops}
        )
        print(f"chol_inv n={n:5d}  {t*1e3:9.2f} ms  ~{gflops:8.1f} GF/s")


def bench_gemm(sizes, results):
    """Factor-accumulation GEMM a^T(a/B): fp32-highest vs bf16->fp32 (the
    reference's cuBLAS fp32 vs tensor-core f_gemm_ex comparison)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    rows = 32 * 56 * 56  # RN50-class patch rows
    for n in sizes:
        a32 = jnp.asarray(rng.randn(rows, n).astype(np.float32))
        a16 = a32.astype(jnp.bfloat16)

        f32 = jax.jit(
            lambda a: jax.lax.dot_general(
                a, a / rows, (((0,), (0,)), ((), ())), precision="highest",
                preferred_element_type=jnp.float32,
            )
        )
        fbf = jax.jit(
            lambda a: jax.lax.dot_general(
                a, a / rows, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        t32, tbf = _timeit(f32, a32), _timeit(fbf, a16)
        fl = 2 * rows * n * n
        results.append(
            {"op": "factor_gemm", "n": n, "fp32_s": t32, "bf16_s": tbf,
             "fp32_gflops": fl / t32 / 1e9, "bf16_gflops": fl / tbf / 1e9}
        )
        print(
            f"gemm     n={n:5d}  fp32 {t32*1e3:8.2f} ms ({fl/t32/1e12:6.2f} "
            f"TF/s) | bf16 {tbf*1e3:8.2f} ms ({fl/tbf/1e12:6.2f} TF/s)"
        )


# ResNet-50 conv layer shapes: (in_c, H, W, kh, stride) at batch 32
RN50_CONV_SHAPES = [
    (3, 224, 224, 7, 2),
    (64, 56, 56, 1, 1), (64, 56, 56, 3, 1), (256, 56, 56, 1, 1),
    (256, 56, 56, 1, 2), (128, 28, 28, 3, 1), (512, 28, 28, 1, 1),
    (512, 28, 28, 1, 2), (256, 14, 14, 3, 1), (1024, 14, 14, 1, 1),
    (1024, 14, 14, 1, 2), (512, 7, 7, 3, 1), (2048, 7, 7, 1, 1),
]


def bench_patches(results, batch=32):
    import jax
    import jax.numpy as jnp
    from kfac_pytorch_tpu.ops import factors as F

    rng = np.random.RandomState(0)
    total = 0.0
    for cin, h, w, k, s in RN50_CONV_SHAPES:
        x = jnp.asarray(rng.randn(batch, h, w, cin).astype(np.float32))
        pad = F.resolve_conv_padding("SAME", (h, w), (k, k), (s, s))
        f = jax.jit(
            lambda x, k=k, s=s, pad=pad: F.extract_patches(x, (k, k), (s, s), pad)
        )
        t = _timeit(f, x)
        total += t
        results.append(
            {"op": "extract_patches", "shape": [cin, h, w, k, s], "time_s": t}
        )
        print(f"patches  c={cin:4d} {h:3d}x{w:<3d} k={k} s={s}  {t*1e3:8.3f} ms")
    print(f"patches  TOTAL {total*1e3:.2f} ms")


def bench_factor_a(results, batch=32, impls=("xla", "pallas", "taps")):
    """Conv A-factor cost per implementation over the RN50 3x3 layers —
    the factor-stage hot spots (1x1 layers have no patch structure and
    always take the XLA path)."""
    import jax
    import jax.numpy as jnp
    from kfac_pytorch_tpu.ops import factors as F

    shapes = [(64, 56, 56, 3, 1), (128, 28, 28, 3, 1), (256, 14, 14, 3, 1),
              (512, 7, 7, 3, 1),
              # the stem: 7x7 stride-2 on 3 channels — no Pallas support
              # (its polyphase packing is cpk=16, 8x lane padding: scoped
              # VMEM infeasible), but its im2col is the single largest
              # patch materialization left (B*112^2 x 147 rows); the bf16
              # arm measures casting the materialized patches before the
              # GEMM (halves that buffer)
              (3, 224, 224, 7, 2),
              # RN50 downsampling 3x3-s2 layers: explicit impl='pallas'
              # routes these through the polyphase transform
              # (pallas_poly) — measured against XLA to calibrate the
              # auto gate (polyphase Grams carry 3.16x wasted flops at
              # k3-s2; 'auto' keeps them on XLA unless these rows say
              # otherwise)
              (128, 56, 56, 3, 2), (256, 28, 28, 3, 2), (512, 14, 14, 3, 2)]
    rng = np.random.RandomState(0)
    totals = {impl: 0.0 for impl in impls}
    totals["xla_bf16"] = 0.0
    for cin, h, w, k, s in shapes:
        x = jnp.asarray(rng.randn(batch, h, w, cin).astype(np.float32))
        pad = F.resolve_conv_padding("SAME", (h, w), (k, k), (s, s))
        row = {"op": "factor_a_conv", "shape": [cin, h, w, k, s]}
        msg = f"factor_a c={cin:4d} {h:3d}x{w:<3d} k={k} s={s}"
        for impl in impls:
            f = jax.jit(
                lambda x, impl=impl, pad=pad, k=k, s=s: F.compute_a_conv(
                    x, (k, k), (s, s), pad, True, impl=impl
                )
            )
            t = _timeit(f, x)
            row[f"{impl}_s"] = t
            totals[impl] += t
            msg += f" | {impl} {t*1e3:8.3f} ms"
        fb = jax.jit(
            lambda x, pad=pad, k=k, s=s: F.compute_a_conv(
                x, (k, k), (s, s), pad, True, impl="xla",
                dtype=jnp.bfloat16,
            )
        )
        t = _timeit(fb, x)
        row["xla_bf16_s"] = t
        totals["xla_bf16"] += t
        msg += f" | xla_bf16 {t*1e3:8.3f} ms"
        results.append(row)
        print(msg)
    print("factor_a TOTAL "
          + " | ".join(f"{i} {totals[i]*1e3:.2f} ms" for i in totals))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--op", default="all",
                   choices=["symeig", "jacobi", "blocked", "tracking",
                            "tracking-drift", "cholesky", "gemm", "patches",
                            "factor_a", "all"])
    p.add_argument("--sizes", type=int, nargs="+",
                   default=[128, 256, 512, 1024, 2048, 4608])
    p.add_argument("--drift-steps", type=int, default=500)
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)
    from kfac_pytorch_tpu.utils.platform import ensure_platform_from_env
    ensure_platform_from_env()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    results = []
    if args.op in ("symeig", "all"):
        bench_symeig(args.sizes, results)
    if args.op in ("jacobi", "all"):
        bench_jacobi(args.sizes, results)
    if args.op in ("blocked", "all"):
        bench_blocked(args.sizes, results)
    if args.op in ("tracking", "all"):
        bench_tracking(args.sizes, results)
    if args.op == "tracking-drift":
        bench_tracking_drift(
            [n for n in args.sizes if n >= 512] or args.sizes,
            results, steps=args.drift_steps,
        )
    if args.op in ("cholesky", "all"):
        bench_cholesky(args.sizes, results)
    if args.op in ("gemm", "all"):
        bench_gemm(args.sizes, results)
    if args.op in ("patches", "all"):
        bench_patches(results)
    if args.op == "factor_a":
        bench_factor_a(results)
    if args.json:
        print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
