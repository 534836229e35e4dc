"""bf16 factor-state storage (KFACConfig.factor_state_dtype).

The factor EMA state A/G may be stored in bfloat16 to halve the dominant
per-step factor-state HBM traffic (BENCH_NOTES round 3: the factor stage
is batch-independent state traffic, not GEMMs). These tests pin down:

* the state is actually stored in the requested dtype (all inv_types),
* the preconditioned update tracks the f32-state control to bf16
  resolution over a multi-step trajectory (the EMA rounding is a
  non-compounding per-step perturbation),
* pi traces are computed with f32 accumulation from the bf16 diagonals
  (a bf16 reduce over a long diagonal would lose the trace's low bits).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kfac_pytorch_tpu.ops import linalg as lops
from kfac_pytorch_tpu.ops.pcg import _masked_diag_mean
from kfac_pytorch_tpu.parallel.strategies import BlockKFAC
from kfac_pytorch_tpu.preconditioner import KFAC, KFACConfig

from tests.test_strategies import _capture, _setup


def _tree_max_rel(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    err = 0.0
    for x, y in zip(leaves_a, leaves_b):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        denom = np.maximum(np.abs(y).max(), 1e-8)
        err = max(err, float(np.abs(x - y).max() / denom))
    return err


@pytest.mark.parametrize("inv_type", ["pcg", "eigen", "inverse"])
def test_state_dtype_stored_and_tracks_f32(inv_type):
    model, params, specs, perturbs, x, y = _setup()
    acts, grads, gs = _capture(model, params, perturbs, x, y)

    kw = dict(inv_type=inv_type, damping=0.03, kl_clip=0.001,
              pcg_iters=6, pcg_fused="never")
    cfg32 = KFACConfig(**kw)
    cfg16 = KFACConfig(factor_state_dtype="bfloat16", **kw)

    blk32 = BlockKFAC(specs, cfg32, world_size=1)
    blk16 = BlockKFAC(specs, cfg16, world_size=1)

    st32, st16 = blk32.init_state(), blk16.init_state()
    for e in st16["buckets"]:
        assert e["A"].dtype == jnp.bfloat16
        assert e["G"].dtype == jnp.bfloat16

    step32 = jax.jit(lambda s: blk32.step(s, grads, acts, gs, lr=0.1))
    step16 = jax.jit(lambda s: blk16.step(s, grads, acts, gs, lr=0.1))
    for _ in range(4):
        out32, st32 = step32(st32)
        out16, st16 = step16(st16)
    for e in st16["buckets"]:
        # the EMA must keep the state in its storage dtype step over step
        assert e["A"].dtype == jnp.bfloat16
        assert e["G"].dtype == jnp.bfloat16
    # bf16 has ~3 decimal digits; after 4 EMA steps the update should
    # track the f32 control to that resolution times the damped inverse's
    # amplification (measured ~8e-2 worst element for eigen/inverse at
    # damping 0.03 — rounding does not compound: the EMA contracts
    # toward the fresh estimate every step)
    assert _tree_max_rel(out16, out32) < 0.12


def test_state_dtype_per_layer_kfac():
    model, params, specs, perturbs, x, y = _setup()
    acts, grads, gs = _capture(model, params, perturbs, x, y)
    cfg = KFACConfig(inv_type="inverse", damping=0.03,
                     factor_state_dtype="bfloat16")
    ref = KFAC(specs, cfg)
    st = ref.init_state()
    for e in st["layers"].values():
        assert e["A"].dtype == jnp.bfloat16
    out, st = jax.jit(lambda s: ref.step(s, grads, acts, gs, lr=0.1))(st)
    for e in st["layers"].values():
        assert e["A"].dtype == jnp.bfloat16
    assert all(
        bool(jnp.all(jnp.isfinite(leaf)))
        for leaf in jax.tree_util.tree_leaves(out)
    )


def test_trace_accumulation_is_f32():
    """Traces of bf16-stored factors must not be accumulated in bf16: a
    4096-long all-ones diagonal sums exactly in f32 but collapses badly
    in a bf16 reduce (eps ~ 8e-3 at magnitude 4096 is +-32)."""
    n = 4096
    v = 1.0078125  # 1 + 2^-7: exactly representable in bf16 (7 mantissa bits)
    m = jnp.eye(n, dtype=jnp.bfloat16)[None] * jnp.bfloat16(v)
    mean = _masked_diag_mean(m, jnp.asarray([n]))
    assert mean.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(mean), v, rtol=1e-6)
    pi = lops.pi_trace_norm(m[0], jnp.eye(n, dtype=jnp.bfloat16))
    np.testing.assert_allclose(np.asarray(pi), np.sqrt(v), rtol=1e-6)


def test_cholesky_inverse_upcasts_half():
    rng = np.random.RandomState(0)
    b = rng.randn(4, 4).astype(np.float32)
    spd = b @ b.T + 4.0 * np.eye(4, dtype=np.float32)
    inv16 = lops.cholesky_inverse(jnp.asarray(spd, jnp.bfloat16))
    assert inv16.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(inv16), np.linalg.inv(spd), rtol=3e-2, atol=3e-3
    )
