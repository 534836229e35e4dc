"""factor_batch_frac: factor statistics from a batch subset (DP-KFAC
local-batch semantics on one device — KFACConfig.factor_batch_frac).

Exactness pin: on a batch whose two halves are IDENTICAL, frac=0.5 must
reproduce the full-batch factors bit-for-bit up to float assoc — the
A-side is a plain mean over rows, and the cotangent rescale (B/k) exactly
restores the full-batch-mean loss scaling on the G side.
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

import kfac_pytorch_tpu as ktpu
from kfac_pytorch_tpu.parallel.strategies import BlockKFAC
from kfac_pytorch_tpu.preconditioner import KFACConfig


class Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = ktpu.KFACConv(8, (3, 3))(x)
        x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        return ktpu.KFACDense(10)(x)


def _setup():
    rng = np.random.RandomState(0)
    model = Net()
    half = rng.randn(4, 8, 8, 3).astype(np.float32)
    x = jnp.asarray(np.concatenate([half, half]))  # identical halves
    y = jnp.asarray(np.concatenate([np.arange(4) % 10] * 2).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), x)
    params = variables["params"]
    specs, perturbs = ktpu.setup_kfac(model, {"params": params}, x)
    return model, params, specs, perturbs, x, y


def _fresh_factors(frac, model, params, specs, perturbs, x, y):
    kfac = BlockKFAC(
        specs,
        KFACConfig(inv_type="pcg", strategy="dp", damping=0.01,
                   factor_batch_frac=frac, factor_decay=1.0),
    )
    state = kfac.init_state()

    def loss_fn(p, pe):
        variables = {"params": p, ktpu.COL_G: pe}
        logits, muts = model.apply(variables, x, mutable=[ktpu.COL_A])
        oh = jax.nn.one_hot(y, 10)
        return -jnp.mean(jnp.sum(oh * jax.nn.log_softmax(logits), -1)), muts

    pert = jax.tree_util.tree_map(jnp.zeros_like, perturbs)
    (_, muts), (grads, gs) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(params, pert)
    acts = muts[ktpu.COL_A]
    _, new_state = kfac.step(state, grads, acts, gs, lr=0.1)
    return new_state


def test_half_frac_equals_full_on_duplicated_batch():
    model, params, specs, perturbs, x, y = _setup()
    full = _fresh_factors(1.0, model, params, specs, perturbs, x, y)
    half = _fresh_factors(0.5, model, params, specs, perturbs, x, y)
    for bf, bh in zip(full["buckets"], half["buckets"]):
        np.testing.assert_allclose(np.asarray(bh["A"]), np.asarray(bf["A"]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(bh["G"]), np.asarray(bf["G"]),
                                   rtol=1e-5, atol=1e-6)


def test_quarter_frac_is_unbiased_scale():
    """On a random batch, frac factors are a valid (different-sample)
    estimate: same trace ORDER of magnitude, SPD, finite."""
    rng = np.random.RandomState(1)
    model = Net()
    x = jnp.asarray(rng.randn(16, 8, 8, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 10, 16))
    variables = model.init(jax.random.PRNGKey(0), x)
    params = variables["params"]
    specs, perturbs = ktpu.setup_kfac(model, {"params": params}, x)
    full = _fresh_factors(1.0, model, params, specs, perturbs, x, y)
    frac = _fresh_factors(0.25, model, params, specs, perturbs, x, y)
    for bf, bq in zip(full["buckets"], frac["buckets"]):
        for k in ("A", "G"):
            tf = float(jnp.trace(bf[k][0]))
            tq = float(jnp.trace(bq[k][0]))
            assert np.isfinite(tq)
            assert 0.1 < tq / tf < 10.0, (k, tq, tf)
