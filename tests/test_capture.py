"""Tests for functional (a, g) capture — the hook-free equivalent of the
reference's forward_pre/full_backward hooks."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

import kfac_pytorch_tpu as ktpu
from kfac_pytorch_tpu.capture import (
    COL_A,
    COL_G,
    captured_a,
    captured_g,
)


class MLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = ktpu.KFACDense(16, name="fc1")(x)
        x = nn.relu(x)
        x = ktpu.KFACDense(4, name="fc2")(x)
        return x


class SmallCNN(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = ktpu.KFACConv(8, (3, 3), strides=(2, 2), name="conv1")(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = ktpu.KFACDense(10, name="head", exclude=True)(x)
        return x


def test_collect_layer_specs_mlp():
    model = MLP()
    x = jnp.zeros((4, 8))
    variables = model.init(jax.random.PRNGKey(0), x)
    specs = ktpu.collect_layer_specs(
        lambda: model.apply(
            {"params": variables["params"]}, x, mutable=[COL_A, COL_G]
        )
    )
    assert [s.name for s in specs] == ["fc1", "fc2"]
    assert specs[0].kind == "dense"
    assert specs[0].in_dim == 8 and specs[0].out_dim == 16
    assert specs[0].has_bias and specs[0].grad_in_dim == 9
    assert specs[0].param_path == ("fc1", "layer")


def test_collect_layer_specs_conv_and_exclude():
    model = SmallCNN()
    x = jnp.zeros((2, 8, 8, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    specs = ktpu.collect_layer_specs(
        lambda: model.apply(
            {"params": variables["params"]}, x, mutable=[COL_A, COL_G]
        )
    )
    # the excluded head (reference exclude_vocabulary_size mechanism,
    # base.py:139-140) must not be registered
    assert [s.name for s in specs] == ["conv1"]
    s = specs[0]
    assert s.kind == "conv"
    assert s.kernel_size == (3, 3) and s.strides == (2, 2)
    assert s.in_dim == 3 * 9 and s.out_dim == 8
    # SAME padding for 8->4 stride-2: total pad 1
    assert s.padding == ((0, 1), (0, 1))


def test_captured_a_and_g_match_manual_backprop():
    """g captured via the perturbation trick must equal dL/d(layer output)
    — what the reference's full_backward_hook saves (base.py:127-130)."""
    model = MLP()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 8).astype(np.float32))
    y = jnp.asarray(rng.randn(8, 4).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(1), x)
    params = variables["params"]
    perturbs = ktpu.make_zero_perturbations(model, {"params": params}, x)

    def loss_fn(params, perturbs):
        out, muts = model.apply(
            {"params": params, COL_G: perturbs}, x, mutable=[COL_A]
        )
        return jnp.mean((out - y) ** 2), muts[COL_A]

    (loss, acts), (gparams, gperturb) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(params, perturbs)

    specs = ktpu.collect_layer_specs(
        lambda: model.apply({"params": params, COL_G: perturbs}, x, mutable=[COL_A])
    )
    spec1, spec2 = specs

    # a for fc1 is the network input
    np.testing.assert_allclose(np.asarray(captured_a({COL_A: acts}, spec1)), x)

    # manual forward to check fc2's a and g
    k1 = params["fc1"]["layer"]
    h_pre = x @ k1["kernel"] + k1["bias"]
    h = jax.nn.relu(h_pre)
    np.testing.assert_allclose(
        np.asarray(captured_a({COL_A: acts}, spec2)), np.asarray(h), rtol=1e-6
    )

    # g for fc2: dL/dout of the final layer = 2(out-y)/N
    k2 = params["fc2"]["layer"]
    out = h @ k2["kernel"] + k2["bias"]
    want_g2 = 2.0 * (out - y) / out.size
    np.testing.assert_allclose(
        np.asarray(captured_g(gperturb, spec2)),
        np.asarray(want_g2),
        rtol=1e-5,
        atol=1e-7,
    )

    # g for fc1: backprop through relu and fc2
    want_g1 = (want_g2 @ k2["kernel"].T) * (h_pre > 0)
    np.testing.assert_allclose(
        np.asarray(captured_g(gperturb, spec1)),
        np.asarray(want_g1),
        rtol=1e-5,
        atol=1e-7,
    )

    # param grads still correct (perturbation must not change values)
    direct = jax.grad(
        lambda p: jnp.mean((model.apply({"params": p}, x) - y) ** 2)
    )(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6
        ),
        gparams,
        direct,
    )


def test_perturbation_is_identity_on_forward():
    model = MLP()
    x = jnp.ones((2, 8))
    variables = model.init(jax.random.PRNGKey(2), x)
    params = variables["params"]
    perturbs = ktpu.make_zero_perturbations(model, {"params": params}, x)
    plain = model.apply({"params": params}, x)
    tapped, _ = model.apply(
        {"params": params, COL_G: perturbs}, x, mutable=[COL_A]
    )
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(tapped))
