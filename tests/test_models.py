"""Model zoo tests: shapes, K-FAC layer registration counts, BN e2e."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

import kfac_pytorch_tpu as ktpu
from kfac_pytorch_tpu.models import available_models, get_model
from kfac_pytorch_tpu.training.loop import (
    KFACScalars,
    TrainState,
    make_eval_step,
    make_train_step,
)


def _specs_for(model, variables, x, **kw):
    return ktpu.setup_kfac(model, variables, x, **kw)


@pytest.mark.parametrize(
    "name,n_layers",
    [
        ("resnet20", 20),   # 19 convs + fc
        ("resnet32", 32),
        ("vgg11", 9),       # 8 convs + fc
        ("wrn28-10", 29),   # 25 convs + 3 shortcuts + fc
        ("densenet121", 121),  # 120 convs + fc
    ],
)
def test_layer_registration_counts(name, n_layers):
    model = get_model(name)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    specs, _ = _specs_for(
        model, {k: v for k, v in variables.items() if k in ("params", "batch_stats")},
        x, train=True,
    )
    assert len(specs) == n_layers, (name, len(specs))


def test_model_output_shapes():
    x = jnp.zeros((2, 32, 32, 3))
    for name in ["resnet20", "vgg11"]:
        model = get_model(name, num_classes=10)
        variables = model.init(jax.random.PRNGKey(0), x, train=True)
        out = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            x, train=False,
        )
        assert out.shape == (2, 10)


def test_imagenet_resnet50_registration():
    """ResNet-50 must expose 54 K-FAC layers with the reference's factor
    dims (dp_block_partition.py:92-93)."""
    model = get_model("imagenet-resnet50", num_classes=1000)
    x = jnp.zeros((1, 64, 64, 3))  # small spatial for test speed
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    specs, _ = _specs_for(
        model,
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        x, train=True,
    )
    assert len(specs) == 54
    a_dims = sorted(s.grad_in_dim for s in specs)
    g_dims = sorted(s.out_dim for s in specs)
    assert a_dims[0] == 64 and a_dims[-1] == 4608
    assert 147 in a_dims  # the 7x7x3 stem
    assert 2049 in a_dims  # fc with bias
    assert g_dims[-1] == 2048 and 1000 in g_dims


def test_resnet20_kfac_train_step_end_to_end():
    """Full BN-model train step with K-FAC: runs under jit, updates
    batch_stats, decreases loss on a memorizable batch."""
    model = get_model("resnet20", num_classes=10)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 32, 32, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 10, 8))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    params = variables["params"]
    model_state = {"batch_stats": variables["batch_stats"]}
    specs, perturbs = _specs_for(
        model, {"params": params, **model_state}, x, train=True
    )
    kfac = ktpu.DP_KFAC(specs, damping=0.03)
    tx = optax.sgd(0.05, momentum=0.9)
    state = TrainState(
        params=params,
        opt_state=tx.init(params),
        kfac_state=kfac.init_state(),
        model_state=model_state,
    )
    step = jax.jit(
        make_train_step(
            model, tx, kfac, perturb_template=perturbs,
            train_kwargs={"train": True},
        )
    )
    scalars = KFACScalars.create(lr=0.05, damping=0.03)
    losses = []
    for _ in range(6):
        state, m = step(state, (x, y), scalars)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # batch_stats must have moved
    bs0 = variables["batch_stats"]["bn_init"]["mean"]
    bs1 = state.model_state["batch_stats"]["bn_init"]["mean"]
    assert not np.allclose(np.asarray(bs0), np.asarray(bs1))
    # eval path
    em = jax.jit(make_eval_step(model))(state.params, state.model_state, (x, y))
    assert np.isfinite(float(em["loss"]))


def test_inceptionv4_registration():
    model = get_model("inceptionv4", num_classes=10)
    x = jnp.zeros((1, 160, 160, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    specs, _ = _specs_for(
        model,
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        x, train=True,
    )
    assert len(specs) == 150  # 149 convs + fc


def test_inceptionv3_registration_and_forward():
    """Inception-v3 (torchvision topology, 94 convs + fc; the reference's
    other Inception option, pytorch_imagenet_resnet.py:254-255)."""
    model = get_model("inceptionv3", num_classes=10)
    x = jnp.zeros((1, 160, 160, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    specs, _ = _specs_for(
        model,
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        x, train=True,
    )
    assert len(specs) == 95  # 94 convs + fc
    out = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        x, train=False,
    )
    assert out.shape == (1, 10)


def test_mobilenet_v2_registration_and_forward():
    """MobileNet-v2 inverted residuals; depthwise convs register one spec
    per group (block-diagonal factors)."""
    model = get_model("mobilenet-v2", num_classes=10)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    specs, _ = _specs_for(
        model,
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        x, train=True,
    )
    grouped = [s for s in specs if s.n_groups > 1]
    singles = [s for s in specs if s.n_groups == 1]
    # 17 inverted residuals + stem + head + fc: 16 expand + 17 project +
    # stem + head + fc = 36 single layers; 17 depthwise modules expand to
    # one spec per channel
    assert len(singles) == 36
    assert len(grouped) == sum(
        s.n_groups for s in grouped if s.group_idx == 0
    )
    out = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        x, train=False,
    )
    assert out.shape == (1, 10)


def test_registry_errors():
    with pytest.raises(ValueError):
        get_model("nope")
    assert "resnet110" in available_models()
