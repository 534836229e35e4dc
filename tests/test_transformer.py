"""Tests for the Transformer and RNN-LM workloads with K-FAC."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

import kfac_pytorch_tpu as ktpu
from kfac_pytorch_tpu.models import RNNLM, Transformer
from kfac_pytorch_tpu.training.loop import KFACScalars, TrainState, make_train_step


def _tiny_transformer(share=True):
    return Transformer(
        n_src_vocab=50, n_trg_vocab=60, d_model=32, d_ff=64, n_layers=2,
        n_head=4, max_len=16, pad_idx=1, share_emb_prj=share, dropout=0.0,
    )


def test_transformer_shapes_and_layer_registration():
    model = _tiny_transformer(share=False)
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randint(2, 50, (4, 9)))
    trg = jnp.asarray(rng.randint(2, 60, (4, 7)))
    variables = model.init(jax.random.PRNGKey(0), src, trg)
    out = model.apply({"params": variables["params"]}, src, trg)
    assert out.shape == (4, 7, 60)

    specs, _ = ktpu.setup_kfac(model, {"params": variables["params"]}, src, trg)
    # per encoder layer: 4 attn + 2 ffn = 6; per decoder layer: 8 attn + 2
    # ffn = 10; 2 enc + 2 dec layers -> 32. trg_word_prj must be EXCLUDED.
    names = [s.name for s in specs]
    assert len(specs) == 32
    assert not any("trg_word_prj" in n for n in names)
    # attention projections are bias-free -> grad_in_dim == d_model
    wqs = [s for s in specs if s.name.endswith("w_qs")]
    assert wqs and all(not s.has_bias and s.grad_in_dim == 32 for s in wqs)
    # FFN has biases
    w1 = [s for s in specs if s.name.endswith("w_1")]
    assert w1 and all(s.has_bias for s in w1)


def test_transformer_kfac_training_step():
    """Seq (B,T,D) activations flow through the seq-mean factor path and one
    K-FAC step trains the model."""
    model = _tiny_transformer(share=True)
    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.randint(2, 50, (8, 9)))
    trg_in = jnp.asarray(rng.randint(2, 60, (8, 7)))
    labels = jnp.asarray(rng.randint(2, 60, (8, 7)))
    variables = model.init(jax.random.PRNGKey(0), src, trg_in)
    params = variables["params"]
    specs, perturbs = ktpu.setup_kfac(model, {"params": params}, src, trg_in)
    kfac = ktpu.DP_KFAC(specs, damping=0.03)

    def loss_fn(logits, y):
        logp = jax.nn.log_softmax(logits)
        oh = jax.nn.one_hot(y, logits.shape[-1])
        return -jnp.mean(jnp.sum(oh * logp, axis=-1))

    tx = optax.adam(1e-3)
    state = TrainState(
        params=params, opt_state=tx.init(params),
        kfac_state=kfac.init_state(), model_state={},
    )

    def model_loss(logits, y):
        return loss_fn(logits, y)

    step = jax.jit(
        make_train_step(
            model, tx, kfac, loss_fn=model_loss, perturb_template=perturbs
        )
    )
    scalars = KFACScalars.create(lr=1e-3, damping=0.03)
    losses = []
    for _ in range(5):
        state, m = step(state, ((src, trg_in), labels), scalars)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_rnn_lm_kfac_decoder():
    model = RNNLM(vocab_size=40, emb_dim=16, hidden_dim=16, n_layers=1,
                  dropout=0.0)
    rng = np.random.RandomState(2)
    tokens = jnp.asarray(rng.randint(0, 40, (4, 12)))
    labels = jnp.asarray(rng.randint(0, 40, (4, 12)))
    variables = model.init(jax.random.PRNGKey(0), tokens)
    params = variables["params"]
    specs, perturbs = ktpu.setup_kfac(model, {"params": params}, tokens)
    # round 2: the recurrent layers' input projections are hoisted out of
    # the time recurrence and K-FAC-tagged (seq-mean factors) — coverage
    # beyond the reference, whose RNN K-FAC path is broken outright
    # (pytorch_wikitext_rnn.py:6)
    assert [s.name for s in specs] == ["lstm0/ih", "decoder"]

    kfac = ktpu.DP_KFAC(specs, damping=0.03)
    tx = optax.sgd(0.5)
    state = TrainState(
        params=params, opt_state=tx.init(params),
        kfac_state=kfac.init_state(), model_state={},
    )

    def loss_fn(logits, y):
        logp = jax.nn.log_softmax(logits)
        oh = jax.nn.one_hot(y, logits.shape[-1])
        return -jnp.mean(jnp.sum(oh * logp, axis=-1))

    step = jax.jit(
        make_train_step(
            model, tx, kfac, loss_fn=loss_fn, perturb_template=perturbs
        )
    )
    scalars = KFACScalars.create(lr=0.5, damping=0.03)
    losses = []
    for _ in range(5):
        state, m = step(state, (tokens, labels), scalars)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
