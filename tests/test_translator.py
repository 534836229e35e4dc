"""Tests for greedy/beam decoding and BLEU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kfac_pytorch_tpu.models import Transformer
from kfac_pytorch_tpu.models.translator import (
    beam_search_decode,
    corpus_bleu,
    greedy_decode,
)

PAD, BOS, EOS = 1, 2, 3


@pytest.fixture(scope="module")
def tiny_model():
    model = Transformer(
        n_src_vocab=30, n_trg_vocab=30, d_model=16, d_ff=32, n_layers=1,
        n_head=2, max_len=16, pad_idx=PAD, dropout=0.0, share_emb_prj=True,
    )
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randint(4, 30, (2, 6)))
    trg = jnp.asarray(rng.randint(4, 30, (2, 5)))
    params = model.init(jax.random.PRNGKey(0), src, trg)["params"]
    return model, params, src


def test_greedy_decode_shapes(tiny_model):
    model, params, src = tiny_model
    out = greedy_decode(model, params, src, bos=BOS, eos=EOS, pad=PAD,
                        max_len=8)
    out = np.asarray(out)
    assert out.shape == (2, 8)
    assert (out[:, 0] == BOS).all()


def test_beam_decode_shapes_and_score_ordering(tiny_model):
    model, params, src = tiny_model
    out = beam_search_decode(
        model, params, src, bos=BOS, eos=EOS, pad=PAD, beam_size=3,
        max_len=8,
    )
    out = np.asarray(out)
    assert out.shape == (2, 8)
    assert (out[:, 0] == BOS).all()
    # beam with k=1 must equal greedy
    beam1 = np.asarray(
        beam_search_decode(model, params, src, bos=BOS, eos=EOS, pad=PAD,
                           beam_size=1, max_len=8)
    )
    greedy = np.asarray(
        greedy_decode(model, params, src, bos=BOS, eos=EOS, pad=PAD,
                      max_len=8)
    )
    np.testing.assert_array_equal(beam1, greedy)


def test_corpus_bleu():
    refs = [[5, 6, 7, 8, 9, EOS, PAD]]
    assert corpus_bleu([[5, 6, 7, 8, 9, EOS]], refs, pad=PAD, eos=EOS) == (
        pytest.approx(1.0)
    )
    assert corpus_bleu([[10, 11, 12, 13, EOS]], refs, pad=PAD, eos=EOS) == 0.0
    partial = corpus_bleu([[5, 6, 7, 10, 11, EOS]], refs, pad=PAD, eos=EOS)
    assert 0.0 < partial < 1.0
