"""CLI-level smoke tests of the example harnesses.

The library pipelines are covered by their own tests; these pin the
HARNESS wiring — argument parsing, kfac-name -> config mapping, trainer
selection — which is exactly the layer where a silent mismapping can ship
(the round-4 find: train_imagenet.py mapped --kfac-name pcg_dp to
inverse-mpd through an incomplete if-chain). Mirrors the reference's
smoke usage of its example scripts (README:70-90).
"""

import jax
import jax.numpy as jnp

from examples.train_cifar import main as cifar_main
from examples.train_imagenet import main as imagenet_main


def _all_finite(tree) -> bool:
    leaves = jax.tree_util.tree_leaves(tree)
    return all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)


def _cifar_args(extra):
    return [
        "--model", "resnet20", "--synthetic", "--epochs", "1",
        "--iters", "2", "--batch-size", "16", "--seed", "0",
    ] + extra


def test_cifar_loop_kfac_runs():
    state = cifar_main(_cifar_args(["--kfac-update-freq", "1"]))
    assert _all_finite(state.params)


def test_cifar_bucketed_trainer_runs():
    state = cifar_main(_cifar_args(
        ["--trainer", "bucketed", "--kfac-update-freq", "1"]))
    # BucketedTrainState exposes the same params surface
    assert _all_finite(state.params)


def test_cifar_bucketed_requires_kfac():
    import pytest

    with pytest.raises(SystemExit):
        cifar_main(_cifar_args(
            ["--trainer", "bucketed", "--kfac-update-freq", "0"]))


def test_imagenet_production_keeps_validated_strides(monkeypatch):
    """--production must keep the convergence-validated stride combo
    (factor_spatial_stride=3, factor_g_spatial_stride=1) when the stride
    flags are unset — the CLI defaults must not leak into the production
    config (round-4 ADVICE: they silently reverted it to full-position
    stats). An explicit A-stride override must not drag G back to
    follow-A (the convergence-failed (3,3) combo)."""
    import examples.train_imagenet as ti

    captured = {}
    real = ti.BlockKFAC

    class Spy(real):
        def __init__(self, specs, cfg, **kw):
            captured["cfg"] = cfg
            super().__init__(specs, cfg, **kw)

    monkeypatch.setattr(ti, "BlockKFAC", Spy)
    base = [
        "--model", "imagenet-resnet18", "--image-size", "32",
        "--num-classes", "10", "--batch-size", "4", "--epochs", "1",
        "--iters", "1", "--production", "--trainer", "bucketed",
        "--seed", "0",
    ]
    ti.main(base)
    assert captured["cfg"].factor_spatial_stride == 3
    assert captured["cfg"].factor_g_spatial_stride == 1
    # explicit A-only override: G stays pinned at the production value
    ti.main(base + ["--factor-spatial-stride", "2"])
    assert captured["cfg"].factor_spatial_stride == 2
    assert captured["cfg"].factor_g_spatial_stride == 1
    # explicit full-position opt-out works
    ti.main(base + ["--factor-spatial-stride", "1",
                    "--factor-g-spatial-stride", "-1"])
    assert captured["cfg"].factor_spatial_stride == 1
    assert captured["cfg"].factor_g_spatial_stride is None


def test_imagenet_pcg_dp_maps_to_pcg():
    # the mapping bug: pcg_dp must build a pcg/dp BlockKFAC, not
    # inverse/mpd
    state = imagenet_main([
        "--model", "imagenet-resnet18", "--image-size", "32",
        "--num-classes", "10", "--batch-size", "4", "--epochs", "1",
        "--iters", "1", "--kfac-name", "pcg_dp", "--seed", "0",
    ])
    assert _all_finite(state.params)


def test_multi30k_harness_with_bleu_runs():
    """Transformer harness end-to-end incl. the beam-search BLEU eval —
    the vocab-excluded output projection + seq-mean Linear factor path
    (reference pytorch_multi30k_transformer.py:470-491)."""
    from examples.train_multi30k import main as multi30k_main

    state = multi30k_main([
        "--synthetic", "--iters", "2", "--epochs", "1",
        "--batch-size", "8", "--seq-len", "12",
        "--d-model", "32", "--d-ff", "64", "--n-layers", "1",
        "--n-head", "2", "--src-vocab", "64", "--trg-vocab", "64",
        "--eval-bleu", "--beam-size", "2", "--seed", "0",
    ])
    assert _all_finite(state.params)


def test_squad_harness_runs():
    """BERT-QA harness: HF FlaxBert through the interceptor + span F1/EM
    eval (reference pytorch_squad_bert.py)."""
    from examples.train_squad import main as squad_main

    params = squad_main([
        "--synthetic", "--iters", "2", "--epochs", "1",
        "--batch-size", "2", "--seq-len", "32", "--model-size", "tiny",
        "--seed", "0",
    ])
    assert _all_finite(params)


def test_wikitext_harness_runs():
    """RNN-LM harness: working K-FAC over the unrolled input/output
    projections (the reference's wikitext harness is broken with K-FAC,
    pytorch_wikitext_rnn.py:6)."""
    from examples.train_wikitext import main as wikitext_main

    state = wikitext_main([
        "--synthetic", "--iters", "2", "--epochs", "1",
        "--batch-size", "4", "--bptt", "8", "--vocab", "64",
        "--emb-dim", "16", "--hidden-dim", "16", "--n-layers", "1",
        "--seed", "0",
    ])
    assert _all_finite(state)
