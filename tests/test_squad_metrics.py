"""SQuAD span-metric tests: known-answer examples for EM/F1 and the span
decode (VERDICT round-2 item 6 — harness eval parity with
/root/reference/examples/pytorch_squad_bert.py:615-648)."""

import numpy as np

from kfac_pytorch_tpu.utils.squad_metrics import (
    best_spans,
    exact_match_score,
    f1_score,
    normalize_answer,
    span_to_text,
    squad_evaluate,
)


def test_normalize_answer():
    assert normalize_answer("The  Quick, Brown Fox!") == "quick brown fox"
    assert normalize_answer("an Apple a day") == "apple day"


def test_exact_match():
    assert exact_match_score("The Beatles", "beatles") == 1.0
    assert exact_match_score("The Rolling Stones", "beatles") == 0.0


def test_f1_known_example():
    # pred {quick, brown} vs gold {quick, brown, fox}: P=1, R=2/3,
    # F1 = 2*1*(2/3)/(1+2/3) = 0.8
    assert abs(f1_score("quick brown", "quick brown fox") - 0.8) < 1e-9
    assert f1_score("", "fox") == 0.0
    assert f1_score("fox", "fox") == 1.0


def test_squad_evaluate_max_over_golds():
    m = squad_evaluate(
        ["quick brown", "cat"],
        [["quick brown fox", "quick brown"], ["dog", "the cat"]],
    )
    # example 1: EM 1 (second gold matches), example 2: EM 1 after
    # article stripping
    assert m["exact_match"] == 100.0
    assert m["f1"] == 100.0


def test_best_spans_constraints():
    t = 8
    sl = np.full((1, t), -5.0, np.float32)
    el = np.full((1, t), -5.0, np.float32)
    sl[0, 5] = 3.0  # best raw start late...
    el[0, 2] = 3.0  # ...but best end earlier: (5, 2) invalid (end < start)
    sl[0, 1] = 1.0
    el[0, 6] = 2.0
    s, e = best_spans(sl, el, max_answer_len=30)
    assert (s[0], e[0]) == (5, 6)  # best VALID pair, not best raw argmaxes
    # with tight max length the long span is excluded
    s, e = best_spans(sl, el, max_answer_len=2)
    assert e[0] - s[0] < 2
    assert e[0] >= s[0]


def test_best_spans_mask():
    sl = np.zeros((1, 6), np.float32)
    el = np.zeros((1, 6), np.float32)
    sl[0, 4] = 5.0
    el[0, 5] = 5.0
    mask = np.array([[1, 1, 1, 1, 0, 0]])
    s, e = best_spans(sl, el, attention_mask=mask)
    assert s[0] <= e[0] < 4  # masked positions never chosen


def test_span_to_text_roundtrip_em():
    ids = np.array([10, 11, 12, 13, 14])
    pred = span_to_text(ids, 1, 3)
    gold = span_to_text(ids, 1, 3)
    assert pred == "11 12 13"
    assert exact_match_score(pred, gold) == 1.0
    part = span_to_text(ids, 1, 2)
    # {11,12} vs {11,12,13}: F1 = 2*(1)*(2/3)/(5/3) = 0.8
    assert abs(f1_score(part, gold) - 0.8) < 1e-9
