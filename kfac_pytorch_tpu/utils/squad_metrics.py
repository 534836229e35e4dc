"""SQuAD span-extraction metrics: exact match and token-overlap F1.

The reference harness evaluates SQuAD with the official v1.1 metrics
(/root/reference/examples/pytorch_squad_bert.py:615-648 — squad_evaluate
over predicted answer strings). This module implements the same metric
definitions from the SQuAD paper:

  * answers are normalized (lowercase, strip punctuation and articles,
    collapse whitespace) before comparison;
  * exact match = normalized prediction == normalized gold;
  * F1 = harmonic mean of token precision/recall over the normalized
    bag-of-tokens overlap;
  * each prediction scores against the max over its gold answers.

Plus the span-decoding step the metrics need: picking the best
(start, end) pair from the QA head's logits under the standard
constraints (end >= start, span length bounded).
"""

from __future__ import annotations

import re
import string
from collections import Counter
from typing import Sequence, Tuple

import numpy as np

_ARTICLES = re.compile(r"\b(a|an|the)\b")
_PUNCT = set(string.punctuation)


def normalize_answer(s: str) -> str:
    """Lowercase, remove punctuation/articles, collapse whitespace."""
    s = s.lower()
    s = "".join(ch for ch in s if ch not in _PUNCT)
    s = _ARTICLES.sub(" ", s)
    return " ".join(s.split())


def exact_match_score(prediction: str, ground_truth: str) -> float:
    return float(normalize_answer(prediction) == normalize_answer(ground_truth))


def f1_score(prediction: str, ground_truth: str) -> float:
    pred_tokens = normalize_answer(prediction).split()
    gold_tokens = normalize_answer(ground_truth).split()
    if not pred_tokens or not gold_tokens:
        return float(pred_tokens == gold_tokens)
    common = Counter(pred_tokens) & Counter(gold_tokens)
    n_same = sum(common.values())
    if n_same == 0:
        return 0.0
    precision = n_same / len(pred_tokens)
    recall = n_same / len(gold_tokens)
    return 2 * precision * recall / (precision + recall)


def metric_max_over_ground_truths(metric_fn, prediction: str,
                                  ground_truths: Sequence[str]) -> float:
    return max(metric_fn(prediction, gt) for gt in ground_truths)


def squad_evaluate(predictions: Sequence[str],
                   gold_answers: Sequence[Sequence[str]]):
    """Corpus EM/F1 over (prediction, [gold...]) pairs, in percent.

    Mirrors the official evaluate(): averages per-example max-over-golds.
    """
    if len(predictions) != len(gold_answers):
        raise ValueError("predictions and gold_answers length mismatch")
    if not predictions:
        return {"exact_match": 0.0, "f1": 0.0}
    em = f1 = 0.0
    for pred, golds in zip(predictions, gold_answers):
        em += metric_max_over_ground_truths(exact_match_score, pred, golds)
        f1 += metric_max_over_ground_truths(f1_score, pred, golds)
    n = len(predictions)
    return {"exact_match": 100.0 * em / n, "f1": 100.0 * f1 / n}


def best_spans(start_logits: np.ndarray, end_logits: np.ndarray,
               max_answer_len: int = 30,
               attention_mask: np.ndarray = None
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Best (start, end) span per example from QA-head logits.

    start_logits/end_logits: (B, T). Score(i, j) = start[i] + end[j]
    maximized over j >= i, j - i < max_answer_len (the standard QA span
    decode the reference inherits from transformers' squad postprocessing).
    Positions with attention_mask == 0 are excluded. Returns
    (starts (B,), ends (B,)) int arrays.
    """
    start_logits = np.asarray(start_logits, np.float32)
    end_logits = np.asarray(end_logits, np.float32)
    b, t = start_logits.shape
    if attention_mask is not None:
        neg = np.float32(-1e9)
        m = np.asarray(attention_mask) == 0
        start_logits = np.where(m, neg, start_logits)
        end_logits = np.where(m, neg, end_logits)
    score = start_logits[:, :, None] + end_logits[:, None, :]  # (B, T, T)
    ii = np.arange(t)
    # row index = start i, col index = end j: need j >= i, j - i < max_len
    valid = (ii[None, :] >= ii[:, None]) & (ii[None, :] - ii[:, None]
                                            < max_answer_len)
    score = np.where(valid[None], score, -np.inf)
    flat = score.reshape(b, -1).argmax(axis=1)
    return (flat // t).astype(np.int64), (flat % t).astype(np.int64)


def span_to_text(token_ids: Sequence[int], start: int, end: int) -> str:
    """Whitespace-joined token-id 'words' for a span — the answer-string
    form used when no detokenizer is available (synthetic/npz data). Real
    tokenized datasets should pass detokenized strings to squad_evaluate
    directly; the metric is identical either way."""
    return " ".join(str(int(tok)) for tok in token_ids[start : end + 1])
