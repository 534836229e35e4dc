"""Autoregressive decoding for the seq2seq Transformer (greedy + beam).

Equivalent of the reference's beam-search Translator
(/root/reference/examples/transformer/Translator.py, used for BLEU eval in
pytorch_multi30k_transformer.py:470-491), re-designed for TPU: the decode
loop is a jitted ``lax.while_loop``/``scan`` over a fixed maximum length
with static shapes (no dynamic-length tensors), and beams are just a batch
dimension.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def greedy_decode(
    model, params, src: jax.Array, *, bos: int, eos: int, pad: int,
    max_len: int = 64,
) -> jax.Array:
    """Greedy decoding. src: (B, Ts) -> tokens (B, max_len) (bos-led,
    eos/pad-filled)."""

    @jax.jit
    def run(params, src):
        b = src.shape[0]
        trg = jnp.full((b, max_len), pad, jnp.int32)
        trg = trg.at[:, 0].set(bos)
        done = jnp.zeros((b,), bool)

        def body(i, carry):
            trg, done = carry
            logits = model.apply({"params": params}, src, trg)
            nxt = jnp.argmax(logits[:, i - 1, :], axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, pad, nxt)
            trg = trg.at[:, i].set(nxt)
            done = done | (nxt == eos)
            return trg, done

        trg, _ = jax.lax.fori_loop(1, max_len, body, (trg, done))
        return trg

    return run(params, src)


def beam_search_decode(
    model, params, src: jax.Array, *, bos: int, eos: int, pad: int,
    beam_size: int = 4, max_len: int = 64, length_alpha: float = 0.7,
) -> jax.Array:
    """Beam search (reference Translator defaults beam=5, here configurable).

    Returns the best hypothesis per source sentence: (B, max_len).
    Static shapes: beams are an extra batch dimension, finished beams keep
    accumulating pad tokens with frozen scores.
    """

    @jax.jit
    def run(params, src):
        b, ts = src.shape
        k = beam_size
        # expand sources across beams: (B*k, Ts)
        src_rep = jnp.repeat(src, k, axis=0)
        trg = jnp.full((b, k, max_len), pad, jnp.int32).at[:, :, 0].set(bos)
        # only beam 0 alive initially so the first expansion isn't k copies
        scores = jnp.where(
            jnp.arange(k)[None, :] == 0, 0.0, NEG_INF
        ) * jnp.ones((b, 1))
        done = jnp.zeros((b, k), bool)

        def body(i, carry):
            trg, scores, done = carry
            logits = model.apply(
                {"params": params}, src_rep, trg.reshape(b * k, max_len)
            )
            logp = jax.nn.log_softmax(logits[:, i - 1, :]).reshape(b, k, -1)
            v = logp.shape[-1]
            # finished beams only extend with pad at no cost
            pad_only = jnp.full((b, k, v), NEG_INF).at[:, :, pad].set(0.0)
            logp = jnp.where(done[:, :, None], pad_only, logp)
            cand = scores[:, :, None] + logp  # (b, k, v)
            flat = cand.reshape(b, k * v)
            top_scores, top_idx = jax.lax.top_k(flat, k)
            beam_idx = top_idx // v
            tok = (top_idx % v).astype(jnp.int32)
            trg = jnp.take_along_axis(
                trg, beam_idx[:, :, None], axis=1
            ).at[:, :, i].set(tok)
            done = (
                jnp.take_along_axis(done, beam_idx, axis=1)
                | (tok == eos)
            )
            return trg, top_scores, done

        trg, scores, done = jax.lax.fori_loop(
            1, max_len, body, (trg, scores, done)
        )
        # length-normalized selection (GNMT alpha; reference normalizes too)
        lengths = jnp.sum((trg != pad).astype(jnp.float32), axis=-1)
        norm = scores / (lengths**length_alpha)
        best = jnp.argmax(norm, axis=1)
        return jnp.take_along_axis(trg, best[:, None, None], axis=1)[:, 0, :]

    return run(params, src)


def corpus_bleu(hyps, refs, *, pad: int, eos: int, max_n: int = 4) -> float:
    """Corpus BLEU-4 on token id sequences (numpy; for eval parity with the
    reference's BLEU reporting)."""
    import collections
    import math

    def clean(seq):
        out = []
        for t in seq:
            if t == eos:
                break
            if t != pad:
                out.append(int(t))
        return out

    p_logs = []
    hyp_len = ref_len = 0
    clip_counts = [0] * max_n
    totals = [0] * max_n
    for h, r in zip(hyps, refs):
        h, r = clean(h), clean(r)
        hyp_len += len(h)
        ref_len += len(r)
        for n in range(1, max_n + 1):
            hc = collections.Counter(
                tuple(h[i : i + n]) for i in range(len(h) - n + 1)
            )
            rc = collections.Counter(
                tuple(r[i : i + n]) for i in range(len(r) - n + 1)
            )
            clip_counts[n - 1] += sum(min(c, rc[g]) for g, c in hc.items())
            totals[n - 1] += max(sum(hc.values()), 0)
    if totals[0] == 0 or clip_counts[0] == 0:
        return 0.0
    for n in range(max_n):
        if totals[n] == 0:
            return 0.0
        if clip_counts[n] == 0:
            # smoothing (Chen & Cherry method 1) for short segments
            p_logs.append(math.log(1.0 / (2.0 * totals[n])))
        else:
            p_logs.append(math.log(clip_counts[n] / totals[n]))
    bp = min(1.0, math.exp(1.0 - ref_len / max(hyp_len, 1)))
    return bp * math.exp(sum(p_logs) / max_n)
