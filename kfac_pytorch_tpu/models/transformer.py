"""Encoder-decoder Transformer (Multi-30k-class seq2seq) in flax, K-FAC-tagged.

TPU-native re-design of the reference's Transformer workload
(/root/reference/examples/transformer/{Models,SubLayers,Layers,Modules}.py):
per-MHA four bias-free projections (w_qs/w_ks/w_vs/fc — all K-FAC dense
layers with (B, T, D) activations hitting the seq-mean factor path,
kfac/utils.py:98-99), position-wise FFN with biases, sinusoidal positional
encoding, post-LN residual blocks, shared target embedding / output
projection, and the pre-softmax vocab projection excluded from K-FAC
(the reference's exclude_vocabulary_size, kfac_preconditioner_base.py:139).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from kfac_pytorch_tpu.capture import KFACDense


def sinusoid_table(max_len: int, d_model: int) -> np.ndarray:
    pos = np.arange(max_len)[:, None]
    i = np.arange(d_model)[None, :]
    angle = pos / np.power(10000.0, 2 * (i // 2) / d_model)
    table = np.zeros((max_len, d_model), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


class MultiHeadAttention(nn.Module):
    n_head: int
    d_model: int
    d_k: int
    d_v: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q, k, v, mask=None, train: bool = False):
        residual = q
        b, lq = q.shape[0], q.shape[1]
        # bias-free projections (reference SubLayers.py:21-24)
        qh = KFACDense(self.n_head * self.d_k, use_bias=False, name="w_qs")(q)
        kh = KFACDense(self.n_head * self.d_k, use_bias=False, name="w_ks")(k)
        vh = KFACDense(self.n_head * self.d_v, use_bias=False, name="w_vs")(v)
        qh = qh.reshape(b, lq, self.n_head, self.d_k).transpose(0, 2, 1, 3)
        kh = kh.reshape(b, k.shape[1], self.n_head, self.d_k).transpose(0, 2, 1, 3)
        vh = vh.reshape(b, v.shape[1], self.n_head, self.d_v).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(self.d_k)
        if mask is not None:
            attn = jnp.where(mask[:, None, :, :], attn, -1e9)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, -1)
        out = KFACDense(self.d_model, use_bias=False, name="fc")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return nn.LayerNorm(epsilon=1e-6)(out + residual)


class PositionwiseFFN(nn.Module):
    d_model: int
    d_ff: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = KFACDense(self.d_ff, name="w_1")(x)
        y = nn.relu(y)
        y = KFACDense(self.d_model, name="w_2")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.LayerNorm(epsilon=1e-6)(y + residual)


class EncoderLayer(nn.Module):
    d_model: int
    d_ff: int
    n_head: int
    d_k: int
    d_v: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        x = MultiHeadAttention(
            self.n_head, self.d_model, self.d_k, self.d_v, self.dropout,
            name="slf_attn",
        )(x, x, x, mask, train)
        return PositionwiseFFN(
            self.d_model, self.d_ff, self.dropout, name="ffn"
        )(x, train)


class DecoderLayer(nn.Module):
    d_model: int
    d_ff: int
    n_head: int
    d_k: int
    d_v: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, enc, slf_mask=None, cross_mask=None,
                 train: bool = False):
        x = MultiHeadAttention(
            self.n_head, self.d_model, self.d_k, self.d_v, self.dropout,
            name="slf_attn",
        )(x, x, x, slf_mask, train)
        x = MultiHeadAttention(
            self.n_head, self.d_model, self.d_k, self.d_v, self.dropout,
            name="enc_attn",
        )(x, enc, enc, cross_mask, train)
        return PositionwiseFFN(
            self.d_model, self.d_ff, self.dropout, name="ffn"
        )(x, train)


class Transformer(nn.Module):
    """Seq2seq Transformer; __call__(src, trg) -> logits (B, Tt, n_trg_vocab).

    pad_idx tokens are masked out; the target-side causal mask is applied.
    """

    n_src_vocab: int
    n_trg_vocab: int
    d_model: int = 512
    d_ff: int = 2048
    n_layers: int = 6
    n_head: int = 8
    dropout: float = 0.1
    max_len: int = 256
    pad_idx: int = 1
    share_emb_prj: bool = True

    @nn.compact
    def __call__(self, src, trg, train: bool = False):
        d_k = d_v = self.d_model // self.n_head
        pos = jnp.asarray(sinusoid_table(self.max_len, self.d_model))

        src_mask = (src != self.pad_idx)[:, None, :]  # (B, 1, Ts)
        trg_pad = (trg != self.pad_idx)[:, None, :]  # (B, 1, Tt)
        tt = trg.shape[1]
        causal = jnp.tril(jnp.ones((tt, tt), bool))[None, :, :]
        trg_mask = trg_pad & causal  # (B, Tt, Tt)

        src_emb = nn.Embed(
            self.n_src_vocab, self.d_model, name="src_word_emb"
        )(src)
        x = src_emb + pos[None, : src.shape[1]]
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.LayerNorm(epsilon=1e-6)(x)
        enc_mask = jnp.repeat(src_mask, src.shape[1], axis=1)  # (B, Ts, Ts)
        for i in range(self.n_layers):
            x = EncoderLayer(
                self.d_model, self.d_ff, self.n_head, d_k, d_v, self.dropout,
                name=f"enc_layer{i}",
            )(x, enc_mask, train)

        trg_embed = nn.Embed(
            self.n_trg_vocab, self.d_model, name="trg_word_emb"
        )
        y = trg_embed(trg) + pos[None, :tt]
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.LayerNorm(epsilon=1e-6)(y)
        cross_mask = jnp.repeat(src_mask, tt, axis=1)  # (B, Tt, Ts)
        for i in range(self.n_layers):
            y = DecoderLayer(
                self.d_model, self.d_ff, self.n_head, d_k, d_v, self.dropout,
                name=f"dec_layer{i}",
            )(y, x, trg_mask, cross_mask, train)

        if self.share_emb_prj:
            # weight tying (reference Models.py:179-181) + 1/sqrt(d) scaling
            logits = y @ trg_embed.embedding.T * (self.d_model**-0.5)
        else:
            # pre-softmax projection excluded from K-FAC (reference
            # base.py:139-140 via exclude_vocabulary_size)
            logits = KFACDense(
                self.n_trg_vocab, use_bias=False, exclude=True,
                name="trg_word_prj",
            )(y)
        return logits
