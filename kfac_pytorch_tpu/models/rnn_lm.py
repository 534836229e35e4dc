"""Word-level RNN language models (LSTM/GRU) in flax, K-FAC-tagged.

Re-design of the reference's WikiText-2 workload
(/root/reference/examples/wikitext_models.py:12-72): embedding -> n RNN
layers -> dense decoder over the vocabulary.

K-FAC scope: the reference registers only Linear/Conv2d modules and its
RNN harness is broken outright ("does not work with K-FAC yet",
pytorch_wikitext_rnn.py:6 — it calls a defunct API). Here:

  * the decoder Linear is a working K-FAC layer ((B, T, D) activations take
    the seq-mean factor path), optionally excluded like a vocab projection;
  * each recurrent layer's INPUT projection (x_t -> gates) is hoisted out
    of the time recurrence — mathematically identical, and as a whole-
    sequence dense it is K-FAC-taggable with seq-mean factors. Only the
    hidden-to-gates recurrent matrix stays inside the scan as a plain
    parameter (first-order updated), since its per-timestep activations
    live inside lax.scan.

Coverage: 1 + 2*n_layers preconditioned modules (decoder + ih per layer +
the candidate/gate split below) vs the reference's zero working ones.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from kfac_pytorch_tpu.capture import KFACDense


class KFACLSTMLayer(nn.Module):
    """LSTM over (B, T, E) with the input projection as a K-FAC dense.

    Gate math matches flax nn.LSTMCell: i, f, g, o = split(W_ih x + b +
    W_hh h); c' = sigmoid(f) c + sigmoid(i) tanh(g); h' = sigmoid(o)
    tanh(c'). The x-projection for ALL timesteps is one tagged dense; the
    recurrence applies only the (untagged) hidden projection.
    """

    hidden: int

    @nn.compact
    def __call__(self, x):
        h4 = 4 * self.hidden
        gx = KFACDense(h4, name="ih")(x)  # (B, T, 4H), K-FAC-tagged
        w_hh = self.param(
            "hh_kernel", nn.initializers.lecun_normal(),
            (self.hidden, h4),
        )

        def step(carry, gx_t):
            c, h = carry
            z = gx_t + h @ w_hh
            i, f, g, o = jnp.split(z, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (c, h), h

        b = x.shape[0]
        init = (
            jnp.zeros((b, self.hidden), x.dtype),
            jnp.zeros((b, self.hidden), x.dtype),
        )
        _, hs = jax.lax.scan(step, init, jnp.swapaxes(gx, 0, 1))
        return jnp.swapaxes(hs, 0, 1)  # (B, T, H)


class KFACGRULayer(nn.Module):
    """GRU over (B, T, E) with the input projection as a K-FAC dense.

    flax nn.GRUCell math: r, z = sigmoid(W_i{r,z} x + b + W_h{r,z} h);
    n = tanh(W_in x + b_in + r * (W_hn h)); h' = (1-z) n + z h.
    """

    hidden: int

    @nn.compact
    def __call__(self, x):
        gx = KFACDense(3 * self.hidden, name="ih")(x)  # (B, T, 3H) tagged
        w_hh = self.param(
            "hh_kernel", nn.initializers.lecun_normal(),
            (self.hidden, 3 * self.hidden),
        )

        def step(h, gx_t):
            hz = h @ w_hh
            xr, xz, xn = jnp.split(gx_t, 3, axis=-1)
            hr, hzg, hn = jnp.split(hz, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hzg)
            n = jnp.tanh(xn + r * hn)
            h = (1.0 - z) * n + z * h
            return h, h

        b = x.shape[0]
        init = jnp.zeros((b, self.hidden), x.dtype)
        _, hs = jax.lax.scan(step, init, jnp.swapaxes(gx, 0, 1))
        return jnp.swapaxes(hs, 0, 1)


class RNNLM(nn.Module):
    vocab_size: int
    emb_dim: int = 200
    hidden_dim: int = 200
    n_layers: int = 2
    cell: str = "lstm"  # 'lstm' | 'gru'
    dropout: float = 0.5
    exclude_decoder: bool = False
    tie_weights: bool = False

    @nn.compact
    def __call__(self, tokens, train: bool = False):
        """tokens: (B, T) int32 -> logits (B, T, vocab)."""
        x = nn.Embed(self.vocab_size, self.emb_dim, name="encoder")(tokens)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        for i in range(self.n_layers):
            if self.cell == "lstm":
                x = KFACLSTMLayer(self.hidden_dim, name=f"lstm{i}")(x)
            elif self.cell == "gru":
                x = KFACGRULayer(self.hidden_dim, name=f"gru{i}")(x)
            else:
                raise ValueError(f"unknown cell {self.cell}")
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        logits = KFACDense(
            self.vocab_size, exclude=self.exclude_decoder, name="decoder"
        )(x)
        return logits
