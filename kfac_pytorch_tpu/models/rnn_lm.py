"""Word-level RNN language models (LSTM/GRU) in flax, K-FAC-tagged.

Re-design of the reference's WikiText-2 workload
(/root/reference/examples/wikitext_models.py:12-72): embedding -> n RNN
layers -> dense decoder over the vocabulary.

K-FAC scope parity: the reference registers only Linear/Conv2d modules, so
in the RNN model only the decoder Linear is preconditioned — and its
harness is flagged "does not work with K-FAC yet"
(pytorch_wikitext_rnn.py:6) because it calls a defunct API. Here the decoder
is a working K-FAC layer (its (B, T, D) activations take the seq-mean factor
path), and it can optionally be excluded like a vocab projection.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from kfac_pytorch_tpu.capture import KFACDense


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
                cell = nn.OptimizedLSTMCell(self.hidden_dim, name=f"lstm{i}")
            elif self.cell == "gru":
                cell = nn.GRUCell(self.hidden_dim, name=f"gru{i}")
            else:
                raise ValueError(f"unknown cell {self.cell}")
            x = nn.RNN(cell, name=f"rnn{i}")(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        logits = KFACDense(
            self.vocab_size, exclude=self.exclude_decoder, name="decoder"
        )(x)
        return logits
