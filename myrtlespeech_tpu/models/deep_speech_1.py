"""DeepSpeech 1 acoustic model (reference ``model/deep_speech_1.py``).

Topology (Hannun et al. 2014, as built by the reference's builder):
3 per-frame Dense layers with clipped ReLU + dropout -> one bidirectional
LSTM -> one Dense hidden layer -> output Dense to ``out_features`` logits.
Input is context-stacked features ``(B, T, F*(2n+1))``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from myrtlespeech_tpu.config.schema import DeepSpeech1Config, RNNConfig, RNNType
from myrtlespeech_tpu.models.rnn import RNN


class DeepSpeech1(nn.Module):
    cfg: DeepSpeech1Config
    out_features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, lengths, train: bool = False):
        c = self.cfg
        y = x.astype(self.dtype)
        for _ in range(3):
            y = nn.Dense(c.n_hidden, dtype=self.dtype,
                         param_dtype=jnp.float32)(y)
            y = jnp.clip(y, 0.0, c.relu_clip)
            y = nn.Dropout(rate=c.drop_prob, deterministic=not train)(y)
        rnn_cfg = RNNConfig(rnn_type=RNNType.LSTM, hidden_size=c.n_hidden,
                            num_layers=1, bidirectional=True,
                            forget_gate_bias=c.forget_gate_bias)
        y, lengths, _ = RNN(rnn_cfg, dtype=self.dtype)(y, lengths, train)
        y = nn.Dense(c.n_hidden, dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = jnp.clip(y, 0.0, c.relu_clip)
        y = nn.Dropout(rate=c.drop_prob, deterministic=not train)(y)
        logits = nn.Dense(self.out_features, dtype=self.dtype,
                          param_dtype=jnp.float32)(y)
        return logits, lengths
