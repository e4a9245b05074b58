"""Per-timestep MLP (reference ``model/fully_connected.py :: FullyConnected``).

Applies ``num_hidden_layers`` hidden Dense layers with the configured
activation, then a final Dense to ``out_features`` (no activation after the
final layer, matching the reference).  Works on any ``(..., F)`` input; for
``(B, T, F)`` batches XLA folds the time dim into one big MXU matmul.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from myrtlespeech_tpu.config.schema import FullyConnectedConfig
from myrtlespeech_tpu.models.activations import apply_activation


class FullyConnected(nn.Module):
    cfg: FullyConnectedConfig
    out_features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        y = x.astype(self.dtype)
        for _ in range(c.num_hidden_layers):
            y = nn.Dense(c.hidden_size, dtype=self.dtype,
                         param_dtype=jnp.float32)(y)
            y = apply_activation(c.activation, y)
            if c.dropout > 0:
                y = nn.Dropout(rate=c.dropout, deterministic=not train)(y)
        return nn.Dense(self.out_features, dtype=self.dtype,
                        param_dtype=jnp.float32)(y)
