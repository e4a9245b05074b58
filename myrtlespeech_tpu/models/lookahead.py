"""Lookahead layer (reference ``model/lookahead.py :: Lookahead``).

For unidirectional DS2: each output frame is a per-feature linear
combination of the current and next ``context`` frames,

    y[t, f] = sum_{i=0..context} w[i, f] * x[t + i, f],

implemented as a gather-free stack of shifted slices contracted against the
weight — elementwise multiplies the VPU fuses, no host loops, static shapes.
Frames past the sequence end contribute zeros (inputs are masked).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from myrtlespeech_tpu.ops import masking


class Lookahead(nn.Module):
    context: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, lengths):
        B, T, F = x.shape
        w = self.param("weight", nn.initializers.xavier_uniform(),
                       (self.context + 1, F), jnp.float32)
        x = masking.mask_sequence(x, lengths, time_axis=1)
        padded = jnp.pad(x, ((0, 0), (0, self.context), (0, 0)))
        y = jnp.zeros_like(x, dtype=jnp.float32)
        for i in range(self.context + 1):
            y = y + padded[:, i:i + T, :].astype(jnp.float32) * w[i]
        return y.astype(self.dtype)
