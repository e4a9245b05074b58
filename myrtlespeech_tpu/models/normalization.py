"""Length-masked batch normalisation for padded sequence batches.

The reference's DS2 applies ``nn.BatchNorm1d`` over flattened (B*T, F)
activations between RNN layers; with padded dense batches the statistics
must exclude padding frames, which this module does explicitly.  Running
statistics live in the ``batch_stats`` flax collection.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm over features of a padded ``(B, T, F)`` batch.

    Statistics are computed over valid frames only (``t < lengths[b]``).
    """

    momentum: float = 0.9
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths, use_running_average: bool):
        B, T, F = x.shape
        scale = self.param("scale", nn.initializers.ones, (F,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (F,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((F,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((F,), jnp.float32))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mask = (jnp.arange(T)[None, :] < lengths[:, None])
            m = mask[:, :, None].astype(jnp.float32)
            n = jnp.maximum(jnp.sum(m), 1.0)
            xf = x.astype(jnp.float32)
            mean = jnp.sum(xf * m, axis=(0, 1)) / n
            var = jnp.sum(((xf - mean) * m) ** 2, axis=(0, 1)) / n
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)

        inv = (var + self.eps) ** -0.5
        out = (x.astype(jnp.float32) - mean) * inv * scale + bias
        return out.astype(self.dtype)
