"""Length-masked convolutions over padded sequence batches.

TPU-native counterpart of the reference's ``src/myrtlespeech/model/cnn.py ::
MaskConv1d / MaskConv2d / out_lens`` — the module family that owns the
sequence-length contract.  Activations past each example's length are zeroed
after every conv, and output lengths follow standard conv arithmetic
(:func:`myrtlespeech_tpu.ops.masking.conv_out_size`).

Layout: features enter as ``(B, T, F)``; 2-D convs view them as an NHWC
image ``(B, T, F, C)`` with time as the first spatial dim, which keeps the
channel dim last (TPU-friendly) and lets XLA tile the conv onto the MXU.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from myrtlespeech_tpu.config.schema import Activation, Conv2dConfig, PaddingMode
from myrtlespeech_tpu.models.activations import apply_activation
from myrtlespeech_tpu.models.normalization import MaskedBatchNorm
from myrtlespeech_tpu.ops import masking


def _pad_amount(mode: PaddingMode, kernel: int) -> int:
    return masking.same_padding(kernel) if mode is PaddingMode.SAME else 0


class MaskedConv2d(nn.Module):
    """One masked conv layer on ``(B, T, F, C)`` with BN + activation."""

    cfg: Conv2dConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, lengths, train: bool):
        c = self.cfg
        pad_t = _pad_amount(c.padding, c.kernel_time)
        pad_f = _pad_amount(c.padding, c.kernel_feature)
        # Static shape sanity: the reference's builders thread feature sizes
        # downward and fail early; mirror that with a clear diagnostic
        # instead of a downstream ZeroDivisionError inside init.
        out_f = masking.conv_out_size(x.shape[2], c.kernel_feature,
                                      c.stride_feature, pad_f)
        out_t = masking.conv_out_size(x.shape[1], c.kernel_time,
                                      c.stride_time, pad_t)
        if out_f <= 0 or out_t <= 0:
            raise ValueError(
                f"MaskedConv2d collapses input (T={x.shape[1]}, "
                f"F={x.shape[2]}) to (T={out_t}, F={out_f}) with "
                f"kernel=({c.kernel_time},{c.kernel_feature}) "
                f"stride=({c.stride_time},{c.stride_feature}) "
                f"padding={c.padding.name}; every output dim must be > 0")
        # Zero padded frames so they cannot leak into valid outputs.
        x = masking.mask_sequence(x, lengths, time_axis=1)
        y = nn.Conv(
            features=c.out_channels,
            kernel_size=(c.kernel_time, c.kernel_feature),
            strides=(c.stride_time, c.stride_feature),
            padding=((pad_t, pad_t), (pad_f, pad_f)),
            use_bias=c.bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x.astype(self.dtype))
        # Clamp at 0: a sequence shorter than the (unpadded) kernel has no
        # valid output frames — the formula would go negative.
        out_lens = jnp.maximum(masking.conv_out_size(
            lengths, c.kernel_time, c.stride_time, pad_t), 0)
        if c.batch_norm:
            B, T, F, C = y.shape
            y = MaskedBatchNorm(dtype=self.dtype)(
                y.reshape(B, T, F * C), out_lens,
                use_running_average=not train).reshape(B, T, F, C)
        y = apply_activation(c.activation, y)
        y = masking.mask_sequence(y, out_lens, time_axis=1)
        return y, out_lens


class ConvBlock(nn.Module):
    """Stack of masked 2-D convs (the DS2 frontend).

    ``(B, T, F) -> (B, T', F' * C)`` flattened for the RNN stack, plus
    updated lengths.
    """

    layers: Tuple[Conv2dConfig, ...]
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, lengths, train: bool):
        y = x[..., None]  # (B, T, F, 1)
        for cfg in self.layers:
            y, lengths = MaskedConv2d(cfg, dtype=self.dtype)(
                y, lengths, train)
        B, T, F, C = y.shape
        return y.reshape(B, T, F * C), lengths


def conv_block_out_features(layers: Tuple[Conv2dConfig, ...],
                            in_features: int) -> int:
    """Static feature-dim formula for :class:`ConvBlock` output."""
    f = in_features
    c = 1
    for cfg in layers:
        pad_f = _pad_amount(cfg.padding, cfg.kernel_feature)
        f = masking.conv_out_size(f, cfg.kernel_feature, cfg.stride_feature,
                                  pad_f)
        c = cfg.out_channels
    return f * c
