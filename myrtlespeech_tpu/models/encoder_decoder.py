"""Generic CTC-style encoder/decoder (reference ``model/encoder_decoder/``).

Encoder: optional conv frontend (VGG or masked conv block) then an optional
RNN stack.  Decoder: per-frame FullyConnected to logits.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from myrtlespeech_tpu.config.schema import EncoderDecoderConfig
from myrtlespeech_tpu.models.cnn import ConvBlock
from myrtlespeech_tpu.models.fully_connected import FullyConnected
from myrtlespeech_tpu.models.rnn import RNN
from myrtlespeech_tpu.models.vgg import VGG


class Encoder(nn.Module):
    cfg: EncoderDecoderConfig  # uses .encoder
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, lengths, train: bool = False):
        e = self.cfg.encoder
        y = x
        if e.vgg is not None:
            y, lengths = VGG(e.vgg, dtype=self.dtype)(y, lengths, train)
        if e.conv_block:
            y, lengths = ConvBlock(e.conv_block, dtype=self.dtype)(
                y, lengths, train)
        if e.rnn is not None:
            y, lengths, _ = RNN(e.rnn, dtype=self.dtype)(y, lengths, train)
        return y, lengths


class EncoderDecoder(nn.Module):
    cfg: EncoderDecoderConfig
    out_features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, lengths, train: bool = False):
        y, lengths = Encoder(self.cfg, dtype=self.dtype)(x, lengths, train)
        logits = FullyConnected(self.cfg.decoder, self.out_features,
                                dtype=self.dtype)(y, train)
        return logits, lengths
