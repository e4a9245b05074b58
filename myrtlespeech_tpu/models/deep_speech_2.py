"""DeepSpeech 2 acoustic model (reference ``model/deep_speech_2.py``).

conv frontend (masked 2-D convs) -> stacked (bi)RNN with BN between layers
-> optional lookahead (unidirectional only) -> per-frame FC -> logits.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from myrtlespeech_tpu.config.schema import DeepSpeech2Config
from myrtlespeech_tpu.models.cnn import ConvBlock
from myrtlespeech_tpu.models.fully_connected import FullyConnected
from myrtlespeech_tpu.models.lookahead import Lookahead
from myrtlespeech_tpu.models.rnn import RNN


class DeepSpeech2(nn.Module):
    cfg: DeepSpeech2Config
    out_features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, lengths, train: bool = False):
        c = self.cfg
        y, lengths = ConvBlock(c.conv_block, dtype=self.dtype)(
            x, lengths, train)
        y, lengths, _ = RNN(c.rnn, dtype=self.dtype)(y, lengths, train)
        if c.lookahead is not None:
            if c.rnn.bidirectional:
                raise ValueError("lookahead requires unidirectional rnn")
            y = Lookahead(c.lookahead.context, dtype=self.dtype)(y, lengths)
        logits = FullyConnected(c.fully_connected, self.out_features,
                                dtype=self.dtype)(y, train)
        return logits, lengths
