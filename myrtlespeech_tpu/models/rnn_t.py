"""RNN transducer model (reference ``model/rnn_t.py :: RNNT``).

MLPerf-style topology: LSTM encoder with mid-stack time reduction,
embedding+LSTM prediction network over label history, and a joint network
(concat -> activation -> FC) producing ``(B, T, U+1, V)`` logits.

``encode`` / ``predict_step`` / ``joint`` are exposed as separate module
methods exactly as the reference exposes them, because the greedy/beam
decoders drive them independently (SURVEY.md §3.3-3.4).  Unlike the
reference's per-step host loops, our decoders call these inside
``lax.while_loop`` on device.

Time reduction stacks ``r`` consecutive encoder frames into the feature dim
(stride ``r``), shrinking T and the (T, U) joint lattice — the main memory
lever for transducer training.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from myrtlespeech_tpu.config.schema import RNNTConfig
from myrtlespeech_tpu.models.activations import apply_activation
from myrtlespeech_tpu.models.fully_connected import FullyConnected
from myrtlespeech_tpu.models.rnn import RNN
from myrtlespeech_tpu.ops import masking


def time_reduce(x, lengths, factor: int):
    """Stack ``factor`` consecutive frames: ``(B, T, F) -> (B, ceil(T/r), F*r)``."""
    if factor == 1:
        return x, lengths
    B, T, F = x.shape
    pad = (-T) % factor
    x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    x = x.reshape(B, (T + pad) // factor, F * factor)
    return x, masking.time_reduction_out_lens(lengths, factor)


class RNNT(nn.Module):
    cfg: RNNTConfig
    vocab_size: int  # |alphabet| + 1 (blank)
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        c = self.cfg
        self.enc_rnn1 = RNN(c.encoder.rnn1, dtype=self.dtype)
        self.enc_rnn2 = (RNN(c.encoder.rnn2, dtype=self.dtype)
                         if c.encoder.rnn2 is not None else None)
        self.embedding = nn.Embed(self.vocab_size, c.prediction.embedding_dim,
                                  dtype=self.dtype, param_dtype=jnp.float32)
        self.pred_rnn = RNN(c.prediction.rnn, dtype=self.dtype)
        self.joint_fc = FullyConnected(c.joint.fc, self.vocab_size,
                                       dtype=self.dtype)

    def encode(self, x, lengths, train: bool = False):
        """Acoustic encoder: ``(B, T, F) -> (B, T', H_enc)`` + lengths."""
        c = self.cfg.encoder
        y, lengths, _ = self.enc_rnn1(x, lengths, train)
        y, lengths = time_reduce(y, lengths, c.time_reduction_factor)
        if self.enc_rnn2 is not None:
            y, lengths, _ = self.enc_rnn2(y, lengths, train)
        return y, lengths

    def predict(self, labels, label_lens, train: bool = False):
        """Prediction net over full label sequences (training path).

        ``labels (B, U) -> g (B, U+1, H_pred)``: a leading blank/SOS step
        (zero embedding, matching the reference's prepend-blank) followed by
        the label history.
        """
        B, U = labels.shape
        emb = self.embedding(labels.astype(jnp.int32))  # (B, U, E)
        emb = jnp.concatenate(
            [jnp.zeros((B, 1, emb.shape[-1]), emb.dtype), emb], axis=1)
        g, _, _ = self.pred_rnn(emb, label_lens + 1, train)
        return g  # (B, U+1, H_pred)

    def predict_step(self, token, state):
        """One prediction-net step for decoding.

        ``token (B,)`` int32 (-1 means SOS/blank-start: zero embedding);
        ``state``: per-layer RNN state or None.  Returns ``(g (B, H), state)``.
        """
        emb = jnp.where((token >= 0)[:, None],
                        self.embedding(jnp.maximum(token, 0).astype(jnp.int32)),
                        0.0)
        B = emb.shape[0]
        ones = jnp.ones((B,), jnp.int32)
        g, _, new_state = self.pred_rnn(emb[:, None, :], ones,
                                        initial_states=state)
        return g[:, 0, :], new_state

    def joint(self, f, g, train: bool = False):
        """Joint net on broadcast-combined encoder/prediction features.

        f: ``(B, T, H_enc)`` (or ``(B, H_enc)``), g: ``(B, U+1, H_pred)``
        (or ``(B, H_pred)``).  Returns logits ``(B, T, U+1, V)`` (or
        ``(B, V)`` for single-step decode).
        """
        c = self.cfg.joint
        if f.ndim == 2 and g.ndim == 2:
            h = jnp.concatenate([f, g], axis=-1)
        else:
            T = f.shape[1]
            U1 = g.shape[1]
            fe = jnp.broadcast_to(f[:, :, None, :],
                                  (f.shape[0], T, U1, f.shape[-1]))
            ge = jnp.broadcast_to(g[:, None, :, :],
                                  (g.shape[0], T, U1, g.shape[-1]))
            h = jnp.concatenate([fe, ge], axis=-1)
        h = apply_activation(c.activation, h)
        return self.joint_fc(h, train)

    def __call__(self, x, x_lens, labels, label_lens, train: bool = False):
        """Full training forward: joint logits ``(B, T', U+1, V)``."""
        f, f_lens = self.encode(x, x_lens, train)
        g = self.predict(labels, label_lens, train)
        return self.joint(f, g, train), f_lens
