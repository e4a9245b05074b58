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
import jax
import jax.numpy as jnp

from myrtlespeech_tpu.config import schema as S
from myrtlespeech_tpu.config.schema import RNNTConfig, RNNTJointNetConfig
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


class RNNTJoint(nn.Module):
    """Factored joint network: ``act(f) @ W_f + act(g) @ W_g`` broadcast-add.

    The reference joint (``src/myrtlespeech/model/rnn_t.py :: RNNT``,
    SURVEY.md §3.3) broadcasts f and g to a ``(B, T, U+1, H_enc+H_pred)``
    concat and feeds it through an MLP — redundantly recomputing
    ``f @ W[:H_enc]`` for every u and ``g @ W[H_enc:]`` for every t.
    Because the pre-FC activation is elementwise and the first FC layer is
    linear over the concat, the first layer factors exactly:

        FC1(act(concat(f, g))) == act(f) @ W[:H_enc] + act(g) @ W[H_enc:] + b

    so the two projections run as small ``(B,T,K)`` / ``(B,U+1,K)``
    matmuls and only the K-wide *sum* ever exists per lattice cell.  At
    the flagship shape (T'=250, U+1=65, H=1344, K=512) this removes
    ~97% of the first layer's FLOPs (the ratio is ``T*U/(T+U)``) and the
    broadcast concat tensor entirely.  The parameter is kept as ONE
    ``(H_enc+H_pred, K)`` kernel — identical shape, init distribution and
    TP column-sharding as the unfactored Dense; the split is a trace-time
    slice.
    """

    cfg: RNNTJointNetConfig
    vocab_size: int
    h_enc: int
    h_pred: int
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        c = self.cfg.fc
        K = c.hidden_size if c.num_hidden_layers >= 1 else self.vocab_size
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.h_enc + self.h_pred, K), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros, (K,),
                               jnp.float32)
        if c.num_hidden_layers >= 1:
            rest = S.replace(c, num_hidden_layers=c.num_hidden_layers - 1)
            self.rest = FullyConnected(rest, self.vocab_size,
                                       dtype=self.dtype)
            self.drop = (nn.Dropout(rate=c.dropout)
                         if c.dropout > 0 else None)

    def project(self, f, g):
        """First-layer projections ``(fp, gp)`` with the pre-FC activation
        applied and the first-layer bias folded into ``gp``."""
        return self.project_f(f), self.project_g(g)

    def project_f(self, f):
        """Encoder-side first-layer projection only (decode-time hoist:
        computed ONCE per utterance instead of per joint evaluation)."""
        f = apply_activation(self.cfg.activation, f).astype(self.dtype)
        return f @ self.kernel.astype(self.dtype)[:self.h_enc]

    def project_g(self, g):
        g = apply_activation(self.cfg.activation, g).astype(self.dtype)
        return g @ self.kernel.astype(self.dtype)[self.h_enc:] \
            + self.bias.astype(self.dtype)

    def from_fp(self, fp, g, train: bool = False):
        """Joint on a PRE-PROJECTED encoder row: ``tail(fp + project_g(g))``.

        The on-device decoders evaluate the joint per (frame, hypothesis,
        round); with ``fp`` hoisted out of the loop each evaluation costs
        one small matmul + the tail instead of re-projecting f every time.
        """
        return self.tail(fp + self.project_g(g), train)

    def tail(self, h, train: bool = False):
        """Everything after the factored first layer: activation + dropout
        + remaining FC hidden layers + final vocab Dense."""
        c = self.cfg.fc
        if c.num_hidden_layers == 0:
            return h  # first layer WAS the vocab projection
        h = apply_activation(c.activation, h)
        if self.drop is not None:
            h = self.drop(h, deterministic=not train)
        return self.rest(h, train)

    def __call__(self, f, g, train: bool = False):
        fp, gp = self.project(f, g)
        if f.ndim == 2:
            h = fp + gp  # single decode step: (B, K)
        else:
            h = fp[:, :, None, :] + gp[:, None, :, :]  # (B, T, U+1, K)
        return self.tail(h, train)


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
        if c.encoder.rnn2 is not None:
            h_enc = c.encoder.rnn2.hidden_size * (
                2 if c.encoder.rnn2.bidirectional else 1)
        else:
            h_enc = (c.encoder.rnn1.hidden_size
                     * (2 if c.encoder.rnn1.bidirectional else 1)
                     * c.encoder.time_reduction_factor)
        h_pred = c.prediction.rnn.hidden_size * (
            2 if c.prediction.rnn.bidirectional else 1)
        self.joint_net = RNNTJoint(c.joint, self.vocab_size, h_enc=h_enc,
                                   h_pred=h_pred, dtype=self.dtype)

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
        p = self.cfg.prediction.embedding_dropout
        if train and p > 0:
            # Per-TOKEN dropout (whole embedding vectors, scaled 1/(1-p)):
            # hides random label-history positions so the joint cannot
            # lean on the prediction net alone (anti-domination
            # regularizer; RNNTPredictNetConfig.embedding_dropout).
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - p, (B, U, 1))
            emb = jnp.where(keep, emb / (1.0 - p), 0.0).astype(emb.dtype)
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
        """Joint net on encoder/prediction features (factored first layer).

        f: ``(B, T, H_enc)`` (or ``(B, H_enc)``), g: ``(B, U+1, H_pred)``
        (or ``(B, H_pred)``).  Returns logits ``(B, T, U+1, V)`` (or
        ``(B, V)`` for single-step decode).  See :class:`RNNTJoint` — the
        broadcast concat of the reference joint never exists.
        """
        return self.joint_net(f, g, train)

    def joint_project(self, f, g):
        """Factored joint first-layer projections (for the fused Pallas
        joint+loss path): ``(fp (B,T,K), gp (B,U+1,K))``."""
        return self.joint_net.project(f, g)

    def joint_project_f(self, f):
        """Encoder-side joint projection ``fp`` (decode-time hoist)."""
        return self.joint_net.project_f(f)

    def joint_from_fp(self, fp, g, train: bool = False):
        """Joint logits from a pre-projected encoder row (decode loops)."""
        return self.joint_net.from_fp(fp, g, train)

    def joint_tail(self, h, train: bool = False):
        """Joint layers after the factored first layer (fused-path use)."""
        return self.joint_net.tail(h, train)

    def __call__(self, x, x_lens, labels, label_lens, train: bool = False):
        """Full training forward: joint logits ``(B, T', U+1, V)``."""
        f, f_lens = self.encode(x, x_lens, train)
        g = self.predict(labels, label_lens, train)
        return self.joint(f, g, train), f_lens
