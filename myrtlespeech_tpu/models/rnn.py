"""Multi-layer (bi)directional RNN module over the scan ops.

TPU-native counterpart of the reference's cuDNN wrapper
(``src/myrtlespeech/model/rnn.py :: RNN``): consumes/produces padded
``(B, T, F)`` batches with lengths, supports LSTM/GRU/vanilla cells,
``forget_gate_bias`` initialisation, bidirectionality (length-aware reverse,
concat), optional masked BatchNorm between stacked layers (DS2 style), and
hidden-state pass-through for streaming decoders.

Compute runs time-major internally; parameters are fp32, matmuls in the
configured compute dtype (bf16 by default — the apex-amp replacement).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from myrtlespeech_tpu.config.schema import RNNConfig, RNNType
from myrtlespeech_tpu.models.normalization import MaskedBatchNorm
from myrtlespeech_tpu.ops import rnn as rnn_ops


def _gate_count(t: RNNType) -> int:
    return {RNNType.LSTM: 4, RNNType.GRU: 3, RNNType.BASIC_RNN: 1,
            RNNType.HARD_LSTM: 4}[t]


def _use_pallas_lstm(cfg: RNNConfig, dtype, B: int) -> bool:
    """Auto-select the fused Pallas kernel on TPU when shapes allow.

    Disabled under an active TP mesh: pallas_call is opaque to GSPMD, so
    model-axis-sharded gate matrices would be gathered per step (see
    ``parallel/sharding.py::PALLAS_TP_GUARD``); the lax scan partitions
    cleanly instead.
    """
    import os

    import jax

    from myrtlespeech_tpu.ops.pallas.lstm_kernel import pallas_lstm_supported
    from myrtlespeech_tpu.parallel.sharding import PALLAS_TP_GUARD

    if os.environ.get("MYRTLE_DISABLE_PALLAS_LSTM"):
        return False  # operational escape hatch / triage bisect lever
    return (cfg.rnn_type is RNNType.LSTM
            and dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"
            and PALLAS_TP_GUARD["model_size"] == 1
            and pallas_lstm_supported(B, cfg.hidden_size))


class RNN(nn.Module):
    """Stacked RNN: ``(B, T, F), lengths -> (B, T, H * dirs), lengths``."""

    cfg: RNNConfig
    dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = True  # auto-gated by _use_pallas_lstm at call time

    def _bias_init(self, key, shape, dtype=jnp.float32):
        b = jnp.zeros(shape, dtype)
        c = self.cfg
        if c.rnn_type in (RNNType.LSTM, RNNType.HARD_LSTM) \
                and c.forget_gate_bias is not None:
            H = shape[0] // 4
            b = b.at[H:2 * H].set(c.forget_gate_bias)
        return b

    @nn.compact
    def __call__(self, x, lengths, train: bool = False,
                 initial_states=None):
        """Run the stack.

        ``initial_states``: optional list (per layer) of per-direction
        states for streaming decode; zeros if None.

        Returns ``(outputs (B, T, H*dirs), lengths, final_states)`` where
        ``final_states`` mirrors the ``initial_states`` structure.
        """
        c = self.cfg
        H = c.hidden_size
        G = _gate_count(c.rnn_type)
        dirs = 2 if c.bidirectional else 1
        y = jnp.swapaxes(x, 0, 1)  # (T, B, F)
        final_states = []

        for layer in range(c.num_layers):
            F_in = y.shape[-1]
            outs = []
            layer_states = []
            for d in range(dirs):
                name = f"l{layer}_{'bwd' if d else 'fwd'}"
                w_ih = self.param(f"{name}_w_ih",
                                  nn.initializers.xavier_uniform(),
                                  (F_in, G * H), jnp.float32)
                w_hh = self.param(f"{name}_w_hh",
                                  nn.initializers.orthogonal(),
                                  (H, G * H), jnp.float32)
                b = self.param(f"{name}_b", self._bias_init, (G * H,)) \
                    if c.bias else None
                init = None if initial_states is None \
                    else initial_states[layer][d]
                if c.rnn_type is RNNType.LSTM:
                    if self.use_pallas and _use_pallas_lstm(
                            c, self.dtype, y.shape[1]):
                        from myrtlespeech_tpu.ops.pallas.lstm_kernel import \
                            lstm_scan_pallas as _scan
                    else:
                        _scan = rnn_ops.lstm_scan
                    out, st = _scan(
                        y, lengths, w_ih, w_hh, b, h0c0=init,
                        reverse=bool(d), compute_dtype=self.dtype)
                elif c.rnn_type is RNNType.HARD_LSTM:
                    out, st = rnn_ops.lstm_scan(
                        y, lengths, w_ih, w_hh, b, h0c0=init,
                        reverse=bool(d), compute_dtype=self.dtype,
                        hard=True)
                elif c.rnn_type is RNNType.GRU:
                    # GRU needs BOTH torch biases: b_hn sits inside the
                    # reset gate (n = tanh(x W_in + b_in + r*(h W_hn +
                    # b_hn))), so b_ih/b_hh are NOT redundant the way they
                    # are for LSTM/vanilla (where one merged bias is
                    # mathematically identical).  Reference semantics:
                    # torch.nn.GRU in model/rnn.py.
                    b_hh = self.param(f"{name}_b_hh", self._bias_init,
                                      (G * H,)) if c.bias else None
                    out, st = rnn_ops.gru_scan(
                        y, lengths, w_ih, w_hh, b, b_hh, h0=init,
                        reverse=bool(d), compute_dtype=self.dtype)
                else:
                    out, st = rnn_ops.rnn_scan(
                        y, lengths, w_ih, w_hh, b, h0=init,
                        reverse=bool(d), compute_dtype=self.dtype)
                outs.append(out)
                layer_states.append(st)
            final_states.append(layer_states)
            y = outs[0] if dirs == 1 else jnp.concatenate(outs, axis=-1)

            is_last = layer == c.num_layers - 1
            if c.batch_norm and not is_last:
                yb = jnp.swapaxes(y, 0, 1)  # (B, T, H*dirs)
                yb = MaskedBatchNorm(dtype=self.dtype)(
                    yb, lengths, use_running_average=not train)
                y = jnp.swapaxes(yb, 0, 1)
            if c.dropout > 0 and not is_last:
                y = nn.Dropout(rate=c.dropout, deterministic=not train)(y)

        return jnp.swapaxes(y, 0, 1), lengths, final_states
