"""Recurrent cell ops: LSTM / GRU / vanilla RNN over ``lax.scan``.

TPU-native replacement for the reference's cuDNN-backed RNN wrapper
(``src/myrtlespeech/model/rnn.py :: RNN``).  Design notes (why this is not a
translation of the cuDNN call):

- **Input projections are hoisted out of the scan**: ``x @ W_ih`` for all
  timesteps is one large ``(T*B, F) @ (F, 4H)`` matmul that tiles perfectly
  onto the MXU.  Only the recurrent ``h @ W_hh`` matmul lives inside
  ``lax.scan`` — this is the standard XLA RNN recipe and removes ~half the
  sequential FLOPs from the critical path.
- **Time-major layout** ``(T, B, H)`` inside the scan so each step is a
  contiguous ``(B, 4H)`` block.
- **bf16 matmuls, fp32 state**: gate matmuls run in the compute dtype with
  ``preferred_element_type=float32``; the cell state ``c`` is carried in
  fp32 to avoid drift over long utterances (replaces apex amp).
- **Variable lengths** are handled by masking, not packing: padded steps
  still execute (static shapes for XLA) and state updates are frozen via
  ``jnp.where`` on the per-step validity mask so final states equal the
  state at ``t = len - 1`` (matches packed-sequence semantics).
- Bidirectionality = length-aware reverse + same forward scan.

Gate order is ``i, f, g, o`` (input, forget, cell, output) — same as the
reference's torch convention, so ``forget_gate_bias`` initialisation applies
to rows ``[H:2H]`` of the bias.

A fused Pallas cell can be swapped in behind :func:`lstm_scan` without
touching callers (see ``myrtlespeech_tpu/ops/pallas/lstm_kernel.py``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class LSTMState(NamedTuple):
    h: jnp.ndarray  # (B, H)
    c: jnp.ndarray  # (B, H) fp32


def reverse_sequences(x, lengths, time_axis: int = 0):
    """Length-aware reverse along ``time_axis`` (TF ``reverse_sequence``).

    For each batch row ``b``, the first ``lengths[b]`` elements are reversed
    and padding stays at the end.  ``x`` is time-major ``(T, B, ...)`` by
    default.
    """
    T = x.shape[time_axis]
    B = lengths.shape[0]
    t = jnp.arange(T)[:, None]  # (T, 1)
    src = jnp.where(t < lengths[None, :], lengths[None, :] - 1 - t, t)  # (T, B)
    if time_axis != 0:
        raise NotImplementedError("time_axis must be 0 (time-major)")
    return jnp.take_along_axis(
        x, src.reshape((T, B) + (1,) * (x.ndim - 2)), axis=0)


def hard_sigmoid(x):
    """Piecewise-linear sigmoid: ``clip(0.2x + 0.5, 0, 1)`` (reference
    ``hard_lstm.py`` convention, FPGA/quantisation-friendly)."""
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)


def hard_tanh(x):
    return jnp.clip(x, -1.0, 1.0)


def lstm_cell(x_proj_t, state: LSTMState, w_hh, b, compute_dtype,
              hard: bool = False):
    """One LSTM step. ``x_proj_t``: (B, 4H) precomputed input projection."""
    H = state.h.shape[-1]
    gates = x_proj_t.astype(jnp.float32) + jnp.dot(
        state.h.astype(compute_dtype), w_hh.astype(compute_dtype),
        preferred_element_type=jnp.float32)
    if b is not None:
        gates = gates + b.astype(jnp.float32)
    sig = hard_sigmoid if hard else jax.nn.sigmoid
    th = hard_tanh if hard else jnp.tanh
    i = sig(gates[:, :H])
    f = sig(gates[:, H:2 * H])
    g = th(gates[:, 2 * H:3 * H])
    o = sig(gates[:, 3 * H:])
    c = f * state.c + i * g
    h = o * th(c)
    return LSTMState(h=h, c=c)


def lstm_scan(x, lengths, w_ih, w_hh, b, h0c0: Optional[LSTMState] = None,
              reverse: bool = False, compute_dtype=jnp.bfloat16,
              hard: bool = False) -> Tuple[jnp.ndarray, LSTMState]:
    """Run an LSTM over a time-major padded batch.

    Args:
      x: ``(T, B, F)`` input.
      lengths: ``(B,)`` valid lengths.
      w_ih: ``(F, 4H)``; w_hh: ``(H, 4H)``; b: ``(4H,)`` or None.
      h0c0: optional initial state (fp32), zeros if None.
      reverse: process each sequence backwards (for the bwd direction).

    Returns:
      outputs ``(T, B, H)`` (padded positions zeroed), final state (fp32,
      equals state at the last *valid* step).
    """
    T, B, F = x.shape
    H = w_hh.shape[0]
    if h0c0 is None:
        h0c0 = LSTMState(h=jnp.zeros((B, H), jnp.float32),
                         c=jnp.zeros((B, H), jnp.float32))
    if reverse:
        x = reverse_sequences(x, lengths)

    # Hoisted input projection: one big MXU matmul over all timesteps.
    x_proj = jnp.dot(x.reshape(T * B, F).astype(compute_dtype),
                     w_ih.astype(compute_dtype),
                     preferred_element_type=jnp.float32).reshape(T, B, 4 * H)

    valid = (jnp.arange(T)[:, None] < lengths[None, :])  # (T, B)

    def step(state: LSTMState, inputs):
        x_t, valid_t = inputs
        new = lstm_cell(x_t, state, w_hh, b, compute_dtype, hard=hard)
        m = valid_t[:, None]
        # Freeze state on padded steps so the final carry is the state at
        # t = len-1 (packed-sequence semantics).
        h = jnp.where(m, new.h, state.h)
        c = jnp.where(m, new.c, state.c)
        out = jnp.where(m, new.h, 0.0)
        return LSTMState(h=h, c=c), out

    final, ys = jax.lax.scan(step, h0c0, (x_proj, valid))
    if reverse:
        ys = reverse_sequences(ys, lengths)
    return ys.astype(compute_dtype), final


def gru_scan(x, lengths, w_ih, w_hh, b_ih, b_hh, h0=None, reverse: bool = False,
             compute_dtype=jnp.bfloat16):
    """GRU over a time-major padded batch (gate order r, z, n — torch).

    w_ih: ``(F, 3H)``; w_hh: ``(H, 3H)``; b_ih/b_hh: ``(3H,)`` or None.
    Returns (outputs ``(T, B, H)``, final h ``(B, H)`` fp32).
    """
    T, B, F = x.shape
    H = w_hh.shape[0]
    if h0 is None:
        h0 = jnp.zeros((B, H), jnp.float32)
    if reverse:
        x = reverse_sequences(x, lengths)

    x_proj = jnp.dot(x.reshape(T * B, F).astype(compute_dtype),
                     w_ih.astype(compute_dtype),
                     preferred_element_type=jnp.float32).reshape(T, B, 3 * H)
    if b_ih is not None:
        x_proj = x_proj + b_ih.astype(jnp.float32)

    valid = (jnp.arange(T)[:, None] < lengths[None, :])

    def step(h, inputs):
        x_t, valid_t = inputs
        h_proj = jnp.dot(h.astype(compute_dtype), w_hh.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
        if b_hh is not None:
            h_proj = h_proj + b_hh.astype(jnp.float32)
        r = jax.nn.sigmoid(x_t[:, :H] + h_proj[:, :H])
        z = jax.nn.sigmoid(x_t[:, H:2 * H] + h_proj[:, H:2 * H])
        n = jnp.tanh(x_t[:, 2 * H:] + r * h_proj[:, 2 * H:])
        new_h = (1.0 - z) * n + z * h
        m = valid_t[:, None]
        h_out = jnp.where(m, new_h, h)
        return h_out, jnp.where(m, new_h, 0.0)

    final, ys = jax.lax.scan(step, h0, (x_proj, valid))
    if reverse:
        ys = reverse_sequences(ys, lengths)
    return ys.astype(compute_dtype), final


def rnn_scan(x, lengths, w_ih, w_hh, b, h0=None, reverse: bool = False,
             compute_dtype=jnp.bfloat16):
    """Vanilla tanh RNN (reference's BASIC_RNN uses ReLU/tanh; tanh here,
    DS1 uses its own clipped-ReLU stack)."""
    T, B, F = x.shape
    H = w_hh.shape[0]
    if h0 is None:
        h0 = jnp.zeros((B, H), jnp.float32)
    if reverse:
        x = reverse_sequences(x, lengths)
    x_proj = jnp.dot(x.reshape(T * B, F).astype(compute_dtype),
                     w_ih.astype(compute_dtype),
                     preferred_element_type=jnp.float32).reshape(T, B, H)
    if b is not None:
        x_proj = x_proj + b.astype(jnp.float32)
    valid = (jnp.arange(T)[:, None] < lengths[None, :])

    def step(h, inputs):
        x_t, valid_t = inputs
        new_h = jnp.tanh(x_t + jnp.dot(
            h.astype(compute_dtype), w_hh.astype(compute_dtype),
            preferred_element_type=jnp.float32))
        m = valid_t[:, None]
        h_out = jnp.where(m, new_h, h)
        return h_out, jnp.where(m, new_h, 0.0)

    final, ys = jax.lax.scan(step, h0, (x_proj, valid))
    if reverse:
        ys = reverse_sequences(ys, lengths)
    return ys.astype(compute_dtype), final
