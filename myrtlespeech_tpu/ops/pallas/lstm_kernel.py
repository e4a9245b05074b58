"""Fused LSTM recurrence as a Pallas TPU kernel.

Replaces the ``lax.scan`` inner loop of ``ops/rnn.py::lstm_scan`` (the
cuDNN-LSTM equivalent, SURVEY.md §2.10 N3).  Design:

- The whole time loop is ONE ``pallas_call`` with ``grid=(T,)``.  TPU grid
  iterations run sequentially on a core, so the hidden/cell state lives in
  VMEM scratch across steps — no per-step HBM round-trips and no XLA loop
  overhead.
- ``w_hh`` (bf16) stays resident in VMEM for the entire sequence; the
  per-step ``h @ w_hh`` hits the MXU; gate nonlinearities fuse on the VPU.
- Input projections (``x @ w_ih``) are computed *outside* the kernel as one
  large matmul (see ops/rnn.py) — the kernel consumes ``x_proj`` blocks
  ``(1, B, 4H)`` streamed by the Pallas pipeline (auto double-buffered).
- fp32 cell state; bf16 outputs.

The backward pass is classic BPTT as a ``lax.scan`` over saved ``(ys, cs)``
residuals with gate recomputation; all weight gradients collapse into two
big matmuls after the scan (same hoisting trick as forward).  The
``custom_vjp`` boundary sits *after* the input projection, so ``w_ih``/input
gradients flow through plain autodiff.

Constraints: best when B is a multiple of 8 and H a multiple of 128
(fp32/bf16 tile shapes); callers fall back to the lax path otherwise.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_kernel(x_proj_ref, valid_ref, w_hh_ref, h0_ref, c0_ref,
                 ys_ref, cs_ref, ifgo_ref, hT_ref, cT_ref, h_scr, c_scr):
    t = pl.program_id(0)
    T = pl.num_programs(0)
    H = h_scr.shape[-1]

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    h = h_scr[:]
    c = c_scr[:]
    gates = x_proj_ref[0].astype(jnp.float32) + jnp.dot(
        h.astype(jnp.bfloat16), w_hh_ref[:],
        preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    # Post-activation gates saved (bf16) for backward: BPTT then needs no
    # gate-recompute matmul, no transcendental recomputes, and no x_proj
    # residual (which was 2x this tensor's bytes in fp32).
    ifgo_ref[0] = jnp.concatenate([i, f, g, o], axis=1).astype(jnp.bfloat16)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)

    # Mask arrives pre-broadcast to lane width 128 ((B,1) vectors trip a
    # Mosaic layout bug at larger B); widen to H with an in-register repeat.
    # Selects, not arithmetic blends: 1 VPU op each instead of 3.
    v128 = valid_ref[0]  # (B, 128) fp32
    v = pltpu.repeat(v128, H // 128, axis=1) if H > 128 else v128[:, :H]
    vb = v > 0.5
    h_out = jnp.where(vb, h_new, h)
    c_out = jnp.where(vb, c_new, c)
    h_scr[:] = h_out
    c_scr[:] = c_out
    ys_ref[0] = jnp.where(vb, h_new, 0.0).astype(ys_ref.dtype)
    cs_ref[0] = c_out

    @pl.when(t == T - 1)
    def _():
        hT_ref[:] = h_out
        cT_ref[:] = c_out


def _lstm_pallas_fwd_call(x_proj, valid, w_hh, h0, c0):
    """Run the forward kernel.  x_proj: (T, B, 4H) fp32 with the bias
    already folded in (a (1, 4H) bias row broadcast inside the kernel trips
    a Mosaic sublane-broadcast bug at B > 8); returns
    (ys bf16 (T,B,H), cs fp32 (T,B,H), ifgo bf16 (T,B,4H), hT, cT)."""
    T, B, H4 = x_proj.shape
    H = H4 // 4
    grid = (T,)
    out = pl.pallas_call(
        _lstm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, B, H4), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H4), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.bfloat16),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H4), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
    )(x_proj, jnp.broadcast_to(valid[:, :, None], (T, B, 128)),
      w_hh.astype(jnp.bfloat16), h0, c0)
    return out


@jax.custom_vjp
def lstm_core(x_proj, valid, w_hh, h0, c0):
    """Fused LSTM recurrence.

    Args: x_proj (T,B,4H) fp32 (input projection with bias folded in),
    valid (T,B) float32 1/0 mask, w_hh (H,4H) fp32, h0/c0 (B,H) fp32.
    Returns (ys bf16 (T,B,H), hT fp32, cT fp32).
    """
    ys, _cs, _ifgo, hT, cT = _lstm_pallas_fwd_call(x_proj, valid, w_hh,
                                                   h0, c0)
    return ys, hT, cT


def _fwd(x_proj, valid, w_hh, h0, c0):
    ys, cs, ifgo, hT, cT = _lstm_pallas_fwd_call(x_proj, valid, w_hh, h0, c0)
    # NB: x_proj is NOT a residual — backward reads the saved bf16 gate
    # activations instead (half the bytes, no recompute matmul).  The empty
    # slice only records x_proj's dtype for the cotangent.
    return (ys, hT, cT), (x_proj[:0], valid, w_hh, h0, c0, ys, cs, ifgo)


def _bwd_kernel(valid_ref, w_hh_ref, cprev_ref, cs_ref, ifgo_ref,
                dys_ref, dhT_ref, dcT_ref, dz_ref, dh0_ref, dc0_ref,
                dh_scr, dc_scr):
    """One reverse-time BPTT step; dh/dc carried in VMEM scratch.

    Consumes the forward's saved bf16 gate activations — no recompute
    matmul — and fuses the ~15 elementwise ops with the dh
    back-propagation matmul (via dot_general on the single resident
    w_hh copy — a second transposed copy would not fit VMEM at H=1024).
    """
    r = pl.program_id(0)  # processes row t = T-1-r via index maps
    T = pl.num_programs(0)
    H = dh_scr.shape[-1]

    @pl.when(r == 0)
    def _():
        dh_scr[:] = dhT_ref[:]
        dc_scr[:] = dcT_ref[:]

    cp = cprev_ref[0]
    c_t = cs_ref[0]
    dy_t = dys_ref[0].astype(jnp.float32)
    v128 = valid_ref[0]  # (B, 128)
    v = pltpu.repeat(v128, H // 128, axis=1) if H > 128 else v128[:, :H]
    v4 = pltpu.repeat(v128, (4 * H) // 128, axis=1) if 4 * H > 128 \
        else v128[:, :4 * H]

    ifgo = ifgo_ref[0].astype(jnp.float32)  # (B, 4H)
    i = ifgo[:, :H]
    f = ifgo[:, H:2 * H]
    g = ifgo[:, 2 * H:3 * H]
    o = ifgo[:, 3 * H:]
    tc = jnp.tanh(c_t)

    dh = dh_scr[:]
    dc = dc_scr[:]
    dh_total = dy_t + dh
    do = dh_total * tc
    dc_total = dc + dh_total * o * (1.0 - tc * tc)
    di = dc_total * g
    dg = dc_total * i
    df = dc_total * cp
    dz = jnp.concatenate([
        di * i * (1.0 - i), df * f * (1.0 - f),
        dg * (1.0 - g * g), do * o * (1.0 - o)], axis=1) * v4
    dz_ref[0] = dz
    # dh_prev = dz @ w_hh^T: contract both operands' last dims.
    dh_prev = jax.lax.dot_general(
        dz.astype(jnp.bfloat16), w_hh_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh_scr[:] = dh_prev + (1.0 - v) * dh
    dc_scr[:] = dc_total * f * v + (1.0 - v) * dc

    @pl.when(r == T - 1)
    def _():
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]


def _bwd_pallas_call(valid, w_hh, c_prev, cs, ifgo, dys, dhT, dcT):
    T, B, H4 = ifgo.shape
    H = H4 // 4
    rev = lambda t: (T - 1 - t, 0, 0)
    rev2 = lambda t: (0, 0)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, 128), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), rev2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), rev2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), rev2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), rev2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), rev2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H4), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
    )(jnp.broadcast_to(valid[:, :, None], (T, B, 128)),
      w_hh.astype(jnp.bfloat16), c_prev, cs, ifgo, dys, dhT, dcT)


def _bwd(res, grads):
    x_proj_proto, valid, w_hh, h0, c0, ys, cs, ifgo = res
    dys, dhT, dcT = grads
    T, B, H = ys.shape

    # h_{t-1}, c_{t-1} sequences (fp32).  ys rows are masked h_new; the true
    # carried h equals the last valid h — rebuild by forward-filling is
    # unnecessary: for valid steps h_{t-1} = carried state at t-1 which
    # equals ys[t-1] when step t-1 was valid, else earlier.  Because valid
    # masks are contiguous prefixes (lengths), h_{t-1} = ys[t-1] for all
    # t <= len, and gradients at t > len are zeroed by `valid` anyway.
    h_prev = jnp.concatenate([h0[None], ys[:-1].astype(jnp.float32)], 0)
    c_prev = jnp.concatenate([c0[None], cs[:-1]], 0)

    dz_all, dh0, dc0 = _bwd_pallas_call(
        valid, w_hh, c_prev, cs, ifgo,
        dys.astype(jnp.float32), dhT, dcT)

    # Weight/bias grads as single large matmuls (hoisted like the forward).
    dw_hh = jnp.dot(
        h_prev.reshape(T * B, H).T.astype(jnp.bfloat16),
        dz_all.reshape(T * B, 4 * H).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32)
    return dz_all.astype(x_proj_proto.dtype), None, dw_hh, dh0, dc0


lstm_core.defvjp(_fwd, _bwd)


def pallas_lstm_supported(B: int, H: int) -> bool:
    """Tile-shape constraints for the fused kernel."""
    return B % 8 == 0 and H % 128 == 0


def lstm_scan_pallas(x, lengths, w_ih, w_hh, b, h0c0=None,
                     reverse: bool = False, compute_dtype=jnp.bfloat16):
    """Drop-in replacement for ``ops.rnn.lstm_scan`` using the fused kernel.

    Same signature/semantics; see ops/rnn.py.
    """
    from myrtlespeech_tpu.ops.rnn import LSTMState, reverse_sequences

    T, B, F = x.shape
    H = w_hh.shape[0]
    if h0c0 is None:
        h0c0 = LSTMState(h=jnp.zeros((B, H), jnp.float32),
                         c=jnp.zeros((B, H), jnp.float32))
    if reverse:
        x = reverse_sequences(x, lengths)

    x_proj = jnp.dot(x.reshape(T * B, F).astype(compute_dtype),
                     w_ih.astype(compute_dtype),
                     preferred_element_type=jnp.float32).reshape(T, B, 4 * H)
    valid = (jnp.arange(T)[:, None] < lengths[None, :]).astype(jnp.float32)
    if b is not None:
        x_proj = x_proj + b.astype(jnp.float32)
    # Stream x_proj at the compute dtype: in bf16 this halves the kernel's
    # dominant per-step HBM read (the gate sum accumulates in fp32 inside).
    x_proj = x_proj.astype(compute_dtype)

    ys, hT, cT = lstm_core(x_proj, valid, w_hh.astype(jnp.float32),
                           h0c0.h, h0c0.c)
    if reverse:
        ys = reverse_sequences(ys, lengths)
    return ys.astype(compute_dtype), LSTMState(h=hT, c=cT)
