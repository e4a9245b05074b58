"""Fused transducer joint tail + blank/emit front as Pallas TPU kernels.

This is the step that kills the transducer's remaining full-size
``(B, T, U+1, ·)`` tensors (SURVEY.md §3.3 memory hot spot; the reference
materialises the whole joint for warp-transducer,
``src/myrtlespeech/loss/rnn_t_loss.py``).  With the factored joint
(``models/rnn_t.py::RNNTJoint``) the per-cell work left after the two
small projections ``fp (B,T,K)`` / ``gp (B,U+1,K)`` is::

    h      = act(fp[t] + gp[u])            # (K,)  per lattice cell
    logits = h @ W2 + b2                   # (V,)
    lp_b   = logits[blank] - lse(logits)
    lp_e   = logits[lab[u]] - lse(logits)

The kernels here evaluate exactly that cell program tile by tile in VMEM
— per grid step one ``(TT*SLAB*U1p, K) @ (K, Vpad)`` MXU matmul plus a
lane-reduced log-sum-exp — emitting only the two ``(B, T, U+1)`` lattice
inputs.  Neither the ``(B,T,U+1,K)`` hidden nor the ``(B,T,U+1,V)``
logits ever exist, in forward OR backward (the backward recomputes each
tile: flash-attention-style rematerialisation).  The matmul inputs are
cast to ``mxu_dtype`` (bf16 by default — the same precision the
production full-joint path's ``nn.Dense(dtype=bf16)`` uses) with fp32
MXU accumulation; tests pass ``mxu_dtype='float32'`` for exact
equivalence against the lax reference.

TPU layout rules shape every array here (Mosaic requires a block's last
two dims to be (8k, 128k) or to equal the array's):

- ``fp`` is fed time-major ``(T, B, K)`` so the per-step block is
  ``(TT, SLAB, K)`` — sublane dim SLAB, lane dim K, both aligned.
- ``U+1`` is padded to ``U1p`` (multiple of 8) so the in-kernel
  ``(SLAB, U1p, K) <-> (SLAB*U1p, K)`` reshapes are tile-exact.
- Per-cell scalar results live as rows: outputs are ``(T, B*U1p, 1)``
  columns (lane dim 1 == array dim), reshaped/transposed to
  ``(B, T, U+1)`` by cheap XLA ops outside.
- ``TT`` time steps per grid step amortise grid/launch overhead; the
  grid is ``(ceil(B/SLAB), T/TT)`` with T fastest so the backward's
  ``dgp``/``dW2`` accumulators stay resident in their output blocks.

Supports RELU/HARDTANH/IDENTITY tail activations and one hidden layer
(the reference's joint topology); other configs fall back to the XLA
paths in ``ops/rnnt.py``.  The activation-gradient mask is derived from
the *activated* value (``h>0`` etc.), so the fp32 pre-activation is
never stored.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_SLAB = int(os.environ.get("MYRTLE_JOINT_SLAB", "8"))
# Time steps per grid step.  Larger TT amortises grid overhead but grows
# the in-kernel row count (TT*SLAB*U1p); the backward holds dh/h rows in
# fp32 so it must stay smaller to fit the ~16MB VMEM scoped limit.
_TT_FWD = int(os.environ.get("MYRTLE_JOINT_TT_FWD", "8"))
_TT_BWD = int(os.environ.get("MYRTLE_JOINT_TT_BWD", "2"))

_ACTS = ("relu", "hardtanh", "identity")


def _act(a, act: str, clip: float):
    if act == "relu":
        return jnp.maximum(a, 0.0)
    if act == "hardtanh":
        return jnp.clip(a, 0.0, clip)
    return a


def _act_grad_mask_from_h(h, act: str, clip: float):
    """d act(a)/da as a function of h = act(a) (valid a.e. for these acts).

    Compares in fp32 — Mosaic rejects bf16 comparisons on this target.
    """
    h32 = h.astype(jnp.float32)
    if act == "relu":
        return (h32 > 0.0).astype(jnp.float32)
    if act == "hardtanh":
        return ((h32 > 0.0) & (h32 < clip)).astype(jnp.float32)
    return jnp.ones_like(h32)


def _hidden(fp_ref, gp_ref, act, clip, mxu_dtype):
    """act(fp[t] + gp) for the whole (TT, SLAB) tile as MXU rows.

    fp block ``(TT, SLAB, K)``, gp block ``(SLAB, U1p, K)`` ->
    ``(TT*SLAB*U1p, K)`` rows in ``mxu_dtype``.  The add + activation run
    in ``mxu_dtype`` (inputs arrive already cast) — bf16 VPU ops at twice
    the fp32 rate, exactly the precision of the production full path
    (``nn.Dense(dtype=bf16)`` on ``act(fp+gp)``).
    """
    TT, SLAB, K = fp_ref.shape
    U1p = gp_ref.shape[1]
    a = (jnp.broadcast_to(gp_ref[:][None], (TT, SLAB, U1p, K))
         + fp_ref[:].reshape(TT, SLAB, 1, K))
    h = _act(a, act, clip)
    return h.reshape(TT * SLAB * U1p, K)


def _fwd_kernel(fp_ref, gp_ref, w2_ref, b2_ref, lab_ref, lpb_ref, lpe_ref,
                *, V: int, blank: int, act: str, clip: float,
                mxu_dtype):
    TT, SLAB, K = fp_ref.shape
    U1p = gp_ref.shape[1]
    N = TT * SLAB * U1p
    Vp = w2_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (N, Vp), 1)
    h = _hidden(fp_ref, gp_ref, act, clip, mxu_dtype)
    logits = jnp.dot(h, w2_ref[:],
                     preferred_element_type=jnp.float32)  # (N, Vp)
    # b2 is NEG_INF-padded past V, so pad lanes never need masking: they
    # vanish from exp-sums and extractions by construction.
    logits += b2_ref[:]
    m = jnp.max(logits, axis=1, keepdims=True)  # (N, 1)
    s = jnp.sum(jnp.exp(logits - m), axis=1, keepdims=True)
    lse = m + jnp.log(s)
    xb = logits[:, blank:blank + 1]  # static slice
    # lab rows repeat per t within the tile: (SLAB*U1p, 1) -> (N, 1).
    lab = jnp.broadcast_to(lab_ref[:].reshape(1, SLAB * U1p, 1),
                           (TT, SLAB * U1p, 1)).reshape(N, 1)
    xe = jnp.sum(jnp.where(lane == lab, logits, 0.0),
                 axis=1, keepdims=True)
    del V  # pad lanes handled by NEG_INF bias padding
    lpb_ref[:] = (xb - lse).reshape(TT, SLAB * U1p, 1)
    lpe_ref[:] = (xe - lse).reshape(TT, SLAB * U1p, 1)


def _bwd_kernel(fp_ref, gp_ref, w2_ref, w2t_ref, b2_ref, lab_ref, gb_ref,
                ge_ref, dfp_ref, dgp_ref, dw2_ref, db2_ref,
                *, V: int, blank: int, act: str, clip: float,
                mxu_dtype):
    t = pl.program_id(1)
    TT, SLAB, K = fp_ref.shape
    U1p = gp_ref.shape[1]
    N = TT * SLAB * U1p
    Vp = w2_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (N, Vp), 1)
    del V  # pad lanes handled by NEG_INF bias padding

    @pl.when(t == 0)
    def _():
        dgp_ref[:] = jnp.zeros_like(dgp_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    h = _hidden(fp_ref, gp_ref, act, clip, mxu_dtype)
    logits = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    logits += b2_ref[:]
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)  # pad lanes are exactly 0 (NEG_INF bias)
    p = p / jnp.sum(p, axis=1, keepdims=True)  # softmax over true lanes
    gb = gb_ref[:].reshape(N, 1)
    ge = ge_ref[:].reshape(N, 1)
    lab = jnp.broadcast_to(lab_ref[:].reshape(1, SLAB * U1p, 1),
                           (TT, SLAB * U1p, 1)).reshape(N, 1)
    dlogits = (jnp.where(lane == blank, gb, 0.0)
               + jnp.where(lane == lab, ge, 0.0)
               - (gb + ge) * p).astype(mxu_dtype)
    dh = jnp.dot(dlogits, w2t_ref[:],
                 preferred_element_type=jnp.float32)  # (N, K)
    dh = (dh * _act_grad_mask_from_h(h, act, clip)
          ).reshape(TT, SLAB, U1p, K)
    dfp_ref[:] = jnp.sum(dh, axis=2)  # (TT, SLAB, K)
    dgp_ref[:] += jnp.sum(dh, axis=0)  # (SLAB, U1p, K)
    # dW2[k, v] = sum_n h[n, k] * dlogits[n, v] (accumulated over t).
    dw2_ref[0] += jax.lax.dot_general(
        h, dlogits, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_ref[0] += jnp.sum(dlogits.astype(jnp.float32), axis=0,
                          keepdims=True)


def _pad_vocab(w2, b2, mxu_dtype):
    """Pad V to lanes; pad bias with NEG_INF so pad lanes self-mask."""
    K, V = w2.shape
    Vp = -(-V // 128) * 128
    if Vp != V:
        w2 = jnp.pad(w2, ((0, 0), (0, Vp - V)))
        b2 = jnp.pad(b2, (0, Vp - V), constant_values=NEG_INF)
    return w2.astype(mxu_dtype), b2.reshape(1, Vp)


def _pad_axis(x, mult: int, axis: int):
    pad = (-x.shape[axis]) % mult
    if pad:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        x = jnp.pad(x, widths)
    return x, x.shape[axis]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def joint_tail_blank_emit(fp, gp, w2, b2, labels, blank_index: int = 0,
                          act: str = "relu", clip: float = 20.0,
                          vocab_size: int = 0, mxu_dtype: str = "bfloat16"):
    """Fused joint tail + blank/emit extraction.

    Args:
      fp: ``(B, T, K)`` encoder-side joint projection (any float dtype).
      gp: ``(B, U+1, K)`` prediction-side projection (bias folded in).
      w2: ``(K, V)`` tail Dense kernel; b2: ``(V,)`` bias.
      labels: ``(B, U)`` int32 targets.
      act: tail activation between the projections' sum and w2.
      vocab_size: V (static; defaults to w2.shape[1]).
      mxu_dtype: matmul input dtype — 'bfloat16' (production: matches the
        full path's ``nn.Dense(dtype=bf16)``) or 'float32' (exact tests).

    Returns ``(lp_blank, lp_emit)`` each ``(B, T, U+1)`` fp32 — exactly
    ``blank_emit_from_logits(joint_logits, labels)`` of ``ops/rnnt.py``
    without ever building ``joint_logits``.
    """
    out, _ = _jt_fwd(fp, gp, w2, b2, labels, blank_index, act, clip,
                     vocab_size, mxu_dtype)
    return out


def _prep(fp, gp, B, T, tt, mxu):
    """Pad + lay out fp/gp for the kernels.

    Pads B up to a slab multiple, U+1 to a sublane multiple (8) so the
    in-kernel row reshapes are tile-exact, and T to a TT multiple (pad
    frames produce rows that are sliced away / contribute zero grads).

    Returns (fp_t (Tp, Bp, K), gp_p (Bp, U1p, K), Bp, U1p, Tp, TT).
    Arrays are cast to the kernel's MXU dtype here (halves HBM traffic
    and makes the in-kernel add/act run at bf16 VPU rate).
    """
    TT = min(tt, T)
    fp_c, _ = _pad_axis(fp.astype(mxu), _SLAB, 0)
    gp_c, Bp = _pad_axis(gp.astype(mxu), _SLAB, 0)
    gp_c, U1p = _pad_axis(gp_c, 8, 1)
    fp_t = jnp.swapaxes(fp_c, 0, 1)  # (T, Bp, K)
    fp_t, Tp = _pad_axis(fp_t, TT, 0)
    return fp_t, gp_c, Bp, U1p, Tp, TT


def _from_rows(cols, B, T, U1, Tp, Bp, U1p):
    """(Tp, Bp*U1p, 1) row-columns -> (B, T, U+1)."""
    x = cols.reshape(Tp, Bp, U1p)[:T, :B, :U1]
    return jnp.swapaxes(x, 0, 1)


def _to_rows(g, Tp, Bp, U1p):
    """(B, T, U+1) cotangent -> (Tp, Bp*U1p, 1) row-columns (zero pad)."""
    B, T, U1 = g.shape
    x = jnp.pad(g.astype(jnp.float32),
                ((0, Bp - B), (0, Tp - T), (0, U1p - U1)))
    return jnp.swapaxes(x, 0, 1).reshape(Tp, Bp * U1p, 1)


def _jt_impl(fp, gp, w2, b2, lab3, blank, act, clip, V, mxu_dtype):
    B, T, K = fp.shape
    U1 = gp.shape[1]
    mxu = jnp.dtype(mxu_dtype)
    w2p, b2p = _pad_vocab(w2, b2.astype(jnp.float32), mxu)
    Vp = w2p.shape[1]
    fp_t, gp_p, Bp, U1p, Tp, TT = _prep(fp, gp, B, T, _TT_FWD, mxu)
    lab_p, _ = _pad_axis(lab3, _SLAB, 0)
    lab_p, _ = _pad_axis(lab_p, 8, 1)
    n_slabs = Bp // _SLAB
    NROW = _SLAB * U1p

    kern = functools.partial(_fwd_kernel, V=V, blank=blank, act=act,
                             clip=clip, mxu_dtype=jnp.dtype(mxu_dtype))
    lpb_t, lpe_t = pl.pallas_call(
        kern,
        grid=(n_slabs, Tp // TT),
        in_specs=[
            pl.BlockSpec((TT, _SLAB, K), lambda s, t: (t, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SLAB, U1p, K), lambda s, t: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Vp), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SLAB, U1p, 1), lambda s, t: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TT, NROW, 1), lambda s, t: (t, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TT, NROW, 1), lambda s, t: (t, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Bp * U1p, 1), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Bp * U1p, 1), jnp.float32),
        ],
    )(fp_t, gp_p, w2p, b2p, lab_p)
    return (_from_rows(lpb_t, B, T, U1, Tp, Bp, U1p),
            _from_rows(lpe_t, B, T, U1, Tp, Bp, U1p))


def _lab3(labels, U1):
    B, U = labels.shape
    lab = jnp.concatenate(
        [labels.astype(jnp.int32), jnp.zeros((B, U1 - U), jnp.int32)],
        axis=1)
    return lab[:, :, None]  # (B, U1, 1) column layout


def _jt_fwd(fp, gp, w2, b2, labels, blank, act, clip, V, mxu_dtype):
    V = V or w2.shape[1]
    U1 = gp.shape[1]
    lab3 = _lab3(labels, U1)
    out = _jt_impl(fp, gp, w2, b2, lab3, blank, act, clip, V, mxu_dtype)
    return out, (fp, gp, w2, b2, lab3)


def _jt_bwd(blank, act, clip, V, mxu_dtype, res, grads):
    fp, gp, w2, b2, lab3 = res
    gb, ge = grads  # (B, T, U+1)
    B, T, K = fp.shape
    U1 = gp.shape[1]
    V = V or w2.shape[1]
    mxu = jnp.dtype(mxu_dtype)
    w2p, b2p = _pad_vocab(w2, b2.astype(jnp.float32), mxu)
    Vp = w2p.shape[1]
    fp_t, gp_p, Bp, U1p, Tp, TT = _prep(fp, gp, B, T, _TT_BWD, mxu)
    lab_p, _ = _pad_axis(lab3, _SLAB, 0)
    lab_p, _ = _pad_axis(lab_p, 8, 1)
    gb_t = _to_rows(gb, Tp, Bp, U1p)
    ge_t = _to_rows(ge, Tp, Bp, U1p)
    n_slabs = Bp // _SLAB
    NROW = _SLAB * U1p

    kern = functools.partial(_bwd_kernel, V=V, blank=blank, act=act,
                             clip=clip, mxu_dtype=jnp.dtype(mxu_dtype))
    dfp_t, dgp, dw2_s, db2_s = pl.pallas_call(
        kern,
        grid=(n_slabs, Tp // TT),
        in_specs=[
            pl.BlockSpec((TT, _SLAB, K), lambda s, t: (t, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SLAB, U1p, K), lambda s, t: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Vp), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Vp, K), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SLAB, U1p, 1), lambda s, t: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TT, NROW, 1), lambda s, t: (t, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TT, NROW, 1), lambda s, t: (t, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TT, _SLAB, K), lambda s, t: (t, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SLAB, U1p, K), lambda s, t: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, Vp), lambda s, t: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Vp), lambda s, t: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Bp, K), jnp.float32),
            jax.ShapeDtypeStruct((Bp, U1p, K), jnp.float32),
            jax.ShapeDtypeStruct((n_slabs, K, Vp), jnp.float32),
            jax.ShapeDtypeStruct((n_slabs, 1, Vp), jnp.float32),
        ],
    )(fp_t, gp_p, w2p, jnp.swapaxes(w2p, 0, 1), b2p, lab_p, gb_t, ge_t)

    dfp = jnp.swapaxes(dfp_t[:T], 0, 1)[:B].astype(fp.dtype)
    dgp = dgp[:B, :U1].astype(gp.dtype)
    dw2 = jnp.sum(dw2_s, axis=0)[:, :w2.shape[1]].astype(w2.dtype)
    db2 = jnp.sum(db2_s, axis=0)[0, :w2.shape[1]].astype(b2.dtype)
    return dfp, dgp, dw2, db2, None


joint_tail_blank_emit.defvjp(_jt_fwd, _jt_bwd)


def joint_tail_supported(act, num_hidden_layers: int, dropout: float,
                         train: bool) -> bool:
    """Static config gate for the fused joint-tail kernel."""
    if os.environ.get("MYRTLE_DISABLE_PALLAS_JOINT"):
        return False
    if num_hidden_layers != 1:
        return False
    if dropout > 0 and train:
        return False  # kernel has no dropout; chunked/full paths serve
    return act in _ACTS
