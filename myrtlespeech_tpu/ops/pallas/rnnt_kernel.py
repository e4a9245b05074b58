"""Transducer (RNN-T) lattice forward-backward as Pallas TPU kernels.

TPU-native replacement for warp-transducer's CUDA lattice kernels
(reference ``loss/rnn_t_loss.py`` binding HawkAaron/warp-transducer,
SURVEY.md §2.10 N1).  Two kernels over the (T, U+1) lattice:

- **forward**: one ``pallas_call`` with ``grid=(T,)``; the per-row alpha
  recurrence along U is solved with a Hillis-Steele scan in the
  (logaddexp, +) semiring — ``ceil(log2(U+1))`` vectorised shift passes on
  a VMEM-resident ``(B, U+1)`` row instead of a sequential U-loop.
- **backward**: reverse grid computing beta rows the same way and emitting
  the analytic gradients w.r.t. the blank/emit log-probs tile by tile
  (``d lp = -exp(alpha + lp + beta_next - logZ)``), so the full
  ``(B, T, U, V)`` gradient never exists: JAX autodiff carries these
  ``(B, T, U+1)`` occupancies back through the (cheap) gather/log-softmax.

Variable lengths use a pad-invariant reformulation instead of masks in the
recurrence: padded frames (``t >= logit_len``) get blank log-prob 0 and
emit -inf, so lattice paths glide through padding at zero cost and the
terminal condition becomes uniform at ``t = T-1`` for every example.

Numerics: fp32 throughout; identical results to the pure-lax path
(``ops/rnnt.py``) which remains the CPU/fallback implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _shift_right(x, d, fill):
    """Shift along the last axis by +d (length preserved).

    NB: narrow concat fills compile correctly for B <= 8 but trip Mosaic
    layout bugs at larger B (and pltpu.roll hangs the compiler) — the
    kernels are gated to B <= 8 until upstream fixes land; the pure-lax
    path covers larger batches (see ops/rnnt.py and pallas_lattice_supported).
    """
    B, U = x.shape
    return jnp.concatenate(
        [jnp.full((B, d), fill, x.dtype), x[:, :U - d]], axis=1)


def _shift_left(x, d, fill):
    B, U = x.shape
    return jnp.concatenate(
        [x[:, d:], jnp.full((B, d), fill, x.dtype)], axis=1)


def _linrec_scan(a, c, reverse: bool = False):
    """Solve x[u] = logaddexp(a[u], x[u-1] + c[u]) (or mirrored) in-kernel.

    Hillis-Steele over affine maps ``x -> logaddexp(A, C + x)`` in the log
    semiring; O(log U) passes of vectorised shifts.
    """
    U = a.shape[-1]
    A, C = a, c
    d = 1
    shift = _shift_left if reverse else _shift_right
    while d < U:
        Al = shift(A, d, NEG_INF)
        Cl = shift(C, d, 0.0)
        A = jnp.logaddexp(A, C + Al)
        C = C + Cl
        d *= 2
    return A


def _fwd_kernel(lp_blank_ref, lp_emit_ref, final_blank_ref, ulen_ref,
                alphas_ref, ll_ref, alpha_scr):
    # Grid is (batch_slab, T) with T fastest; the alpha scratch carries
    # within a slab and is re-initialised by the t == 0 branch (which
    # writes the whole row without reading) when the next slab starts.
    t = pl.program_id(1)
    T = pl.num_programs(1)
    B, U1 = alpha_scr.shape

    e_t = lp_emit_ref[0]  # (B, U1)

    @pl.when(t == 0)
    def _():
        # alpha[0, u] = sum_{w<u} emit[0, w]: linear recurrence with
        # a = [0, -inf, ...], c = [x, emit[0,0], emit[0,1], ...].
        u_iota = jax.lax.broadcasted_iota(jnp.int32, (B, U1), 1)
        a0 = jnp.where(u_iota == 0, 0.0, NEG_INF)
        c0 = _shift_right(e_t, 1, 0.0)
        alpha_scr[:] = _linrec_scan(a0, c0)

    @pl.when(t > 0)
    def _():
        # Vertical move uses the PREVIOUS row's blank probs, which the
        # caller passes shifted: lp_blank_ref[0] holds blank[t-1] here.
        a = alpha_scr[:] + lp_blank_ref[0]
        c = _shift_right(e_t, 1, NEG_INF)
        alpha_scr[:] = _linrec_scan(a, c)

    alphas_ref[0] = alpha_scr[:]

    @pl.when(t == T - 1)
    def _():
        # loglike[b] = alpha[T-1, ulen] + blank[T-1, ulen]; with the
        # pad-invariant blanks this equals the per-example terminal.
        # Emit the masked terminal row; the (cheap) row-sum happens in JAX
        # outside the kernel ((B,1)-shaped reductions trip a Mosaic
        # broadcast bug for B > 8).
        u_iota = jax.lax.broadcasted_iota(jnp.int32, (B, U1), 1)
        sel = (u_iota == ulen_ref[:]).astype(jnp.float32)
        final = alpha_scr[:] + final_blank_ref[:]  # + blank[T-1]
        ll_ref[:] = final * sel


def _bwd_kernel(lp_blank_ref, lp_emit_ref, alphas_ref, ulen_ref, ll_ref,
                gblank_ref, gemit_ref, beta_scr):
    """Reverse grid step: compute beta[t] and gradient rows for row t.

    Grid is (batch_slab, T) with T fastest; the beta scratch re-inits at
    r == 0 (full write, no read) when each new slab starts.
    """
    r = pl.program_id(1)  # 0 .. T-1, row t = T-1-r via index maps
    B, U1 = beta_scr.shape

    blank_t = lp_blank_ref[0]  # (B, U1): blank[t]
    emit_t = lp_emit_ref[0]
    alpha_t = alphas_ref[0]
    logZ = ll_ref[:]  # (B, U1) broadcast rows

    @pl.when(r == 0)
    def _():
        # Virtual beta[T, u] = 0 at u == ulen else -inf.
        u_iota = jax.lax.broadcasted_iota(jnp.int32, (B, U1), 1)
        beta_scr[:] = jnp.where(u_iota == ulen_ref[:], 0.0, NEG_INF)

    beta_next = beta_scr[:]  # beta[t+1]

    # d ll / d blank[t]: occupancy of the (t,u) -> (t+1,u) edge.
    gblank_ref[0] = jnp.exp(alpha_t + blank_t + beta_next - logZ)

    # beta[t]: reverse recurrence x[u] = logaddexp(bb[u], x[u+1]+emit[u]).
    bb = blank_t + beta_next
    beta_t = _linrec_scan(bb, emit_t, reverse=True)

    # Gradient w.r.t. emit[t]: edge (t,u) -> (t,u+1) uses beta[t, u+1].
    beta_right = _shift_left(beta_t, 1, NEG_INF)
    gemit_ref[0] = jnp.exp(alpha_t + emit_t + beta_right - logZ)

    beta_scr[:] = beta_t


def _pad_invariant(lp_blank, lp_emit, logit_lens, label_lens):
    """Apply the padding transformation: past-length frames get blank=0,
    emit=-inf; emits beyond label_len get -inf."""
    B, T, U1 = lp_blank.shape
    t_iota = jnp.arange(T)[None, :, None]
    u_iota = jnp.arange(U1)[None, None, :]
    t_pad = t_iota >= logit_lens[:, None, None]
    lp_blank = jnp.where(t_pad, 0.0, lp_blank)
    lp_emit = jnp.where(
        t_pad | (u_iota >= label_lens[:, None, None]), NEG_INF, lp_emit)
    return lp_blank, lp_emit


@jax.custom_vjp
def rnnt_lattice_pallas(lp_blank, lp_emit, logit_lens, label_lens):
    """Per-example transducer log-likelihood from blank/emit log-probs.

    lp_blank/lp_emit: ``(B, T, U+1)`` fp32 (see ops/rnnt.py for their
    definition).  Returns ``(B,)`` log-likelihoods.
    """
    ll, _ = _lattice_fwd_impl(lp_blank, lp_emit, logit_lens, label_lens)
    return ll


_SLAB = 8  # max rows per slab block (Mosaic miscompiles row shifts beyond)


def _slab_of(B: int) -> int:
    """Rows per grid slab: B itself when B <= 8 (no padding), else 8."""
    return B if B <= _SLAB else _SLAB


def _pad_batch(x, Bp: int):
    widths = [(0, Bp - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths)


def _call_fwd(lpb_t, lpe_t, final_blank, ulen, T, Bp, U1, slab):
    n_slabs = Bp // slab
    row3 = pl.BlockSpec((1, slab, U1), lambda s, t: (t, s, 0),
                        memory_space=pltpu.VMEM)
    flat2 = pl.BlockSpec((slab, U1), lambda s, t: (s, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(n_slabs, T),
        in_specs=[
            # blank rows shifted: at grid step t we read blank[t-1].
            row3, row3, flat2, flat2,
        ],
        out_specs=[row3, flat2],
        out_shape=[
            jax.ShapeDtypeStruct((T, Bp, U1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, U1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((slab, U1), jnp.float32)],
    )(lpb_t, lpe_t, final_blank, ulen)


def _lattice_fwd_impl(lp_blank, lp_emit, logit_lens, label_lens):
    B, T, U1 = lp_blank.shape
    slab = _slab_of(B)
    Bp = -(-B // slab) * slab
    lpb, lpe = _pad_invariant(lp_blank, lp_emit, logit_lens, label_lens)
    if Bp != B:
        # Pad rows get logit_len-0 semantics (blank 0 / emit -inf rows):
        # ll = 0, grads sliced off.
        lpb = _pad_batch(lpb, Bp)
        lpe = _pad_batch(lpe, Bp) + jnp.where(
            jnp.arange(Bp)[:, None, None] < B, 0.0, NEG_INF)
        label_lens = _pad_batch(label_lens, Bp)
    lpb_t = jnp.moveaxis(lpb, 1, 0)  # (T, Bp, U1)
    lpe_t = jnp.moveaxis(lpe, 1, 0)
    # Shift blanks down one row: kernel's step t consumes blank[t-1].
    lpb_shift = jnp.concatenate(
        [jnp.zeros((1, Bp, U1), jnp.float32), lpb_t[:-1]], axis=0)
    ulen = jnp.broadcast_to(
        label_lens.astype(jnp.int32)[:, None], (Bp, U1))

    alphas, ll_row = _call_fwd(lpb_shift, lpe_t, lpb_t[-1], ulen, T, Bp,
                               U1, slab)
    ll_vec = jnp.sum(ll_row, axis=1)  # masked row -> scalar per example
    ll = jnp.broadcast_to(ll_vec[:, None], (Bp, U1))
    return ll_vec[:B], (lpb, lpe, alphas, ll, ulen)


def _vjp_fwd(lp_blank, lp_emit, logit_lens, label_lens):
    ll, res = _lattice_fwd_impl(lp_blank, lp_emit, logit_lens, label_lens)
    return ll, res + (logit_lens,)


def _vjp_bwd(res, g):
    lpb, lpe, alphas, ll, ulen, logit_lens = res
    Bp, T, U1 = lpb.shape
    B = logit_lens.shape[0]
    slab = _slab_of(B)
    n_slabs = Bp // slab
    lpb_t = jnp.moveaxis(lpb, 1, 0)
    lpe_t = jnp.moveaxis(lpe, 1, 0)

    rev3 = pl.BlockSpec((1, slab, U1), lambda s, t: (T - 1 - t, s, 0),
                        memory_space=pltpu.VMEM)
    flat2 = pl.BlockSpec((slab, U1), lambda s, t: (s, 0),
                         memory_space=pltpu.VMEM)
    gblank, gemit = pl.pallas_call(
        _bwd_kernel,
        grid=(n_slabs, T),
        in_specs=[rev3, rev3, rev3, flat2, flat2],
        out_specs=[rev3, rev3],
        out_shape=[
            jax.ShapeDtypeStruct((T, Bp, U1), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, U1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((slab, U1), jnp.float32)],
    )(lpb_t, lpe_t, alphas, ulen, ll)

    gb = jnp.moveaxis(gblank, 0, 1)[:B] * g[:, None, None]
    ge = jnp.moveaxis(gemit, 0, 1)[:B] * g[:, None, None]
    # Gradients through the pad transformation: padded entries were
    # constants, so their grads are zero.
    t_iota = jnp.arange(T)[None, :, None]
    t_pad = t_iota >= logit_lens[:, None, None]
    gb = jnp.where(t_pad, 0.0, gb)
    ge = jnp.where(ge > -jnp.inf, ge, 0.0)  # emit entries set to -inf
    ge = jnp.where(t_pad, 0.0, ge)
    return gb, ge, None, None


rnnt_lattice_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def rnnt_lattice(lp_blank, lp_emit, logit_lens, label_lens):
    """Any-batch lattice: ONE pallas_call with a 2-D ``(slab, T)`` grid.

    The in-kernel row shifts are only Mosaic-correct for <= 8 rows per
    block (see ``_shift_right``), so the batch rides a grid dimension of
    8-row slabs instead of the rows axis — the alpha/beta scratch
    re-initialises at ``t == 0`` as each slab starts (VERDICT r2 #5;
    replaces the round-1/2 unrolled per-slab call loop).  Pad rows
    (B % 8 != 0) get blank-only semantics: ll = 0, grads sliced off.
    """
    return rnnt_lattice_pallas(lp_blank, lp_emit, logit_lens, label_lens)


def rnnt_loss_pallas(logits, logit_lens, labels, label_lens,
                     blank_index: int = 0, reduction: str = "mean"):
    """Drop-in replacement for ``ops.rnnt.rnnt_loss`` using the kernels.

    The softmax front runs as the fused blank/emit extraction
    (``ops.rnnt.blank_emit_from_logits`` — no materialised log-softmax,
    single-pass hand-written backward); the (T,U) lattice runs in Pallas.
    """
    from myrtlespeech_tpu.ops.rnnt import blank_emit_from_logits

    lp_blank, lp_emit = blank_emit_from_logits(logits, labels, blank_index)
    ll = rnnt_lattice(lp_blank, lp_emit, logit_lens, label_lens)
    nll = -ll
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll)
    raise ValueError(f"unknown reduction {reduction!r}")
