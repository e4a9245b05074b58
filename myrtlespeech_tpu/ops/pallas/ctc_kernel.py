"""CTC lattice forward-backward as Pallas TPU kernels.

TPU-native replacement for the ATen/cuDNN CTC kernels behind the
reference's ``loss/ctc_loss.py`` (SURVEY.md §2.10 N2).  Same design as the
transducer kernels (``rnnt_kernel.py``):

- forward: ``grid=(T,)`` with the alpha row ``(B, 2U+1)`` resident in VMEM;
  the CTC recurrence is a fixed 3-term stencil (stay / advance / skip) —
  pure vectorised shifts, no inner scan needed;
- backward: reverse grid computing beta rows and emitting the occupancy
  gradient ``d ll / d lp_ext[t,s] = exp(alpha + beta - lp - logZ)`` row by
  row; autodiff carries it through the extended-label gather/log-softmax.

Variable input lengths use a pad-invariant reformulation: frames past each
example's length emit blank with probability 1 (blank positions get
log-prob 0, labels -inf), so every path glides to the final blank and the
terminal condition is uniform at ``t = T-1``.  Label padding: odd lattice
positions ``s >= 2*label_len`` get -inf at every frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _sr(x, d, fill):
    """Shift right along last axis (see rnnt_kernel._shift_right note on
    the B <= 8 gating of these kernels)."""
    B, S = x.shape
    return jnp.concatenate(
        [jnp.full((B, d), fill, x.dtype), x[:, :S - d]], axis=1)


def _sl(x, d, fill):
    B, S = x.shape
    return jnp.concatenate(
        [x[:, d:], jnp.full((B, d), fill, x.dtype)], axis=1)


def _fwd_kernel(lp_ref, skip_ref, ulen_ref, alphas_ref, ll_ref, alpha_scr):
    # Grid is (batch_slab, T), T fastest; alpha scratch re-inits at t == 0
    # (full write, no read) as each new slab starts.
    t = pl.program_id(1)
    T = pl.num_programs(1)
    B, S = alpha_scr.shape
    lp_t = lp_ref[0]

    @pl.when(t == 0)
    def _():
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
        alpha_scr[:] = jnp.where(s_iota <= 1, lp_t, NEG_INF)

    @pl.when(t > 0)
    def _():
        a = alpha_scr[:]
        stay = a
        adv = _sr(a, 1, NEG_INF)
        skp = jnp.where(skip_ref[:] > 0.5, _sr(a, 2, NEG_INF), NEG_INF)
        alpha_scr[:] = jnp.logaddexp(jnp.logaddexp(stay, adv), skp) + lp_t

    alphas_ref[0] = alpha_scr[:]

    @pl.when(t == T - 1)
    def _():
        # Emit the masked terminal row; the 2-entry logsumexp happens in
        # JAX outside the kernel ((B,1) reductions trip a Mosaic broadcast
        # bug for B > 8).
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
        last = 2 * ulen_ref[:]
        sel = (s_iota == last) | (s_iota == jnp.maximum(last - 1, 0))
        ll_ref[:] = jnp.where(sel, alpha_scr[:], NEG_INF)


def _bwd_kernel(lp_ref, skip_ref, alphas_ref, ulen_ref, ll_ref, grad_ref,
                beta_scr):
    r = pl.program_id(1)  # row t = T-1-r via index maps
    B, S = beta_scr.shape
    lp_t = lp_ref[0]
    alpha_t = alphas_ref[0]
    logZ = ll_ref[:]

    @pl.when(r == 0)
    def _():
        # beta[T-1, s] = lp[T-1, s] on terminal positions {2u, 2u-1}.
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
        last = 2 * ulen_ref[:]
        sel = (s_iota == last) | (s_iota == jnp.maximum(last - 1, 0))
        beta_scr[:] = jnp.where(sel, lp_t, NEG_INF)

    @pl.when(r > 0)
    def _():
        bn = beta_scr[:]  # beta[t+1]
        stay = bn
        adv = _sl(bn, 1, NEG_INF)
        # Skip INTO s+2 is allowed when skip mask at s+2 is set.
        skp = _sl(jnp.where(skip_ref[:] > 0.5, bn, NEG_INF), 2, NEG_INF)
        beta_scr[:] = jnp.logaddexp(jnp.logaddexp(stay, adv), skp) + lp_t

    # Occupancy gradient (finite NEG_INF keeps exp() NaN-free).
    grad_ref[0] = jnp.exp(alpha_t + beta_scr[:] - lp_t - logZ)


@jax.custom_vjp
def ctc_lattice_pallas(lp_ext, can_skip, label_lens):
    """CTC log-likelihood from extended-label log-probs.

    lp_ext: ``(B, T, 2U+1)`` fp32 (pad-invariant, see wrapper);
    can_skip: ``(B, 2U+1)`` float 0/1; label_lens: ``(B,)``.
    Returns ``(B,)`` log-likelihoods.
    """
    ll, _ = _fwd_impl(lp_ext, can_skip, label_lens)
    return ll


_SLAB = 8  # max rows per slab block (Mosaic miscompiles row shifts beyond)


def _slab_of(B: int) -> int:
    return B if B <= _SLAB else _SLAB


def _pad_batch(x, Bp: int):
    widths = [(0, Bp - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths)


def _fwd_impl(lp_ext, can_skip, label_lens):
    B, T, S = lp_ext.shape
    slab = _slab_of(B)
    Bp = -(-B // slab) * slab
    if Bp != B:
        # Pad rows: all-NEG_INF frames except an implicit t=0 start; their
        # ll is garbage but gets sliced off, and grads are exp(NEG_INF
        # sums) = 0.  Simplest safe fill: NEG_INF everywhere.
        lp_ext = _pad_batch(lp_ext, Bp) + jnp.where(
            jnp.arange(Bp)[:, None, None] < B, 0.0, NEG_INF)
        can_skip = _pad_batch(can_skip, Bp)
        label_lens = _pad_batch(label_lens, Bp)
    lp_t = jnp.moveaxis(lp_ext, 1, 0)
    ulen = jnp.broadcast_to(label_lens.astype(jnp.int32)[:, None], (Bp, S))
    n_slabs = Bp // slab
    row3 = pl.BlockSpec((1, slab, S), lambda s, t: (t, s, 0),
                        memory_space=pltpu.VMEM)
    flat2 = pl.BlockSpec((slab, S), lambda s, t: (s, 0),
                         memory_space=pltpu.VMEM)
    alphas, ll = pl.pallas_call(
        _fwd_kernel,
        grid=(n_slabs, T),
        in_specs=[row3, flat2, flat2],
        out_specs=[row3, flat2],
        out_shape=[
            jax.ShapeDtypeStruct((T, Bp, S), jnp.float32),
            jax.ShapeDtypeStruct((Bp, S), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((slab, S), jnp.float32)],
    )(lp_t, can_skip, ulen)
    mx = jnp.max(ll, axis=1)
    ll_vec = mx + jnp.log(jnp.sum(jnp.exp(ll - mx[:, None]), axis=1))
    ll_bcast = jnp.broadcast_to(ll_vec[:, None], (Bp, S))
    return ll_vec[:B], (lp_t, can_skip, ulen, alphas, ll_bcast, B)


def _vjp_fwd(lp_ext, can_skip, label_lens):
    ll, res = _fwd_impl(lp_ext, can_skip, label_lens)
    return ll, res


def _vjp_bwd(res, g):
    lp_t, can_skip, ulen, alphas, ll, B = res
    T, Bp, S = lp_t.shape
    slab = _slab_of(B)
    n_slabs = Bp // slab
    rev3 = pl.BlockSpec((1, slab, S), lambda s, t: (T - 1 - t, s, 0),
                        memory_space=pltpu.VMEM)
    flat2 = pl.BlockSpec((slab, S), lambda s, t: (s, 0),
                         memory_space=pltpu.VMEM)
    grad = pl.pallas_call(
        _bwd_kernel,
        grid=(n_slabs, T),
        in_specs=[rev3, flat2, rev3, flat2, flat2],
        out_specs=rev3,
        out_shape=jax.ShapeDtypeStruct((T, Bp, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((slab, S), jnp.float32)],
    )(lp_t, can_skip, alphas, ulen, ll)
    dlp = jnp.moveaxis(grad, 0, 1)[:B] * g[:, None, None]
    return dlp, None, None


ctc_lattice_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def ctc_lattice(lp_ext, can_skip, label_lens):
    """Any-batch CTC lattice: ONE pallas_call, 2-D ``(slab, T)`` grid
    (VERDICT r2 #5; same design as ``rnnt_kernel.rnnt_lattice``)."""
    return ctc_lattice_pallas(lp_ext, can_skip, label_lens)


def ctc_loss_pallas(logits, logit_lens, labels, label_lens,
                    blank_index: int = 0, reduction: str = "mean"):
    """Drop-in replacement for ``ops.ctc.ctc_loss`` using the kernels."""
    from myrtlespeech_tpu.ops.ctc import _extended_labels

    B, T, V = logits.shape
    U = labels.shape[1]
    S = 2 * U + 1
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ext = _extended_labels(labels, blank_index)  # (B, S)
    lp_ext = jnp.take_along_axis(
        logp, ext[:, None, :].astype(jnp.int32), axis=2)  # (B, T, S)

    s_iota = jnp.arange(S)[None, None, :]
    t_iota = jnp.arange(T)[None, :, None]
    is_blank_pos = (s_iota % 2 == 0)
    # Label padding: odd positions beyond 2*label_len are invalid always.
    label_ok = s_iota < (2 * label_lens[:, None, None] + 1)
    lp_ext = jnp.where(label_ok | is_blank_pos, lp_ext, NEG_INF)
    # Pad-invariance: past-length frames emit blank with prob 1.
    t_pad = t_iota >= logit_lens[:, None, None]
    lp_ext = jnp.where(t_pad, jnp.where(is_blank_pos, 0.0, NEG_INF), lp_ext)

    can_skip = jnp.zeros((B, S), jnp.float32)
    if U > 1:
        diff = (labels[:, 1:] != labels[:, :-1]).astype(jnp.float32)
        can_skip = can_skip.at[:, 3::2].set(diff)

    ll = ctc_lattice(lp_ext, can_skip, label_lens)
    # The pad transformation wrote constants into lp_ext; their gradients
    # are killed by the jnp.where above during autodiff automatically.
    nll = -ll
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        denom = jnp.maximum(label_lens, 1).astype(nll.dtype)
        return jnp.mean(nll / denom)
    raise ValueError(f"unknown reduction {reduction!r}")
