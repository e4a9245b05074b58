"""CTC loss as a pure-JAX log-space forward recursion.

TPU-native replacement for the reference's ATen/cuDNN CTC
(``src/myrtlespeech/loss/ctc_loss.py :: CTCLoss`` wrapping
``torch.nn.CTCLoss``).  The alpha (forward) recursion over the extended
label sequence runs as a single ``lax.scan`` over time, fully batched over
``(B, S)`` — no per-example Python, no dynamic shapes.  Gradients come from
autodiff through the scan, which for CTC yields exactly the classic
soft-alignment gradient.

Like ``torch.nn.CTCLoss``, :func:`ctc_loss` applies ``log_softmax``
internally, expects ``blank_index`` anywhere in the vocab, and supports
zero-length targets.  Reductions mirror torch semantics ('mean' divides each
example's loss by its target length before averaging).

A Pallas lattice kernel can replace :func:`ctc_loss` behind the same
signature (``myrtlespeech_tpu/ops/pallas/ctc_kernel.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _extended_labels(labels, blank_index: int):
    """Interleave blanks: labels (B, U) -> ext (B, 2U+1)."""
    B, U = labels.shape
    S = 2 * U + 1
    ext = jnp.full((B, S), blank_index, dtype=labels.dtype)
    return ext.at[:, 1::2].set(labels)


def ctc_forward_log_likelihood(logits, logit_lens, labels, label_lens,
                               blank_index: int = 0):
    """Per-example CTC log-likelihood ``log p(labels | logits)``.

    Args:
      logits: ``(B, T, V)`` unnormalised scores (any float dtype; fp32 used
        internally).
      logit_lens: ``(B,)`` valid frame counts (>= 1).
      labels: ``(B, U)`` int targets, padded arbitrarily past ``label_lens``.
      label_lens: ``(B,)`` valid target lengths (may be 0).
      blank_index: index of the CTC blank in ``V``.

    Returns:
      ``(B,)`` fp32 log-likelihoods (<= 0).
    """
    B, T, V = logits.shape
    U = labels.shape[1]
    S = 2 * U + 1

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ext = _extended_labels(labels, blank_index)  # (B, S)

    # (B, T, S): log-prob of each extended symbol at each frame.
    logp_ext = jnp.take_along_axis(
        logp, ext[:, None, :].astype(jnp.int32), axis=2)
    logp_ext = jnp.moveaxis(logp_ext, 1, 0)  # (T, B, S)

    # Skip-transition allowed into position s iff ext[s] is a real label
    # (odd s) and differs from ext[s-2].
    can_skip = jnp.zeros((B, S), dtype=bool)
    if U > 1:
        diff = labels[:, 1:] != labels[:, :-1]  # (B, U-1)
        can_skip = can_skip.at[:, 3::2].set(diff)

    alpha0 = jnp.full((B, S), NEG_INF, jnp.float32)
    alpha0 = alpha0.at[:, 0].set(logp_ext[0, :, 0])
    if S > 1:
        has_label = label_lens > 0
        alpha0 = alpha0.at[:, 1].set(
            jnp.where(has_label, logp_ext[0, :, 1], NEG_INF))

    valid_t = (jnp.arange(T)[:, None] < logit_lens[None, :])  # (T, B)

    def step(alpha, inputs):
        lp_t, v_t = inputs  # (B, S), (B,)
        prev1 = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF), alpha[:, :-1]], axis=1)
        prev2 = jnp.concatenate(
            [jnp.full((B, 2), NEG_INF), alpha[:, :-2]], axis=1)
        prev2 = jnp.where(can_skip, prev2, NEG_INF)
        new = jnp.logaddexp(jnp.logaddexp(alpha, prev1), prev2) + lp_t
        alpha = jnp.where(v_t[:, None], new, alpha)
        return alpha, None

    alpha, _ = jax.lax.scan(step, alpha0, (logp_ext[1:], valid_t[1:]))

    # Read final positions 2*label_len and 2*label_len - 1.
    last = 2 * label_lens  # (B,)
    a_last = jnp.take_along_axis(alpha, last[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(
        alpha, jnp.maximum(last - 1, 0)[:, None], axis=1)[:, 0]
    ll = jnp.where(label_lens > 0, jnp.logaddexp(a_last, a_prev), a_last)
    return jnp.maximum(ll, NEG_INF)


def ctc_loss(logits, logit_lens, labels, label_lens, blank_index: int = 0,
             reduction: str = "mean"):
    """CTC loss with torch-compatible reductions.

    'none' -> ``(B,)`` per-example negative log-likelihoods;
    'sum' -> scalar sum; 'mean' -> per-example loss divided by target length
    (clamped to 1), then averaged over the batch (torch semantics).
    """
    nll = -ctc_forward_log_likelihood(logits, logit_lens, labels, label_lens,
                                      blank_index)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        denom = jnp.maximum(label_lens, 1).astype(nll.dtype)
        return jnp.mean(nll / denom)
    raise ValueError(f"unknown reduction {reduction!r}")
