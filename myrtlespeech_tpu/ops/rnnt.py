"""RNN-T (transducer) loss as a pure-JAX log-space lattice recursion.

TPU-native replacement for the reference's warp-transducer CUDA loss
(``src/myrtlespeech/loss/rnn_t_loss.py :: RNNTLoss`` binding
HawkAaron/warp-transducer).  The forward (alpha) recursion over the (T, U)
lattice runs as a ``lax.scan`` over time where each step solves the
along-U linear recurrence with an **associative scan in the log semiring**
— O(log U) depth per frame instead of a sequential U-loop, fully batched.

    alpha[t, u] = logaddexp(alpha[t-1, u] + blank[t-1, u],
                            alpha[t,  u-1] + emit[t,  u-1])

Gradients come from autodiff through the scans (the transducer gradient is
exactly the derivative of the forward log-likelihood, so this is correct and
saves hand-writing beta).  fp32 throughout the lattice regardless of logits
dtype.

The memory hot spot is the ``(B, T, U+1, V)`` joint logits produced by the
model — this op takes them as given; the fused Pallas joint+loss kernel
(``ops/pallas/rnnt_kernel.py``) is the path that avoids materialising them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _log_semiring_linrec(a, c):
    """Solve x[u] = logaddexp(a[u], x[u-1] + c[u]) via associative scan.

    a, c: ``(..., U)``; the recurrence runs along the last axis with
    ``x[-1] = -inf``.  Returns x with the same shape.

    Elements are affine maps in the (logaddexp, +) semiring represented as
    pairs ``(c, a)`` meaning ``x -> logaddexp(a, c + x)``; composition of
    ``(c1, a1)`` then ``(c2, a2)`` is ``(c1 + c2, logaddexp(a2, c2 + a1))``.
    """

    def combine(left, right):
        c1, a1 = left
        c2, a2 = right
        return c1 + c2, jnp.logaddexp(a2, c2 + a1)

    _, x = jax.lax.associative_scan(combine, (c, a), axis=-1)
    return x


def rnnt_forward_log_likelihood(log_probs, logit_lens, labels, label_lens,
                                blank_index: int = 0):
    """Per-example transducer log-likelihood from joint log-probs.

    Args:
      log_probs: ``(B, T, U+1, V)`` log-softmaxed joint outputs.
      logit_lens: ``(B,)`` valid encoder frame counts (>= 1).
      labels: ``(B, U)`` int targets.
      label_lens: ``(B,)`` valid target lengths (may be 0).
      blank_index: blank id in ``V``.

    Returns ``(B,)`` fp32 log-likelihoods.
    """
    B, T, U1, V = log_probs.shape
    U = U1 - 1
    lp = log_probs.astype(jnp.float32)

    # blank[t, u] = lp[t, u, blank]; emit[t, u] = lp[t, u, labels[u]].
    lp_blank = lp[..., blank_index]  # (B, T, U+1)
    lab = jnp.concatenate(
        [labels.astype(jnp.int32),
         jnp.zeros((B, 1), jnp.int32)], axis=1)  # (B, U+1); last col unused
    lp_emit = jnp.take_along_axis(
        lp, lab[:, None, :, None], axis=3)[..., 0]  # (B, T, U+1)
    # Disallow emitting beyond the true label length.
    u_idx = jnp.arange(U1)[None, :]
    emit_ok = u_idx < label_lens[:, None]  # (B, U+1)
    lp_emit = jnp.where(emit_ok[:, None, :], lp_emit, NEG_INF)

    lp_blank_t = jnp.moveaxis(lp_blank, 1, 0)  # (T, B, U+1)
    lp_emit_t = jnp.moveaxis(lp_emit, 1, 0)  # (T, B, U+1)

    # t = 0 row: alpha[0, u] = sum_{w<u} emit[0, w] = cumsum of emits.
    e0 = lp_emit_t[0]  # (B, U+1)
    alpha0 = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32),
         jnp.cumsum(e0[:, :-1], axis=1)], axis=1)
    alpha0 = jnp.maximum(alpha0, NEG_INF)

    valid_t = (jnp.arange(T)[:, None] < logit_lens[None, :])  # (T, B)

    def step(alpha, inputs):
        prev_blank, e_t, v_t = inputs
        # Vertical move: a[u] = alpha[t-1, u] + blank[t-1, u].
        a = alpha + prev_blank
        # Horizontal moves within row t: x[u] = logaddexp(a[u], x[u-1]+e[u-1]).
        c = jnp.concatenate([jnp.full((B, 1), NEG_INF), e_t[:, :-1]], axis=1)
        new = _log_semiring_linrec(a, c)
        alpha = jnp.where(v_t[:, None], new, alpha)
        return alpha, None

    alpha, _ = jax.lax.scan(
        step, alpha0, (lp_blank_t[:-1], lp_emit_t[1:], valid_t[1:]))

    # Terminal: alpha[T-1, U] + blank[T-1, U], per-example (T, U).
    final_u = label_lens[:, None]  # (B, 1)
    a_final = jnp.take_along_axis(alpha, final_u, axis=1)[:, 0]
    last_t = jnp.maximum(logit_lens - 1, 0)  # (B,)
    b_final = jnp.take_along_axis(
        jnp.take_along_axis(
            lp_blank, last_t[:, None, None], axis=1)[:, 0, :],
        final_u, axis=1)[:, 0]
    return jnp.maximum(a_final + b_final, NEG_INF)


def rnnt_loss(logits, logit_lens, labels, label_lens, blank_index: int = 0,
              reduction: str = "mean"):
    """Transducer loss from raw joint logits ``(B, T, U+1, V)``.

    Applies log_softmax over ``V`` internally (warp-transducer convention).
    'mean' averages per-example losses over the batch (warp-transducer
    semantics — no division by label length, unlike CTC's torch 'mean').
    """
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -rnnt_forward_log_likelihood(lp, logit_lens, labels, label_lens,
                                       blank_index)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll)
    raise ValueError(f"unknown reduction {reduction!r}")
