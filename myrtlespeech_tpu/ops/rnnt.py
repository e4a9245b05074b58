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

import functools

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _blank_emit_direct(logits, lab, blank_index):
    """Fused ``log_softmax`` + blank/label extraction from raw joint logits.

    Computes ``lp_blank[b,t,u] = log_softmax(logits)[b,t,u,blank]`` and
    ``lp_emit[b,t,u] = log_softmax(logits)[b,t,u,lab[b,u]]`` without ever
    materialising the ``(B, T, U+1, V)`` log-softmax tensor, and with a
    hand-written single-pass backward.  This is the transducer loss's HBM
    hot path: XLA lowers ``log_softmax`` + ``take_along_axis`` + their
    autodiff to several full-tensor passes with gather/scatter (measured
    ~2 ms of the 2.65 ms loss at B=32/T'=250/U=64/V=29 on v5e, i.e. the
    softmax front dominates the lattice itself — docs/performance.md).
    Here the forward is max + exp-sum + two masked lane reductions and the
    backward is ONE fused elementwise pass
    ``dx = gb*onehot(blank) + ge*onehot(lab) - (gb+ge)*softmax(x)``.

    Args: logits ``(B, T, U+1, V)`` (any float dtype), lab ``(B, U+1)``
    int32 (labels with a trailing pad column).  Returns two ``(B, T, U+1)``
    fp32 arrays.  (Replaces the warp-transducer CUDA front of reference
    ``loss/rnn_t_loss.py``.)
    """
    out, _ = _blank_emit_direct_fwd(logits, lab, blank_index)
    return out


def _blank_emit_direct_fwd(logits, lab, blank_index):
    x = logits.astype(jnp.float32)
    V = x.shape[-1]
    m = jnp.max(x, axis=-1)
    lse = m + jnp.log(jnp.sum(jnp.exp(x - m[..., None]), axis=-1))
    xb = x[..., blank_index]
    emask = (jnp.arange(V)[None, None, None, :]
             == lab[:, None, :, None])  # (B, T=1bc, U+1, V)
    xe = jnp.sum(jnp.where(emask, x, 0.0), axis=-1)
    return (xb - lse, xe - lse), (logits, lab, lse)


def _blank_emit_direct_bwd(blank_index, res, grads):
    logits, lab, lse = res
    gb, ge = grads
    x = logits.astype(jnp.float32)
    V = x.shape[-1]
    v_iota = jnp.arange(V)[None, None, None, :]
    softmax = jnp.exp(x - lse[..., None])
    emask = v_iota == lab[:, None, :, None]
    dx = (jnp.where(v_iota == blank_index, gb[..., None], 0.0)
          + jnp.where(emask, ge[..., None], 0.0)
          - (gb + ge)[..., None] * softmax)
    return dx.astype(logits.dtype), None


_blank_emit_direct.defvjp(_blank_emit_direct_fwd, _blank_emit_direct_bwd)


def blank_emit_from_logits(logits, labels, blank_index: int = 0):
    """Blank/emit log-probs straight from raw joint logits (fused front).

    Equivalent to ``blank_emit_log_probs(log_softmax(logits), labels)`` but
    avoids materialising the log-softmax tensor and uses a single-pass
    hand-written backward (see :func:`_blank_emit_direct`).
    """
    B = logits.shape[0]
    lab = jnp.concatenate(
        [labels.astype(jnp.int32),
         jnp.zeros((B, 1), jnp.int32)], axis=1)  # (B, U+1); last col unused
    return _blank_emit_direct(logits, lab, blank_index)


def blank_emit_log_probs(log_probs, labels, blank_index: int = 0):
    """Extract the two lattice inputs from joint log-probs.

    log_probs: ``(B, T, U+1, V)``; labels: ``(B, U)``.  Returns
    ``(lp_blank, lp_emit)`` each ``(B, T, U+1)`` fp32 where
    ``lp_blank[t, u] = lp[t, u, blank]`` and
    ``lp_emit[t, u] = lp[t, u, labels[u]]`` (last column is garbage — the
    lattice masks it via ``label_lens``).
    """
    B = log_probs.shape[0]
    lp = log_probs.astype(jnp.float32)
    lp_blank = lp[..., blank_index]  # (B, T, U+1)
    lab = jnp.concatenate(
        [labels.astype(jnp.int32),
         jnp.zeros((B, 1), jnp.int32)], axis=1)  # (B, U+1); last col unused
    lp_emit = jnp.take_along_axis(
        lp, lab[:, None, :, None], axis=3)[..., 0]  # (B, T, U+1)
    return lp_blank, lp_emit


def rnnt_log_likelihood_from_blank_emit(lp_blank, lp_emit, logit_lens,
                                        label_lens):
    """Transducer lattice recursion from pre-gathered blank/emit log-probs.

    lp_blank, lp_emit: ``(B, T, U+1)`` fp32 (see
    :func:`blank_emit_log_probs`); returns ``(B,)`` fp32 log-likelihoods.
    """
    B, T, U1 = lp_blank.shape
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
    lp_blank, lp_emit = blank_emit_log_probs(log_probs, labels, blank_index)
    return rnnt_log_likelihood_from_blank_emit(lp_blank, lp_emit, logit_lens,
                                               label_lens)


def _reduce(nll, reduction: str):
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll)
    raise ValueError(f"unknown reduction {reduction!r}")


def rnnt_loss(logits, logit_lens, labels, label_lens, blank_index: int = 0,
              reduction: str = "mean"):
    """Transducer loss from raw joint logits ``(B, T, U+1, V)``.

    Applies log_softmax over ``V`` internally (warp-transducer convention).
    'mean' averages per-example losses over the batch (warp-transducer
    semantics — no division by label length, unlike CTC's torch 'mean').
    """
    lp_blank, lp_emit = blank_emit_from_logits(logits, labels, blank_index)
    nll = -rnnt_log_likelihood_from_blank_emit(lp_blank, lp_emit, logit_lens,
                                               label_lens)
    return _reduce(nll, reduction)


def rnnt_loss_fused(f, f_lens, g, labels, label_lens, joint_apply, *,
                    blank_index: int = 0, reduction: str = "mean",
                    chunk_size: int = 32):
    """Transducer loss fused with the joint network, chunked over T.

    The (B, T, U+1, H_joint) hidden and (B, T, U+1, V) logits of the joint
    net are the transducer's memory hot spot (SURVEY.md §3.3) — the
    reference holds the full logits for warp-transducer, bounding batch
    size.  Here the joint runs one T-chunk at a time inside a
    ``lax.scan``; each chunk reduces immediately to the two tiny lattice
    inputs ``(lp_blank, lp_emit)`` (B, T, U+1) and the chunk's activations
    are rematerialised in the backward pass (``jax.checkpoint``), so peak
    memory is O(T/chunks) of the unfused path while the big joint matmuls
    still hit the MXU at full (B*chunk*U) row counts.

    Args:
      f: ``(B, T, H_enc)`` encoder output; f_lens: ``(B,)``.
      g: ``(B, U+1, H_pred)`` prediction-net output.
      joint_apply: ``fn(f_chunk (B, tc, H_enc)) -> logits (B, tc, U+1, V)``
        — typically ``lambda fc: model.apply(vars, fc, g, method=RNNT.joint)``.
      chunk_size: frames per chunk (static).

    Returns the reduced loss (same semantics as :func:`rnnt_loss`).
    """
    B, T, H = f.shape
    tc = min(chunk_size, T)
    pad = (-T) % tc
    n_chunks = (T + pad) // tc
    f_pad = jnp.pad(f, ((0, 0), (0, pad), (0, 0)))
    f_chunks = jnp.moveaxis(
        f_pad.reshape(B, n_chunks, tc, H), 1, 0)  # (n, B, tc, H)

    @jax.checkpoint
    def chunk_fn(f_chunk):
        logits = joint_apply(f_chunk)  # (B, tc, U+1, V)
        return blank_emit_from_logits(logits, labels, blank_index)

    def scan_body(_, f_chunk):
        return None, chunk_fn(f_chunk)

    _, (lpb, lpe) = jax.lax.scan(scan_body, None, f_chunks)
    # (n, B, tc, U+1) -> (B, T, U+1)
    U1 = lpb.shape[-1]
    lp_blank = jnp.moveaxis(lpb, 0, 1).reshape(B, T + pad, U1)[:, :T]
    lp_emit = jnp.moveaxis(lpe, 0, 1).reshape(B, T + pad, U1)[:, :T]
    nll = -rnnt_log_likelihood_from_blank_emit(lp_blank, lp_emit, f_lens,
                                               label_lens)
    return _reduce(nll, reduction)
