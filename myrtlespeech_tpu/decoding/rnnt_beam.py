"""Batched on-device RNN-T beam search.

Reference: ``src/myrtlespeech/post_process/rnn_t_beam_decoder.py ::
RNNTBeamDecoder`` — Graves 2012 Algorithm 1 with Python dict bookkeeping per
utterance.  This implementation keeps every hypothesis in fixed-size device
arrays and runs under ``jit``:

- Per encoder frame, hypotheses expand in up to ``max_symbols_per_step``
  rounds.  In each round every live hypothesis either takes **blank**
  (joining the frame's *finished* set) or **emits** a symbol (staying in
  the *expanding* set, prediction net advanced).
- Identical label sequences reached by different paths are merged with a
  log-sum-exp keyed on a rolling pair of 32-bit prefix hashes — the
  device-array replacement for Graves' dict merge (same device as the CTC
  prefix beam, see ``ctc_beam.py``).
- Both sets are truncated to the beam width with ``top_k`` every round, so
  all shapes are static; the expansion loop is a ``lax.while_loop`` that
  exits early once every hypothesis has taken blank.

``length_norm`` divides final scores by sequence length (reference option).
The decoder is model-agnostic via ``predict_step`` / ``joint_step``
closures, vmapped over the batch (beam width plays the batch role inside).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30
_MUL1 = jnp.uint32(0x01000193)
_MUL2 = jnp.uint32(0x00100001)


def _merge_topk(scores, h1, h2, W):
    """Hash-merge duplicate hypotheses then select top W.

    Returns (merged scores (N,), selector idx (W,)) — gather other buffers
    with the selector.  Duplicates: all but one copy get NEG_INF after
    their mass is merged into the kept copy.
    """
    order = jnp.argsort(h1)
    s1, s2 = h1[order], h2[order]
    sc = scores[order]
    prev_same = jnp.concatenate(
        [jnp.array([False]), (s1[1:] == s1[:-1]) & (s2[1:] == s2[:-1])])

    def combine(a, b):
        va, sa = a
        vb, sb = b
        return jnp.where(sb, vb, jnp.logaddexp(va, vb)), sa | sb

    merged, _ = jax.lax.associative_scan(combine, (sc, ~prev_same), axis=0)
    is_last = jnp.concatenate([~prev_same[1:], jnp.array([True])])
    merged = jnp.where(is_last, merged, NEG_INF)
    top_sc, top_pos = jax.lax.top_k(merged, W)
    return top_sc, order[top_pos]


def _merge_two_sets_topk(a_sc, a_h1, a_h2, b_sc, b_h1, b_h2, W):
    """Merge set ``b`` into set ``a`` where hashes match, then top W.

    Exploits that the LIVE rows of both sets are internally
    duplicate-free (the beam invariant: each is a merged top-W), so the
    only possible live duplicates are cross-pairs — found with one
    (W, W) equality matrix instead of an argsort + segmented scan over
    the concatenation (the merge was the expansion loop's measured hot
    spot, round 4).

    DEAD rows need an explicit guard (ADVICE r4): a dead ``a`` row
    (top-W filler from an earlier round) keeps its stale hash; without
    the liveness mask a live ``b`` hypothesis matching it would be
    absorbed into the dead row (logaddexp(NEG_INF, b) == b) while the
    original ``b`` row is killed — silently duplicating/teleporting a
    hypothesis.  Dead ``b`` rows are harmless either way (NEG_INF
    contributes nothing to a live ``a``'s merge and a dead ``b`` stays
    dead), so masking the absorbing side suffices.  Returns
    ``(scores (W,), selector (W,))`` indexing into ``concat(a, b)``.
    """
    match = (a_h1[:, None] == b_h1[None, :]) & \
        (a_h2[:, None] == b_h2[None, :]) & \
        (a_sc > NEG_INF / 2)[:, None]  # (Wa, Wb)
    add = jnp.where(match, b_sc[None, :], NEG_INF)
    a_merged = jnp.logaddexp(a_sc, jax.nn.logsumexp(add, axis=1))
    b_dead = match.any(axis=0)
    b_left = jnp.where(b_dead, NEG_INF, b_sc)
    cand = jnp.concatenate([a_merged, b_left])
    return jax.lax.top_k(cand, W)


def _speculative_decode(f_bt, n_valid, carry0, expand_frame, joint_step,
                        blank_index, F):
    """Block-speculative frame loop for one utterance.

    Per ``lax.while_loop`` iteration: ONE batched joint evaluates the next
    F frames against the current beam's prediction-net outputs, a cheap
    scan consumes the leading run of *pure-blank* frames (score adds only
    — hypotheses, hashes, g and state are untouched by blank moves), and
    the full expansion body runs for the first emitting frame, if any.
    A frame is pure-blank exactly when no symbol extension can beat the
    worst blank move — the same condition under which the expansion loop's
    prune rule exits after its first round, so the result is identical to
    the frame-by-frame path (``prune_expands`` semantics; tested).
    """
    T, H_enc = f_bt.shape
    W = carry0[4].shape[0]
    # Pad so the F-frame lookahead window never clamps near the end.
    f_pad = jnp.pad(f_bt, ((0, F), (0, 0)))

    def cond(loop):
        t, _ = loop
        return t < n_valid

    def body(loop):
        t, carry = loop
        tokens, lens, h1, h2, score, g, state = carry
        f_blk = jax.lax.dynamic_slice(f_pad, (t, 0), (F, H_enc))
        # One joint for all F frames x W hypotheses.
        logits = joint_step(
            jnp.repeat(f_blk, W, axis=0),
            jnp.tile(g, (F,) + (1,) * (g.ndim - 1)))  # (F*W, V)
        V = logits.shape[-1]
        lp_blk = jax.nn.log_softmax(
            logits.astype(jnp.float32), -1).reshape(F, W, V)
        # NB: blank consumption leaves g untouched, so lp_blk[k] is ALSO
        # the emitting frame's round-0 joint — expand_frame reuses it
        # instead of re-evaluating (one joint + log_softmax saved per
        # block step).

        # Consume the leading run of pure-blank frames WITHOUT a
        # sequential scan (round-4: the F-step lax.scan added ~F tiny
        # sequential sub-steps per block, measurable at this op-latency-
        # bound scale).  The score after consuming frames < i is just
        # ``score + cumsum(valid blank log-probs)``, so every frame's
        # pure-blank test evaluates in parallel; the first failing valid
        # frame is the emitting frame k.
        frame_valid = (t + jnp.arange(F)) < n_valid
        blank_lp = lp_blk[:, :, blank_index]                   # (F, W)
        nbmax = jnp.max(
            lp_blk.at[:, :, blank_index].set(NEG_INF), axis=-1)  # (F, W)
        step_add = jnp.where(frame_valid[:, None], blank_lp, 0.0)
        csum_excl = jnp.concatenate(
            [jnp.zeros((1, W), score.dtype),
             jnp.cumsum(step_add, axis=0)])                    # (F+1, W)
        sc_i = score[None, :] + csum_excl[:F]                  # (F, W)
        fin_sc = sc_i + blank_lp
        pure = jnp.max(sc_i + nbmax, axis=1) <= jnp.min(fin_sc, axis=1)
        stop = frame_valid & (~pure)
        hit = jnp.any(stop)
        k = jnp.where(hit, jnp.argmax(stop), F).astype(jnp.int32)
        score = score + csum_excl[k]

        carry = (tokens, lens, h1, h2, score, g, state)
        f_t = jax.lax.dynamic_slice(f_pad, (t + k, 0), (1, H_enc))[0]
        lp0 = jax.lax.dynamic_index_in_dim(
            lp_blk, jnp.minimum(k, F - 1), 0, keepdims=False)  # (W, V)
        # NB: under vmap this cond becomes a select (both branches run);
        # the win is fewer sequential block steps, not branch skipping.
        carry = jax.lax.cond(
            hit, lambda c: expand_frame(f_t, c, lp0), lambda c: c, carry)
        return t + k + hit.astype(jnp.int32), carry

    _, carry = jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32),
                                               carry0))
    return carry


def rnnt_beam_decode(
    f,  # (B, T, H_enc)
    f_lens,  # (B,)
    predict_step: Callable,  # (tokens (N,), state) -> (g (N, H), state)
    joint_step: Callable,  # (f_t (N, H_enc), g (N, H)) -> (N, V) logits
    init_state_fn: Callable,  # (n: int) -> pred-state pytree with leading N
    *,
    blank_index: int,
    beam_width: int = 8,
    length_norm: bool = False,
    max_symbols_per_step: int = 30,
    max_output_len: int = 200,
    expand_topk: Optional[int] = None,
    prune_expands: bool = True,
    speculative_frames: Optional[int] = 8,
):
    """Beam-search decode a batch. Returns ``(tokens (B, U), lens (B,))``.

    ``expand_topk``: consider only each hypothesis's k most probable
    non-blank symbols when expanding (None = all V — exact).  The beam can
    only ever keep W survivors, so k >= W loses nothing in practice while
    shrinking the per-round merge/sort from W*(V+1) to W*(k+1) candidates.

    ``speculative_frames``: process frames in lookahead blocks of F.  One
    batched joint evaluates F frames x W hypotheses at once; consecutive
    **pure-blank** frames (no symbol extension can beat the worst blank
    move — exactly the prune rule's exit condition after round 0) are
    consumed with score adds only, and the full expansion body runs only
    at the first emitting frame of each block.  On speech-like posteriors
    most frames are pure blank, so this replaces ~T sequential
    joint+merge+predict rounds with ~(emissions + T/F) block steps —
    output-identical to the frame-by-frame loop under ``prune_expands``
    (tested).  Requires ``prune_expands``; None or 1 disables.
    """
    W = beam_width
    B, T, H_enc = f.shape
    U = max_output_len
    F = speculative_frames if prune_expands else None
    if F is not None and F <= 1:
        F = None

    def decode_one(f_bt, n_valid):
        # Hypothesis buffers, leading dim W.
        tokens = jnp.zeros((W, U), jnp.int32)
        lens = jnp.zeros((W,), jnp.int32)
        h1 = jnp.zeros((W,), jnp.uint32)
        h2 = jnp.zeros((W,), jnp.uint32)
        score = jnp.full((W,), NEG_INF).at[0].set(0.0)
        state = init_state_fn(W)
        g, state = predict_step(jnp.full((W,), -1, jnp.int32), state)

        def expand_frame(f_t, carry, lp0):
            """Full expansion body for one frame (blank/emit rounds).

            ``lp0`` is the frame's round-0 joint log-softmax for the
            carried beam — precomputed by the caller (the speculative
            block joint already evaluated it; the scan path computes it
            once).  Round 0 is hoisted out of the while_loop: its blank
            merge degenerates (the finished pool is empty, so "everyone
            takes blank" needs no sort/dedup/state gather) and its joint
            is ``lp0``, so the loop body — with its full joint eval and
            both merges — only runs for genuinely contested rounds.
            """
            tokens, lens, h1, h2, score, g, state = carry
            f_tw = jnp.broadcast_to(f_t[None, :], (W, H_enc))

            def emit_extensions(r, exp, logp):
                """W x K symbol extensions of ``exp``, merged to top W."""
                V = logp.shape[-1]
                if expand_topk is not None and expand_topk < V:
                    K = expand_topk
                    # Blank masked so the top-k picks non-blank symbols.
                    lp_nb = logp.at[:, blank_index].set(NEG_INF)
                    lp_top, char_top = jax.lax.top_k(lp_nb, K)  # (W, K)
                    ext_sc = exp["score"][:, None] + lp_top
                    char_mat = char_top.astype(jnp.int32)
                else:
                    K = V
                    ext_sc = exp["score"][:, None] + logp  # (W, V)
                    char_mat = jnp.broadcast_to(
                        jnp.arange(V, dtype=jnp.int32)[None, :], (W, V))
                ok = (char_mat != blank_index) & \
                    (exp["lens"][:, None] < U) & (r < max_symbols_per_step)
                ext_sc = jnp.where(ok, ext_sc, NEG_INF).reshape(-1)
                parent = jnp.repeat(jnp.arange(W), K)
                echar = char_mat.reshape(-1)
                cu = (echar + 1).astype(jnp.uint32)
                eh1 = exp["h1"][parent] * _MUL1 + cu
                eh2 = exp["h2"][parent] * _MUL2 + cu
                # No dedup needed here (unlike the finished-pool merge):
                # the expanding set holds pairwise-DISTINCT label
                # sequences (the previous round merged), and two distinct
                # sequences extended by one symbol are still distinct —
                # equal length forces equal parent and equal symbol.  So
                # the hash-sort merge is vacuous and a plain top_k
                # suffices; this removes an argsort(W*K) + segmented
                # logsumexp from every expansion round (measured round 4:
                # the rounds are merge-bound, not joint-bound).
                e_sc, e_sel = jax.lax.top_k(ext_sc, W)
                p_sel = parent[e_sel]
                c_sel = echar[e_sel]
                e_tokens = exp["tokens"][p_sel]
                e_lens = exp["lens"][p_sel]
                pos = jnp.where(e_sc > NEG_INF / 2, e_lens, U)
                e_tokens = e_tokens.at[jnp.arange(W), pos].set(
                    jnp.maximum(c_sel, 0), mode="drop")
                e_lens = e_lens + (e_sc > NEG_INF / 2).astype(jnp.int32)
                # Advance prediction net for the emitted hypotheses.
                par_state = jax.tree_util.tree_map(
                    lambda a: a[p_sel], exp["state"])
                e_g, e_state = predict_step(jnp.maximum(c_sel, 0),
                                            par_state)
                return dict(tokens=e_tokens, lens=e_lens,
                            h1=eh1[e_sel], h2=eh2[e_sel], score=e_sc,
                            g=e_g, state=e_state)

            # --- round 0 (hoisted): empty finished pool ------------------
            exp = dict(tokens=tokens, lens=lens, h1=h1, h2=h2, score=score,
                       g=g, state=state)
            fin = dict(tokens=tokens, lens=lens, h1=h1, h2=h2,
                       score=score + lp0[:, blank_index], g=g, state=state)
            exp = emit_extensions(0, exp, lp0)

            def cond(loop):
                # One extra round past the emission cap: the final round
                # only applies the blank move (emissions masked below), so
                # the reference's "forced blank after max_symbols_per_step"
                # is folded into the loop — no separate joint eval after it.
                #
                # Graves-style pruning (the big throughput lever): symbol
                # extensions only ever LOWER a score (log-probs <= 0), so
                # once the best expanding hypothesis is below the W-th
                # best finished score, no descendant can enter the beam —
                # stop expanding.  This cuts rounds/frame from
                # max_symbols_per_step+1 to ~2 on speech-like posteriors
                # (same pruning rule as the reference's Algorithm-1 loop
                # "while |B more probable than max A| < W").
                r, fin, exp = loop
                fin_min = jnp.min(fin["score"])  # W-th best of W slots
                cutoff = jnp.maximum(fin_min, NEG_INF / 2) \
                    if prune_expands else NEG_INF / 2
                return (r <= max_symbols_per_step) & \
                    jnp.any(exp["score"] > cutoff)

            def body(loop):
                r, fin, exp = loop
                logits = joint_step(f_tw, exp["g"])  # (W, V)
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)

                # --- blank: expanding hyps join the finished pool -------
                # fin and exp are each internally distinct, so the merge
                # reduces to cross-matching (W, W) hash pairs — no sort.
                blank_sc = exp["score"] + logp[:, blank_index]
                top_sc, sel = _merge_two_sets_topk(
                    fin["score"], fin["h1"], fin["h2"],
                    blank_sc, exp["h1"], exp["h2"], W)
                cand_h1 = jnp.concatenate([fin["h1"], exp["h1"]])
                cand_h2 = jnp.concatenate([fin["h2"], exp["h2"]])
                gath = lambda a, b: jnp.concatenate([a, b])[sel]
                new_fin = dict(
                    tokens=gath(fin["tokens"], exp["tokens"]),
                    lens=gath(fin["lens"], exp["lens"]),
                    h1=cand_h1[sel], h2=cand_h2[sel], score=top_sc,
                    g=gath(fin["g"], exp["g"]),
                    state=jax.tree_util.tree_map(
                        lambda a, b: jnp.concatenate([a, b])[sel],
                        fin["state"], exp["state"]))

                new_exp = emit_extensions(r, exp, logp)
                return r + 1, new_fin, new_exp

            _, fin, exp = jax.lax.while_loop(cond, body, (1, fin, exp))

            # The loop only exits once every expanding hypothesis is dead
            # (blank taken, possibly forced by the masked final round), so
            # the finished pool IS the new beam.
            return (fin["tokens"], fin["lens"], fin["h1"], fin["h2"],
                    fin["score"], fin["g"], fin["state"])

        def frame(carry, inputs):
            f_t, valid = inputs  # (H_enc,), bool
            g0 = carry[5]
            lp0 = jax.nn.log_softmax(
                joint_step(jnp.broadcast_to(f_t[None, :], (W, H_enc)),
                           g0).astype(jnp.float32), -1)
            new = expand_frame(f_t, carry, lp0)
            # Frames past the utterance end leave the beam untouched.
            out = jax.tree_util.tree_map(
                lambda n, o: jnp.where(
                    jnp.reshape(valid, (1,) * n.ndim), n, o), new, carry)
            return out, None

        carry0 = (tokens, lens, h1, h2, score, g, state)
        if F is None:
            valid = jnp.arange(T) < n_valid
            (tokens, lens, h1, h2, score, g, state), _ = jax.lax.scan(
                frame, carry0, (f_bt, valid))
        else:
            (tokens, lens, h1, h2, score, g, state) = _speculative_decode(
                f_bt, n_valid, carry0, expand_frame, joint_step,
                blank_index, F)

        final = jnp.where(length_norm,
                          score / jnp.maximum(lens, 1).astype(score.dtype),
                          score)
        best = jnp.argmax(final)
        return tokens[best], lens[best]

    return jax.vmap(decode_one)(f, f_lens)
