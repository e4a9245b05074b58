"""Batched on-device CTC prefix beam search.

Reference: ``src/myrtlespeech/post_process/ctc_beam_decoder.py ::
CTCBeamDecoder`` — a pure-Python prefix beam search (Hannun 2014 / Graves
2012) with per-prefix ``(p_blank, p_non_blank)``, beam width, probability
pruning and optional word-count weighting.  The reference walks Python dicts
per utterance; this implementation keeps the entire beam in fixed-size
device arrays and runs the whole batch in one ``lax.scan`` over time:

- Each beam entry is ``(prefix buffer (U,), length, p_b, p_nb)`` plus a
  rolling **pair of 32-bit hashes** identifying the prefix.
- Per frame, the ``W`` stay-candidates and ``W*V`` extension candidates are
  formed dense, duplicates merged by a **pairwise stay-vs-extension hash
  match** (each sub-set is internally duplicate-free, so no sort is
  needed — see the in-step comment), and the top ``W`` survivors selected
  with ``top_k`` — the device-friendly replacement for the reference's
  dict-keyed merging.
- ``prune_threshold`` drops low-probability symbols before extension,
  mirroring the reference's pruning knob.

Everything is static-shaped and vmapped over the batch, so the decoder runs
inside ``jit`` (and under ``pjit``/shard_map for sharded eval).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from myrtlespeech_tpu.decoding.lm import (WORD_LM_PROBES, WORD_SEED1,
                                          WORD_SEED2, WordLM, bigram_keys)

NEG_INF = -1e30
_MUL1 = jnp.uint32(0x01000193)  # FNV-ish multipliers for the rolling hashes
_MUL2 = jnp.uint32(0x00100001)


def _word_lm_lookup(key1, key2, logp, oov, h1, h2):
    """Probe the open-addressed word table for hash pairs ``(h1, h2)``.

    Double hashing with a static probe count (decoding/lm.py builds the
    table so every stored word is reachable within WORD_LM_PROBES).
    Vectorised over any h1/h2 shape; misses score ``oov``.
    Returns ``(scores, found)``.
    """
    S = key1.shape[0]
    # Mirror the build-time perturbation of the (0, 0) hash pair (the
    # empty-slot marker).
    zero = (h1 == 0) & (h2 == 0)
    h1 = jnp.where(zero, jnp.uint32(1), h1)
    step = h2 | jnp.uint32(1)
    res = jnp.full(h1.shape, oov, jnp.float32)
    found = jnp.zeros(h1.shape, bool)
    for j in range(WORD_LM_PROBES):
        idx = ((h1 + jnp.uint32(j) * step)
               & jnp.uint32(S - 1)).astype(jnp.int32)
        hit = (key1[idx] == h1) & (key2[idx] == h2) & ~found
        res = jnp.where(hit, logp[idx], res)
        found = found | hit
    return res, found


def _word_lm_score(wl, wp1, wp2, wh1, wh2):
    """Score the completed word (hashes ``wh``) in context ``wp``.

    Unigram table only: ``log p(word)``.  With a bigram table:
    ``log p(word | prev)`` on a context hit, else stupid backoff
    ``backoff_log + log p(word)`` (decoding/lm.py::WordLM semantics).
    """
    uni, _ = _word_lm_lookup(wl["key1"], wl["key2"], wl["logp"],
                             wl["oov"], wh1, wh2)
    if wl["bkey1"] is None:
        return uni
    bk1, bk2 = bigram_keys(wp1, wp2, wh1, wh2)
    big, hit = _word_lm_lookup(wl["bkey1"], wl["bkey2"], wl["blogp"],
                               0.0, bk1, bk2)
    return jnp.where(hit, big, wl["backoff"] + uni)


def _beam_step(carry, logp_t, *, W: int, V: int, U: int, blank: int,
               prune_log: float, word_beta: Optional[float],
               separator: Optional[int], lm_alpha: Optional[float] = None,
               lm_bigram=None, expand_topk: Optional[int] = None,
               word_lm_alpha: Optional[float] = None, word_lm=None):
    """One frame of prefix beam search for a single utterance."""
    (prefixes, lengths, words, h1, h2, wh1, wh2, wp1, wp2, p_b, p_nb,
     valid_t) = carry
    lp, is_valid = logp_t  # (V,), scalar bool

    total = jnp.logaddexp(p_b, p_nb)  # (W,)
    last = jnp.where(
        lengths > 0,
        jnp.take_along_axis(prefixes,
                            jnp.maximum(lengths - 1, 0)[:, None],
                            axis=1)[:, 0],
        -1)  # (W,)

    # ---- candidates -----------------------------------------------------
    # Stay candidates (one per beam): blank keeps prefix; repeated last
    # symbol also keeps prefix (collapses).
    stay_pb = total + lp[blank]
    stay_pnb = jnp.where(last >= 0, p_nb + lp[jnp.maximum(last, 0)], NEG_INF)

    # Extension candidates (W x K): prefix + c for c != blank.  With
    # ``expand_topk`` only the frame's K best non-blank symbols are
    # considered (K >= W is lossless in practice — the beam keeps at most
    # W survivors), shrinking the sort/merge below by ~V/K.
    if expand_topk is not None and expand_topk < V:
        K = expand_topk
        lp_top, sym = jax.lax.top_k(lp.at[blank].set(NEG_INF), K)  # (K,)
    else:
        K = V
        lp_top, sym = lp, jnp.arange(V)
    ext_base = jnp.where(last[:, None] == sym[None, :],
                         p_b[:, None], total[:, None])  # double-letter rule
    ext_p = ext_base + lp_top[None, :]  # (W, K)
    char_ok = (sym != blank)[None, :]
    pruned = lp_top[None, :] >= prune_log
    ext_p = jnp.where(char_ok & pruned, ext_p, NEG_INF)
    if separator is not None and (word_beta is not None
                                  or word_lm is not None):
        # A separator extension completes the beam's current word.
        completes = (sym[None, :] == separator) & \
            (last[:, None] != separator) & (lengths[:, None] > 0)
        if word_beta is not None:
            # Word-count bonus (the reference's beta term).
            ext_p = ext_p + jnp.where(completes, word_beta, 0.0)
        if word_lm is not None and word_lm_alpha is not None:
            # Word-level LM weighting (the reference's alpha term at word
            # granularity): score the COMPLETED word — identified by the
            # beam's rolling word-hash pair, in the context of the beam's
            # previously completed word (bigram tables) — via the
            # on-device hash table.  One probe set per beam, broadcast
            # over symbols.
            wlp = _word_lm_score(word_lm, wp1, wp2, wh1, wh2)  # (W,)
            ext_p = ext_p + jnp.where(completes,
                                      word_lm_alpha * wlp[:, None], 0.0)
    if lm_alpha is not None and lm_bigram is not None:
        # Character-bigram LM weighting (the reference's alpha term):
        # score += alpha * log p_lm(c | last); row `V` of the matrix is
        # the sentence-start distribution (empty prefix).
        lm_row = lm_bigram[jnp.where(last >= 0, last, V)]  # (W, V)
        ext_p = ext_p + lm_alpha * jnp.take(lm_row, sym, axis=1)

    # Flatten: N = W stay + W*K extensions.
    N = W + W * K
    parent = jnp.concatenate(
        [jnp.arange(W), jnp.repeat(jnp.arange(W), K)])  # (N,)
    ext_char = jnp.concatenate(
        [jnp.full((W,), -1, jnp.int32),
         jnp.tile(sym.astype(jnp.int32), W)])
    cand_pb = jnp.concatenate([stay_pb, jnp.full((W * K,), NEG_INF)])
    cand_pnb = jnp.concatenate([stay_pnb, ext_p.reshape(-1)])

    # Rolling hashes for candidate prefixes.
    ph1, ph2 = h1[parent], h2[parent]
    cu = (ext_char + 1).astype(jnp.uint32)
    nh1 = jnp.where(ext_char >= 0, ph1 * _MUL1 + cu, ph1)
    nh2 = jnp.where(ext_char >= 0, ph2 * _MUL2 + cu, ph2)

    # Rolling hashes for the CURRENT word (reset on separator, kept on
    # stay): how the word-LM identifies the completed word.  Uses the
    # same multipliers as the prefix hashes but lm.py's nonzero seeds so
    # "empty word" is distinguishable.
    pwh1, pwh2 = wh1[parent], wh2[parent]
    pwp1, pwp2 = wp1[parent], wp2[parent]
    if separator is not None:
        is_sep = ext_char == separator
        nwh1 = jnp.where(
            ext_char < 0, pwh1,
            jnp.where(is_sep, WORD_SEED1, pwh1 * _MUL1 + cu))
        nwh2 = jnp.where(
            ext_char < 0, pwh2,
            jnp.where(is_sep, WORD_SEED2, pwh2 * _MUL2 + cu))
        # Previous-word context (bigram word LM): a separator that
        # completes a non-empty word promotes the current word hash to
        # the context slot; empty "words" (double separators, leading
        # separator) leave the context unchanged.
        cand_completes = is_sep & (last[parent] != separator) & \
            (lengths[parent] > 0)
        nwp1 = jnp.where(cand_completes, pwh1, pwp1)
        nwp2 = jnp.where(cand_completes, pwh2, pwp2)
    else:
        nwh1 = jnp.where(ext_char < 0, pwh1, pwh1 * _MUL1 + cu)
        nwh2 = jnp.where(ext_char < 0, pwh2, pwh2 * _MUL2 + cu)
        nwp1, nwp2 = pwp1, pwp2

    # Kill candidates from dead beams / overlong prefixes.
    alive = total[parent] > NEG_INF / 2
    too_long = (ext_char >= 0) & (lengths[parent] >= U)
    dead = ~alive | too_long
    cand_pb = jnp.where(dead, NEG_INF, cand_pb)
    cand_pnb = jnp.where(dead, NEG_INF, cand_pnb)

    # ---- merge duplicates (pairwise stay <-> extension match) -----------
    # Among LIVE candidates both sub-sets are internally duplicate-free:
    # the live stays inherit the (merged) beam's distinctness, and two
    # extensions of distinct equal-length parents are distinct
    # (p1 + c1 == p2 + c2 forces p1 == p2, c1 == c2).  The ONLY possible
    # live duplicates are cross-pairs stay(p) == ext(q, c) with p = q + c
    # — found with one (W, W*K) hash equality matrix; each live stay
    # matches at most one live extension.  This replaces the former
    # argsort(W + W*K) + two segmented logsumexp scans per frame
    # (measured: the sort dominated the device time of the scan body).
    #
    # DEAD slots need explicit masking (ADVICE r4): a dead stay (killed
    # beam filler) or a previously-killed duplicate still carries a stale
    # hash; without the liveness guard a live extension matching a dead
    # stay would be logaddexp'd into BOTH rows, resurrecting a phantom
    # duplicate beam and double-counting its mass.  Dead extensions are
    # already NEG_INF (absorbing into a live stay adds nothing), but a
    # dead extension must not KILL a live stay's merge either — the
    # score side handles that (NEG_INF contributes nothing); only the
    # stay side's liveness changes which matches are honoured.
    sh1, sh2 = nh1[:W], nh2[:W]
    eh1, eh2 = nh1[W:], nh2[W:]
    e_pnb = cand_pnb[W:]  # extension p_b is NEG_INF by construction
    alive_stay = jnp.logaddexp(cand_pb[:W], cand_pnb[:W]) > NEG_INF / 2
    match = (sh1[:, None] == eh1[None, :]) & \
        (sh2[:, None] == eh2[None, :]) & \
        alive_stay[:, None]  # (W, W*K)
    ext_into_stay = jax.nn.logsumexp(
        jnp.where(match, e_pnb[None, :], NEG_INF), axis=1)
    mpb = jnp.concatenate(
        [cand_pb[:W], jnp.full((W * K,), NEG_INF)])
    mpnb = jnp.concatenate(
        [jnp.logaddexp(cand_pnb[:W], ext_into_stay),
         jnp.where(match.any(axis=0), NEG_INF, e_pnb)])
    score = jnp.logaddexp(mpb, mpnb)

    # ---- select top W ----------------------------------------------------
    top_score, top_idx = jax.lax.top_k(score, W)
    new_pb = mpb[top_idx]
    new_pnb = mpnb[top_idx]
    src = parent[top_idx]
    ch = ext_char[top_idx]
    new_h1, new_h2 = nh1[top_idx], nh2[top_idx]
    new_wh1, new_wh2 = nwh1[top_idx], nwh2[top_idx]
    new_wp1, new_wp2 = nwp1[top_idx], nwp2[top_idx]

    new_prefixes = prefixes[src]
    new_lengths = lengths[src]
    new_words = words[src]
    ext = ch >= 0
    pos = jnp.where(ext, new_lengths, U)  # drop for stays
    new_prefixes = new_prefixes.at[jnp.arange(W), pos].set(
        jnp.maximum(ch, 0), mode="drop")
    new_lengths = new_lengths + ext.astype(jnp.int32)
    if separator is not None:
        new_words = new_words + (ext & (ch == separator)).astype(jnp.int32)

    # Frames past the utterance end: keep previous beam unchanged.
    keep = lambda n, o: jnp.where(is_valid, n, o)
    carry = (keep(new_prefixes, prefixes), keep(new_lengths, lengths),
             keep(new_words, words), keep(new_h1, h1), keep(new_h2, h2),
             keep(new_wh1, wh1), keep(new_wh2, wh2),
             keep(new_wp1, wp1), keep(new_wp2, wp2),
             keep(new_pb, p_b), keep(new_pnb, p_nb), valid_t)
    return carry, None


def ctc_beam_decode(logits, logit_lens, *, blank_index: int = 0,
                    beam_width: int = 16, prune_threshold: float = 1e-3,
                    word_count_beta: Optional[float] = None,
                    separator_index: Optional[int] = None,
                    lm_alpha: Optional[float] = None,
                    lm_bigram=None,
                    word_lm_alpha: Optional[float] = None,
                    word_lm: Optional[WordLM] = None,
                    max_output_len: Optional[int] = None,
                    expand_topk: Optional[int] = None):
    """Prefix-beam-search decode a batch of ``(B, T, V)`` logits.

    ``lm_bigram``: optional ``(V+1, V)`` char-bigram log-prob matrix (row
    ``V`` = sentence start) scored with weight ``lm_alpha`` — the
    device-array form of the reference's LM alpha option.

    ``word_lm``: optional :class:`~myrtlespeech_tpu.decoding.lm.WordLM`
    hash table; each word completed by a ``separator_index`` emission is
    scored ``word_lm_alpha * log p_lm(word)`` inside the scan (plus the
    final unterminated word at utterance end) — the reference's
    word-level LM alpha semantics, on device.  Requires
    ``separator_index``.

    Returns ``(tokens (B, U) int32, token_lens (B,) int32)`` for the best
    prefix per utterance, where ``U = max_output_len or T``.
    """
    B, T, V = logits.shape
    U = max_output_len or T
    W = beam_width
    if word_lm is not None and separator_index is None:
        raise ValueError("word_lm scoring requires separator_index")
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    prune_log = jnp.log(jnp.asarray(prune_threshold, jnp.float32)) \
        if prune_threshold > 0 else jnp.asarray(NEG_INF)
    wl = None
    if word_lm is not None:
        wl = dict(key1=jnp.asarray(word_lm.key1),
                  key2=jnp.asarray(word_lm.key2),
                  logp=jnp.asarray(word_lm.logp),
                  oov=jnp.float32(word_lm.oov_log_prob),
                  bkey1=None, bkey2=None, blogp=None, backoff=None)
        if word_lm.bkey1 is not None:
            wl.update(bkey1=jnp.asarray(word_lm.bkey1),
                      bkey2=jnp.asarray(word_lm.bkey2),
                      blogp=jnp.asarray(word_lm.blogp),
                      backoff=jnp.float32(word_lm.backoff_log))

    step = functools.partial(
        _beam_step, W=W, V=V, U=U, blank=blank_index,
        prune_log=prune_log, word_beta=word_count_beta,
        separator=separator_index, lm_alpha=lm_alpha,
        lm_bigram=None if lm_bigram is None
        else jnp.asarray(lm_bigram, jnp.float32),
        expand_topk=expand_topk,
        word_lm_alpha=word_lm_alpha, word_lm=wl)

    def decode_one(lp_bt, n_valid):
        # Initial beam: single empty prefix (p_b = 0), rest dead.
        prefixes = jnp.zeros((W, U), jnp.int32)
        lengths = jnp.zeros((W,), jnp.int32)
        words = jnp.zeros((W,), jnp.int32)
        h1 = jnp.zeros((W,), jnp.uint32)
        h2 = jnp.zeros((W,), jnp.uint32)
        wh1 = jnp.full((W,), WORD_SEED1, jnp.uint32)
        wh2 = jnp.full((W,), WORD_SEED2, jnp.uint32)
        # Previous-completed-word context starts at the seed pair — the
        # sentence-start context the bigram tables were estimated with.
        wp1 = jnp.full((W,), WORD_SEED1, jnp.uint32)
        wp2 = jnp.full((W,), WORD_SEED2, jnp.uint32)
        p_b = jnp.full((W,), NEG_INF).at[0].set(0.0)
        p_nb = jnp.full((W,), NEG_INF)
        valid = jnp.arange(T) < n_valid
        (prefixes, lengths, words, h1, h2, wh1, wh2, wp1, wp2, p_b, p_nb,
         _), _ = jax.lax.scan(
            step, (prefixes, lengths, words, h1, h2, wh1, wh2, wp1, wp2,
                   p_b, p_nb, None),
            (lp_bt, valid))
        score = jnp.logaddexp(p_b, p_nb)
        if wl is not None and word_lm_alpha is not None:
            # Score the final unterminated word (no trailing separator):
            # beams whose word-hash pair is not the empty seeds carry one.
            has_word = (wh1 != WORD_SEED1) | (wh2 != WORD_SEED2)
            wlp = _word_lm_score(wl, wp1, wp2, wh1, wh2)
            score = score + jnp.where(has_word, word_lm_alpha * wlp, 0.0)
        best = jnp.argmax(score)
        return prefixes[best], lengths[best]

    return jax.vmap(decode_one)(logp, logit_lens)
