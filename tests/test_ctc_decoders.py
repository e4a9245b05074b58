"""CTC decoder tests with brute-force oracles.

Mirrors the reference's decoder test strategy (SURVEY.md §4): enumerate all
alignments for tiny (T, V) and compare decoder output against the exact
posterior argmax; plus edge cases (all-blank, empty, repeats).
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myrtlespeech_tpu.decoding.ctc_beam import ctc_beam_decode
from myrtlespeech_tpu.decoding.ctc_greedy import ctc_greedy_decode
from myrtlespeech_tpu.decoding.wer import cer, edit_distance, wer


def collapse(path, blank):
    out, prev = [], None
    for p in path:
        if p != prev and p != blank:
            out.append(p)
        prev = p
    return tuple(out)


def brute_force_best_labeling(logp, blank):
    """Exact posterior argmax over labelings by enumerating all alignments."""
    T, V = logp.shape
    scores = {}
    for path in itertools.product(range(V), repeat=T):
        lab = collapse(path, blank)
        p = sum(logp[t, path[t]] for t in range(T))
        scores[lab] = np.logaddexp(scores.get(lab, -np.inf), p)
    return max(scores.items(), key=lambda kv: kv[1])[0]


def test_greedy_simple():
    # argmax path: [1, 1, blank, 2, 2, blank, 1] -> [1, 2, 1]
    V = 3
    path = [1, 1, 0, 2, 2, 0, 1]
    logits = np.full((1, len(path), V), -5.0, np.float32)
    for t, p in enumerate(path):
        logits[0, t, p] = 5.0
    toks, lens = ctc_greedy_decode(jnp.asarray(logits),
                                   jnp.asarray([len(path)]))
    assert int(lens[0]) == 3
    np.testing.assert_array_equal(np.asarray(toks)[0, :3], [1, 2, 1])


def test_greedy_respects_lengths():
    V = 3
    logits = np.full((2, 4, V), -5.0, np.float32)
    logits[:, :, 1] = 5.0  # all frames argmax to symbol 1
    toks, lens = ctc_greedy_decode(jnp.asarray(logits), jnp.asarray([4, 2]))
    # repeats collapse -> single symbol regardless of length
    np.testing.assert_array_equal(np.asarray(lens), [1, 1])


def test_greedy_all_blank():
    logits = np.full((1, 5, 3), -5.0, np.float32)
    logits[0, :, 0] = 5.0
    toks, lens = ctc_greedy_decode(jnp.asarray(logits), jnp.asarray([5]))
    assert int(lens[0]) == 0


@pytest.mark.parametrize("seed", range(5))
def test_beam_matches_brute_force(seed):
    """Wide beam on tiny problems must find the exact MAP labeling."""
    rng = np.random.default_rng(seed)
    T, V = 4, 3
    logits = rng.standard_normal((1, T, V)).astype(np.float32) * 2.0
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[0]), axis=-1))
    expected = brute_force_best_labeling(logp, blank=0)
    toks, lens = ctc_beam_decode(jnp.asarray(logits), jnp.asarray([T]),
                                 beam_width=32, prune_threshold=0.0)
    got = tuple(np.asarray(toks)[0, :int(lens[0])])
    assert got == expected, f"beam {got} != brute force {expected}"


def test_beam_beats_or_ties_greedy():
    """Beam search posterior should never be worse than greedy's labeling."""
    rng = np.random.default_rng(42)
    T, V = 6, 4
    logits = rng.standard_normal((4, T, V)).astype(np.float32)
    lens = np.array([6, 5, 4, 6], np.int32)
    b_toks, b_lens = ctc_beam_decode(jnp.asarray(logits), jnp.asarray(lens),
                                     beam_width=16, prune_threshold=0.0)
    for b in range(4):
        logp = np.asarray(jax.nn.log_softmax(
            jnp.asarray(logits[b, :lens[b]]), axis=-1))
        expected = brute_force_best_labeling(logp, blank=0)
        got = tuple(np.asarray(b_toks)[b, :int(b_lens[b])])
        assert got == expected


def test_beam_prune_still_works():
    rng = np.random.default_rng(7)
    logits = rng.standard_normal((1, 5, 4)).astype(np.float32) * 3.0
    toks, lens = ctc_beam_decode(jnp.asarray(logits), jnp.asarray([5]),
                                 beam_width=8, prune_threshold=1e-3)
    assert int(lens[0]) <= 5


def test_edit_distance_and_rates():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([], [1, 2]) == 2
    assert wer(["a b c"], ["a b c"]) == 0.0
    assert wer(["a b c d"], ["a b x d"]) == 0.25
    assert cer(["abc"], ["axc"]) == pytest.approx(1 / 3)


def test_beam_lm_bias_changes_output():
    """A strong char-bigram LM must steer the beam toward LM-likely strings."""
    rng = np.random.default_rng(11)
    T, V = 6, 4  # blank=0, chars 1..3
    logits = rng.standard_normal((1, T, V)).astype(np.float32) * 0.1
    # LM that loves '1 -> 2' transitions and start '1'; hates everything else
    lm = np.full((V + 1, V), -10.0, np.float32)
    lm[V, 1] = 0.0   # start with 1
    lm[1, 2] = 0.0   # 1 -> 2
    lm[2, 1] = 0.0   # 2 -> 1
    toks, lens = ctc_beam_decode(
        jnp.asarray(logits), jnp.asarray([T]), beam_width=16,
        prune_threshold=0.0, lm_alpha=2.0, lm_bigram=lm)
    got = list(np.asarray(toks)[0, :int(lens[0])])
    assert all(g in (1, 2) for g in got)
    for a, b in zip(got, got[1:]):
        assert (a, b) in [(1, 2), (2, 1)]


def test_beam_word_beta_bonus():
    """Positive word-count beta with separator encourages separators."""
    rng = np.random.default_rng(12)
    T, V = 8, 4  # say index 3 = separator
    logits = rng.standard_normal((1, T, V)).astype(np.float32) * 0.1
    t_no, l_no = ctc_beam_decode(jnp.asarray(logits), jnp.asarray([T]),
                                 beam_width=8, prune_threshold=0.0)
    t_b, l_b = ctc_beam_decode(jnp.asarray(logits), jnp.asarray([T]),
                               beam_width=8, prune_threshold=0.0,
                               word_count_beta=3.0, separator_index=3)
    seps_no = (np.asarray(t_no)[0, :int(l_no[0])] == 3).sum()
    seps_b = (np.asarray(t_b)[0, :int(l_b[0])] == 3).sum()
    assert seps_b >= seps_no


def test_beam_expand_topk_lossless_when_k_large():
    """expand_topk >= V-1 must reproduce the full expansion exactly."""
    rng = np.random.default_rng(21)
    B, T, V = 3, 9, 6
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    lens = jnp.asarray([9, 6, 1])
    full = ctc_beam_decode(jnp.asarray(logits), lens, beam_width=8,
                           prune_threshold=0.0)
    k = ctc_beam_decode(jnp.asarray(logits), lens, beam_width=8,
                        prune_threshold=0.0, expand_topk=V - 1)
    np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(k[1]))
    np.testing.assert_array_equal(np.asarray(full[0]), np.asarray(k[0]))


def test_beam_expand_topk_small_still_finds_peaked_path():
    """With a peaked distribution, k=2 matches the full beam."""
    rng = np.random.default_rng(22)
    B, T, V = 2, 8, 10
    logits = rng.standard_normal((B, T, V)).astype(np.float32) * 0.01
    # plant a strong path on symbols 3 and 7
    logits[:, ::2, 3] += 6.0
    logits[:, 1::2, 7] += 6.0
    lens = jnp.asarray([T, T])
    full = ctc_beam_decode(jnp.asarray(logits), lens, beam_width=4,
                           prune_threshold=0.0)
    k = ctc_beam_decode(jnp.asarray(logits), lens, beam_width=4,
                        prune_threshold=0.0, expand_topk=2)
    np.testing.assert_array_equal(np.asarray(full[0]), np.asarray(k[0]))
    np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(k[1]))


def test_beam_word_lm_changes_winner():
    """A word LM flips an acoustically ambiguous decode to the likely word.

    V=4: blank=0, separator=1, 'a'=2, 'b'=3.  Acoustics slightly prefer
    'b' both before and after a strong separator; the word LM knows only
    the word 'a'.  With alpha on, both the separator-completed first word
    AND the final unterminated word must flip to 'a'.
    """
    from myrtlespeech_tpu.decoding.lm import WordLM, word_hashes

    T, V = 3, 4
    logits = np.full((1, T, V), -5.0, np.float32)
    logits[0, 0, 2], logits[0, 0, 3] = 4.0, 4.2   # 'b' slightly ahead
    logits[0, 1, 1] = 6.0                         # separator
    logits[0, 2, 2], logits[0, 2, 3] = 4.0, 4.2   # 'b' slightly ahead
    h1a, h2a = word_hashes([2])  # the word "a"
    key1 = np.zeros((8,), np.uint32)
    key2 = np.zeros((8,), np.uint32)
    logp = np.zeros((8,), np.float32)
    step = np.uint32(h2a | 1)
    idx = int((h1a + np.uint32(0) * step) & np.uint32(7))
    key1[idx], key2[idx], logp[idx] = h1a, h2a, 0.0  # p("a") = 1
    wlm = WordLM(key1=key1, key2=key2, logp=logp, oov_log_prob=-10.0)

    t_off, l_off = ctc_beam_decode(
        jnp.asarray(logits), jnp.asarray([T]), beam_width=8,
        prune_threshold=0.0, separator_index=1)
    t_on, l_on = ctc_beam_decode(
        jnp.asarray(logits), jnp.asarray([T]), beam_width=8,
        prune_threshold=0.0, separator_index=1,
        word_lm_alpha=2.0, word_lm=wlm)
    off = list(np.asarray(t_off)[0, :int(l_off[0])])
    on = list(np.asarray(t_on)[0, :int(l_on[0])])
    assert off == [3, 1, 3]  # acoustics alone: "b b"
    assert on == [2, 1, 2]   # word LM: "a a"


def test_beam_word_lm_flat_table_is_noop():
    """An all-OOV table with oov_log_prob=0 must not change any decode
    (every completed word scores alpha * 0) — pins the hash-carry and
    scoring plumbing as pure additions."""
    from myrtlespeech_tpu.decoding.lm import WordLM

    rng = np.random.default_rng(21)
    B, T, V = 3, 9, 5
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    lens = jnp.asarray([T, T - 2, 4])
    flat = WordLM(key1=np.zeros((8,), np.uint32),
                  key2=np.zeros((8,), np.uint32),
                  logp=np.zeros((8,), np.float32), oov_log_prob=0.0)
    t0, l0 = ctc_beam_decode(jnp.asarray(logits), lens, beam_width=8,
                             prune_threshold=0.0, separator_index=1)
    t1, l1 = ctc_beam_decode(jnp.asarray(logits), lens, beam_width=8,
                             prune_threshold=0.0, separator_index=1,
                             word_lm_alpha=3.0, word_lm=flat)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    for i in range(B):
        np.testing.assert_array_equal(
            np.asarray(t0)[i, :int(l0[i])], np.asarray(t1)[i, :int(l1[i])])


def test_beam_word_bigram_lm_context_flips_decode():
    """A word-BIGRAM LM flips an ambiguous word based on the PREVIOUS word.

    V=4: blank=0, separator=1, 'a'=2, 'b'=3.  First word is clearly "a";
    the final (unterminated) word is acoustically ambiguous with 'a'
    slightly ahead.  Corpus: "a b" x2, "a a" x1 -> unigram p(a) == p(b)
    is NOT true (a:3, b:2), so the unigram model agrees with the
    acoustics ("a a"); the bigram model knows p(b | a) = 2/3 > p(a | a)
    = 1/3 and flips the second word to 'b'.
    """
    from myrtlespeech_tpu.data.alphabet import Alphabet
    from myrtlespeech_tpu.decoding.lm import estimate_word_lm

    alphabet = Alphabet("_ ab")
    corpus = ["a b", "a b", "a a"]
    uni = estimate_word_lm(corpus, alphabet, order=1)
    bi = estimate_word_lm(corpus, alphabet, order=2)

    T, V = 3, 4
    logits = np.full((1, T, V), -5.0, np.float32)
    logits[0, 0, 2] = 5.0                          # "a"
    logits[0, 1, 1] = 6.0                          # separator
    logits[0, 2, 2], logits[0, 2, 3] = 4.2, 4.0    # 'a' slightly ahead

    def run(wlm):
        kw = {}
        if wlm is not None:
            kw = dict(word_lm_alpha=2.0, word_lm=wlm)
        toks, lens = ctc_beam_decode(
            jnp.asarray(logits), jnp.asarray([T]), beam_width=8,
            prune_threshold=0.0, separator_index=1, **kw)
        return list(np.asarray(toks)[0, :int(lens[0])])

    assert run(None) == [2, 1, 2]   # acoustics: "a a"
    assert run(uni) == [2, 1, 2]    # unigram prefers "a" too
    assert run(bi) == [2, 1, 3]     # bigram context: "a b"
