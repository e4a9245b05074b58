"""Hypothesis property tests for decoders and Pallas lattice kernels.

VERDICT r3 #8: the enumeration oracles (tests/test_ctc_decoders.py,
tests/test_rnnt_decoders.py) and the lax loss oracles run under ``@given``
with shrinking, instead of fixed seeds only.  Mirrors the reference's
property-test style (SURVEY.md §4) across the decode/loss surface:

- CTC prefix beam == brute-force MAP labeling for arbitrary tiny
  problems (wide beam, no pruning).
- CTC beam invariances: ``expand_topk >= W`` lossless; flat word LM is a
  no-op — for arbitrary (T, V, W, prune, topk, LM on/off).
- RNN-T beam == exact MAP over a tiny transducer for arbitrary weights.
- RNN-T beam output invariance: speculative frame-blocking on/off for
  arbitrary (shape, W, topk, max_symbols, blank bias).
- Pallas CTC / RNN-T lattice kernels == lax oracles for arbitrary
  (B, T, U, V) in interpret mode.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from jax.experimental.pallas import tpu as pltpu

from myrtlespeech_tpu.decoding.ctc_beam import ctc_beam_decode
from myrtlespeech_tpu.decoding.rnnt_beam import rnnt_beam_decode

# Each example jit-compiles fresh shapes; keep example counts low and
# disable deadlines (same policy as test_config_properties.py).
_SETTINGS = dict(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large])


def _collapse(path, blank):
    out, prev = [], None
    for p in path:
        if p != prev and p != blank:
            out.append(p)
        prev = p
    return tuple(out)


def _ctc_brute_force(logp, blank=0):
    T, V = logp.shape
    scores = {}
    for path in itertools.product(range(V), repeat=T):
        lab = _collapse(path, blank)
        p = sum(logp[t, path[t]] for t in range(T))
        scores[lab] = np.logaddexp(scores.get(lab, -np.inf), p)
    return max(scores.items(), key=lambda kv: kv[1])[0]


# ---------------------------------------------------------------------------
# CTC prefix beam
# ---------------------------------------------------------------------------


@given(T=st.integers(2, 4), V=st.integers(2, 4),
       seed=st.integers(0, 2**31 - 1))
@settings(**_SETTINGS)
def test_ctc_beam_matches_brute_force(T, V, seed):
    """Wide unpruned beam finds the exact MAP labeling for ANY (T, V)."""
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((1, T, V)).astype(np.float32) * 2.0
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[0]), axis=-1))
    expected = _ctc_brute_force(logp, blank=0)
    toks, lens = ctc_beam_decode(jnp.asarray(logits), jnp.asarray([T]),
                                 beam_width=32, prune_threshold=0.0)
    got = tuple(np.asarray(toks)[0, :int(lens[0])])
    assert got == expected


@given(T=st.integers(3, 8), V=st.integers(3, 6), W=st.integers(2, 12),
       prune=st.sampled_from([0.0, 1e-4]),
       lm_on=st.booleans(), seed=st.integers(0, 2**31 - 1))
@settings(**_SETTINGS)
def test_ctc_beam_topk_lossless_and_flat_word_lm_noop(T, V, W, prune,
                                                      lm_on, seed):
    """For ANY config: expand_topk >= W equals the exact (topk=None)
    decode, and an all-OOV word LM with oov=0 never changes the output."""
    from myrtlespeech_tpu.decoding.lm import WordLM

    rng = np.random.default_rng(seed)
    B = 2
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    lens = jnp.asarray([T, max(T - 2, 1)])
    kw = dict(beam_width=W, prune_threshold=prune, separator_index=1)
    if lm_on:
        flat = WordLM(key1=np.zeros((8,), np.uint32),
                      key2=np.zeros((8,), np.uint32),
                      logp=np.zeros((8,), np.float32), oov_log_prob=0.0)
        kw_lm = dict(kw, word_lm_alpha=2.5, word_lm=flat)
    else:
        kw_lm = kw
    t0, l0 = ctc_beam_decode(logits, lens, expand_topk=None, **kw)
    t1, l1 = ctc_beam_decode(logits, lens,
                             expand_topk=min(max(W, 2), V), **kw_lm)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    for i in range(B):
        np.testing.assert_array_equal(
            np.asarray(t0)[i, :int(l0[i])], np.asarray(t1)[i, :int(l1[i])])


# ---------------------------------------------------------------------------
# RNN-T beam
# ---------------------------------------------------------------------------


@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_rnnt_beam_finds_map_sequence(seed):
    """Wide beam == exact MAP over a tiny transducer for ANY init seed."""
    from myrtlespeech_tpu.models.rnn_t import RNNT
    from tests.test_rnnt_decoders import (_exact_scores, _helpers,
                                          _tiny_model)

    V = 3  # keeps the exact enumeration cheap under @given
    m, vars_, cfg, x, lens = _tiny_model(V=V, seed=seed)
    T = int(lens[0])
    scores = _exact_scores(m, vars_, x, lens, V, max_len=T)
    best = max(scores, key=scores.get)

    f, f_lens = m.apply(vars_, x, lens, method=RNNT.encode)
    predict_step, joint_step, init_state_fn = _helpers(m, vars_, cfg)
    toks, tlens = rnnt_beam_decode(
        f, f_lens, predict_step, joint_step, init_state_fn,
        blank_index=0, beam_width=16, max_symbols_per_step=T,
        max_output_len=T)
    got = tuple(np.asarray(toks)[0, :int(tlens[0])])
    assert got == best, f"beam {got} != map {best}"


@given(T=st.integers(3, 10), W=st.integers(2, 8),
       topk=st.sampled_from([None, 8, 16]),
       max_symbols=st.integers(1, 4),
       spec_frames=st.sampled_from([2, 4, 8]),
       blank_bias=st.sampled_from([0.0, 2.0, 4.0]),
       seed=st.integers(0, 2**31 - 1))
@settings(**_SETTINGS)
def test_rnnt_beam_speculative_invariance(T, W, topk, max_symbols,
                                          spec_frames, blank_bias, seed):
    """Speculative frame-blocking never changes the decode, for ANY
    (T, W, topk, max_symbols, F, posterior peakiness)."""
    from myrtlespeech_tpu.ops.rnn import LSTMState

    V, H, He = 5, 4, 6
    rng = np.random.default_rng(seed)
    Wj = jnp.asarray(rng.standard_normal((He + H, V)).astype(np.float32))
    bj = jnp.zeros((V,)).at[0].set(blank_bias)
    emb = jnp.asarray(rng.standard_normal((V + 1, H)).astype(np.float32))

    def predict_step(tok, state):
        g = emb[tok + 1] + state[0][0].h
        return g, [[LSTMState(h=g * 0.5, c=state[0][0].c)]]

    def joint_step(f_t, g):
        return jnp.concatenate([f_t, g], -1) @ Wj + bj

    def init_state_fn(n):
        return [[LSTMState(h=jnp.zeros((n, H)), c=jnp.zeros((n, H)))]]

    B = 2
    f = jnp.asarray(rng.standard_normal((B, T, He)).astype(np.float32))
    f_lens = jnp.asarray([T, max(T - 2, 1)])
    kw = dict(blank_index=0, beam_width=W, expand_topk=topk,
              max_symbols_per_step=max_symbols, max_output_len=2 * T)
    t0, l0 = rnnt_beam_decode(f, f_lens, predict_step, joint_step,
                              init_state_fn, speculative_frames=None, **kw)
    t1, l1 = rnnt_beam_decode(f, f_lens, predict_step, joint_step,
                              init_state_fn,
                              speculative_frames=spec_frames, **kw)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    for i in range(B):
        np.testing.assert_array_equal(
            np.asarray(t0)[i, :int(l0[i])], np.asarray(t1)[i, :int(l1[i])])


# ---------------------------------------------------------------------------
# Pallas lattice kernels vs lax oracles (interpret mode)
# ---------------------------------------------------------------------------


@given(B=st.integers(1, 4), T=st.integers(3, 8), U=st.integers(1, 4),
       V=st.integers(3, 6), seed=st.integers(0, 2**31 - 1))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_pallas_ctc_matches_lax(B, T, U, V, seed):
    from myrtlespeech_tpu.ops.ctc import ctc_loss
    from myrtlespeech_tpu.ops.pallas.ctc_kernel import ctc_loss_pallas

    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    # CTC needs T >= 2 * label_len (worst case all-repeats); the label
    # lengths below are capped to logit_lens // 2 so any lens work.
    lo = min(max(2 * U, 2), T)
    logit_lens = jnp.asarray(rng.integers(lo, T + 1, B).astype(np.int32))
    labels = jnp.asarray(rng.integers(1, V, (B, U)).astype(np.int32))
    label_lens = jnp.asarray(
        np.minimum(rng.integers(0, U + 1, B),
                   np.asarray(logit_lens) // 2).astype(np.int32))
    with pltpu.force_tpu_interpret_mode():
        ours = ctc_loss_pallas(logits, logit_lens, labels, label_lens,
                               reduction="none")
    ref = ctc_loss(logits, logit_lens, labels, label_lens, reduction="none")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@given(B=st.integers(1, 4), T=st.integers(2, 7), U=st.integers(1, 4),
       V=st.integers(2, 6), seed=st.integers(0, 2**31 - 1))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_pallas_rnnt_matches_lax(B, T, U, V, seed):
    from myrtlespeech_tpu.ops.pallas.rnnt_kernel import rnnt_loss_pallas
    from myrtlespeech_tpu.ops.rnnt import rnnt_loss

    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.standard_normal((B, T, U + 1, V))
                         .astype(np.float32))
    logit_lens = jnp.asarray(rng.integers(1, T + 1, B).astype(np.int32))
    labels = jnp.asarray(rng.integers(1, V, (B, U)).astype(np.int32))
    label_lens = jnp.asarray(rng.integers(0, U + 1, B).astype(np.int32))
    with pltpu.force_tpu_interpret_mode():
        ours = rnnt_loss_pallas(logits, logit_lens, labels, label_lens,
                                reduction="none")
    ref = rnnt_loss(logits, logit_lens, labels, label_lens,
                    reduction="none")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_decoders_large_vocab_smoke():
    """Wordpiece-scale vocabulary (V=512): CTC beam matches its own
    greedy argmax on a peaked distribution, and the RNN-T beam emits
    valid symbols — pins the expand_topk/top_k paths at large V where
    lane occupancy and hash spread differ from the V=29 char regime."""
    import jax
    import jax.numpy as jnp

    from myrtlespeech_tpu.decoding.ctc_beam import ctc_beam_decode
    from myrtlespeech_tpu.decoding.ctc_greedy import ctc_greedy_decode

    rng = np.random.default_rng(11)
    B, T, V = 2, 12, 512
    # Peaked logits: beam and greedy must agree on the collapsed argmax.
    path = rng.integers(0, V, (B, T))
    logits = np.full((B, T, V), -8.0, np.float32)
    for b in range(B):
        logits[b, np.arange(T), path[b]] = 8.0
    lens = np.asarray([T, T - 3], np.int32)
    gt, gl = ctc_greedy_decode(jnp.asarray(logits), jnp.asarray(lens),
                               blank_index=0)
    bt, bl = ctc_beam_decode(jnp.asarray(logits), jnp.asarray(lens),
                             blank_index=0, beam_width=4, expand_topk=16)
    for b in range(B):
        assert bt[b, :bl[b]].tolist() == gt[b, :gl[b]].tolist()
