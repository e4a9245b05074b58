"""RNN-T decoder tests against a brute-force oracle.

Strategy (mirrors the reference's decoder oracles): build a tiny RNNT
model, enumerate all label sequences up to a max length, score each exactly
with the verified transducer likelihood, and check that beam search with a
wide beam finds the MAP sequence and greedy finds a reasonable one.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myrtlespeech_tpu.config.schema import (
    Activation, FullyConnectedConfig, RNNConfig, RNNTConfig,
    RNNTEncoderConfig, RNNTJointNetConfig, RNNTPredictNetConfig,
)
from myrtlespeech_tpu.decoding.rnnt_beam import rnnt_beam_decode
from myrtlespeech_tpu.decoding.rnnt_greedy import rnnt_greedy_decode
from myrtlespeech_tpu.models.rnn_t import RNNT
from myrtlespeech_tpu.ops.rnn import LSTMState
from myrtlespeech_tpu.ops.rnnt import rnnt_forward_log_likelihood


def _tiny_model(V=4, seed=0):
    cfg = RNNTConfig(
        encoder=RNNTEncoderConfig(
            rnn1=RNNConfig(hidden_size=8, num_layers=1),
            time_reduction_factor=1, rnn2=None),
        prediction=RNNTPredictNetConfig(
            embedding_dim=4, rnn=RNNConfig(hidden_size=8, num_layers=1)),
        joint=RNNTJointNetConfig(
            activation=Activation.RELU,
            fc=FullyConnectedConfig(num_hidden_layers=0)))
    m = RNNT(cfg, vocab_size=V, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    B, T, F = 1, 3, 5
    x = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    lens = jnp.asarray(np.array([T], np.int32))
    labels = jnp.asarray(np.array([[1, 2]], np.int32))
    vars_ = m.init(jax.random.PRNGKey(seed), x, lens, labels,
                   jnp.asarray([2]), False)
    return m, vars_, cfg, x, lens


def _exact_scores(m, vars_, x, lens, V, max_len):
    """Exact log P(y) for every label sequence up to max_len."""
    f, f_lens = m.apply(vars_, x, lens, method=RNNT.encode)
    scores = {}
    for L in range(0, max_len + 1):
        for y in itertools.product(range(1, V), repeat=L):
            labels = jnp.asarray(np.array([list(y) + [0] * (max_len - L)],
                                          np.int32))
            g = m.apply(vars_, labels, jnp.asarray([L]), method=RNNT.predict)
            logits = m.apply(vars_, f, g, method=RNNT.joint)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            ll = rnnt_forward_log_likelihood(lp, f_lens, labels,
                                             jnp.asarray([L]))
            scores[y] = float(ll[0])
    return scores


def _helpers(m, vars_, cfg):
    H = cfg.prediction.rnn.hidden_size

    def init_state_fn(n):
        return [[LSTMState(h=jnp.zeros((n, H)), c=jnp.zeros((n, H)))]]

    def predict_step(token, state):
        return m.apply(vars_, token, state, method=RNNT.predict_step)

    def joint_step(f_t, g):
        return m.apply(vars_, f_t, g, method=RNNT.joint)

    return predict_step, joint_step, init_state_fn


@pytest.mark.parametrize("seed", [0, 1])
def test_beam_finds_map_sequence(seed):
    V = 4
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
    # Beam merges paths (sums over alignments), exactly like the oracle.
    assert got == best, f"beam {got} (score {scores.get(got)}) != " \
        f"map {best} ({scores[best]})"


def test_greedy_decodes_something_sane():
    V = 4
    m, vars_, cfg, x, lens = _tiny_model(V=V, seed=0)
    f, f_lens = m.apply(vars_, x, lens, method=RNNT.encode)
    predict_step, joint_step, init_state_fn = _helpers(m, vars_, cfg)
    toks, tlens = rnnt_greedy_decode(
        f, f_lens, predict_step, joint_step, init_state_fn(1),
        blank_index=0, max_symbols_per_step=3, max_output_len=10)
    L = int(tlens[0])
    assert 0 <= L <= 10
    assert np.all(np.asarray(toks)[0, :L] > 0)  # no blanks emitted


def test_greedy_max_symbols_respected():
    """With max_symbols_per_step=1, emissions per frame are capped: total
    output length <= number of frames."""
    V = 6
    m, vars_, cfg, x, lens = _tiny_model(V=V, seed=3)
    f, f_lens = m.apply(vars_, x, lens, method=RNNT.encode)
    predict_step, joint_step, init_state_fn = _helpers(m, vars_, cfg)
    toks, tlens = rnnt_greedy_decode(
        f, f_lens, predict_step, joint_step, init_state_fn(1),
        blank_index=0, max_symbols_per_step=1, max_output_len=50)
    assert int(tlens[0]) <= int(f_lens[0])


def test_greedy_batch_consistency():
    """Decoding a batch equals decoding each utterance alone."""
    V = 4
    m, vars_, cfg, _, _ = _tiny_model(V=V, seed=0)
    rng = np.random.default_rng(7)
    B, T, F = 3, 4, 5
    x = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    lens = jnp.asarray(np.array([4, 3, 2], np.int32))
    f, f_lens = m.apply(vars_, x, lens, method=RNNT.encode)
    predict_step, joint_step, init_state_fn = _helpers(m, vars_, cfg)
    toks, tlens = rnnt_greedy_decode(
        f, f_lens, predict_step, joint_step, init_state_fn(B),
        blank_index=0, max_symbols_per_step=4, max_output_len=16)
    for b in range(B):
        tb, lb = rnnt_greedy_decode(
            f[b:b + 1, :int(f_lens[b])], f_lens[b:b + 1], predict_step,
            joint_step, init_state_fn(1), blank_index=0,
            max_symbols_per_step=4, max_output_len=16)
        assert int(lb[0]) == int(tlens[b])
        np.testing.assert_array_equal(
            np.asarray(tb)[0, :int(lb[0])],
            np.asarray(toks)[b, :int(tlens[b])])


def test_beam_expand_topk_lossless_when_k_large(tiny_model=None):
    """expand_topk >= V-1 reproduces the full RNN-T beam exactly."""
    import numpy as np

    from myrtlespeech_tpu.decoding.rnnt_beam import rnnt_beam_decode

    rng = np.random.default_rng(31)
    B, T, H, V = 2, 5, 4, 6

    # Stateless toy predict/joint closing over random matrices.
    wj = jnp.asarray(rng.standard_normal((2 * H, V)).astype(np.float32))
    we = jnp.asarray(rng.standard_normal((V + 1, H)).astype(np.float32))

    def predict_step(tok, state):
        return we[tok + 1], state

    def joint_step(f_t, g):
        return jnp.concatenate([f_t, g], -1) @ wj

    def init_state_fn(n):
        return jnp.zeros((n, 1))

    f = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))
    f_lens = jnp.asarray([T, 3])
    kw = dict(blank_index=0, beam_width=4, max_symbols_per_step=3,
              max_output_len=12)
    full = rnnt_beam_decode(f, f_lens, predict_step, joint_step,
                            init_state_fn, **kw)
    k = rnnt_beam_decode(f, f_lens, predict_step, joint_step,
                         init_state_fn, expand_topk=V - 1, **kw)
    np.testing.assert_array_equal(np.asarray(full[0]), np.asarray(k[0]))
    np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(k[1]))


@pytest.mark.parametrize("seed", [0, 1])
def test_beam_pruning_preserves_map_sequence(seed):
    """Graves-style expansion pruning must not change the decoded output
    on the oracle-model distribution (pruned hyps can never re-enter the
    beam: extension scores only decrease)."""
    V = 4
    m, vars_, cfg, x, lens = _tiny_model(V=V, seed=seed)
    T = int(lens[0])
    f, f_lens = m.apply(vars_, x, lens, method=RNNT.encode)
    predict_step, joint_step, init_state_fn = _helpers(m, vars_, cfg)
    outs = []
    for prune in (True, False):
        toks, tlens = rnnt_beam_decode(
            f, f_lens, predict_step, joint_step, init_state_fn,
            blank_index=0, beam_width=16, max_symbols_per_step=T,
            max_output_len=T, prune_expands=prune)
        outs.append(tuple(np.asarray(toks)[0, :int(tlens[0])]))
    assert outs[0] == outs[1]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_beam_speculative_blocks_are_output_invariant(seed):
    """Speculative frame-blocking (one batched joint per F-frame block,
    pure-blank frames consumed with score adds) must produce EXACTLY the
    frame-by-frame beam's output, including ragged f_lens and a blank-
    biased (speech-like) joint where whole blocks are consumed at once."""
    rng = np.random.default_rng(100 + seed)
    B, T, H, V = 3, 17, 4, 6
    wj = jnp.asarray(rng.standard_normal((2 * H, V)).astype(np.float32))
    # Bias blank up so most frames are pure-blank (the production shape).
    wb = jnp.zeros((V,)).at[0].set(3.0)
    we = jnp.asarray(rng.standard_normal((V + 1, H)).astype(np.float32))

    def predict_step(tok, state):
        return we[tok + 1], state

    def joint_step(f_t, g):
        return jnp.concatenate([f_t, g], -1) @ wj + wb

    def init_state_fn(n):
        return jnp.zeros((n, 1))

    f = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))
    f_lens = jnp.asarray([T, 5, 11])
    kw = dict(blank_index=0, beam_width=4, max_symbols_per_step=3,
              max_output_len=12)
    base = rnnt_beam_decode(f, f_lens, predict_step, joint_step,
                            init_state_fn, speculative_frames=None, **kw)
    for F in (2, 4, 8, 32):
        spec = rnnt_beam_decode(f, f_lens, predict_step, joint_step,
                                init_state_fn, speculative_frames=F, **kw)
        np.testing.assert_array_equal(np.asarray(base[1]),
                                      np.asarray(spec[1]), err_msg=f"F={F}")
        np.testing.assert_array_equal(np.asarray(base[0]),
                                      np.asarray(spec[0]), err_msg=f"F={F}")


def test_projected_joint_decode_equivalence():
    """Decoding in projected joint space (factored-joint hoist,
    builders.build_rnnt_decode_helpers::make_projected) must produce the
    same output as driving the decoders with raw encoder features and the
    full joint."""
    from myrtlespeech_tpu.builders.build import build_rnnt_decode_helpers
    from myrtlespeech_tpu.decoding.rnnt_greedy import rnnt_greedy_decode

    m, vars_, cfg, x, lens = _tiny_model(V=4, seed=3)
    f, f_lens = m.apply(vars_, x, lens, method=RNNT.encode)
    make, make_projected, init_state_fn = build_rnnt_decode_helpers(m, cfg)
    predict_step, joint_step = make(vars_)
    pstep2, joint_fp_step, project_f = make_projected(vars_)
    fp = project_f(f)

    kw = dict(blank_index=0, beam_width=8, max_symbols_per_step=3,
              max_output_len=6)
    t0, l0 = rnnt_beam_decode(f, f_lens, predict_step, joint_step,
                              init_state_fn, **kw)
    t1, l1 = rnnt_beam_decode(fp, f_lens, pstep2, joint_fp_step,
                              init_state_fn, **kw)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))

    g0 = rnnt_greedy_decode(f, f_lens, predict_step, joint_step,
                            init_state_fn(1), blank_index=0,
                            max_symbols_per_step=3, max_output_len=6)
    g1 = rnnt_greedy_decode(fp, f_lens, pstep2, joint_fp_step,
                            init_state_fn(1), blank_index=0,
                            max_symbols_per_step=3, max_output_len=6)
    np.testing.assert_array_equal(np.asarray(g0[0]), np.asarray(g1[0]))
    np.testing.assert_array_equal(np.asarray(g0[1]), np.asarray(g1[1]))
