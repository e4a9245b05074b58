"""Tests for the char-bigram LM (decoding/lm.py) and its builder wiring."""

import numpy as np
import pytest

from myrtlespeech_tpu.data.alphabet import Alphabet
from myrtlespeech_tpu.decoding.lm import (estimate_bigram_lm, load_bigram_lm,
                                          save_bigram_lm)


def test_estimate_rows_normalise():
    alphabet = Alphabet("_ab")
    lm = estimate_bigram_lm(["abab", "aab"], alphabet, blank_index=0)
    assert lm.shape == (4, 3)
    np.testing.assert_allclose(np.exp(lm).sum(axis=1), 1.0, rtol=1e-5)


def test_estimate_counts_dominate():
    alphabet = Alphabet("_ab")
    # 'a' is always followed by 'b' in the corpus -> p(b|a) must dominate.
    lm = estimate_bigram_lm(["ab" * 50], alphabet, smoothing=0.1,
                            blank_index=0)
    a, b = alphabet.get_index("a"), alphabet.get_index("b")
    assert lm[a, b] > lm[a, a]
    # Sentence-start row (index V) prefers 'a'.
    assert lm[3, a] > lm[3, b]
    # Blank column carries (near) no mass.
    assert lm[a, 0] < -20


def test_estimate_vocab_padding():
    # Model vocab larger than alphabet (dedicated blank row convention).
    alphabet = Alphabet(" ab")
    lm = estimate_bigram_lm(["ab ab"], alphabet, vocab_size=4, blank_index=3)
    assert lm.shape == (5, 4)
    assert (lm[:, 3] < -20).all()  # non-alphabet blank column
    np.testing.assert_allclose(np.exp(lm).sum(axis=1), 1.0, rtol=1e-5)


def test_estimate_out_of_alphabet_breaks_context():
    alphabet = Alphabet("ab")
    # '#' is out-of-alphabet: "a#b" must not count an a->b transition.
    lm_sep = estimate_bigram_lm(["a#b"] * 100, alphabet, smoothing=1.0)
    lm_join = estimate_bigram_lm(["ab"] * 100, alphabet, smoothing=1.0)
    a, b = 0, 1
    assert lm_join[a, b] > lm_sep[a, b]


def test_save_load_roundtrip(tmp_path):
    alphabet = Alphabet("_abc")
    lm = estimate_bigram_lm(["abc cab"], alphabet, blank_index=0)
    path = str(tmp_path / "lm.npy")
    save_bigram_lm(path, lm)
    back = load_bigram_lm(path, vocab_size=4)
    np.testing.assert_array_equal(lm, back)
    with pytest.raises(ValueError):
        load_bigram_lm(path, vocab_size=7)
    with pytest.raises(ValueError):
        save_bigram_lm(path, np.zeros((3, 3), np.float32))


def test_builder_threads_lm(tmp_path):
    """CTCBeamDecoderConfig.lm_bigram_path reaches ctc_beam_decode."""
    import jax.numpy as jnp

    from myrtlespeech_tpu.builders.build import (build_decoder,
                                                 build_model, vocab_size)
    from myrtlespeech_tpu.config import schema as S

    stt = S.SpeechToTextConfig(
        alphabet="_ab",
        pre_process_steps=(),
        model=S.DeepSpeech1Config(n_hidden=8),
        loss=S.CTCLossConfig(blank_index=0),
        post_process=S.CTCBeamDecoderConfig(
            blank_index=0, beam_width=4, prune_threshold=0.0,
            lm_alpha=5.0, lm_bigram_path=str(tmp_path / "lm.npy")),
    )
    # LM that only allows 'a' everywhere.
    V = vocab_size(stt)
    lm = np.full((V + 1, V), -30.0, np.float32)
    lm[:, 1] = 0.0
    save_bigram_lm(str(tmp_path / "lm.npy"), lm)

    model = build_model(stt)
    decode = build_decoder(stt, model)
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((1, 5, V)).astype(np.float32))
    toks, lens = decode(logits, jnp.asarray([5]))
    got = np.asarray(toks)[0, : int(lens[0])]
    assert (got == 1).all()


def test_train_char_lm_tool(tmp_path):
    """End-to-end: tool estimates an LM from a config's fake train set."""
    import sys
    sys.path.insert(0, "/root/repo")
    from tools.train_char_lm import main

    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(
        "from myrtlespeech_tpu.config.schema import *\n"
        "task_config = TaskConfig(\n"
        "    speech_to_text=SpeechToTextConfig(\n"
        "        alphabet='_ab', pre_process_steps=(),\n"
        "        model=DeepSpeech1Config(n_hidden=8),\n"
        "        loss=CTCLossConfig(blank_index=0),\n"
        "        post_process=CTCGreedyDecoderConfig(blank_index=0)),\n"
        "    train_config=TrainConfig(batch_size=2,\n"
        "        optimizer=AdamConfig(learning_rate=1e-3)),\n"
        "    train_dataset=FakeSpeechToTextConfig(\n"
        "        dataset_len=4, audio_ms=IntRange(100, 200),\n"
        "        label_symbols='ab', label_len=IntRange(2, 5)),\n"
        ")\n")
    out = tmp_path / "lm.npy"
    main(["--config", str(cfg_path), "--out", str(out)])
    lm = load_bigram_lm(str(out), vocab_size=3)
    assert lm.shape == (4, 3)


# ---------------------------------------------------------------------------
# Word-level LM (hash-table unigram, decoding/lm.py::WordLM)
# ---------------------------------------------------------------------------


def test_word_lm_estimation_orders_by_count():
    from myrtlespeech_tpu.decoding.lm import estimate_word_lm, word_hashes

    alphabet = Alphabet("_ ab")
    lm = estimate_word_lm(["ab a ab", "ab b"], alphabet)

    def lookup(word):
        h1, h2 = word_hashes(alphabet.get_indices(word))
        S = lm.key1.shape[0]
        step = np.uint32(h2 | 1)
        for j in range(4):
            # uint32 wraparound is intentional (mirrors lm.py's guarded
            # recurrence); silence numpy's scalar-overflow warning.
            with np.errstate(over="ignore"):
                idx = int((h1 + np.uint32(j) * step) & np.uint32(S - 1))
            if lm.key1[idx] == h1 and lm.key2[idx] == h2:
                return float(lm.logp[idx])
        return lm.oov_log_prob

    # count("ab")=3 > count("a")=1 == count("b")=1 > OOV.
    assert lookup("ab") > lookup("a")
    assert lookup("a") == pytest.approx(lookup("b"))
    assert lookup("b") > lm.oov_log_prob
    assert lookup("ba") == lm.oov_log_prob  # in-alphabet but unseen


def test_word_lm_device_lookup_matches_table():
    import jax.numpy as jnp

    from myrtlespeech_tpu.decoding.ctc_beam import _word_lm_lookup
    from myrtlespeech_tpu.decoding.lm import estimate_word_lm, word_hashes

    alphabet = Alphabet("_ ab")
    lm = estimate_word_lm(["ab a ab b aa bb ab"], alphabet)
    words = ["ab", "a", "b", "aa", "bb", "ba"]  # "ba" is OOV
    hs = [word_hashes(alphabet.get_indices(w)) for w in words]
    h1 = jnp.asarray([int(h[0]) for h in hs], jnp.uint32)
    h2 = jnp.asarray([int(h[1]) for h in hs], jnp.uint32)
    got = np.asarray(_word_lm_lookup(
        jnp.asarray(lm.key1), jnp.asarray(lm.key2), jnp.asarray(lm.logp),
        jnp.float32(lm.oov_log_prob), h1, h2)[0])
    # Device lookup == host probe for every word (incl. the OOV miss).
    host = []
    for h1_, h2_ in hs:
        S = lm.key1.shape[0]
        step = np.uint32(h2_ | 1)
        val = lm.oov_log_prob
        for j in range(4):
            with np.errstate(over="ignore"):  # uint32 probe wraps
                idx = int((h1_ + np.uint32(j) * step) & np.uint32(S - 1))
            if lm.key1[idx] == h1_ and lm.key2[idx] == h2_:
                val = float(lm.logp[idx])
                break
        host.append(val)
    np.testing.assert_allclose(got, host, rtol=1e-6)


def test_word_lm_save_load_roundtrip(tmp_path):
    from myrtlespeech_tpu.decoding.lm import (estimate_word_lm, load_word_lm,
                                              save_word_lm)

    alphabet = Alphabet("_ ab")
    lm = estimate_word_lm(["ab a b"], alphabet)
    path = str(tmp_path / "word_lm.npz")
    save_word_lm(path, lm)
    lm2 = load_word_lm(path)
    np.testing.assert_array_equal(lm.key1, lm2.key1)
    np.testing.assert_array_equal(lm.key2, lm2.key2)
    np.testing.assert_allclose(lm.logp, lm2.logp)
    assert lm.oov_log_prob == pytest.approx(lm2.oov_log_prob)


def test_builder_threads_word_lm(tmp_path):
    from myrtlespeech_tpu.builders import build as B
    from myrtlespeech_tpu.config import schema as S
    from myrtlespeech_tpu.decoding.lm import estimate_word_lm, save_word_lm

    alphabet = Alphabet("_ ab")
    path = str(tmp_path / "wlm.npz")
    save_word_lm(path, estimate_word_lm(["ab a"], alphabet))

    def stt(post):
        return S.SpeechToTextConfig(
            alphabet="_ ab",
            pre_process_steps=(S.PreProcessStepConfig(
                S.MFCCConfig(n_mels=8, log_mel_only=True)),),
            model=S.DeepSpeech1Config(n_hidden=8),
            loss=S.CTCLossConfig(blank_index=0),
            post_process=post)

    cfg = stt(S.CTCBeamDecoderConfig(blank_index=0, beam_width=4,
                                     separator_index=1, word_lm_alpha=1.0,
                                     word_lm_path=path))
    model = B.build_model(cfg, dtype=np.float32)
    dec = B.build_decoder(cfg, model)
    assert dec.keywords["word_lm"] is not None
    assert dec.keywords["word_lm_alpha"] == 1.0

    # Missing separator_index must be rejected up-front.
    bad = stt(S.CTCBeamDecoderConfig(blank_index=0, beam_width=4,
                                     word_lm_alpha=1.0, word_lm_path=path))
    with pytest.raises(ValueError, match="separator_index"):
        B.build_decoder(bad, model)


def test_train_char_lm_tool_word_out(tmp_path):
    import sys
    sys.path.insert(0, "/root/repo")
    from tools.train_char_lm import main as lm_main

    cfg_py = tmp_path / "cfg.py"
    cfg_py.write_text(
        "from myrtlespeech_tpu.config import schema as S\n"
        "task_config = S.TaskConfig(\n"
        "    speech_to_text=S.SpeechToTextConfig(\n"
        "        alphabet='_ ab',\n"
        "        pre_process_steps=(S.PreProcessStepConfig(\n"
        "            S.MFCCConfig(n_mels=8, log_mel_only=True)),),\n"
        "        model=S.DeepSpeech1Config(n_hidden=8),\n"
        "        loss=S.CTCLossConfig(blank_index=0),\n"
        "        post_process=S.CTCGreedyDecoderConfig(blank_index=0)),\n"
        "    train_config=S.TrainConfig(batch_size=1, epochs=1),\n"
        "    train_dataset=S.FakeSpeechToTextConfig(\n"
        "        dataset_len=4, label_symbols='ab '),\n"
        ")\n")
    out = tmp_path / "wlm.npz"
    lm_main(["--config", str(cfg_py), "--word-lm-out", str(out)])
    from myrtlespeech_tpu.decoding.lm import load_word_lm
    lm = load_word_lm(str(out))
    assert (lm.key1 != 0).any()


def _probe(key1, key2, logp, h1, h2, default):
    """Host-side open-addressed probe (mirrors the device lookup)."""
    S = key1.shape[0]
    if h1 == 0 and h2 == 0:
        h1 = np.uint32(1)
    step = np.uint32(h2 | 1)
    for j in range(4):
        with np.errstate(over="ignore"):
            idx = int((h1 + np.uint32(j) * step) & np.uint32(S - 1))
        if key1[idx] == h1 and key2[idx] == h2:
            return float(logp[idx])
    return default


def test_word_bigram_lm_estimation():
    """order=2 stores MLE log p(word | prev); misses back off."""
    from myrtlespeech_tpu.decoding.lm import (WORD_SEED1, WORD_SEED2,
                                              bigram_keys, estimate_word_lm,
                                              word_hashes)

    alphabet = Alphabet("_ ab")
    # Bigrams: (START, a) x3, (a, b) x2, (a, a) x1.
    lm = estimate_word_lm(["a b", "a b", "a a"], alphabet, order=2)
    assert lm.bkey1 is not None

    def bscore(prev, word):
        ph = ((WORD_SEED1, WORD_SEED2) if prev is None
              else word_hashes(alphabet.get_indices(prev)))
        wh = word_hashes(alphabet.get_indices(word))
        with np.errstate(over="ignore"):
            k1, k2 = bigram_keys(ph[0], ph[1], wh[0], wh[1])
        return _probe(lm.bkey1, lm.bkey2, lm.blogp, k1, k2, None)

    assert bscore(None, "a") == pytest.approx(np.log(3 / 3))  # p(a|START)=1
    assert bscore("a", "b") == pytest.approx(np.log(2 / 3))
    assert bscore("a", "a") == pytest.approx(np.log(1 / 3))
    assert bscore("b", "a") is None        # unseen context -> backoff
    assert lm.backoff_log == pytest.approx(np.log(0.4))


def test_word_bigram_lm_save_load_roundtrip(tmp_path):
    from myrtlespeech_tpu.decoding.lm import (estimate_word_lm, load_word_lm,
                                              save_word_lm)

    alphabet = Alphabet("_ ab")
    lm = estimate_word_lm(["a b a", "b a"], alphabet, order=2)
    path = str(tmp_path / "wlm2.npz")
    save_word_lm(path, lm)
    back = load_word_lm(path)
    np.testing.assert_array_equal(back.key1, lm.key1)
    np.testing.assert_array_equal(back.bkey1, lm.bkey1)
    np.testing.assert_array_equal(back.blogp, lm.blogp)
    assert back.backoff_log == pytest.approx(lm.backoff_log)
    # Unigram-only files still load with empty bigram fields.
    lm1 = estimate_word_lm(["a b"], alphabet, order=1)
    path1 = str(tmp_path / "wlm1.npz")
    save_word_lm(path1, lm1)
    back1 = load_word_lm(path1)
    assert back1.bkey1 is None


def test_word_lm_scale_probe_budget():
    """Every stored word of a 2k-vocabulary table stays reachable within
    the static WORD_LM_PROBES budget (the large-vocab guarantee the
    12k-word stress artifact measures, benchmarks/data/large_vocab/)."""
    from myrtlespeech_tpu.decoding.lm import (WORD_LM_PROBES,
                                              estimate_word_lm, word_hashes)

    alphabet = Alphabet("_ abcdefghijklmnopqrstuvwxyz")
    rng = np.random.default_rng(7)
    letters = "abcdefghijklmnopqrstuvwxyz"
    vocab = sorted({"".join(rng.choice(list(letters),
                                       int(rng.integers(3, 10))))
                    for _ in range(2500)})
    sents = [" ".join(vocab[k:k + 10]) for k in range(0, len(vocab), 10)]
    lm = estimate_word_lm(sents, alphabet, order=2)
    S = lm.key1.shape[0]
    for w in vocab:
        h1, h2 = word_hashes(alphabet.get_indices(w))
        if h1 == 0 and h2 == 0:
            h1 = np.uint32(1)
        step = np.uint32(h2 | 1)
        for j in range(WORD_LM_PROBES):
            with np.errstate(over="ignore"):
                idx = int((h1 + np.uint32(j) * step) & np.uint32(S - 1))
            if lm.key1[idx] == h1 and lm.key2[idx] == h2:
                break
        else:
            raise AssertionError(f"word {w!r} unreachable in "
                                 f"{WORD_LM_PROBES} probes")
