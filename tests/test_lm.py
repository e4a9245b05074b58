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
