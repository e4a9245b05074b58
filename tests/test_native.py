"""Native C++ edit distance vs the pure-Python oracle."""

import numpy as np
import pytest

from myrtlespeech_tpu.decoding.wer import edit_distance

native = pytest.importorskip("myrtlespeech_tpu.native")


def test_matches_python_oracle():
    rng = np.random.default_rng(0)
    refs, hyps = [], []
    for _ in range(50):
        refs.append(list(rng.integers(0, 10, rng.integers(0, 30))))
        hyps.append(list(rng.integers(0, 10, rng.integers(0, 30))))
    try:
        got = native.edit_distance_batch(refs, hyps)
    except (OSError, Exception) as e:  # no compiler in env
        pytest.skip(f"native lib unavailable: {e}")
    expected = [edit_distance(r, h) for r, h in zip(refs, hyps)]
    assert got == expected


def test_string_tokens():
    try:
        got = native.edit_distance_batch(
            [["the", "cat"], list("abc")], [["the", "dog"], list("axc")])
    except Exception as e:
        pytest.skip(f"native lib unavailable: {e}")
    assert got == [1, 1]


def test_error_counts_aggregation():
    """error_counts are the exact sufficient statistics: summing shard
    counts reproduces the corpus-level rate (multi-host eval semantics)."""
    from myrtlespeech_tpu.decoding.wer import error_rate, wer_counts

    refs = ["the cat sat", "on the mat", "a dog", "ran far away"]
    hyps = ["the cat sit", "on mat", "a dog", "ran very far away"]
    d_all, t_all = wer_counts(refs, hyps)
    d1, t1 = wer_counts(refs[:2], hyps[:2])
    d2, t2 = wer_counts(refs[2:], hyps[2:])
    assert (d1 + d2, t1 + t2) == (d_all, t_all)
    assert abs(error_rate([r.split() for r in refs],
                          [h.split() for h in hyps])
               - d_all / t_all) < 1e-12


# ---------------------------------------------------------------------------
# Native audio IO (native/audio_io.cc): the C++ DataLoader-core equivalent.
# ---------------------------------------------------------------------------


def _write_wav(path, data, sr=16000, sampwidth=2, channels=1):
    import wave
    with wave.open(str(path), "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(sampwidth)
        f.setframerate(sr)
        f.writeframes(data.tobytes())


def test_wav_info_and_batch_match_python_reader(tmp_path):
    from myrtlespeech_tpu import native
    from myrtlespeech_tpu.data.dataset.librispeech import _read_wav

    rng = np.random.default_rng(0)
    paths = []
    for i, n in enumerate([1600, 2400, 800]):
        pcm = (rng.standard_normal(n) * 20000).astype(np.int16)
        p = tmp_path / f"mono{i}.wav"
        _write_wav(p, pcm)
        paths.append(str(p))
    # stereo int16: both readers average channels
    st = (rng.standard_normal((500, 2)) * 20000).astype(np.int16)
    p = tmp_path / "stereo.wav"
    _write_wav(p, st, channels=2)
    paths.append(str(p))
    # int32 mono
    pcm32 = (rng.standard_normal(700) * 2**28).astype(np.int32)
    p = tmp_path / "mono32.wav"
    _write_wav(p, pcm32, sampwidth=4)
    paths.append(str(p))

    n_samp, sr = native.wav_info(paths[0])
    assert (n_samp, sr) == (1600, 16000)

    wav, lens, rates = native.wav_read_batch(paths, 2400)
    assert wav.shape == (5, 2400) and wav.dtype == np.float32
    assert list(rates) == [16000] * 5
    for i, p in enumerate(paths):
        ref, ref_sr = _read_wav(p)
        assert lens[i] == len(ref) and ref_sr == 16000
        np.testing.assert_allclose(wav[i, :lens[i]], ref, atol=1e-6)
        assert not wav[i, lens[i]:].any()  # padding stays zero


def test_wav_read_batch_errors_are_actionable(tmp_path):
    from myrtlespeech_tpu import native

    pcm = np.zeros(100, np.int16)
    good = tmp_path / "good.wav"
    _write_wav(good, pcm)
    # file longer than the bucket
    with pytest.raises(OSError, match="longer than max_samples"):
        native.wav_read_batch([str(good)], 50)
    # unreadable path
    with pytest.raises(OSError, match="missing.wav"):
        native.wav_read_batch([str(tmp_path / "missing.wav"), str(good)],
                              200)
    # not a WAV
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a riff file at all........")
    with pytest.raises(OSError, match="bad.wav"):
        native.wav_read_batch([str(bad)], 200)


def test_bucketed_loader_native_path_matches_python_path(tmp_path):
    """The C++ batch decode path must produce byte-identical batches to the
    per-sample Python path over a real LibriSpeech tree."""
    import wave

    from myrtlespeech_tpu.config.schema import (LibriSpeechConfig,
                                                LibriSpeechSubset)
    from myrtlespeech_tpu.data.alphabet import Alphabet
    from myrtlespeech_tpu.data.batch import BucketedLoader
    from myrtlespeech_tpu.data.dataset.librispeech import LibriSpeech

    rng = np.random.default_rng(1)
    d = tmp_path / "dev-clean" / "7" / "8"
    d.mkdir(parents=True)
    lines = []
    for u, n in enumerate([1600, 3200, 2000, 2600]):
        uid = f"7-8-{u:04d}"
        pcm = (rng.standard_normal(n) * 20000).astype(np.int16)
        _write_wav(d / f"{uid}.wav", pcm)
        lines.append(f"{uid} HELLO THERE\n")
    (d / "7-8.trans.txt").write_text("".join(lines))

    ds = LibriSpeech(LibriSpeechConfig(
        subsets=(LibriSpeechSubset.DEV_CLEAN,), data_dir=str(tmp_path)))
    alphabet = Alphabet("_ abcdefghijklmnopqrstuvwxyz'")

    def batches(force_python):
        loader = BucketedLoader(ds, alphabet, 2, shuffle=False)
        if force_python:
            loader._native_ok = False
        loader.set_epoch(0)
        return list(loader)

    nat, py = batches(False), batches(True)
    assert len(nat) == len(py) and len(nat) >= 2
    for a, b in zip(nat, py):
        for k in ("wav", "wav_lens", "labels", "label_lens", "n_real"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        assert a["texts"] == b["texts"]
