"""LibriSpeech reader + downloader (data/dataset/librispeech.py).

Reference parity: ``src/myrtlespeech/data/dataset/librispeech.py`` —
subset layout, transcripts, duration filter, download with checksum.  The
downloader is exercised against a locally-built archive (no egress in
this sandbox); the network path is asserted to fail with an actionable
error."""

import hashlib
import os
import tarfile
import wave

import numpy as np
import pytest

from myrtlespeech_tpu.config.schema import (LibriSpeechConfig,
                                            LibriSpeechSubset)
from myrtlespeech_tpu.data.dataset import librispeech as L


def _write_wav(path, n_samples, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    pcm = (rng.standard_normal(n_samples) * 3000).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())
    return pcm.astype(np.float32) / 32768.0


def _make_subset_tree(root, subset, utts):
    """utts: list of (speaker, chapter, utt, n_samples, text)."""
    made = {}
    for spk, chp, utt, n, text in utts:
        d = os.path.join(root, subset, str(spk), str(chp))
        os.makedirs(d, exist_ok=True)
        utt_id = f"{spk}-{chp}-{utt:04d}"
        made[utt_id] = (_write_wav(os.path.join(d, utt_id + ".wav"), n,
                                   seed=utt), text)
        trans = os.path.join(d, f"{spk}-{chp}.trans.txt")
        with open(trans, "a") as f:
            f.write(f"{utt_id} {text.upper()}\n")
    return made


def test_reader_indexes_and_decodes(tmp_path):
    root = str(tmp_path)
    made = _make_subset_tree(root, "dev-clean", [
        (84, 121123, 1, 16000, "hello world"),
        (84, 121123, 2, 8000, "short one"),
        (174, 50561, 1, 32000, "two seconds here"),
    ])
    ds = L.LibriSpeech(LibriSpeechConfig(
        subsets=(LibriSpeechSubset.DEV_CLEAN,), data_dir=root))
    assert len(ds) == 3
    texts = set()
    for i in range(len(ds)):
        wav, text = ds[i]
        assert wav.dtype == np.float32 and wav.ndim == 1
        texts.add(text)
    # Transcripts are lowercased (reference convention).
    assert texts == {"hello world", "short one", "two seconds here"}
    # Decoded audio matches what was written.
    by_text = {ds[i][1]: ds[i][0] for i in range(len(ds))}
    np.testing.assert_allclose(by_text["hello world"],
                               made["84-121123-0001"][0], atol=1e-6)
    # duration metadata enables bucketing without decode.
    durs = sorted(ds.duration_samples(i) for i in range(3))
    assert durs == [8000, 16000, 32000]


def test_reader_duration_filter_and_cache(tmp_path):
    root = str(tmp_path)
    _make_subset_tree(root, "dev-clean", [
        (1, 2, 1, 16000, "keep me"),
        (1, 2, 2, 80000, "too long"),  # 5 s
    ])
    cfg = LibriSpeechConfig(subsets=(LibriSpeechSubset.DEV_CLEAN,),
                            data_dir=root, max_duration_s=2.0)
    ds = L.LibriSpeech(cfg)
    assert len(ds) == 1 and ds[0][1] == "keep me"
    # Second construction comes from the JSON index cache.
    assert os.path.exists(os.path.join(root, "dev-clean",
                                       ".myrtlespeech_tpu_index.json"))
    ds2 = L.LibriSpeech(cfg)
    assert len(ds2) == 1 and ds2[0][1] == "keep me"


def test_missing_subset_error_mentions_download(tmp_path):
    with pytest.raises(FileNotFoundError, match="download=True"):
        L.LibriSpeech(LibriSpeechConfig(
            subsets=(LibriSpeechSubset.DEV_CLEAN,),
            data_dir=str(tmp_path)))


def _build_archive(tmp_path, subset="dev-clean"):
    """Build <tmp>/stage/LibriSpeech/<subset>/... and tar it like OpenSLR."""
    stage = tmp_path / "stage"
    _make_subset_tree(str(stage / "LibriSpeech"), subset,
                      [(3, 4, 1, 1600, "downloaded utt")])
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    archive = data_dir / f"{subset}.tar.gz"
    with tarfile.open(archive, "w:gz") as tar:
        tar.add(stage / "LibriSpeech", arcname="LibriSpeech")
    return str(data_dir), str(archive)


def test_download_extracts_preplaced_archive(tmp_path, monkeypatch):
    """An archive already at <data_dir>/<subset>.tar.gz is verified and
    extracted without touching the network (the out-of-band path the
    error message advertises)."""
    data_dir, archive = _build_archive(tmp_path)
    md5 = hashlib.md5(open(archive, "rb").read()).hexdigest()
    monkeypatch.setitem(L._MD5, "dev-clean", md5)
    dest = L.download_subset("dev-clean", data_dir)
    assert os.path.isdir(dest)
    ds = L.LibriSpeech(LibriSpeechConfig(
        subsets=(LibriSpeechSubset.DEV_CLEAN,), data_dir=data_dir,
        download=True))
    assert len(ds) == 1 and ds[0][1] == "downloaded utt"


def test_download_md5_mismatch_raises(tmp_path, monkeypatch):
    data_dir, _ = _build_archive(tmp_path)
    monkeypatch.setitem(L._MD5, "dev-clean", "0" * 32)
    with pytest.raises(RuntimeError, match="MD5 mismatch"):
        L.download_subset("dev-clean", data_dir)


def test_download_network_failure_is_actionable(tmp_path, monkeypatch):
    monkeypatch.setattr(L, "_OPENSLR_URL",
                        "file:///nonexistent/{subset}.tar.gz")
    with pytest.raises(RuntimeError, match="out of band"):
        L.download_subset("dev-clean", str(tmp_path))


def test_download_idempotent_on_existing_tree(tmp_path):
    root = str(tmp_path)
    _make_subset_tree(root, "dev-clean", [(1, 2, 3, 1600, "x")])
    # Existing subset dir: no archive needed, returns in place.
    assert L.download_subset("dev-clean", root) == \
        os.path.join(root, "dev-clean")
