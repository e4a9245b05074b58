"""LibriSpeech dataset reader.

Reference: ``src/myrtlespeech/data/dataset/librispeech.py :: LibriSpeech``
(torch Dataset with download+checksum).  This reader consumes the standard
on-disk layout

    <data_dir>/<subset>/<speaker>/<chapter>/<speaker>-<chapter>-<utt>.{flac,wav}
    <data_dir>/<subset>/<speaker>/<chapter>/<speaker>-<chapter>.trans.txt

Download is intentionally not implemented (no network egress in this
environment); point ``data_dir`` at an existing copy.  FLAC decode uses
``soundfile`` when importable; WAV uses the stdlib.  An index of
``(path, duration, transcript)`` is built once and cached, enabling
duration bucketing and ``max_duration_s`` filtering without touching audio.
"""

from __future__ import annotations

import json
import os
import wave as wave_mod
from typing import List, Optional, Tuple

import numpy as np

from myrtlespeech_tpu.config.schema import LibriSpeechConfig


def _read_wav(path: str) -> Tuple[np.ndarray, int]:
    with wave_mod.open(path, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        raw = f.readframes(n)
        width = f.getsampwidth()
        if width == 2:
            wav = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
        elif width == 4:
            wav = np.frombuffer(raw, np.int32).astype(np.float32) / 2 ** 31
        else:
            raise ValueError(f"unsupported sample width {width} in {path}")
        if f.getnchannels() > 1:
            wav = wav.reshape(-1, f.getnchannels()).mean(axis=1)
    return wav, sr


def _read_audio(path: str) -> Tuple[np.ndarray, int]:
    if path.endswith(".wav"):
        return _read_wav(path)
    try:
        import soundfile  # optional; not present in all sandboxes
    except ImportError as e:
        raise RuntimeError(
            f"reading {path} requires the 'soundfile' package for FLAC; "
            "convert to wav or install soundfile") from e
    wav, sr = soundfile.read(path, dtype="float32")
    if wav.ndim > 1:
        wav = wav.mean(axis=1)
    return wav, sr


class LibriSpeech:
    """Map-style dataset of ``(waveform float32 (S,), transcript str)``."""

    def __init__(self, cfg: LibriSpeechConfig):
        self.cfg = cfg
        self.entries: List[Tuple[str, float, str]] = []
        for subset in cfg.subsets:
            root = os.path.join(cfg.data_dir, subset.value)
            if not os.path.isdir(root):
                raise FileNotFoundError(
                    f"LibriSpeech subset dir not found: {root}")
            self.entries.extend(self._index_subset(root))
        if cfg.max_duration_s is not None:
            self.entries = [e for e in self.entries
                            if e[1] <= cfg.max_duration_s]
        self.entries.sort(key=lambda e: e[0])

    def _index_subset(self, root: str) -> List[Tuple[str, float, str]]:
        cache = os.path.join(root, ".myrtlespeech_tpu_index.json")
        if os.path.exists(cache):
            with open(cache) as f:
                return [tuple(e) for e in json.load(f)]
        entries = []
        for dirpath, _dirnames, filenames in os.walk(root):
            for fn in filenames:
                if not fn.endswith(".trans.txt"):
                    continue
                with open(os.path.join(dirpath, fn)) as f:
                    for line in f:
                        utt_id, _, text = line.strip().partition(" ")
                        for ext in (".flac", ".wav"):
                            p = os.path.join(dirpath, utt_id + ext)
                            if os.path.exists(p):
                                dur = self._duration(p)
                                entries.append((p, dur, text.lower()))
                                break
        try:
            with open(cache, "w") as f:
                json.dump(entries, f)
        except OSError:
            pass  # read-only data dir: just skip the cache
        return entries

    @staticmethod
    def _duration(path: str) -> float:
        if path.endswith(".wav"):
            with wave_mod.open(path, "rb") as f:
                return f.getnframes() / f.getframerate()
        try:
            import soundfile
            info = soundfile.info(path)
            return info.frames / info.samplerate
        except ImportError:
            return 0.0  # unknown; bucketing falls back to decode-time length

    def __len__(self) -> int:
        return len(self.entries)

    def duration_samples(self, index: int, sample_rate: int = 16000) -> int:
        return int(self.entries[index][1] * sample_rate)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, str]:
        path, _dur, text = self.entries[index]
        wav, _sr = _read_audio(path)
        return wav.astype(np.float32), text
