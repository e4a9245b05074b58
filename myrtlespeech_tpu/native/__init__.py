"""ctypes bindings for the native host-side runtime (C++).

Builds lazily on first use if the shared library is missing and a compiler
is available; falls back cleanly (callers catch ImportError/OSError and use
pure Python — see ``myrtlespeech_tpu/decoding/wer.py``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libmyrtle_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.edit_distance_batch_i32.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
    lib.edit_distance_batch_i32.restype = None
    _lib = lib
    return lib


def _flatten(seqs: List[Sequence[int]]):
    offsets = np.zeros(len(seqs) + 1, np.int64)
    for i, s in enumerate(seqs):
        offsets[i + 1] = offsets[i] + len(s)
    flat = np.fromiter((t for s in seqs for t in s), np.int32,
                       count=int(offsets[-1]))
    return flat, offsets


def edit_distance_batch(refs: List[Sequence], hyps: List[Sequence]
                        ) -> List[int]:
    """Batched edit distance over token sequences (any hashable tokens)."""
    lib = _load()
    # Intern arbitrary tokens to int32 ids.
    vocab = {}
    def ids(seq):
        out = []
        for t in seq:
            if t not in vocab:
                vocab[t] = len(vocab)
            out.append(vocab[t])
        return out

    r_flat, r_off = _flatten([ids(r) for r in refs])
    h_flat, h_off = _flatten([ids(h) for h in hyps])
    n = len(refs)
    out = np.zeros(n, np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    # Guard against zero-size arrays (ctypes rejects NULL-able casts).
    r_flat = np.ascontiguousarray(r_flat) if r_flat.size else np.zeros(1, np.int32)
    h_flat = np.ascontiguousarray(h_flat) if h_flat.size else np.zeros(1, np.int32)
    lib.edit_distance_batch_i32(
        r_flat.ctypes.data_as(i32p), r_off.ctypes.data_as(i64p),
        h_flat.ctypes.data_as(i32p), h_off.ctypes.data_as(i64p),
        ctypes.c_int64(n), out.ctypes.data_as(i32p))
    return out.tolist()
