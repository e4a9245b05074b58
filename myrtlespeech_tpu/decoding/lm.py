"""Character-bigram language model for CTC prefix beam search.

The reference's ``src/myrtlespeech/post_process/ctc_beam_decoder.py ::
CTCBeamDecoder`` exposes an optional LM weighting (``alpha`` on LM
probabilities, ``beta`` on word counts, Hannun 2014 eq. 2).  Its LM is an
external binary scored per prefix on the host; that design is a dead end on
TPU — per-prefix host callbacks would put O(B*T*W) round-trips back on the
hot path that the device beam search exists to remove.

The TPU-native form is a *dense* LM: a ``(V+1, V)`` log-probability matrix
``lm[prev, next]`` (row ``V`` = sentence start) that lives in device memory
and is scored with one gather inside the beam-search scan
(``decoding/ctc_beam.py``), adding zero host traffic.  A char-bigram model
is exactly what fits this shape; higher-order LMs can be distilled into it
or applied in a host-side rescoring pass over the returned beam.

This module estimates, saves and loads such matrices.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np

from myrtlespeech_tpu.data.alphabet import Alphabet

#: Row index used for the sentence-start context (no previous character).
START = -1


def estimate_bigram_lm(
    transcripts: Iterable[str],
    alphabet: Alphabet,
    *,
    smoothing: float = 1.0,
    blank_index: Optional[int] = None,
    vocab_size: Optional[int] = None,
) -> np.ndarray:
    """Estimate a ``(V+1, V)`` char-bigram log-prob matrix from text.

    Add-``smoothing`` (Laplace) estimate of ``log p(next | prev)`` over the
    alphabet.  ``V`` defaults to ``len(alphabet)`` but should be the model's
    vocab size (``builders.build.vocab_size``), which may exceed the
    alphabet by a dedicated blank row; row ``V`` is the sentence-start
    distribution.  The ``blank_index`` column gets (near) -inf mass — blank
    is never a real "next character" (the beam search only scores the LM on
    non-blank extensions anyway, so this is belt-and-braces).

    Returns float32; rows normalise over the V columns.
    """
    V = vocab_size or len(alphabet)
    if V < len(alphabet):
        raise ValueError(f"vocab_size {V} < alphabet size {len(alphabet)}")
    counts = np.full((V + 1, V), float(smoothing), np.float64)
    # Non-alphabet columns (e.g. a dedicated blank row past the alphabet)
    # carry no linguistic mass.
    counts[:, len(alphabet):] = 1e-20
    for line in transcripts:
        prev = START
        for ch in line:
            if ch not in alphabet:
                # Out-of-alphabet characters break the context (the
                # transcript cleaner should have removed them; be lenient
                # here so estimation works on raw text).
                prev = START
                continue
            cur = alphabet.get_index(ch)
            counts[prev if prev >= 0 else V, cur] += 1.0
            prev = cur
    if blank_index is not None and 0 <= blank_index < V:
        counts[:, blank_index] = 1e-20
    mat = np.log(counts / counts.sum(axis=1, keepdims=True))
    return mat.astype(np.float32)


def save_bigram_lm(path: str, lm: np.ndarray) -> None:
    """Save an LM matrix produced by :func:`estimate_bigram_lm` (.npy)."""
    lm = np.asarray(lm, np.float32)
    if lm.ndim != 2 or lm.shape[0] != lm.shape[1] + 1:
        raise ValueError(f"expected (V+1, V) matrix, got {lm.shape}")
    np.save(path, lm)


def load_bigram_lm(path: str, *, vocab_size: Optional[int] = None) -> np.ndarray:
    """Load a ``(V+1, V)`` LM matrix, validating shape against the vocab."""
    lm = np.load(path)
    if lm.ndim != 2 or lm.shape[0] != lm.shape[1] + 1:
        raise ValueError(f"{path}: expected (V+1, V) matrix, got {lm.shape}")
    if vocab_size is not None and lm.shape[1] != vocab_size:
        raise ValueError(
            f"{path}: LM vocab {lm.shape[1]} != model vocab {vocab_size}")
    return lm.astype(np.float32)
