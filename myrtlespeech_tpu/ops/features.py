"""On-device audio feature extraction: STFT, log-mel filterbank, MFCC.

TPU-native replacement for the reference's torchaudio-based preprocessing
(``src/myrtlespeech/data/preprocess.py :: MFCC`` backed by C++/ATen FFT).
Instead of computing features in forked DataLoader workers on the host, the
whole chain — framing, windowing, rFFT, mel projection, log, DCT — runs
batched on the TPU inside the jitted step:

  waveform (B, S) -> frames (B, T, n_fft) -> |rFFT|^2 -> mel (matmul, MXU)
  -> log -> [DCT matmul] -> features (B, T, F)

Everything is shape-static so XLA can fuse; the mel projection and DCT are
matrices so they ride the MXU.  Frame-level sequence lengths are derived from
sample counts with the same formulas used by torchaudio (center=True STFT).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel(f):
    """HTK mel scale (matches torchaudio's default ``mel_scale='htk'``)."""
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def mel_filterbank(n_mels: int, n_fft: int, sample_rate: int,
                   f_min: float = 0.0, f_max: Optional[float] = None
                   ) -> np.ndarray:
    """Triangular mel filterbank matrix ``(n_fft // 2 + 1, n_mels)``.

    Matches torchaudio.functional.melscale_fbanks (HTK scale, no norm).
    """
    f_max = f_max if f_max is not None else sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=None)
def dct_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    """Orthonormal DCT-II matrix ``(n_mels, n_mfcc)`` (torchaudio 'ortho')."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)
    dct = np.cos(math.pi / n_mels * (n[:, None] + 0.5) * k[None, :])
    dct *= math.sqrt(2.0 / n_mels)
    dct[:, 0] *= 1.0 / math.sqrt(2.0)
    return dct.astype(np.float32)


@functools.lru_cache(maxsize=None)
def hann_window(win_length: int, n_fft: int) -> np.ndarray:
    """Periodic Hann window zero-padded symmetrically to ``n_fft``."""
    w = 0.5 - 0.5 * np.cos(2.0 * math.pi * np.arange(win_length) / win_length)
    pad = n_fft - win_length
    left = pad // 2
    out = np.zeros((n_fft,), dtype=np.float32)
    out[left:left + win_length] = w
    return out


def frame_signal(x, n_fft: int, hop: int):
    """``(B, S) -> (B, T, n_fft)`` frames with center reflect padding.

    T = S // hop + 1 (torchaudio center=True convention).

    The gather formulation below is a measured decision (round 5): an
    alternative with static strided slices of a 32-sample-chunked view
    (16 slices + concat, no gather) profiled ~1.45x SLOWER on device
    (0.99 vs 0.68 ms per B=32/5 s feature call) — XLA fuses this gather
    into the windowing fusion, while the slice/concat variant
    materialises 16 copies.  See docs/performance.md "Round 5:
    features".
    """
    B, S = x.shape
    pad = n_fft // 2
    n_frames = S // hop + 1
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    idx = (jnp.arange(n_frames) * hop)[:, None] + jnp.arange(n_fft)[None, :]
    return x[:, idx]  # (B, T, n_fft)


@functools.lru_cache(maxsize=None)
def _dft_matrices(n_fft: int):
    """Real-DFT as two real matrices ``(n_fft, n_fft//2+1)`` (cos, -sin)."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * math.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def stft_power(x, n_fft: int, hop: int, win_length: int,
               use_dft_matmul: Optional[bool] = None):
    """Power spectrogram ``(B, S) -> (B, T, n_fft//2+1)`` (fp32).

    On TPU the rFFT is computed as two real matmuls against cached DFT
    matrices — for feature-extraction sizes (n_fft <= 1024) this maps the
    whole transform onto the MXU and fuses with the windowing, instead of
    XLA's generic FFT decomposition.  Set ``use_dft_matmul=False`` to force
    ``jnp.fft.rfft`` (CPU default).
    """
    frames = frame_signal(x.astype(jnp.float32), n_fft, hop)
    win = jnp.asarray(hann_window(win_length, n_fft))
    windowed = frames * win
    if use_dft_matmul is None:
        use_dft_matmul = jax.default_backend() == "tpu"
    if use_dft_matmul:
        cos_m, nsin_m = _dft_matrices(n_fft)
        re = jnp.einsum("btn,nk->btk", windowed, jnp.asarray(cos_m))
        im = jnp.einsum("btn,nk->btk", windowed, jnp.asarray(nsin_m))
        return (re ** 2 + im ** 2).astype(jnp.float32)
    spec = jnp.fft.rfft(windowed, n=n_fft, axis=-1)
    return (spec.real ** 2 + spec.imag ** 2).astype(jnp.float32)


def num_frames(sample_lens, hop: int):
    """Frame-level lengths from sample-level lengths (center=True)."""
    return sample_lens // hop + 1


def log_mel_spectrogram(x, sample_lens, *, sample_rate: int = 16000,
                        n_fft: int = 512, win_length: int = 400,
                        hop_length: int = 160, n_mels: int = 80,
                        eps: float = 1e-10):
    """Batched log-mel features.

    Args:
      x: ``(B, S)`` waveform (any float dtype; computed in fp32).
      sample_lens: ``(B,)`` valid sample counts.

    Returns:
      ``(features (B, T, n_mels) fp32, frame_lens (B,) int32)``.
    """
    # Zero samples past each utterance's length BEFORE framing: boundary
    # frames (t <= len//hop) read up to n_fft/2 samples beyond ``len``,
    # and features must be a pure function of the valid samples (the
    # padding-content-invariance contract; equals the zero-padded collate
    # numerics exactly).
    B, S = x.shape
    x = jnp.where(jnp.arange(S)[None, :] < sample_lens[:, None], x, 0.0)
    power = stft_power(x, n_fft, hop_length, win_length)
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft, sample_rate))
    mel = jnp.einsum("btf,fm->btm", power, fb)
    feats = jnp.log(mel + eps)
    return feats, num_frames(sample_lens, hop_length).astype(jnp.int32)


def mfcc(x, sample_lens, *, sample_rate: int = 16000, n_fft: int = 512,
         win_length: int = 400, hop_length: int = 160, n_mels: int = 80,
         n_mfcc: int = 80, eps: float = 1e-10):
    """Batched MFCC: log-mel followed by orthonormal DCT-II (matmul)."""
    logmel, frame_lens = log_mel_spectrogram(
        x, sample_lens, sample_rate=sample_rate, n_fft=n_fft,
        win_length=win_length, hop_length=hop_length, n_mels=n_mels, eps=eps)
    dct = jnp.asarray(dct_matrix(n_mfcc, n_mels))
    return jnp.einsum("btm,mk->btk", logmel, dct), frame_lens


def standardize(feats, frame_lens, eps: float = 1e-5):
    """Per-utterance mean/variance normalisation over valid frames.

    TPU-native version of the reference's ``Standardize`` step: statistics
    are computed only over non-padding frames via masking.
    """
    B, T, F = feats.shape
    mask = (jnp.arange(T)[None, :] < frame_lens[:, None]).astype(feats.dtype)
    n = jnp.maximum(frame_lens.astype(feats.dtype), 1.0)[:, None] * F
    m = mask[:, :, None]
    mean = jnp.sum(feats * m, axis=(1, 2), keepdims=True) / n[:, :, None]
    var = jnp.sum(((feats - mean) * m) ** 2, axis=(1, 2), keepdims=True) \
        / n[:, :, None]
    out = (feats - mean) * jax.lax.rsqrt(var + eps)
    return out * m


def add_context_frames(feats, n_context: int):
    """DS1-style context stacking: concat +/- n_context neighbouring frames.

    ``(B, T, F) -> (B, T, F * (2*n_context + 1))``.  Padding frames beyond
    the sequence edge are zeros (same as reference's edge behaviour).
    """
    B, T, F = feats.shape
    padded = jnp.pad(feats, ((0, 0), (n_context, n_context), (0, 0)))
    ctx = [padded[:, i:i + T, :] for i in range(2 * n_context + 1)]
    return jnp.concatenate(ctx, axis=-1)
