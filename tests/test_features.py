"""Feature-extraction tests: STFT/log-mel/MFCC invariants + numpy oracle.

The reference computes MFCC via torchaudio (C++/ATen); torchaudio is not
available here so the oracle is a direct numpy STFT/mel implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from myrtlespeech_tpu.ops import features
from myrtlespeech_tpu.ops.specaugment import spec_augment


def np_log_mel(x, n_fft, hop, win_length, n_mels, sr, eps=1e-10):
    pad = n_fft // 2
    xp = np.pad(x, ((pad, pad),), mode="reflect")
    n_frames = len(x) // hop + 1
    win = features.hann_window(win_length, n_fft)
    out = np.zeros((n_frames, n_fft // 2 + 1))
    for t in range(n_frames):
        fr = xp[t * hop:t * hop + n_fft] * win
        sp = np.fft.rfft(fr, n=n_fft)
        out[t] = np.abs(sp) ** 2
    fb = features.mel_filterbank(n_mels, n_fft, sr)
    return np.log(out @ fb + eps)


def test_log_mel_matches_numpy():
    rng = np.random.default_rng(0)
    sr, n_fft, hop, win, n_mels = 16000, 256, 80, 200, 23
    x = rng.standard_normal((2, 1600)).astype(np.float32)
    lens = np.array([1600, 800], np.int32)
    feats, flens = features.log_mel_spectrogram(
        jnp.asarray(x), jnp.asarray(lens), sample_rate=sr, n_fft=n_fft,
        win_length=win, hop_length=hop, n_mels=n_mels)
    assert feats.shape == (2, 1600 // hop + 1, n_mels)
    np.testing.assert_array_equal(np.asarray(flens), [21, 11])
    ref = np_log_mel(x[0], n_fft, hop, win, n_mels, sr)
    np.testing.assert_allclose(np.asarray(feats[0]), ref, rtol=1e-3,
                               atol=1e-3)


def test_sinusoid_lands_in_right_mel_bin():
    sr, n_fft = 16000, 512
    t = np.arange(sr, dtype=np.float32) / sr
    x = np.sin(2 * np.pi * 1000.0 * t)[None, :]  # 1 kHz tone
    feats, _ = features.log_mel_spectrogram(
        jnp.asarray(x), jnp.asarray([sr]), n_fft=n_fft, n_mels=40)
    mean_spec = np.asarray(feats[0]).mean(axis=0)
    peak_mel = mean_spec.argmax()
    # 1 kHz in HTK mel = 999.98 ≈ mel bin at ~1000/4000 of the scale.
    centers = features.mel_to_hz(
        np.linspace(features.hz_to_mel(0), features.hz_to_mel(sr / 2), 42))
    assert abs(centers[peak_mel + 1] - 1000.0) < 150.0


def test_mfcc_shape_and_dct():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 3200)).astype(np.float32)
    lens = np.array([3200, 1600, 100], np.int32)
    out, flens = features.mfcc(jnp.asarray(x), jnp.asarray(lens),
                               n_mfcc=13, n_mels=40, n_fft=256,
                               win_length=256, hop_length=160)
    assert out.shape == (3, 21, 13)
    # DCT matrix is orthonormal in the 'ortho' sense: D^T D = I when square.
    d = features.dct_matrix(40, 40)
    np.testing.assert_allclose(d.T @ d, np.eye(40), atol=1e-5)


def test_standardize_masks_padding():
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.standard_normal((2, 10, 4)).astype(np.float32))
    lens = jnp.asarray(np.array([10, 5], np.int32))
    out = features.standardize(feats, lens)
    o = np.asarray(out)
    # valid region ~ zero mean / unit var
    assert abs(o[0].mean()) < 1e-4
    assert abs(o[1, :5].mean()) < 1e-4
    assert abs(o[1, :5].std() - 1.0) < 1e-2
    # padding zeroed
    assert np.all(o[1, 5:] == 0)


def test_add_context_frames():
    feats = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)
    out = features.add_context_frames(feats, 2)
    assert out.shape == (2, 4, 15)
    # centre block of each frame equals the original frame
    np.testing.assert_array_equal(np.asarray(out[:, :, 6:9]),
                                  np.asarray(feats))
    # first frame's left context is zero-padded
    assert np.all(np.asarray(out[0, 0, :6]) == 0)


def test_spec_augment_masks_and_preserves():
    rng = np.random.default_rng(3)
    feats = jnp.asarray(np.abs(rng.standard_normal((4, 50, 20))) + 1.0)
    lens = jnp.asarray(np.array([50, 40, 30, 20], np.int32))
    out = spec_augment(jax.random.PRNGKey(0), feats, lens,
                       feature_mask=5, time_mask=10)
    o = np.asarray(out)
    assert o.shape == feats.shape
    # masking only zeroes, never alters surviving values
    surviving = o != 0
    np.testing.assert_allclose(o[surviving], np.asarray(feats)[surviving])
    # something was masked with these settings
    assert (o == 0).sum() > 0


def test_dft_matmul_matches_fft():
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 1600)).astype(np.float32))
    a = features.stft_power(x, 256, 80, 200, use_dft_matmul=True)
    b = features.stft_power(x, 256, 80, 200, use_dft_matmul=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                               atol=1e-3)


def test_log_mel_pad_invariance():
    """Features for an utterance are identical whatever padding follows it
    (the masked framing cannot leak) — frames fully inside the valid
    region must match bit-for-bit between a padded and a longer batch."""
    rng = np.random.default_rng(5)
    wav = rng.standard_normal(3200).astype(np.float32)
    pad1 = np.concatenate([wav, np.zeros(800, np.float32)])
    pad2 = np.concatenate([wav, 9.0 * np.ones(2400, np.float32)])
    lens = jnp.asarray([3200], jnp.int32)
    f1, l1 = features.log_mel_spectrogram(jnp.asarray(pad1[None]), lens,
                                   sample_rate=16000, n_fft=512,
                                   win_length=400, hop_length=160, n_mels=16)
    f2, l2 = features.log_mel_spectrogram(jnp.asarray(pad2[None]), lens,
                                   sample_rate=16000, n_fft=512,
                                   win_length=400, hop_length=160, n_mels=16)
    assert int(l1[0]) == int(l2[0])
    n = int(l1[0])
    np.testing.assert_array_equal(np.asarray(f1[0, :n]),
                                  np.asarray(f2[0, :n]))
