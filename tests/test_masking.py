"""Sequence-mask and conv-length formula tests.

Mirrors the reference's dedicated seq-len tests for
``model/cnn.py::out_lens`` (SURVEY.md §4: "the masked-conv length formulas
get dedicated tests").
"""

import jax.numpy as jnp
import numpy as np
import torch

from myrtlespeech_tpu.ops import masking


def test_sequence_mask():
    m = masking.sequence_mask(jnp.array([0, 2, 4]), 4)
    np.testing.assert_array_equal(
        np.asarray(m),
        [[0, 0, 0, 0], [1, 1, 0, 0], [1, 1, 1, 1]])


def test_mask_sequence_zeroes_padding():
    x = jnp.ones((2, 3, 4))
    out = masking.mask_sequence(x, jnp.array([1, 3]))
    assert float(out[0, 0].sum()) == 4.0
    assert float(out[0, 1:].sum()) == 0.0
    assert float(out[1].sum()) == 12.0


def test_conv_out_size_matches_torch():
    rng = np.random.default_rng(0)
    for _ in range(50):
        size = int(rng.integers(1, 100))
        k = int(rng.integers(1, 12))
        s = int(rng.integers(1, 4))
        p = int(rng.integers(0, 6))
        d = int(rng.integers(1, 3))
        expected_len = size + 2 * p - d * (k - 1) - 1
        if expected_len < 0:
            continue
        conv = torch.nn.Conv1d(1, 1, k, stride=s, padding=p, dilation=d)
        out = conv(torch.zeros(1, 1, size)).shape[-1]
        assert masking.conv_out_size(size, k, s, p, d) == out


def test_conv_out_size_traced():
    lens = jnp.array([10, 20, 33])
    out = masking.conv_out_size(lens, kernel=11, stride=2, padding=5)
    ref = [masking.conv_out_size(int(l), 11, 2, 5) for l in [10, 20, 33]]
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_time_reduction_out_lens():
    lens = jnp.array([1, 2, 3, 4, 5])
    np.testing.assert_array_equal(
        np.asarray(masking.time_reduction_out_lens(lens, 2)), [1, 1, 2, 2, 3])
