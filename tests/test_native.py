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
