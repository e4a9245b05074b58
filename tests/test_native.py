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
