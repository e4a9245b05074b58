"""Alphabet round-trip tests (mirrors reference tests/data/test_alphabet.py)."""

import numpy as np
import pytest

from myrtlespeech_tpu.data.alphabet import Alphabet


def test_round_trip():
    a = Alphabet(" abc'")
    assert len(a) == 5
    s = "a cab"
    idx = a.get_indices(s)
    assert a.get_symbols(idx) == s
    assert a.get_index("a") == 1
    assert a.get_symbol(0) == " "
    assert "b" in a and "z" not in a


def test_duplicate_rejected():
    with pytest.raises(ValueError):
        Alphabet("aa")


def test_oov_raises():
    a = Alphabet("ab")
    with pytest.raises(KeyError):
        a.get_indices("abc")


def test_encode_pads():
    a = Alphabet("ab")
    out = a.encode("ba", 5)
    np.testing.assert_array_equal(out, [1, 0, 0, 0, 0])
    with pytest.raises(ValueError):
        a.encode("aaa", 2)
