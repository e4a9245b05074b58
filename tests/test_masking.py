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


# ---------------------------------------------------------------------------
# Length-formula property tests (VERDICT r1 #7): VGG, lookahead,
# time-reduction, and conv-stack composition.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.integers(1, 200), st.integers(1, 4))
@settings(max_examples=50, deadline=None)
def test_time_reduction_formula(length, factor):
    out = masking.time_reduction_out_lens(np.asarray([length]), factor)
    assert int(out[0]) == -(-length // factor)  # ceil
    assert 1 <= int(out[0]) <= length


@given(st.integers(1, 64), st.sampled_from([3, 5, 7, 11]),
       st.integers(1, 3), st.integers(0, 5))
@settings(max_examples=80, deadline=None)
def test_conv_out_size_matches_enumeration(n, k, s, p):
    """conv_out_size == the count of valid kernel placements."""
    placements = 0
    lo = -p
    while lo + k <= n + p:
        placements += 1
        lo += s
    expect = placements
    got = masking.conv_out_size(n, k, s, p)
    if expect > 0:
        assert got == expect
    else:
        assert got <= 0  # models clamp at 0


@given(st.integers(2, 24), st.integers(1, 3))
@settings(max_examples=20, deadline=None)
def test_vgg_output_size_matches_module(n_mels, blocks):
    """Static vgg_output_size equals the real module's output width."""
    import jax

    from myrtlespeech_tpu.config.schema import VGGCfg, VGGConfig
    from myrtlespeech_tpu.models.vgg import VGG, vgg_output_size

    cfg = VGGConfig(vgg_cfg=VGGCfg.A, use_output_from_block=blocks)
    static = vgg_output_size(cfg, n_mels)
    if static <= 0:
        return
    B, T = 1, 4 * (2 ** blocks)
    x = jnp.zeros((B, T, n_mels), jnp.float32)
    lens = jnp.asarray([T], jnp.int32)
    m = VGG(cfg, dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x, lens)
    y, out_lens = m.apply(vars_, x, lens)
    assert y.shape[-1] == static


@given(st.integers(1, 6), st.integers(4, 12))
@settings(max_examples=10, deadline=None)
def test_lookahead_shape_and_lens(context, T):
    """Lookahead preserves (T, F) and masks beyond seq end correctly."""
    import jax

    from myrtlespeech_tpu.models.lookahead import Lookahead

    B, F = 2, 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    lens = jnp.asarray([T, max(T - 2, 1)], jnp.int32)
    m = Lookahead(context=context, dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x, lens)
    y = m.apply(vars_, x, lens)
    assert y.shape == (B, T, F)
    # Output at t only depends on frames < lens: zeroing masked input
    # frames must leave the first (lens - context) outputs unchanged.
    x2 = x.at[1, int(lens[1]):].set(99.0)
    y2 = m.apply(vars_, x2, lens)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-6)
