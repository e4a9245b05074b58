"""Fused Pallas LSTM kernel vs the lax.scan reference (interpret mode).

On CPU the kernel runs under the Pallas TPU interpreter — numerics-level
validation; performance is exercised on real hardware by bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from myrtlespeech_tpu.ops import rnn as rnn_ops
from myrtlespeech_tpu.ops.pallas.lstm_kernel import (lstm_scan_pallas,
                                                     pallas_lstm_supported)


def _case(T=6, B=8, F=16, H=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((T, B, F)).astype(np.float32) * 0.5)
    lens = jnp.asarray(
        rng.integers(1, T + 1, B).astype(np.int32))
    w_ih = jnp.asarray(rng.standard_normal((F, 4 * H)).astype(np.float32)
                       * 0.2)
    w_hh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32)
                       * 0.2)
    b = jnp.asarray(rng.standard_normal((4 * H,)).astype(np.float32) * 0.1)
    return x, lens, w_ih, w_hh, b


def test_supported_predicate():
    assert pallas_lstm_supported(8, 128)
    assert not pallas_lstm_supported(7, 128)
    assert not pallas_lstm_supported(8, 100)


def test_forward_matches_lax():
    x, lens, w_ih, w_hh, b = _case()
    with pltpu.force_tpu_interpret_mode():
        ys_p, st_p = lstm_scan_pallas(x, lens, w_ih, w_hh, b)
    ys_l, st_l = rnn_ops.lstm_scan(x, lens, w_ih, w_hh, b)
    np.testing.assert_allclose(np.asarray(ys_p, np.float32),
                               np.asarray(ys_l, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(st_p.h), np.asarray(st_l.h),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(st_p.c), np.asarray(st_l.c),
                               rtol=2e-2, atol=2e-2)


def test_reverse_matches_lax():
    x, lens, w_ih, w_hh, b = _case(seed=1)
    with pltpu.force_tpu_interpret_mode():
        ys_p, st_p = lstm_scan_pallas(x, lens, w_ih, w_hh, b, reverse=True)
    ys_l, st_l = rnn_ops.lstm_scan(x, lens, w_ih, w_hh, b, reverse=True)
    np.testing.assert_allclose(np.asarray(ys_p, np.float32),
                               np.asarray(ys_l, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_gradients_match_lax():
    x, lens, w_ih, w_hh, b = _case(T=5, seed=2)

    def loss_pallas(w_hh_, x_):
        ys, st = lstm_scan_pallas(x_, lens, w_ih, w_hh_, b)
        return jnp.sum(ys.astype(jnp.float32) ** 2) + jnp.sum(st.h ** 2)

    def loss_lax(w_hh_, x_):
        ys, st = rnn_ops.lstm_scan(x_, lens, w_ih, w_hh_, b)
        return jnp.sum(ys.astype(jnp.float32) ** 2) + jnp.sum(st.h ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_pallas, argnums=(0, 1))(w_hh, x)
    gl = jax.grad(loss_lax, argnums=(0, 1))(w_hh, x)
    for a, b_ in zip(gp, gl):
        denom = np.abs(np.asarray(b_)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(a) / denom,
                                   np.asarray(b_) / denom,
                                   rtol=5e-2, atol=5e-2)
