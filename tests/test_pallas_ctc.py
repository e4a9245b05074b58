"""Pallas CTC lattice kernels vs pure-lax + torch (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from myrtlespeech_tpu.ops.ctc import ctc_loss
from myrtlespeech_tpu.ops.pallas.ctc_kernel import ctc_loss_pallas


def _case(B=4, T=9, U=4, V=6, seed=0):
    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    logit_lens = jnp.asarray(rng.integers(max(3, U + 1), T + 1, B)
                             .astype(np.int32))
    labels = jnp.asarray(rng.integers(1, V, (B, U)).astype(np.int32))
    label_lens = jnp.asarray(
        np.minimum(rng.integers(0, U + 1, B),
                   np.asarray(logit_lens) // 2).astype(np.int32))
    return logits, logit_lens, labels, label_lens


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_forward_matches_lax(seed):
    args = _case(seed=seed)
    with pltpu.force_tpu_interpret_mode():
        ours = ctc_loss_pallas(*args, reduction="none")
    ref = ctc_loss(*args, reduction="none")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_repeated_labels_skip_rule():
    rng = np.random.default_rng(3)
    B, T, V = 2, 10, 5
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    labels = jnp.asarray(np.array([[1, 1, 2, 2], [3, 3, 3, 3]], np.int32))
    tl = jnp.asarray([10, 9], dtype=jnp.int32)
    ll = jnp.asarray([4, 4], dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        ours = ctc_loss_pallas(logits, tl, labels, ll, reduction="none")
    ref = ctc_loss(logits, tl, labels, ll, reduction="none")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_lax():
    logits, logit_lens, labels, label_lens = _case(seed=4)

    def f_pallas(x):
        return ctc_loss_pallas(x, logit_lens, labels, label_lens,
                               reduction="sum")

    def f_lax(x):
        return ctc_loss(x, logit_lens, labels, label_lens, reduction="sum")

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(f_pallas)(logits)
    gl = jax.grad(f_lax)(logits)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gl),
                               rtol=1e-4, atol=1e-5)


def test_zero_length_targets_and_blank_index():
    rng = np.random.default_rng(5)
    B, T, U, V = 3, 8, 3, 5
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    tl = jnp.asarray([8, 6, 5], dtype=jnp.int32)
    labels = jnp.asarray(rng.integers(0, V - 1, (B, U)).astype(np.int32))
    ll = jnp.asarray([3, 0, 2], dtype=jnp.int32)
    blank = V - 1
    with pltpu.force_tpu_interpret_mode():
        ours = ctc_loss_pallas(logits, tl, labels, ll, blank_index=blank,
                               reduction="none")
    ref = ctc_loss(logits, tl, labels, ll, blank_index=blank,
                   reduction="none")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("B", [20])
def test_slab_tiling_matches_lax(B):
    """B > 8 runs through the batch-slab wrapper (incl. a ragged slab at
    B=20); values and gradients must still match the lax lattice."""
    args = _case(B=B, seed=7)
    with pltpu.force_tpu_interpret_mode():
        ours = ctc_loss_pallas(*args, reduction="none")
        g_ours = jax.grad(
            lambda lg: ctc_loss_pallas(lg, *args[1:], reduction="sum")
        )(args[0])
    ref = ctc_loss(*args, reduction="none")
    g_ref = jax.grad(
        lambda lg: ctc_loss(lg, *args[1:], reduction="sum"))(args[0])
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
