"""Pallas transducer lattice kernels vs the pure-lax reference (interpret).

Values AND gradients must match ops.rnnt.rnnt_loss exactly (both fp32
log-space over the same lattice).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from myrtlespeech_tpu.ops.pallas.rnnt_kernel import rnnt_loss_pallas
from myrtlespeech_tpu.ops.rnnt import rnnt_loss


def _case(B=3, T=6, U=4, V=5, seed=0):
    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.standard_normal((B, T, U + 1, V))
                         .astype(np.float32))
    logit_lens = jnp.asarray(rng.integers(2, T + 1, B).astype(np.int32))
    labels = jnp.asarray(rng.integers(1, V, (B, U)).astype(np.int32))
    label_lens = jnp.asarray(rng.integers(0, U + 1, B).astype(np.int32))
    return logits, logit_lens, labels, label_lens


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_forward_matches_lax(seed):
    args = _case(seed=seed)
    with pltpu.force_tpu_interpret_mode():
        ours = rnnt_loss_pallas(*args, reduction="none")
    ref = rnnt_loss(*args, reduction="none")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_full_lengths():
    logits, _, labels, _ = _case(seed=3)
    B, T, U1, V = logits.shape
    tl = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), U1 - 1, jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        ours = rnnt_loss_pallas(logits, tl, labels, ll, reduction="none")
    ref = rnnt_loss(logits, tl, labels, ll, reduction="none")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_lax():
    logits, logit_lens, labels, label_lens = _case(seed=4)

    def f_pallas(x):
        return rnnt_loss_pallas(x, logit_lens, labels, label_lens,
                                reduction="sum")

    def f_lax(x):
        return rnnt_loss(x, logit_lens, labels, label_lens, reduction="sum")

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(f_pallas)(logits)
    gl = jax.grad(f_lax)(logits)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gl),
                               rtol=1e-4, atol=1e-5)


def test_nonzero_blank_and_reductions():
    rng = np.random.default_rng(5)
    B, T, U, V = 2, 4, 2, 6
    logits = jnp.asarray(rng.standard_normal((B, T, U + 1, V))
                         .astype(np.float32))
    tl = jnp.asarray([4, 3], dtype=jnp.int32)
    labels = jnp.asarray(rng.integers(0, V - 1, (B, U)).astype(np.int32))
    ll = jnp.asarray([2, 1], dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        ours = rnnt_loss_pallas(logits, tl, labels, ll, blank_index=V - 1,
                                reduction="mean")
    ref = rnnt_loss(logits, tl, labels, ll, blank_index=V - 1,
                    reduction="mean")
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


@pytest.mark.parametrize("B", [20])
def test_slab_tiling_matches_lax(B):
    """B > 8 runs through the batch-slab wrapper (incl. a ragged slab at
    B=20); values and gradients must still match the lax lattice."""
    args = _case(B=B, seed=7)
    with pltpu.force_tpu_interpret_mode():
        ours = rnnt_loss_pallas(*args, reduction="none")
        g_ours = jax.grad(
            lambda lg: rnnt_loss_pallas(lg, *args[1:], reduction="sum")
        )(args[0])
    ref = rnnt_loss(*args, reduction="none")
    g_ref = jax.grad(
        lambda lg: rnnt_loss(lg, *args[1:], reduction="sum"))(args[0])
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
