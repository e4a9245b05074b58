"""Fused joint-tail kernel vs the lax reference program (interpret mode).

``joint_tail_blank_emit(fp, gp, w2, b2, labels)`` must equal
``blank_emit_from_logits(act(fp[:, :, None] + gp[:, None]) @ w2 + b2)``
— values AND gradients w.r.t. every input — without ever materialising
the ``(B, T, U+1, ·)`` tensors.  Tests run the kernel with
``mxu_dtype='float32'`` so the comparison is exact (production uses
bf16, same as the full path's ``nn.Dense(dtype=bf16)``).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from myrtlespeech_tpu.ops.pallas.joint_kernel import (joint_tail_blank_emit,
                                                      joint_tail_supported)
from myrtlespeech_tpu.ops.rnnt import (blank_emit_from_logits,
                                       rnnt_log_likelihood_from_blank_emit)


def _act(a, act, clip=20.0):
    if act == "relu":
        return jnp.maximum(a, 0.0)
    if act == "hardtanh":
        return jnp.clip(a, 0.0, clip)
    return a


def _ref(fp, gp, w2, b2, labels, blank, act):
    """The unfused program the kernel must reproduce."""
    h = _act(fp[:, :, None, :] + gp[:, None, :, :], act)
    logits = h @ w2 + b2
    return blank_emit_from_logits(logits, labels, blank)


def _case(B=3, T=7, U=4, K=16, V=11, seed=0):
    rng = np.random.default_rng(seed)
    fp = jnp.asarray(rng.standard_normal((B, T, K)).astype(np.float32))
    gp = jnp.asarray(rng.standard_normal((B, U + 1, K)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((K, V)).astype(np.float32) * 0.3)
    b2 = jnp.asarray(rng.standard_normal((V,)).astype(np.float32) * 0.1)
    labels = jnp.asarray(rng.integers(1, V, (B, U)).astype(np.int32))
    return fp, gp, w2, b2, labels


@pytest.mark.parametrize("act", ["relu", "hardtanh", "identity"])
@pytest.mark.parametrize("blank", [0])
def test_forward_matches_reference(act, blank):
    fp, gp, w2, b2, labels = _case(seed=hash(act) % 100)
    with pltpu.force_tpu_interpret_mode():
        lpb, lpe = joint_tail_blank_emit(fp, gp, w2, b2, labels, blank,
                                         act, 20.0, 0, "float32")
    rb, re_ = _ref(fp, gp, w2, b2, labels, blank, act)
    np.testing.assert_allclose(np.asarray(lpb), np.asarray(rb),
                               rtol=1e-5, atol=1e-5)
    # lp_emit's final (u = U) column is unused garbage in both paths ONLY
    # when labels pad differently; both use label 0 there, so compare all.
    np.testing.assert_allclose(np.asarray(lpe), np.asarray(re_),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "B,T,U,K,V",
    [
        (1, 3, 2, 8, 5),     # tiny, everything unaligned
        (9, 10, 7, 16, 29),  # B > slab, U+1 = 8 exactly, ASR-like V
        (4, 16, 8, 32, 33),  # T multiple of TT, U+1=9 needs padding
    ])
def test_forward_shapes(B, T, U, K, V):
    fp, gp, w2, b2, labels = _case(B, T, U, K, V, seed=B * 7 + V)
    with pltpu.force_tpu_interpret_mode():
        lpb, lpe = joint_tail_blank_emit(fp, gp, w2, b2, labels, 0,
                                         "relu", 20.0, 0, "float32")
    rb, re_ = _ref(fp, gp, w2, b2, labels, 0, "relu")
    assert lpb.shape == (B, T, U + 1)
    np.testing.assert_allclose(np.asarray(lpb), np.asarray(rb),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lpe), np.asarray(re_),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("act", ["relu", "hardtanh", "identity"])
def test_gradients_match_reference(act):
    fp, gp, w2, b2, labels = _case(B=3, T=6, U=4, K=16, V=11,
                                   seed=42 + len(act))
    # Weighted sums exercise non-uniform cotangents on both outputs.
    rng = np.random.default_rng(9)
    wb = jnp.asarray(rng.standard_normal((3, 6, 5)).astype(np.float32))
    we = jnp.asarray(rng.standard_normal((3, 6, 5)).astype(np.float32))

    def loss_kernel(fp, gp, w2, b2):
        lpb, lpe = joint_tail_blank_emit(fp, gp, w2, b2, labels, 0,
                                         act, 20.0, 0, "float32")
        return jnp.sum(lpb * wb) + jnp.sum(lpe * we)

    def loss_ref(fp, gp, w2, b2):
        rb, re_ = _ref(fp, gp, w2, b2, labels, 0, act)
        return jnp.sum(rb * wb) + jnp.sum(re_ * we)

    with pltpu.force_tpu_interpret_mode():
        g_k = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(fp, gp, w2, b2)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(fp, gp, w2, b2)
    for ours, ref, name in zip(g_k, g_r, ["dfp", "dgp", "dw2", "db2"]):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_full_transducer_loss_through_kernel():
    """Kernel front + lattice == full-logits lax loss, values and grads."""
    B, T, U, K, V = 2, 6, 4, 16, 7
    fp, gp, w2, b2, labels = _case(B, T, U, K, V, seed=5)
    rng = np.random.default_rng(6)
    f_lens = jnp.asarray(rng.integers(2, T + 1, B).astype(np.int32))
    l_lens = jnp.asarray(rng.integers(0, U + 1, B).astype(np.int32))

    def nll_kernel(fp, gp, w2, b2):
        lpb, lpe = joint_tail_blank_emit(fp, gp, w2, b2, labels, 0,
                                         "relu", 20.0, 0, "float32")
        ll = rnnt_log_likelihood_from_blank_emit(lpb, lpe, f_lens, l_lens)
        return -jnp.mean(ll)

    def nll_ref(fp, gp, w2, b2):
        rb, re_ = _ref(fp, gp, w2, b2, labels, 0, "relu")
        ll = rnnt_log_likelihood_from_blank_emit(rb, re_, f_lens, l_lens)
        return -jnp.mean(ll)

    with pltpu.force_tpu_interpret_mode():
        v_k, g_k = jax.value_and_grad(nll_kernel, argnums=(0, 1, 2, 3))(
            fp, gp, w2, b2)
    v_r, g_r = jax.value_and_grad(nll_ref, argnums=(0, 1, 2, 3))(
        fp, gp, w2, b2)
    np.testing.assert_allclose(float(v_k), float(v_r), rtol=1e-5)
    for ours, ref in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_supported_gate():
    assert joint_tail_supported("relu", 1, 0.0, True)
    assert joint_tail_supported("hardtanh", 1, 0.0, False)
    assert not joint_tail_supported("relu", 2, 0.0, True)   # deep tail
    assert not joint_tail_supported("relu", 1, 0.1, True)   # train dropout
    assert joint_tail_supported("relu", 1, 0.1, False)      # eval: no drop
    assert not joint_tail_supported("gelu", 1, 0.0, True)   # unknown act
