"""CTC loss numeric cross-check against torch.nn.CTCLoss (CPU oracle).

The reference delegates to ATen/cuDNN CTC; our pure-lax recursion must match
its values and gradients (SURVEY.md §4 carry-over: "numeric cross-checks of
Pallas CTC/transducer kernels vs torch CPU").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from myrtlespeech_tpu.ops.ctc import ctc_loss


def _torch_ctc(logits, logit_lens, labels, label_lens, blank, reduction):
    lp = torch.log_softmax(
        torch.tensor(np.asarray(logits), dtype=torch.float64), dim=-1)
    lp = lp.transpose(0, 1)  # (T, B, V)
    return torch.nn.functional.ctc_loss(
        lp, torch.tensor(np.asarray(labels)),
        torch.tensor(np.asarray(logit_lens)),
        torch.tensor(np.asarray(label_lens)),
        blank=blank, reduction=reduction, zero_infinity=False)


def _rand_case(rng, B=4, T=11, U=5, V=7):
    logits = rng.standard_normal((B, T, U and V)).astype(np.float32) \
        if False else rng.standard_normal((B, T, V)).astype(np.float32)
    logit_lens = rng.integers(max(2, U + 1), T + 1, size=B).astype(np.int32)
    labels = rng.integers(1, V, size=(B, U)).astype(np.int32)
    label_lens = rng.integers(0, U + 1, size=B).astype(np.int32)
    # CTC requires T >= number of repeats-expanded symbols; keep lens modest.
    label_lens = np.minimum(label_lens, logit_lens // 2)
    return logits, logit_lens, labels, label_lens


@pytest.mark.parametrize("reduction", ["none", "sum", "mean"])
def test_matches_torch(reduction):
    rng = np.random.default_rng(0)
    logits, logit_lens, labels, label_lens = _rand_case(rng)
    ours = ctc_loss(jnp.asarray(logits), jnp.asarray(logit_lens),
                    jnp.asarray(labels), jnp.asarray(label_lens),
                    blank_index=0, reduction=reduction)
    ref = _torch_ctc(logits, logit_lens, labels, label_lens, 0, reduction)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4,
                               atol=1e-4)


def test_nonzero_blank_index():
    rng = np.random.default_rng(1)
    B, T, U, V = 3, 9, 3, 6
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    logit_lens = np.array([9, 7, 8], np.int32)
    labels = rng.integers(0, V - 1, size=(B, U)).astype(np.int32)
    label_lens = np.array([3, 2, 0], np.int32)
    blank = V - 1
    ours = ctc_loss(jnp.asarray(logits), jnp.asarray(logit_lens),
                    jnp.asarray(labels), jnp.asarray(label_lens),
                    blank_index=blank, reduction="none")
    ref = _torch_ctc(logits, logit_lens, labels, label_lens, blank, "none")
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4,
                               atol=1e-4)


def test_repeated_labels():
    # Repeats exercise the skip-transition rule (no skip between repeats).
    rng = np.random.default_rng(2)
    B, T, V = 2, 12, 5
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    labels = np.array([[1, 1, 2, 2], [3, 3, 3, 3]], np.int32)
    logit_lens = np.array([12, 12], np.int32)
    label_lens = np.array([4, 4], np.int32)
    ours = ctc_loss(jnp.asarray(logits), jnp.asarray(logit_lens),
                    jnp.asarray(labels), jnp.asarray(label_lens),
                    reduction="none")
    ref = _torch_ctc(logits, logit_lens, labels, label_lens, 0, "none")
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4,
                               atol=1e-4)


def test_gradients_match_torch():
    rng = np.random.default_rng(3)
    logits, logit_lens, labels, label_lens = _rand_case(rng, B=3, T=8, U=3,
                                                        V=5)
    g = jax.grad(lambda x: ctc_loss(x, jnp.asarray(logit_lens),
                                    jnp.asarray(labels),
                                    jnp.asarray(label_lens),
                                    reduction="sum"))(jnp.asarray(logits))
    t_logits = torch.tensor(np.asarray(logits), dtype=torch.float64,
                            requires_grad=True)
    lp = torch.log_softmax(t_logits, dim=-1).transpose(0, 1)
    loss = torch.nn.functional.ctc_loss(
        lp, torch.tensor(labels), torch.tensor(logit_lens),
        torch.tensor(label_lens), blank=0, reduction="sum")
    loss.backward()
    np.testing.assert_allclose(np.asarray(g), t_logits.grad.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_batch_of_one_vs_batched():
    # Reference test-strategy invariance: batched == per-example results.
    rng = np.random.default_rng(4)
    logits, logit_lens, labels, label_lens = _rand_case(rng)
    batched = np.asarray(ctc_loss(
        jnp.asarray(logits), jnp.asarray(logit_lens), jnp.asarray(labels),
        jnp.asarray(label_lens), reduction="none"))
    for b in range(logits.shape[0]):
        single = ctc_loss(jnp.asarray(logits[b:b + 1]),
                          jnp.asarray(logit_lens[b:b + 1]),
                          jnp.asarray(labels[b:b + 1]),
                          jnp.asarray(label_lens[b:b + 1]), reduction="none")
        np.testing.assert_allclose(np.asarray(single)[0], batched[b],
                                   rtol=1e-4, atol=1e-5)


def test_zero_length_target():
    """label_len 0: loss = -sum(log p_blank) over valid frames (matches
    torch CTCLoss with an empty target)."""
    import torch

    rng = np.random.default_rng(9)
    B, T, V = 2, 5, 4
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    logit_lens = np.asarray([5, 3], np.int32)
    labels = np.zeros((B, 2), np.int32)
    label_lens = np.asarray([0, 0], np.int32)

    ours = ctc_loss(jnp.asarray(logits), jnp.asarray(logit_lens),
                    jnp.asarray(labels), jnp.asarray(label_lens),
                    blank_index=0, reduction="none")
    lp = torch.log_softmax(torch.tensor(logits), -1).transpose(0, 1)
    ref = torch.nn.CTCLoss(blank=0, reduction="none")(
        lp, torch.zeros((B, 0), dtype=torch.long),
        torch.tensor(logit_lens), torch.tensor(label_lens))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_length_one_input():
    """T=1 with a single-symbol target: loss = -log p(symbol)."""
    rng = np.random.default_rng(10)
    V = 5
    logits = rng.standard_normal((1, 1, V)).astype(np.float32)
    out = ctc_loss(jnp.asarray(logits), jnp.asarray([1]),
                   jnp.asarray([[2]]), jnp.asarray([1]),
                   blank_index=0, reduction="none")
    lse = np.log(np.exp(logits[0, 0]).sum())
    np.testing.assert_allclose(float(out[0]), lse - logits[0, 0, 2],
                               rtol=1e-5)
