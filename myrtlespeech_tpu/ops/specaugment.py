"""SpecAugment (Park et al. 2019) as a pure, jittable on-device op.

TPU-native replacement for the reference's host-side ``SpecAugment``
preprocessing step (``src/myrtlespeech/data/preprocess.py``).  Runs inside
the jitted train step on batched features using masking arithmetic only —
no dynamic shapes, no host RNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mask_axis(rng, x, axis_len: int, max_width: int, n_masks: int, axis: int):
    """Apply ``n_masks`` random contiguous zero-masks along ``axis``."""
    B = x.shape[0]
    keys = jax.random.split(rng, 2)
    # widths in [0, max_width], starts in [0, axis_len - width]
    widths = jax.random.randint(keys[0], (B, n_masks), 0, max_width + 1)
    starts = jax.random.randint(keys[1], (B, n_masks), 0,
                                jnp.maximum(axis_len - widths, 1))
    pos = jnp.arange(axis_len)  # (L,)
    # inside[b, m, l] = starts <= l < starts + width
    inside = (pos[None, None, :] >= starts[:, :, None]) & \
             (pos[None, None, :] < (starts + widths)[:, :, None])
    keep = ~jnp.any(inside, axis=1)  # (B, L)
    shape = [1] * x.ndim
    shape[0] = B
    shape[axis] = axis_len
    return x * keep.reshape(shape).astype(x.dtype)


def spec_augment(rng, feats, frame_lens, *, feature_mask: int = 27,
                 time_mask: int = 100, n_feature_masks: int = 2,
                 n_time_masks: int = 2, time_mask_ratio: float = 1.0):
    """Apply SpecAugment time/frequency masking.

    Args:
      rng: PRNG key.
      feats: ``(B, T, F)`` features.
      frame_lens: ``(B,)`` valid frame counts (time masks are capped to a
        fraction of each utterance's true length).

    Returns masked features ``(B, T, F)``.
    """
    B, T, F = feats.shape
    k_f, k_t, k_w = jax.random.split(rng, 3)

    out = _mask_axis(k_f, feats, F, feature_mask, n_feature_masks, axis=2)

    # Time masks: width capped at min(time_mask, ratio * true_len) per row.
    cap = jnp.minimum(
        jnp.asarray(time_mask, jnp.int32),
        (time_mask_ratio * frame_lens.astype(jnp.float32)).astype(jnp.int32))
    widths = jax.random.randint(k_w, (B, n_time_masks), 0, 2 ** 30)
    widths = widths % (cap[:, None] + 1)
    starts = jax.random.randint(k_t, (B, n_time_masks), 0, 2 ** 30)
    starts = starts % jnp.maximum(frame_lens[:, None] - widths, 1)
    pos = jnp.arange(T)
    inside = (pos[None, None, :] >= starts[:, :, None]) & \
             (pos[None, None, :] < (starts + widths)[:, :, None])
    keep = ~jnp.any(inside, axis=1)  # (B, T)
    return out * keep[:, :, None].astype(feats.dtype)
