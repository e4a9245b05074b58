"""Vectorized on-device CTC greedy decoding.

Reference: ``src/myrtlespeech/post_process/ctc_greedy_decoder.py ::
CTCGreedyDecoder`` (argmax -> collapse repeats -> drop blanks), which runs
as host-side Python per utterance.  Here the whole batch decodes inside one
jitted computation: argmax over vocab, a keep-mask (`!= blank`, `!= prev`,
`t < len`), and a scatter-compaction via cumulative sum — no host loops,
no dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ctc_greedy_decode(logits, logit_lens, blank_index: int = 0):
    """Decode ``(B, T, V)`` logits (or log-probs; argmax is invariant).

    Returns ``(tokens (B, T) int32, token_lens (B,) int32)`` where row
    ``b`` holds the decoded label sequence left-aligned, padded with 0.
    """
    B, T, V = logits.shape
    a = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, T)
    prev = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32), a[:, :-1]],
                           axis=1)
    valid = jnp.arange(T)[None, :] < logit_lens[:, None]
    keep = (a != blank_index) & (a != prev) & valid
    # Compact kept tokens to the front of each row.
    pos = jnp.cumsum(keep, axis=1) - 1  # target index where kept
    pos = jnp.where(keep, pos, T)  # dropped -> out-of-range (mode='drop')
    out = jnp.zeros((B, T), jnp.int32)
    b_idx = jnp.arange(B)[:, None]
    out = out.at[b_idx, pos].set(a, mode="drop")
    return out, jnp.sum(keep, axis=1).astype(jnp.int32)
