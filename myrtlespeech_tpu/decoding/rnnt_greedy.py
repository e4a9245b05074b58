"""Batched on-device RNN-T greedy decoding.

The reference decodes per utterance with nested Python loops and one tiny
GPU call per (t, symbol) step — O(B*T*U) host round-trips
(``src/myrtlespeech/post_process/rnn_t_greedy_decoder.py``, SURVEY.md §3.4
"the reference's biggest perf pathology").  Here the whole batch decodes in
ONE ``lax.while_loop`` on device:

- state holds a per-row time cursor ``t``, the prediction-net feature ``g``
  and RNN state, the emitted-token buffer and counts;
- every iteration evaluates the joint for all rows at their current
  ``(t, g)``, then each row either *emits* (append symbol, advance
  prediction net) or *advances time* — rows are masked independently, so
  no host sync and no per-utterance Python;
- ``max_symbols_per_step`` bounds consecutive emissions exactly as the
  reference does, and also bounds the loop trip count statically.

The decoder is model-agnostic: it takes closures for ``joint_step`` and
``predict_step`` (built from flax ``apply`` in the builders).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def rnnt_greedy_decode(
    f,  # (B, T, H_enc) encoder output
    f_lens,  # (B,)
    predict_step: Callable,  # (token (B,), state) -> (g (B, H_pred), state)
    joint_step: Callable,  # (f_t (B, H_enc), g (B, H_pred)) -> (B, V) logits
    init_state,  # prediction-net state pytree for batch B
    *,
    blank_index: int,
    max_symbols_per_step: int = 30,
    max_output_len: int = 200,
):
    """Greedy transducer decode for a whole batch on device.

    Returns ``(tokens (B, max_output_len) int32, token_lens (B,) int32)``.
    """
    B, T, _ = f.shape
    U = max_output_len

    g0, state0 = predict_step(jnp.full((B,), -1, jnp.int32), init_state)

    def cond(carry):
        t, *_ = carry
        return jnp.any(t < f_lens)

    def body(carry):
        t, emitted, g, state, out, out_len = carry
        t_safe = jnp.minimum(t, T - 1)
        f_t = jnp.take_along_axis(f, t_safe[:, None, None], axis=1)[:, 0, :]
        logits = joint_step(f_t, g)  # (B, V)
        k = jnp.argmax(logits, axis=-1).astype(jnp.int32)

        active = t < f_lens
        full = out_len >= U
        emit = active & (k != blank_index) & (emitted < max_symbols_per_step) \
            & ~full

        # Append for emitting rows.
        b_idx = jnp.arange(B)
        pos = jnp.where(emit, out_len, U)  # non-emitting -> dropped
        out = out.at[b_idx, pos].set(k, mode="drop")
        out_len = out_len + emit.astype(jnp.int32)

        # Advance prediction net for emitting rows only.
        new_g, new_state = predict_step(k, state)
        sel = emit[:, None]
        g = jnp.where(sel, new_g, g)
        state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(
                emit.reshape((B,) + (1,) * (n.ndim - 1)), n, o),
            new_state, state)

        # Non-emitting active rows advance time; emission counter resets.
        advance = active & ~emit
        t = t + advance.astype(jnp.int32)
        emitted = jnp.where(emit, emitted + 1, 0)
        return t, emitted, g, state, out, out_len

    t0 = jnp.zeros((B,), jnp.int32)
    out0 = jnp.zeros((B, U), jnp.int32)
    carry = (t0, t0, g0, state0, out0, t0)
    *_, out, out_len = jax.lax.while_loop(cond, body, carry)
    return out, out_len
