"""Sequence-length bookkeeping: masks and conv output-length formulas.

This module is the TPU-native home of the reference's sequence-length
contract (``src/myrtlespeech/model/cnn.py :: out_lens`` and the per-module
``(x, seq_lens)`` tuple convention).  In this framework every batched
sequence tensor is a *padded dense array* accompanied by an int32 ``lengths``
array; modules never see Python-level variable shapes (XLA needs static
shapes), they mask instead.

Conventions
-----------
- Batch-major activations: ``(B, T, ...)``; lengths: ``(B,)`` int32.
- ``lengths[b]`` counts valid leading frames of row ``b``; frames at
  ``t >= lengths[b]`` are padding and must not influence results.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sequence_mask(lengths, max_len: int, dtype=jnp.bool_):
    """``(B,) -> (B, max_len)`` mask; True where ``t < lengths[b]``."""
    t = jnp.arange(max_len, dtype=jnp.int32)
    return (t[None, :] < lengths[:, None]).astype(dtype)


def mask_sequence(x, lengths, time_axis: int = 1, value=0.0):
    """Zero (or fill) padded positions of ``x`` along ``time_axis``.

    ``x``: any array whose ``time_axis`` dim is T and dim 0 is B.
    """
    T = x.shape[time_axis]
    mask = sequence_mask(lengths, T)  # (B, T)
    shape = [1] * x.ndim
    shape[0] = x.shape[0]
    shape[time_axis] = T
    mask = mask.reshape(shape)
    return jnp.where(mask, x, jnp.asarray(value, dtype=x.dtype))


def conv_out_size(in_size, kernel: int, stride: int = 1, padding: int = 0,
                  dilation: int = 1):
    """Output spatial size of a strided convolution.

    Same formula as the reference's ``cnn.py::out_lens`` (standard conv
    arithmetic): ``floor((in + 2*pad - dilation*(kernel-1) - 1)/stride + 1)``.
    Works on Python ints, numpy arrays and jnp arrays (for traced lengths).
    """
    numer = in_size + 2 * padding - dilation * (kernel - 1) - 1
    if isinstance(in_size, (int, np.integer)):
        return int(np.floor(numer / stride) + 1)
    return (numer // stride + 1).astype(jnp.int32) if hasattr(numer, "astype") \
        else numer // stride + 1


def same_padding(kernel: int, dilation: int = 1) -> int:
    """Symmetric padding that keeps size for stride-1 (``SAME``-ish).

    For even effective kernels this is the floor; combined with
    :func:`conv_out_size` it reproduces the reference's SAME behaviour for
    odd kernels (the common case: 11, 21, 41).
    """
    return (dilation * (kernel - 1)) // 2


def time_reduction_out_lens(lengths, factor: int):
    """Output lengths after stacking ``factor`` consecutive frames (ceil)."""
    return (lengths + factor - 1) // factor
