"""Activation functions matching the reference's ``activation.proto`` surface.

HARDTANH here is the DS-style clipped ReLU ``min(max(x, 0), 20)`` — the
form the reference's DS1/DS2 builders instantiate (``relu_clip`` = 20).
"""

from __future__ import annotations

import jax.numpy as jnp

from myrtlespeech_tpu.config.schema import Activation


def apply_activation(act: Activation, x, clip: float = 20.0):
    if act is Activation.IDENTITY:
        return x
    if act is Activation.RELU:
        return jnp.maximum(x, 0)
    if act is Activation.HARDTANH:
        return jnp.clip(x, 0.0, clip)
    raise ValueError(f"unknown activation {act}")
