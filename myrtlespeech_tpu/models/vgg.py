"""VGG-style conv frontend (reference ``model/vgg.py``).

torchvision-style cfgs A/B built from 3x3 stride-1 SAME convs (+ optional
BN) with 2x2 max-pools between blocks; ``use_output_from_block`` truncates
the stack.  Operates on ``(B, T, F)`` viewed as an NHWC image with time as
the first spatial dim, masked past each sequence's length.
"""

from __future__ import annotations

from typing import Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from myrtlespeech_tpu.config.schema import VGGCfg, VGGConfig
from myrtlespeech_tpu.ops import masking

# torchvision cfgs: ints = conv out-channels, "M" = 2x2 max-pool.
_CFGS = {
    VGGCfg.A: (64, "M", 128, "M", 256, 256, "M", 512, 512, "M",
               512, 512, "M"),
    VGGCfg.B: (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
               512, 512, "M"),
}


def _truncate(cfg: Tuple[Union[int, str], ...], n_blocks: int):
    out, blocks = [], 0
    for item in cfg:
        out.append(item)
        if item == "M":
            blocks += 1
            if blocks == n_blocks:
                return tuple(out)
    return tuple(out)


class VGG(nn.Module):
    cfg: VGGConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, lengths, train: bool = False):
        layers = _truncate(_CFGS[self.cfg.vgg_cfg],
                           self.cfg.use_output_from_block)
        y = x[..., None]  # (B, T, F, 1)
        for item in layers:
            if item == "M":
                y = nn.max_pool(y, (2, 2), strides=(2, 2))
                lengths = lengths // 2
            else:
                y = masking.mask_sequence(y, lengths, time_axis=1)
                y = nn.Conv(item, (3, 3), padding="SAME", dtype=self.dtype,
                            param_dtype=jnp.float32)(y.astype(self.dtype))
                if self.cfg.batch_norm:
                    y = nn.BatchNorm(use_running_average=not train,
                                     dtype=self.dtype,
                                     param_dtype=jnp.float32)(y)
                y = jnp.maximum(y, 0)
        y = masking.mask_sequence(y, lengths, time_axis=1)
        B, T, F, C = y.shape
        return y.reshape(B, T, F * C), lengths


def vgg_output_size(cfg: VGGConfig, in_features: int) -> int:
    """Static output feature size of :class:`VGG` for ``in_features`` mels."""
    layers = _truncate(_CFGS[cfg.vgg_cfg], cfg.use_output_from_block)
    f, c = in_features, 1
    for item in layers:
        if item == "M":
            f = f // 2
        else:
            c = item
    return f * c
