"""HBM memory planner for the transducer joint path.

The full-joint RNN-T training step materialises ``(B, T', U+1, H_joint)``
hidden activations and ``(B, T', U+1, V)`` logits (plus their backward
transients) — the framework's memory hot spot (SURVEY.md §3.3; the
reference holds the full logits tensor for warp-transducer, which bounds
its batch size).  On a memory-limited chip this can exhaust HBM, and some
platforms kill the TPU worker instead of raising a clean OOM (observed on
the sandbox v5e, docs/performance.md "Held-out accuracy").

This planner closes that failure mode *automatically*: at trace time —
when the batch/bucket shapes are static Python ints — it projects the
joint path's activation footprint and, if the projection exceeds the
budget, routes that bucket's compilation through the T-chunked fused
joint+loss (``ops/rnnt.py::rnnt_loss_fused``) with the largest chunk that
fits.  Short buckets keep the (faster) full-joint path; only the long
buckets pay the ~12% remat cost (measured A/B in docs/performance.md).

The decision is per compiled shape, deterministic, and overridable:

- ``RNNTLossConfig.fused_chunk_size`` set -> always fused (user choice).
- ``MYRTLE_DISABLE_MEM_PLANNER=1`` -> always full-joint (round-1
  behaviour).
- ``MYRTLE_HBM_BYTES`` -> budget override for testing / other chips.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

_LOG = logging.getLogger(__name__)

# Fraction of the device's HBM the joint activations may claim.  The rest
# holds params/optimizer state (typically < 1 GB for these models), LSTM
# scan residuals (O(B*T*H) — ~0.5 GB at B=32/5 s/H=1024), the feature
# pipeline and XLA scratch.  0.45 is deliberately conservative: the cost
# of a false positive is ~12% step time on long buckets; the cost of a
# false negative is a killed TPU worker.
DEFAULT_FRACTION = 0.45

# Bytes per joint lattice cell, as multiples of element counts:
#   hidden (B,T',U+1,H_j): forward residual (compute dtype) + backward
#   transient + the pre-activation kept for the ReLU/tanh VJP.
_HIDDEN_COPIES = 3
#   logits (B,T',U+1,V): fp32 cast for the loss + d(logits) + one fusion
#   transient.  (The fused blank/emit front keeps no log-softmax copy.)
_LOGIT_COPIES = 3


def hbm_bytes_limit() -> Optional[int]:
    """Per-device HBM budget in bytes, or None when unknown.

    ``MYRTLE_HBM_BYTES`` overrides; otherwise asks the runtime
    (``device.memory_stats()["bytes_limit"]``, available on TPU).
    """
    env = os.environ.get("MYRTLE_HBM_BYTES")
    if env:
        return int(env)
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:  # platform without memory_stats (e.g. CPU)
        stats = None
    if stats and stats.get("bytes_limit"):
        return stats["bytes_limit"]
    if jax.default_backend() == "tpu":
        # Some TPU runtimes (e.g. the sandbox's experimental remote
        # platform) expose no memory_stats; assume the smallest common
        # HBM (v5e, 16 GiB) so the planner still protects the chip.
        return 16 * 2**30
    return None


def joint_activation_bytes(B: int, T: int, U1: int, H_joint: int, V: int,
                           hidden_bytes: int = 2,
                           backward: bool = True) -> int:
    """Projected peak bytes of the full-joint path's big activations."""
    cells = B * T * U1
    h_copies = _HIDDEN_COPIES if backward else 1
    v_copies = _LOGIT_COPIES if backward else 2
    return cells * (h_copies * H_joint * hidden_bytes + v_copies * V * 4)


def plan_transducer_chunk(B: int, T: int, U1: int, H_joint: int, V: int,
                          hidden_bytes: int = 2,
                          backward: bool = True) -> Optional[int]:
    """Return None (full joint fits HBM) or a fused-path T-chunk size.

    All shape args are static Python ints (trace-time).  The chunk is the
    largest multiple of 8 whose projected footprint fits the budget,
    clamped to [8, T].
    """
    if os.environ.get("MYRTLE_DISABLE_MEM_PLANNER"):
        return None
    limit = hbm_bytes_limit()
    if limit is None:
        return None
    budget = int(limit * float(
        os.environ.get("MYRTLE_JOINT_MEM_FRACTION", DEFAULT_FRACTION)))
    need = joint_activation_bytes(B, T, U1, H_joint, V, hidden_bytes,
                                  backward)
    if need <= budget:
        return None
    per_frame = max(1, need // T)
    chunk = max(8, (budget // per_frame) // 8 * 8)
    chunk = min(chunk, T)
    _LOG.info(
        "memory planner: full joint (B=%d, T'=%d, U+1=%d, H_j=%d, V=%d) "
        "projects %.2f GB > %.2f GB budget; using fused joint+loss with "
        "chunk=%d", B, T, U1, H_joint, V, need / 2**30, budget / 2**30,
        chunk)
    return chunk
