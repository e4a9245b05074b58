"""Device mesh construction.

The reference has NO distributed layer (single GPU, SURVEY.md §2.11); this
is the new subsystem (§5): one global ``jax.sharding.Mesh`` with axes
``("data", "model")``.  Batches shard over ``data`` (DP; gradient psum
rides ICI/DCN), large gate/joint matrices shard over ``model`` (TP over
ICI).  The same code path serves 1 chip (1x1 mesh) through multi-host pod
slices — collectives are inserted by GSPMD from sharding annotations, never
written by hand in model code.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices.

    ``data=None`` uses all remaining devices after ``model``.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model={model}")
    data = data if data is not None else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init (``jax.distributed.initialize``); no-op single-host.

    On TPU pods all arguments are auto-detected from the environment.
    """
    if num_processes is not None and num_processes > 1 or coordinator:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches: leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
