"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Mirrors the reference's CPU-only CI strategy (tests/ run on CircleCI without
a GPU); here we additionally get 8 virtual devices so pjit/collective code
paths are exercised without a TPU pod — the standard JAX trick
(``--xla_force_host_platform_device_count``).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
