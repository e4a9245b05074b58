"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Mirrors the reference's CPU-only CI strategy (its tests/ run on CircleCI
without a GPU); the 8 virtual devices additionally exercise pjit/collective
code paths without a TPU pod (``--xla_force_host_platform_device_count``,
the standard JAX trick).

Environment quirk (TPU sandbox): a ``sitecustomize`` registers the
experimental ``axon`` TPU backend at interpreter start, and a process
started with ``JAX_PLATFORMS=cpu`` in its *environment* hangs inside that
registration.  Selecting CPU via ``jax.config.update`` after import avoids
the hang entirely, so that is the only supported way to force CPU here.
``XLA_FLAGS`` still works from here because backends initialise lazily.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compile cache: the suite is compile-bound (every fit()
# test builds real train/eval graphs), and the same tiny graphs recompile
# on every run and in every xdist worker.  The cache is keyed on HLO +
# flags, so correctness is XLA's problem, not ours; warm runs cut suite
# wall time massively.
import os as _os  # noqa: E402

_cache = _os.environ.get("MYRTLE_TEST_JAX_CACHE",
                         "/tmp/myrtle_test_jax_cache")
# Per-xdist-worker subdirectory: worker names (gw0, gw1, ...) are stable
# across runs, so each worker still hits a warm cache, while concurrent
# read/write of the same cache files between workers (observed once as a
# worker abort mid-run) is impossible.
_cache = _os.path.join(_cache,
                       _os.environ.get("PYTEST_XDIST_WORKER", "main"))
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
