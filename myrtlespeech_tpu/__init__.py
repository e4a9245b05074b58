"""myrtlespeech_tpu: TPU-native speech recognition framework.

Full capability surface of MyrtleSoftware/myrtlespeech, re-designed for
JAX/XLA/Pallas on TPU device meshes.  See README.md for the subsystem map.

Top-level conveniences (``Task``, ``build_task``, ``schema``,
``load_config``, ``fit``) resolve lazily (PEP 562): importing the package
must not touch jax/jnp, because ``python -m myrtlespeech_tpu.run.cli``
imports it before the CLI can run ``jax.distributed.initialize`` — which
must precede ANY backend-initialising call (multi-host launch, BASELINE
config 5).
"""

__version__ = "0.1.0"

_LAZY = {
    "Task": ("myrtlespeech_tpu.builders.build", "Task"),
    "build_task": ("myrtlespeech_tpu.builders.build", "build_task"),
    "schema": ("myrtlespeech_tpu.config", "schema"),
    "load_config": ("myrtlespeech_tpu.config.serde", "load"),
    "fit": ("myrtlespeech_tpu.run.train", "fit"),
}

__all__ = ["__version__", *_LAZY]


def __getattr__(name: str):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(__all__)
