"""myrtlespeech_tpu: TPU-native speech recognition framework.

Full capability surface of MyrtleSoftware/myrtlespeech, re-designed for
JAX/XLA/Pallas on TPU device meshes.  See README.md for the subsystem map.
"""

__version__ = "0.1.0"

from myrtlespeech_tpu.builders.build import Task, build_task  # noqa: F401
from myrtlespeech_tpu.config import schema  # noqa: F401
from myrtlespeech_tpu.config.serde import load as load_config  # noqa: F401
from myrtlespeech_tpu.run.train import fit  # noqa: F401
