"""RNN-T 960h multi-host recipe (BASELINE.json config 5).

Same model as configs/rnn_t_960_beam.py; run with the sharded trainer:

    python -m myrtlespeech_tpu.run.cli --config configs/rnn_t_960_multihost.py

On a pod slice, launch one process per host (jax.distributed auto-inits on
TPU); the train step shards batches over the ``data`` mesh axis (DCN+ICI
psum for gradients) and encoder gate/joint matrices over ``model`` (ICI).
See myrtlespeech_tpu/parallel/.  MESH_MODEL below sets the model-axis size;
the data axis takes the remaining chips.
"""

from configs.rnn_t_960_beam import task_config as _base
from myrtlespeech_tpu.config.schema import replace

MESH_MODEL = 2  # TP degree over ICI; data-parallel over remaining chips

task_config = replace(
    _base,
    train_config=replace(_base.train_config, batch_size=256),
)
