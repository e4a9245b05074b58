"""RNN-T 960h multi-host recipe (BASELINE.json config 5).

Same model as configs/rnn_t_960_beam.py, trained over a ``(data, model)``
device mesh:

    python -m myrtlespeech_tpu.run.cli --config configs/rnn_t_960_multihost.py

On a pod slice, launch one process per host (jax.distributed auto-inits on
TPU; or pass --coordinator/--num_processes/--process_id).  ``fit`` builds
the mesh from ``train_config.mesh_model``: batches shard over ``data``
(DCN+ICI psum for gradients), encoder gate/joint matrices shard over
``model`` (ICI).  See myrtlespeech_tpu/parallel/ and run/train.py::fit.
"""

from configs.rnn_t_960_beam import task_config as _base
from myrtlespeech_tpu.config.schema import replace

task_config = replace(
    _base,
    train_config=replace(_base.train_config, batch_size=256,
                         mesh_model=2),  # TP=2 over ICI; DP over the rest
)
