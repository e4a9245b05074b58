"""Hard-corpus RNN-T FROM SCRATCH + prediction-net embedding dropout.

The measured round-3/4 result: from-scratch training on the hard corpus
(noise 0.15) collapses into prediction-net domination (fixed emitted
string, WER ~1.0 for 30+ epochs; see ``synthetic_hard_rnnt.py``), and
the committed fix was a curriculum (medium -> hard fine-tune, WER 9.3%).
The round-4 verdict's challenge (VERDICT r4 missing #6): the diagnosis
points directly at standard mitigations nobody A/B'd.  This recipe is
that A/B — identical to the degenerate ``synthetic_hard_rnnt.py`` except
``embedding_dropout=0.3`` on the prediction net (per-token masking, the
anti-domination regularizer), 32-epoch cosine schedule.

    python -m myrtlespeech_tpu.run.cli --config \
        configs/synthetic_hard_rnnt_preddrop.py \
        --checkpoint_dir /tmp/r5/preddrop_ckpt --log_dir /tmp/r5/preddrop_logs

Outcome (either direction) is committed to benchmarks/data/ and
docs/performance.md: converges -> the curriculum was unnecessary;
still degenerates -> the curriculum is a measured decision, not a
workaround.
"""

from myrtlespeech_tpu.config import schema as S
from configs.synthetic_hard_rnnt import task_config as _hard

task_config = S.replace(
    _hard,
    speech_to_text=S.replace(
        _hard.speech_to_text,
        model=S.replace(
            _hard.speech_to_text.model,
            prediction=S.replace(_hard.speech_to_text.model.prediction,
                                 embedding_dropout=0.3)),
    ),
    train_config=S.replace(
        _hard.train_config, epochs=32,
        lr_scheduler=S.CosineAnnealingLRConfig(t_max_epochs=32)),
)
