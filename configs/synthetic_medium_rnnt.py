"""RNN-T accuracy benchmark on the MEDIUM synthetic corpus (VERDICT r3 #1).

Same held-out-speaker + random-channel-filter corpus as
``synthetic_hard_rnnt.py`` but at noise 0.05 instead of 0.15.  Round 3
showed the transducer *does* learn this corpus — the 24-epoch pilot broke
through at epoch ~20 (WER 1.0 -> 0.68, still falling steeply) exactly as
its cosine schedule expired — so this recipe is the same trajectory with a
64-epoch schedule, long enough to converge.  Held-out-speaker WER is the
committed transducer accuracy benchmark; the curve and per-epoch CSV live
in ``benchmarks/data/rnnt_medium/`` and docs/performance.md.

This recipe is also stage 1 of the hard-corpus curriculum: fine-tune at
noise 0.15 with ``--init_from`` (see ``synthetic_hard_rnnt_ft.py``).

    python -m myrtlespeech_tpu.run.cli --config configs/synthetic_medium_rnnt.py \
        --checkpoint_dir /tmp/rnnt_med --log_dir /tmp/rnnt_med_logs

Reference anchor: plays the role of the reference's RNN-T LibriSpeech
recipe (``src/myrtlespeech/configs/rnn_t_en.config``, SURVEY §2.8) while
the sandbox has no egress for real speech.
"""

from myrtlespeech_tpu.config import schema as S
from configs.synthetic_hard_rnnt import task_config as _hard

task_config = S.replace(
    _hard,
    train_dataset=S.replace(_hard.train_dataset, noise_level=0.05),
    eval_dataset=S.replace(_hard.eval_dataset, noise_level=0.05),
    train_config=S.replace(
        _hard.train_config, epochs=64,
        lr_scheduler=S.CosineAnnealingLRConfig(t_max_epochs=64)),
)
