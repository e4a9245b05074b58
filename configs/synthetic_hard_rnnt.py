"""RNN-T on the HARD corpus — a committed NEGATIVE result (from scratch).

configs/synthetic_rnnt.py on the HARD corpus: 20 simulated speakers
(per-speaker formant warps; eval on 5 held-out speakers), random channel
filters, 3x noise (0.15).

**Do not expect this recipe to converge from scratch.**  Measured
round 3: training from random init at this noise level collapses into
the classic transducer degenerate mode — the prediction net dominates
the joint, the model emits a fixed string, loss plateaus ~27 and
held-out WER stays ~1.0 for 30+ epochs.  The recipe is kept (a) as the
reproduction of that negative result — evidence the accuracy benchmark
detects real failures — and (b) as the shared base config for the
recipes that DO work on this corpus family:

- ``synthetic_medium_rnnt.py``: same corpus at noise 0.05, converges
  from scratch (committed WER curve in benchmarks/data/rnnt_medium/).
- ``synthetic_hard_rnnt_ft.py``: THIS corpus at noise 0.15, converges
  when warm-started from the medium checkpoint (curriculum via
  ``--init_from``).

    # reproduce the negative result (burns ~30 epochs of chip time):
    python -m myrtlespeech_tpu.run.cli --config configs/synthetic_hard_rnnt.py \
        --checkpoint_dir /tmp/syn_hard_rnnt
"""

from myrtlespeech_tpu.config.schema import (
    Activation, AdamConfig, CosineAnnealingLRConfig, FullyConnectedConfig,
    MFCCConfig, PreProcessStepConfig, RNNConfig, RNNTBeamDecoderConfig,
    RNNTConfig, RNNTEncoderConfig, RNNTJointNetConfig, RNNTLossConfig,
    RNNTPredictNetConfig, SpecAugmentConfig, SpeechToTextConfig,
    StageSelector, StandardizeConfig, SyntheticSpeechConfig, TaskConfig,
    TrainConfig,
)

ALPHABET = "_ abcdefghijklmnopqrstuvwxyz"  # blank at 0

_HARD = dict(
    n_speakers=20, speaker_holdout=0.25, formant_spread=1.0,
    channel_filter=True, noise_level=0.15,
)

task_config = TaskConfig(
    speech_to_text=SpeechToTextConfig(
        alphabet=ALPHABET,
        pre_process_steps=(
            PreProcessStepConfig(MFCCConfig(n_mels=64, log_mel_only=True)),
            PreProcessStepConfig(StandardizeConfig()),
            PreProcessStepConfig(
                SpecAugmentConfig(feature_mask=12, time_mask=30,
                                  n_feature_masks=2, n_time_masks=2),
                stage=StageSelector.TRAIN),
        ),
        model=RNNTConfig(
            encoder=RNNTEncoderConfig(
                rnn1=RNNConfig(hidden_size=256, num_layers=2,
                               forget_gate_bias=1.0),
                time_reduction_factor=2,
                rnn2=RNNConfig(hidden_size=256, num_layers=2,
                               forget_gate_bias=1.0)),
            prediction=RNNTPredictNetConfig(
                embedding_dim=128,
                rnn=RNNConfig(hidden_size=128, num_layers=1,
                              forget_gate_bias=1.0)),
            joint=RNNTJointNetConfig(
                activation=Activation.RELU,
                fc=FullyConnectedConfig(num_hidden_layers=1, hidden_size=256,
                                        activation=Activation.RELU)),
        ),
        # Fused joint+loss keeps the long buckets inside single-chip HBM.
        loss=RNNTLossConfig(blank_index=0, fused_chunk_size=32),
        post_process=RNNTBeamDecoderConfig(blank_index=0, beam_width=8,
                                           length_norm=True,
                                           max_symbols_per_step=8),
    ),
    train_config=TrainConfig(
        batch_size=32, epochs=48,
        optimizer=AdamConfig(learning_rate=7e-4),
        lr_scheduler=CosineAnnealingLRConfig(t_max_epochs=48),
        lr_warmup_steps=500, grad_clip_norm=5.0,
        audio_bucket_growth=1.7, label_bucket=64),
    train_dataset=SyntheticSpeechConfig(dataset_len=4096, split="train",
                                        **_HARD),
    eval_dataset=SyntheticSpeechConfig(dataset_len=256, split="eval",
                                       **_HARD),
)
