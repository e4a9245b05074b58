"""CLI end-to-end tests (reference: tests driving run/run.py main).

Runs the real `main()` in-process on the tiny fake-data config, including
checkpoint save + `--resume` continuation.
"""

import json

import pytest

from myrtlespeech_tpu.run.cli import main

_CFG = """\
from myrtlespeech_tpu.config.schema import *
task_config = TaskConfig(
    speech_to_text=SpeechToTextConfig(
        alphabet='_ab', pre_process_steps=(
            PreProcessStepConfig(MFCCConfig(n_mels=8, log_mel_only=True)),),
        model=DeepSpeech1Config(n_hidden=8),
        loss=CTCLossConfig(blank_index=0),
        post_process=CTCGreedyDecoderConfig(blank_index=0)),
    train_config=TrainConfig(batch_size=2, epochs=1,
                             optimizer=AdamConfig(learning_rate=1e-3)),
    train_dataset=FakeSpeechToTextConfig(
        dataset_len=4, audio_ms=IntRange(100, 150),
        label_symbols='ab', label_len=IntRange(1, 3)),
    eval_dataset=FakeSpeechToTextConfig(
        dataset_len=2, audio_ms=IntRange(100, 150),
        label_symbols='ab', label_len=IntRange(1, 3)),
)
"""


@pytest.fixture
def cfg_path(tmp_path):
    p = tmp_path / "cfg.py"
    p.write_text(_CFG)
    return str(p)


def test_cli_trains_and_reports(cfg_path, tmp_path, capsys):
    rc = main(["--config", cfg_path, "--log_dir", str(tmp_path / "logs")])
    assert rc == 0
    out = capsys.readouterr().out
    reports = json.loads(out[out.index("{"):])
    assert "train_mean_loss" in reports and "wer" in reports
    assert (tmp_path / "logs" / "metrics.csv").exists()


def test_cli_checkpoint_and_resume(cfg_path, tmp_path, capsys):
    ckpt = str(tmp_path / "ckpt")
    assert main(["--config", cfg_path, "--checkpoint_dir", ckpt,
                 "--epochs", "1", "--no_decode"]) == 0
    capsys.readouterr()

    from myrtlespeech_tpu.run.checkpoint import CheckpointManager
    step_after_1 = CheckpointManager(ckpt).latest_step()
    assert step_after_1 and step_after_1 >= 1

    # Resume for a second epoch: step must continue past the first run's.
    assert main(["--config", cfg_path, "--checkpoint_dir", ckpt,
                 "--resume", "--epochs", "2", "--no_decode"]) == 0
    out = capsys.readouterr().out
    assert f"resumed from step {step_after_1}" in out
    assert CheckpointManager(ckpt).latest_step() > step_after_1
