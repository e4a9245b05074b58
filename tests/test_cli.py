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
    reports = json.loads(out[out.rindex("{\n"):])
    assert "train_mean_loss" in reports and "wer" in reports
    assert (tmp_path / "logs" / "metrics.csv").exists()


_MESH_CFG = """\
from myrtlespeech_tpu.config.schema import *
task_config = TaskConfig(
    speech_to_text=SpeechToTextConfig(
        alphabet="_ abcdefghijklmnopqrstuvwxyz'",
        pre_process_steps=(
            PreProcessStepConfig(MFCCConfig(n_mels=16, log_mel_only=True)),),
        model=RNNTConfig(
            encoder=RNNTEncoderConfig(
                rnn1=RNNConfig(hidden_size=16, num_layers=1),
                time_reduction_factor=2,
                rnn2=RNNConfig(hidden_size=16, num_layers=1)),
            prediction=RNNTPredictNetConfig(
                embedding_dim=8, rnn=RNNConfig(hidden_size=8, num_layers=1)),
            joint=RNNTJointNetConfig(
                fc=FullyConnectedConfig(num_hidden_layers=1, hidden_size=16,
                                        activation=Activation.RELU))),
        loss=RNNTLossConfig(blank_index=0),
        post_process=RNNTGreedyDecoderConfig(blank_index=0)),
    train_config=TrainConfig(batch_size=8, epochs=1, mesh_model=2,
                             optimizer=AdamConfig(learning_rate=1e-3)),
    train_dataset=FakeSpeechToTextConfig(
        dataset_len=8, audio_ms=IntRange(100, 200),
        label_symbols='ab ', label_len=IntRange(1, 4)),
    eval_dataset=FakeSpeechToTextConfig(
        dataset_len=8, audio_ms=IntRange(100, 200),
        label_symbols='ab ', label_len=IntRange(1, 4), seed=1),
)
"""


def test_cli_trains_sharded_on_mesh(tmp_path, capsys):
    """The flagship multi-host path (BASELINE config 5 shape, VERDICT r1
    #1): the CLI trains an RNN-T with mesh_model=2 on the virtual
    8-device mesh — DP over ``data``, TP-2 over ``model`` — through the
    same fit() code path as single-chip, including a sharded eval."""
    import jax

    assert len(jax.devices()) == 8  # conftest virtual mesh
    p = tmp_path / "mesh_cfg.py"
    p.write_text(_MESH_CFG)
    rc = main(["--config", str(p), "--max_batches", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    reports = json.loads(out[out.rindex("{\n"):])
    assert "train_mean_loss" in reports and "wer" in reports
    import math
    assert math.isfinite(float(reports["train_mean_loss"]))


def test_cli_eval_only(cfg_path, tmp_path, capsys):
    """--eval_only restores the checkpoint and runs one decoding eval
    pass (WER reported), without training or writing new checkpoints."""
    ckpt = str(tmp_path / "ck")
    assert main(["--config", cfg_path, "--checkpoint_dir", ckpt,
                 "--epochs", "1", "--no_decode"]) == 0
    capsys.readouterr()
    from myrtlespeech_tpu.run.checkpoint import CheckpointManager
    step = CheckpointManager(ckpt).latest_step()

    assert main(["--config", cfg_path, "--checkpoint_dir", ckpt,
                 "--resume", "--eval_only"]) == 0
    out = capsys.readouterr().out
    reports = json.loads(out[out.rindex("{\n"):])
    assert "wer" in reports and "eval_mean_loss" in reports
    assert "train_mean_loss" not in reports
    assert CheckpointManager(ckpt).latest_step() == step  # nothing saved


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
