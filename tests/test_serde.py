"""Config serialisation round-trip tests."""

import os

import pytest

from myrtlespeech_tpu.config import schema as S
from myrtlespeech_tpu.config.serde import from_dict, load, save_json, to_dict


def test_round_trip_default():
    cfg = S.TaskConfig()
    assert from_dict(to_dict(cfg)) == cfg


def test_round_trip_rnnt():
    cfg = S.TaskConfig(
        speech_to_text=S.SpeechToTextConfig(
            model=S.RNNTConfig(), loss=S.RNNTLossConfig(),
            post_process=S.RNNTBeamDecoderConfig(beam_width=12,
                                                 length_norm=True),
            pre_process_steps=(
                S.PreProcessStepConfig(S.MFCCConfig(n_mels=64)),
                S.PreProcessStepConfig(S.SpecAugmentConfig(),
                                       stage=S.StageSelector.TRAIN),
            )))
    assert from_dict(to_dict(cfg)) == cfg


def test_json_file_round_trip(tmp_path):
    cfg = S.TaskConfig()
    p = str(tmp_path / "cfg.json")
    save_json(cfg, p)
    assert load(p) == cfg


def test_py_config_load():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load(os.path.join(root, "configs", "ctc_tiny_fake.py"))
    assert isinstance(cfg, S.TaskConfig)
    assert isinstance(cfg.speech_to_text.model, S.DeepSpeech2Config)


def test_all_example_configs_load_and_validate():
    from myrtlespeech_tpu.builders.build import validate
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_dir = os.path.join(root, "configs")
    count = 0
    for fn in sorted(os.listdir(cfg_dir)):
        if fn.endswith(".py"):
            cfg = load(os.path.join(cfg_dir, fn))
            validate(cfg.speech_to_text)
            count += 1
    assert count >= 3


def test_bad_extension():
    with pytest.raises(ValueError):
        load("config.yaml")


def test_round_trip_synthetic_dataset():
    from myrtlespeech_tpu.config.schema import (SyntheticSpeechConfig,
                                                TaskConfig, replace)
    cfg = replace(TaskConfig(),
                  train_dataset=SyntheticSpeechConfig(split="train"),
                  eval_dataset=SyntheticSpeechConfig(split="eval",
                                                     dataset_len=7))
    assert from_dict(to_dict(cfg)) == cfg
