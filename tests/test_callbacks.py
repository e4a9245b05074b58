"""Callback system unit tests (reference ``tests/run/`` callback coverage:
hook ordering, state threading, and each callback's reporting semantics —
all pure host-side, no jit)."""

import csv
import math
import os

import numpy as np
import pytest

from myrtlespeech_tpu.run import callbacks as C
from myrtlespeech_tpu.run.callbacks import CallbackHandler, Stage


class _Recorder(C.Callback):
    def __init__(self):
        self.calls = []

    def __getattribute__(self, name):
        if name.startswith("on_"):
            def hook(ts, _name=name):
                self.calls.append(_name)
            return hook
        return object.__getattribute__(self, name)


def _drive(handler, n_train=2, n_eval=1, metrics=None):
    metrics = metrics or {"loss": 1.0}
    handler.on_train_begin()
    handler.on_epoch_begin(0)
    handler.on_stage_begin(Stage.TRAIN)
    for _ in range(n_train):
        handler.on_batch_begin({"wav_lens": np.asarray([16000, 8000])})
        handler.on_batch_end(dict(metrics))
    handler.on_stage_end()
    handler.on_stage_begin(Stage.EVAL)
    for _ in range(n_eval):
        handler.on_batch_begin({"texts": ["a b"], "n_real": 1})
        handler.on_batch_end(dict(metrics))
    handler.on_stage_end()
    handler.on_epoch_end()
    handler.on_train_end()


def test_hook_order_and_state_threading():
    rec = _Recorder()
    h = CallbackHandler([rec])
    _drive(h, n_train=2, n_eval=1)
    assert rec.calls[0] == "on_train_begin" and rec.calls[-1] == "on_train_end"
    assert rec.calls.count("on_batch_end") == 3
    # Train-stage steps counted; eval steps not.
    assert h.state["step"] == 2
    assert h.state["epoch"] == 0


def test_stop_epoch_after_counts_within_stage():
    h = CallbackHandler([C.StopEpochAfter(1)])
    h.on_train_begin(); h.on_epoch_begin(0); h.on_stage_begin(Stage.TRAIN)
    h.on_batch_begin({}); h.on_batch_end({"loss": 0.0})
    assert h.state["stop_epoch"] is True
    # A new stage resets the batch index, so eval still runs.
    h.on_stage_begin(Stage.EVAL)
    assert h.state["batch_index"] == 0


def test_report_mean_batch_loss_math():
    h = CallbackHandler([C.ReportMeanBatchLoss()])
    h.on_train_begin(); h.on_epoch_begin(0); h.on_stage_begin(Stage.TRAIN)
    for v in (1.0, 2.0, 6.0):
        h.on_batch_begin({}); h.on_batch_end({"loss": v})
    h.on_stage_end()
    assert math.isclose(h.state["reports"]["train_mean_loss"], 3.0)


def test_throughput_monitor_accumulates_audio_seconds():
    h = CallbackHandler([C.ThroughputMonitor(sample_rate=16000)])
    _drive(h, n_train=2, n_eval=0)
    # 2 batches x (16000 + 8000) samples = 3.0 audio-seconds
    rate = h.state["reports"]["train_audio_sec_per_sec"]
    assert rate > 0


def test_csv_logger_rows_and_flush(tmp_path):
    path = str(tmp_path / "m.csv")
    h = CallbackHandler([C.CSVLogger(path)])
    h.on_train_begin(); h.on_epoch_begin(0); h.on_stage_begin(Stage.TRAIN)
    h.on_batch_begin({}); h.on_batch_end({"loss": 1.5, "lr": 0.1})
    # Flushed before train end (tail-able long runs).
    with open(path) as fh:
        lines = fh.read().strip().splitlines()
    assert len(lines) == 2 and lines[0].startswith("step,")
    h.on_train_end()
    row = next(csv.DictReader(open(path)))
    assert float(row["loss"]) == 1.5 and row["stage"] == "train"


def test_csv_logger_epoch_reports_file(tmp_path):
    """Per-epoch reports (wer/cer) land in a sibling *_epochs.csv — the
    machine-readable source for WER-vs-epoch curves."""
    path = str(tmp_path / "m.csv")
    h = CallbackHandler([C.CSVLogger(path)])
    h.on_train_begin()
    for epoch, wer in [(0, 1.0), (1, 0.25)]:
        h.on_epoch_begin(epoch)
        h.on_stage_begin(Stage.TRAIN)
        h.on_batch_begin({}); h.on_batch_end({"loss": 1.0})
        h.state["reports"] = {"wer": wer, "cer": wer / 2,
                              "texts": "not-a-float"}
        h.on_epoch_end()
    h.on_train_end()
    rows = list(csv.DictReader(open(str(tmp_path / "m_epochs.csv"))))
    assert [float(r["wer"]) for r in rows] == [1.0, 0.25]
    assert [int(r["epoch"]) for r in rows] == [0, 1]
    assert "texts" not in rows[0]


def test_report_decoder_wer_detokenises_and_scores():
    from myrtlespeech_tpu.data.alphabet import Alphabet

    al = Alphabet("_ab ")
    cb = C.ReportDecoderWER(al)
    h = CallbackHandler([cb])
    h.on_train_begin(); h.on_epoch_begin(0)
    h.on_stage_begin(Stage.EVAL)
    # Decoded "ab" vs reference "ab" -> WER 0; "a" vs "b" -> WER 1.
    h.on_batch_begin({"texts": ["ab", "b"], "n_real": 2})
    h.on_batch_end({
        "decoded_tokens": np.asarray([[1, 2], [1, 0]]),
        "decoded_lens": np.asarray([2, 1]),
    })
    h.on_stage_end()
    assert math.isclose(h.state["reports"]["wer"], 0.5)
    # CER: refs "ab"+"b" = 3 chars, errors: 0 + 1 sub = 1/3.
    assert math.isclose(h.state["reports"]["cer"], 1 / 3)


def test_report_decoder_wer_respects_n_real():
    from myrtlespeech_tpu.data.alphabet import Alphabet

    al = Alphabet("_ab ")
    cb = C.ReportDecoderWER(al)
    h = CallbackHandler([cb])
    h.on_train_begin(); h.on_epoch_begin(0); h.on_stage_begin(Stage.EVAL)
    # Second row is padding (repeated sample) and must not be scored.
    h.on_batch_begin({"texts": ["ab", "ab"], "n_real": 1})
    h.on_batch_end({
        "decoded_tokens": np.asarray([[1, 2], [9, 9]]),
        "decoded_lens": np.asarray([2, 2]),
    })
    h.on_stage_end()
    assert h.state["reports"]["wer"] == 0.0


def test_checkpoint_callback_cursor_semantics(tmp_path):
    """Cursor: (epoch+1, 0) after a full epoch; (epoch, batch_index) after
    an early stop — drives exact resume."""

    class _FakeMgr:
        def __init__(self):
            self.saves = []

        def save(self, step, state, force=False, *, epoch=0,
                 batch_in_epoch=0):
            self.saves.append((step, epoch, batch_in_epoch))

        def latest_step(self):
            return self.saves[-1][0] if self.saves else None

        def wait(self):
            pass

    from myrtlespeech_tpu.run.checkpoint import CheckpointCallback

    class _State:
        step = 7

    mgr = _FakeMgr()
    cb = CheckpointCallback(mgr)
    h = CallbackHandler([cb])
    h.state["train_state"] = _State()
    h.on_train_begin(); h.on_epoch_begin(3); h.on_stage_begin(Stage.TRAIN)
    h.on_batch_begin({}); h.on_batch_end({"loss": 0.0})
    h.on_stage_end(); h.on_epoch_end()
    assert mgr.saves[-1] == (7, 4, 0)  # full epoch -> next epoch, batch 0

    mgr2 = _FakeMgr()
    cb2 = CheckpointCallback(mgr2)
    h2 = CallbackHandler([cb2, C.StopEpochAfter(1)])
    h2.state["train_state"] = _State()
    h2.on_train_begin(); h2.on_epoch_begin(3); h2.on_stage_begin(Stage.TRAIN)
    h2.on_batch_begin({}); h2.on_batch_end({"loss": 0.0})
    h2.on_stage_end(); h2.on_epoch_end(); h2.on_train_end()
    assert mgr2.saves[-1] == (7, 3, 1)  # mid-epoch -> same epoch, cursor 1
