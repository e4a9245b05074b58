"""Callback system for the training loop.

Reference: ``src/myrtlespeech/run/callbacks/callback.py :: Callback,
CallbackHandler`` (fastai-style hooks).  The same hook surface is kept so
reference-style training scripts translate 1:1, with one structural change:
everything between ``on_loss_begin`` and ``on_step_end`` happens *inside*
the jitted train step on device, so those hooks observe (and may not
mutate) the already-computed metrics pytree.  Host-side control decisions
(early stop, logging cadence, checkpointing) live in the hooks that wrap
the step.
"""

from __future__ import annotations

import csv
import enum
import os
import time
from typing import Any, Dict, List, Optional


class Stage(enum.Enum):
    """Reference ``run/stage.py :: Stage``."""

    TRAIN = "train"
    EVAL = "eval"


class Callback:
    """Base callback; subclasses override any subset of hooks.

    ``training_state`` is a mutable dict threaded through all callbacks
    (reference's CallbackHandler state dict): step, epoch, stage, metrics,
    stop flags...
    """

    def on_train_begin(self, ts: Dict[str, Any]) -> None: ...
    def on_train_end(self, ts: Dict[str, Any]) -> None: ...
    def on_epoch_begin(self, ts: Dict[str, Any]) -> None: ...
    def on_epoch_end(self, ts: Dict[str, Any]) -> None: ...
    def on_stage_begin(self, ts: Dict[str, Any]) -> None: ...
    def on_stage_end(self, ts: Dict[str, Any]) -> None: ...
    def on_batch_begin(self, ts: Dict[str, Any]) -> None: ...
    def on_batch_end(self, ts: Dict[str, Any]) -> None: ...


class CallbackHandler:
    """Dispatches hooks; owns the shared training-state dict."""

    def __init__(self, callbacks: List[Callback]):
        self.callbacks = list(callbacks)
        self.state: Dict[str, Any] = {
            "step": 0, "epoch": 0, "stage": Stage.TRAIN,
            "stop_training": False, "stop_epoch": False, "metrics": {},
        }

    def _fire(self, hook: str) -> None:
        for cb in self.callbacks:
            getattr(cb, hook)(self.state)

    def on_train_begin(self): self._fire("on_train_begin")
    def on_train_end(self): self._fire("on_train_end")

    def on_epoch_begin(self, epoch: int):
        self.state["epoch"] = epoch
        self.state["stop_epoch"] = False
        # Fresh report dict per epoch: otherwise an epoch whose eval
        # produced no refs (or skipped decode) would re-log the previous
        # epoch's wer/cer as if freshly measured (ADVICE r3).
        self.state["reports"] = {}
        self._fire("on_epoch_begin")

    def on_epoch_end(self): self._fire("on_epoch_end")

    def on_stage_begin(self, stage: Stage):
        self.state["stage"] = stage
        self.state["batch_index"] = 0
        self._fire("on_stage_begin")

    def on_stage_end(self): self._fire("on_stage_end")

    def on_batch_begin(self, batch) -> None:
        self.state["batch"] = batch
        self._fire("on_batch_begin")

    def on_batch_end(self, metrics: Dict[str, Any]) -> None:
        self.state["metrics"] = metrics
        if self.state["stage"] is Stage.TRAIN:
            self.state["step"] += 1
        self.state["batch_index"] = self.state.get("batch_index", 0) + 1
        self._fire("on_batch_end")


class ReportMeanBatchLoss(Callback):
    """Reference ``callbacks/report_mean_batch_loss.py``: running mean loss
    per stage, reported at stage end into ``ts['reports']``.

    Each batch's (already per-example-masked) loss is weighted by its
    real-row count — the exact corpus-level mean regardless of padded
    remainder chunks — and in multi-process runs the (sum, weight) pair
    is additionally summed across processes, so a 1-process and an
    N-process run of the same config report the identical value even
    when bucket-tail slices leave some hosts with zero real rows.  Every
    process participates in the allgather unconditionally (a host with
    an empty eval shard still has to join the collective, or the others
    deadlock — found by the 2-process rehearsal).
    """

    def on_stage_begin(self, ts):
        self._sum, self._n = 0.0, 0.0

    def on_batch_end(self, ts):
        loss = ts["metrics"].get("loss")
        if loss is None:
            return
        batch = ts.get("batch") or {}
        if "texts" in batch:
            w = float(len(batch["texts"]))
        elif "n_real_local" in batch:
            w = float(batch["n_real_local"])
        elif "n_real" in batch:
            w = float(batch["n_real"])
        else:
            w = 1.0
        self._sum += float(loss) * w
        self._n += w

    def on_stage_end(self, ts):
        import jax
        s, n = self._sum, self._n
        if jax.process_count() > 1:
            import numpy as np
            from jax.experimental import multihost_utils
            agg = multihost_utils.process_allgather(
                np.asarray([s, n], np.float64))
            s, n = float(agg.sum(axis=0)[0]), float(agg.sum(axis=0)[1])
        ts.setdefault("reports", {})[
            f"{ts['stage'].value}_mean_loss"] = s / max(n, 1e-12)


class ReportDecoderWER(Callback):
    """Reference ``callbacks/report_ctc_decoder.py`` (and the transducer
    analogue): accumulate decoded transcripts during EVAL, report WER/CER.

    The actual decoding happens inside the jitted eval step; this callback
    consumes the resulting ``(tokens, token_lens)`` device arrays from the
    metrics dict, detokenizes against the alphabet, and scores.
    """

    def __init__(self, alphabet, log_transcripts: int = 0):
        self.alphabet = alphabet
        self.log_transcripts = log_transcripts

    def on_stage_begin(self, ts):
        if ts["stage"] is Stage.EVAL:
            self.refs: List[str] = []
            self.hyps: List[str] = []

    def on_batch_end(self, ts):
        if ts["stage"] is not Stage.EVAL:
            return
        m = ts["metrics"]
        if "decoded_tokens" not in m:
            return
        import numpy as np
        toks = np.asarray(m["decoded_tokens"])
        lens = np.asarray(m["decoded_lens"])
        texts = ts["batch"].get("texts", [])
        n_real = int(ts["batch"].get("n_real", len(texts)))
        for i in range(min(n_real, len(texts))):
            hyp = self.alphabet.get_symbols(
                [t for t in toks[i, :lens[i]]])
            self.refs.append(texts[i])
            self.hyps.append(hyp)

    def on_stage_end(self, ts):
        if ts["stage"] is not Stage.EVAL:
            return
        import jax
        if not self.refs and jax.process_count() == 1:
            return
        from myrtlespeech_tpu.decoding.wer import cer_counts, wer_counts
        wd, wt = wer_counts(self.refs, self.hyps)
        cd, ct = cer_counts(self.refs, self.hyps)
        # Multi-host eval (BASELINE config 5): each host decoded its own
        # dataset shard; sum the sufficient statistics across processes
        # so the reported WER/CER is the exact corpus-level rate.  Every
        # process joins the collective even with an EMPTY shard (zero
        # counts): bucket-tail slicing can leave a host no real rows,
        # and skipping the allgather deadlocks the rest (measured: the
        # 2-process rehearsal hung exactly here, gloo 30 s timeout).
        if jax.process_count() > 1:
            import numpy as np
            from jax.experimental import multihost_utils
            agg = multihost_utils.process_allgather(
                np.asarray([wd, wt, cd, ct], np.int64))
            wd, wt, cd, ct = [int(x) for x in agg.sum(axis=0)]
            if wt == 0 and ct == 0:
                return  # no host decoded anything this stage
        r = ts.setdefault("reports", {})
        r["wer"] = wd / max(wt, 1)
        r["cer"] = cd / max(ct, 1)
        for i in range(min(self.log_transcripts, len(self.refs))):
            r[f"transcript_{i}"] = {"ref": self.refs[i],
                                    "hyp": self.hyps[i]}


class CSVLogger(Callback):
    """Reference ``callbacks/csv_logger.py``: per-batch metric rows."""

    def __init__(self, path: str):
        self.path = path
        self._file = None
        self._writer = None
        self._efile = None
        self._ewriter = None

    @property
    def epochs_path(self) -> str:
        base, ext = os.path.splitext(self.path)
        return f"{base}_epochs{ext or '.csv'}"

    def on_train_begin(self, ts):
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        self._file = open(self.path, "w", newline="")
        self._writer = None
        # The epochs file is rewritten together with the per-batch stream
        # (same run == same file pair) so rows from different runs cannot
        # mix and the header always matches every row (ADVICE r3 medium).
        # On checkpoint resume (start_epoch > 0) rows from epochs the run
        # will not replay are preserved, keeping the WER-vs-epoch curve
        # whole across supervisor restarts.
        start = int(ts.get("start_epoch", 0))
        prior = []
        if start > 0 and os.path.exists(self.epochs_path):
            with open(self.epochs_path, newline="") as f:
                for r in csv.DictReader(f):
                    try:
                        if int(float(r.get("epoch", ""))) < start:
                            prior.append(r)
                    except ValueError:
                        continue
        self._efile = open(self.epochs_path, "w", newline="")
        self._ewriter = None
        # Preserved rows are NOT written yet: the header is finalised on
        # the first post-resume epoch row so metric columns added since
        # the original run are unioned in instead of silently dropped
        # (ADVICE r4 low).  on_train_end flushes them if no new epoch
        # report ever arrives.
        self._eprior = prior

    def on_batch_end(self, ts):
        row = {"step": ts["step"], "epoch": ts["epoch"],
               "stage": ts["stage"].value}
        for k, v in ts["metrics"].items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                continue
        if self._writer is None:
            self._writer = csv.DictWriter(self._file,
                                          fieldnames=list(row.keys()),
                                          extrasaction="ignore")
            self._writer.writeheader()
        self._writer.writerow(row)
        # Flush so long runs are monitorable (tail -f) while in flight.
        self._file.flush()

    def on_epoch_end(self, ts):
        """Append the epoch's report block (incl. wer/cer) to a sibling
        ``*_epochs.csv`` — the per-batch stream above fixes its columns on
        the first (train) row, so epoch-level decoder metrics need their
        own file.  This is what WER-vs-epoch curves are plotted from."""
        reports = ts.get("reports")
        if not reports or self._efile is None:
            return
        row = {"epoch": ts["epoch"]}
        for k, v in reports.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                continue
        if self._ewriter is None:
            # Fieldnames fix on the first epoch write — the union of any
            # resume-preserved header with this row's keys, so columns
            # added since the original run survive a resume.  Later rows
            # with extra keys drop them (extrasaction) and rows missing
            # keys pad with '' (restval) — columns can never misalign.
            prior = getattr(self, "_eprior", None) or []
            fields = list(prior[0].keys()) if prior else []
            fields += [k for k in row if k not in fields]
            self._ewriter = csv.DictWriter(
                self._efile, fieldnames=fields,
                extrasaction="ignore", restval="")
            self._ewriter.writeheader()
            for r in prior:
                self._ewriter.writerow(r)
            self._eprior = []
        self._ewriter.writerow(row)
        self._efile.flush()

    def on_train_end(self, ts):
        if self._file:
            self._file.close()
        if self._efile:
            prior = getattr(self, "_eprior", None) or []
            if self._ewriter is None and prior:
                # Resume run ended without a new epoch report: flush the
                # preserved rows so the curve file is never truncated.
                self._ewriter = csv.DictWriter(
                    self._efile, fieldnames=list(prior[0].keys()),
                    extrasaction="ignore", restval="")
                self._ewriter.writeheader()
                for r in prior:
                    self._ewriter.writerow(r)
            self._efile.close()
            self._efile = None


class TensorBoardLogger(Callback):
    """Reference TensorBoard wiring (via tensorboardX here)."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self.writer = None

    def on_train_begin(self, ts):
        try:
            from tensorboardX import SummaryWriter
        except ImportError:
            return
        self.writer = SummaryWriter(self.log_dir)

    def on_batch_end(self, ts):
        if self.writer is None or ts["stage"] is not Stage.TRAIN:
            return
        for k, v in ts["metrics"].items():
            try:
                self.writer.add_scalar(f"train/{k}", float(v), ts["step"])
            except (TypeError, ValueError):
                continue

    def on_epoch_end(self, ts):
        if self.writer is None:
            return
        for k, v in ts.get("reports", {}).items():
            if isinstance(v, (int, float)):
                self.writer.add_scalar(f"report/{k}", v, ts["step"])

    def on_train_end(self, ts):
        if self.writer is not None:
            self.writer.close()


class StopEpochAfter(Callback):
    """Reference ``callbacks/stop_epoch_after.py``: cap batches per epoch
    (smoke tests)."""

    def __init__(self, n_batches: int):
        self.n_batches = n_batches

    def on_batch_end(self, ts):
        if ts.get("batch_index", 0) >= self.n_batches:
            ts["stop_epoch"] = True


class LogReports(Callback):
    """Print the per-epoch reports dict as one JSON line (long-run
    monitoring: WER/CER/loss trajectory without waiting for train end)."""

    def on_epoch_end(self, ts):
        import json
        r = {k: v for k, v in ts.get("reports", {}).items()
             if isinstance(v, (int, float))}
        if r:
            print(json.dumps({"epoch": ts["epoch"], **r}), flush=True)


class ProfilerCallback(Callback):
    """jax.profiler trace over a step window (SURVEY.md §5 tracing plan).

    Captures a TensorBoard-viewable trace of steps
    ``[start_step, start_step + num_steps)`` into ``log_dir``.
    """

    def __init__(self, log_dir: str, start_step: int = 10,
                 num_steps: int = 5):
        self.log_dir = log_dir
        self.start_step = start_step
        self.end_step = start_step + num_steps
        self._active = False

    def on_batch_begin(self, ts):
        import jax
        if ts["stage"] is Stage.TRAIN and not self._active \
                and ts["step"] == self.start_step:
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def on_batch_end(self, ts):
        import jax
        if self._active and ts["step"] >= self.end_step:
            jax.profiler.stop_trace()
            self._active = False

    def on_train_end(self, ts):
        import jax
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


class ThroughputMonitor(Callback):
    """North-star metric: audio-seconds/sec (per chip) from summed wav_lens."""

    def __init__(self, sample_rate: int = 16000):
        self.sample_rate = sample_rate

    def on_stage_begin(self, ts):
        self._audio_s = 0.0
        self._t0 = time.perf_counter()

    def on_batch_end(self, ts):
        batch = ts.get("batch")
        if batch is not None and "wav_lens" in batch:
            import numpy as np
            lens = np.asarray(batch["wav_lens"])
            # Count REAL rows only: bucket-remainder fill repeats the
            # last utterance, and counting duplicates inflates the rate
            # (the round-3/4 eval numbers overcounted by up to 1.6x on
            # the fragmented 15-batch eval; honest accounting matters
            # more than a bigger number).
            n_real = batch.get("n_real_local", batch.get("n_real"))
            if n_real is not None:
                lens = lens[:int(n_real)]
            self._audio_s += float(np.sum(lens)) / self.sample_rate

    def on_stage_end(self, ts):
        dt = time.perf_counter() - self._t0
        ts.setdefault("reports", {})[
            f"{ts['stage'].value}_audio_sec_per_sec"] = \
            self._audio_s / max(dt, 1e-9)
