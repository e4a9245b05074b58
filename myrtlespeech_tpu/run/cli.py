"""Command-line entry point.

Reference: ``src/myrtlespeech/run/run.py :: main`` —
``python -m myrtlespeech.run.run --config=<textproto>``.  Here:

    python -m myrtlespeech_tpu.run.cli --config=configs/ctc_tiny_fake.py \
        [--epochs N] [--log_dir DIR] [--checkpoint_dir DIR] [--resume]
"""

from __future__ import annotations

import argparse
import json
import math

from myrtlespeech_tpu.builders.build import build_task
from myrtlespeech_tpu.config.serde import load
from myrtlespeech_tpu.run import callbacks as C
from myrtlespeech_tpu.run.train import fit


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Train a speech task (TPU-native)")
    p.add_argument("--config", required=True, help=".py or .json TaskConfig")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--log_dir", default=None, help="TensorBoard/CSV dir")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--max_batches", type=int, default=None,
                   help="cap batches per epoch (smoke runs)")
    p.add_argument("--no_decode", action="store_true",
                   help="skip decoding during eval (loss only)")
    args = p.parse_args(argv)

    cfg = load(args.config)
    steps_per_epoch = max(
        1, math.ceil(_dataset_len(cfg.train_dataset)
                     / cfg.train_config.batch_size))
    task = build_task(cfg, steps_per_epoch=steps_per_epoch)

    cbs = [C.ReportMeanBatchLoss(), C.ThroughputMonitor(),
           C.ReportDecoderWER(task.alphabet)]
    if args.log_dir:
        cbs.append(C.CSVLogger(f"{args.log_dir}/metrics.csv"))
        cbs.append(C.TensorBoardLogger(args.log_dir))
    initial_state, start_epoch = None, 0
    if args.checkpoint_dir:
        from myrtlespeech_tpu.run.checkpoint import (CheckpointCallback,
                                                     CheckpointManager)
        mgr = CheckpointManager(args.checkpoint_dir)
        cbs.append(CheckpointCallback(mgr))
        if args.resume and mgr.latest_step() is not None:
            initial_state, start_epoch = _restore_state(
                task, mgr, steps_per_epoch)
            print(f"resumed from step {int(initial_state.step)} "
                  f"(epoch {start_epoch})")
    if args.max_batches:
        cbs.append(C.StopEpochAfter(args.max_batches))

    handler = fit(task, epochs=args.epochs, callbacks=cbs,
                  decode_eval=not args.no_decode,
                  initial_state=initial_state, start_epoch=start_epoch)
    print(json.dumps(handler.state.get("reports", {}), indent=2,
                     default=str))
    return 0


def _dataset_len(ds_cfg) -> int:
    from myrtlespeech_tpu.builders.build import build_dataset
    return len(build_dataset(ds_cfg))


def _restore_state(task, mgr, steps_per_epoch: int):
    """Restore the latest TrainState; returns (state, epoch to resume at).

    A template state (correct pytree structure/shapes) is initialised from
    one example batch, then overwritten by the checkpoint.
    """
    import jax

    from myrtlespeech_tpu.data.batch import BucketedLoader
    from myrtlespeech_tpu.run.train import init_state

    loader = BucketedLoader(task.train_dataset, task.alphabet,
                            task.cfg.train_config.batch_size, shuffle=False)
    batch = next(iter(loader))
    arrays = {k: v for k, v in batch.items() if k != "texts"}
    template = init_state(task, jax.random.PRNGKey(
        task.cfg.train_config.seed), arrays)
    state = mgr.restore(template)
    return state, int(state.step) // max(steps_per_epoch, 1)


if __name__ == "__main__":
    raise SystemExit(main())
