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
import os

# NB: package imports happen inside main(), AFTER --platform and
# jax.distributed.initialize — importing model/decoder modules touches
# jnp (module-level constants), which initialises the XLA backend and
# forecloses distributed init (observed in the 2-process rehearsal).


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Train a speech task (TPU-native)")
    p.add_argument("--config", required=True, help=".py or .json TaskConfig")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--log_dir", default=None, help="TensorBoard/CSV dir")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--init_from", default=None,
                   help="warm-start weights (params + batch_stats) from "
                        "another run's checkpoint dir; optimizer/step/LR "
                        "schedule start fresh (curriculum / transfer)")
    p.add_argument("--max_batches", type=int, default=None,
                   help="cap batches per epoch (smoke runs)")
    p.add_argument("--no_decode", action="store_true",
                   help="skip decoding during eval (loss only)")
    p.add_argument("--eval_only", action="store_true",
                   help="skip training: restore from --checkpoint_dir "
                        "(or init fresh) and run one eval pass with "
                        "decoding + WER")
    p.add_argument("--batch_size", type=int, default=None,
                   help="override train_config.batch_size")
    p.add_argument("--mesh_model", type=int, default=None,
                   help="override train_config.mesh_model (TP degree)")
    # Multi-host launch (BASELINE config 5): on TPU pods jax.distributed
    # auto-detects all three from the environment; pass them explicitly
    # elsewhere.  Single-process runs leave them unset (no-op).
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port for multi-host init")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. 'cpu') before backend "
                        "init — the in-process form of JAX_PLATFORMS "
                        "(which this sandbox's TPU plugin cannot tolerate "
                        "as an env var); used by the multi-process CPU "
                        "rehearsal (tools/multiproc_rehearsal.py)")
    args = p.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    # Persistent compile cache: recipe graphs (bucketed train/eval, beam
    # decode) take minutes to compile over this sandbox's remote-compile
    # tunnel; cache them so reruns and eval-only sweeps measure the chip.
    import jax as _jax
    _jax.config.update("jax_compilation_cache_dir",
                       os.environ.get("MYRTLE_COMPILE_CACHE",
                                      "/tmp/myrtle_jax_cache"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from myrtlespeech_tpu.parallel.mesh import initialize_distributed
    initialize_distributed(coordinator=args.coordinator,
                           num_processes=args.num_processes,
                           process_id=args.process_id)

    from myrtlespeech_tpu.builders.build import build_task
    from myrtlespeech_tpu.config.serde import load
    from myrtlespeech_tpu.run import callbacks as C
    from myrtlespeech_tpu.run.train import fit

    cfg = load(args.config)
    if args.mesh_model is not None:
        from myrtlespeech_tpu.config.schema import replace
        cfg = replace(cfg, train_config=replace(
            cfg.train_config, mesh_model=args.mesh_model))
    steps_per_epoch = max(
        1, math.ceil(_dataset_len(cfg.train_dataset)
                     / cfg.train_config.batch_size))
    task = build_task(cfg, steps_per_epoch=steps_per_epoch)

    cbs = [C.ReportMeanBatchLoss(), C.ThroughputMonitor(),
           C.ReportDecoderWER(task.alphabet), C.LogReports()]
    if args.log_dir:
        cbs.append(C.CSVLogger(f"{args.log_dir}/metrics.csv"))
        cbs.append(C.TensorBoardLogger(args.log_dir))
    initial_state, start_epoch, skip_batches = None, 0, 0
    if args.checkpoint_dir:
        from myrtlespeech_tpu.run.checkpoint import (CheckpointCallback,
                                                     CheckpointManager)
        mgr = CheckpointManager(args.checkpoint_dir)
        if not args.eval_only:
            cbs.append(CheckpointCallback(mgr))
        # --eval_only implies restoring the checkpoint (evaluating random
        # weights is never what an eval sweep means); --resume restores
        # the full cursor for training.
        if (args.resume or args.eval_only) and mgr.latest_step() is not None:
            initial_state, start_epoch, skip_batches = _restore_state(
                task, mgr)
            print(f"resumed from step {int(initial_state.step)} "
                  f"(epoch {start_epoch}, batch {skip_batches})")
    if args.init_from and initial_state is None:
        from myrtlespeech_tpu.run.checkpoint import CheckpointManager
        initial_state = _warm_start(task, CheckpointManager(args.init_from))
        print(f"warm-started weights from {args.init_from}")
    if args.max_batches:
        cbs.append(C.StopEpochAfter(args.max_batches))

    handler = fit(task, epochs=args.epochs, callbacks=cbs,
                  batch_size=args.batch_size,
                  decode_eval=not args.no_decode,
                  initial_state=initial_state, start_epoch=start_epoch,
                  skip_batches=skip_batches, eval_only=args.eval_only)
    print(json.dumps(handler.state.get("reports", {}), indent=2,
                     default=str))
    return 0


def _dataset_len(ds_cfg) -> int:
    from myrtlespeech_tpu.builders.build import build_dataset
    return len(build_dataset(ds_cfg))


def _template_state(task):
    """Fresh TrainState with the task's pytree structure (one example
    batch drives shape inference) — the restore template."""
    import jax

    from myrtlespeech_tpu.data.batch import BucketedLoader
    from myrtlespeech_tpu.run.train import init_state

    loader = BucketedLoader(task.train_dataset, task.alphabet,
                            task.cfg.train_config.batch_size, shuffle=False)
    batch = next(iter(loader))
    arrays = {k: v for k, v in batch.items() if k != "texts"}
    return init_state(task, jax.random.PRNGKey(
        task.cfg.train_config.seed), arrays)


def _warm_start(task, mgr):
    """Weights-only init from another run's checkpoint (--init_from)."""
    return mgr.restore_params(_template_state(task))


def _restore_state(task, mgr):
    """Restore the latest TrainState + exact data cursor; returns
    ``(state, start_epoch, skip_batches)``.

    A template state (correct pytree structure/shapes) is initialised from
    one example batch, then overwritten by the checkpoint.
    """
    state, cursor = mgr.restore_with_cursor(_template_state(task))
    return state, cursor["epoch"], cursor["batch_in_epoch"]


if __name__ == "__main__":
    raise SystemExit(main())
