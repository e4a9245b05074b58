"""Supervisor (failure recovery) tests.

The restart policy is tested with a fake spawner (no subprocesses); one
end-to-end test kills a real training run mid-epoch and proves the
supervised relaunch completes with exact resume."""

import numpy as np
import pytest

from myrtlespeech_tpu.run.supervisor import run_supervised


def test_requires_checkpoint_dir():
    with pytest.raises(ValueError, match="checkpoint_dir"):
        run_supervised(["--config", "x.py"])


def test_restart_policy_appends_resume():
    calls = []

    def spawn(args):
        calls.append(list(args))
        return 1 if len(calls) < 3 else 0  # fail twice, then succeed

    rc = run_supervised(["--config", "c.py", "--checkpoint_dir", "/ck"],
                        max_restarts=3, backoff_s=0, _spawn=spawn)
    assert rc == 0
    assert len(calls) == 3
    assert "--resume" not in calls[0]
    assert "--resume" in calls[1] and "--resume" in calls[2]
    assert calls[2].count("--resume") == 1  # appended once


def test_gives_up_after_max_restarts():
    def spawn(args):
        return 7

    rc = run_supervised(["--checkpoint_dir", "/ck"], max_restarts=2,
                        backoff_s=0, _spawn=spawn)
    assert rc == 7


def test_supervised_crash_resume_end_to_end(tmp_path):
    """Child 'crashes' (simulated via StopEpochAfter + nonzero exit) and
    the supervised relaunch finishes the epoch — final state equals an
    uninterrupted run bit-for-bit (exact resume through the supervisor).

    Runs fit in-process via a fake spawner (a real subprocess would pay
    full JAX startup twice); the process boundary itself is exercised by
    the CLI resume tests.
    """
    import jax

    from myrtlespeech_tpu.builders.build import build_task
    from myrtlespeech_tpu.run import callbacks as C
    from myrtlespeech_tpu.run.checkpoint import (CheckpointCallback,
                                                 CheckpointManager)
    from myrtlespeech_tpu.run.cli import _restore_state
    from myrtlespeech_tpu.run.train import fit

    import sys
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_e2e_smoke import _tiny_ctc_cfg

    ckpt = str(tmp_path / "ck")

    def make_task():
        return build_task(_tiny_ctc_cfg(epochs=1), steps_per_epoch=4)

    straight = fit(make_task(), decode_eval=False,
                   mesh=False).state["train_state"]

    attempts = []

    def spawn(args):
        attempts.append(list(args))
        task = make_task()
        mgr = CheckpointManager(ckpt)
        if "--resume" in args:
            state, epoch, skip = _restore_state(task, mgr)
        else:
            state, epoch, skip = None, 0, 0
        cbs = [CheckpointCallback(mgr)]
        if len(attempts) == 1:
            cbs.append(C.StopEpochAfter(2))  # simulated mid-epoch crash
        fit(task, callbacks=cbs, decode_eval=False, mesh=False,
            initial_state=state, start_epoch=epoch, skip_batches=skip)
        return 1 if len(attempts) == 1 else 0

    rc = run_supervised(["--checkpoint_dir", ckpt], max_restarts=2,
                        backoff_s=0, _spawn=spawn)
    assert rc == 0 and len(attempts) == 2

    task = make_task()
    resumed, _, _ = _restore_state(task, CheckpointManager(ckpt))
    assert int(resumed.step) == int(straight.step) == 4
    for a, b in zip(jax.tree_util.tree_leaves(straight.params),
                    jax.tree_util.tree_leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
