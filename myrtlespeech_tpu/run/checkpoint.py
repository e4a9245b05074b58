"""Checkpoint / resume via orbax.

The reference's checkpoint story is a save-state-dict callback at most
(SURVEY.md §5: weakest area); this is a deliberate upgrade: full
``TrainState`` (params, batch_stats, opt_state, step, rng) saved
asynchronously with orbax, with deterministic resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from myrtlespeech_tpu.run.callbacks import Callback, Stage
from myrtlespeech_tpu.run.train import TrainState


class CheckpointManager:
    """Thin wrapper over ``ocp.CheckpointManager`` for TrainState."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))

    def save(self, step: int, state: TrainState, force: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state._asdict()),
                       force=force)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, target: TrainState,
                step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(target._asdict()))
        return TrainState(**restored)


class CheckpointCallback(Callback):
    """Save a checkpoint every N train epochs (and at train end)."""

    def __init__(self, manager: CheckpointManager, every_epochs: int = 1):
        self.manager = manager
        self.every_epochs = every_epochs

    def on_epoch_end(self, ts):
        state = ts.get("train_state")
        if state is None:
            return
        if (ts["epoch"] + 1) % self.every_epochs == 0:
            self.manager.save(int(state.step), state)

    def on_train_end(self, ts):
        state = ts.get("train_state")
        if state is not None \
                and self.manager.latest_step() != int(state.step):
            self.manager.save(int(state.step), state, force=True)
        self.manager.wait()
