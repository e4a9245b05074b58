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

    def save(self, step: int, state: TrainState, force: bool = False, *,
             epoch: int = 0, batch_in_epoch: int = 0) -> None:
        """Save TrainState + the data-loader cursor (epoch, batch index).

        The cursor makes resume *exact* (SURVEY.md §5 checkpoint row):
        data order is a pure function of ``(seed, epoch)``
        (``BucketedLoader.set_epoch``), so ``(epoch, batch_in_epoch)``
        pins the precise continuation point.
        """
        payload = dict(state._asdict())
        payload["loader"] = {"epoch": np.asarray(epoch, np.int32),
                             "batch_in_epoch": np.asarray(batch_in_epoch,
                                                          np.int32)}
        self._mgr.save(step, args=ocp.args.StandardSave(payload),
                       force=force)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, target: TrainState,
                step: Optional[int] = None) -> TrainState:
        state, _ = self.restore_with_cursor(target, step)
        return state

    def restore_params(self, target: TrainState,
                       step: Optional[int] = None) -> TrainState:
        """Weights-only warm start (curriculum / transfer learning).

        Restores ``params`` and ``batch_stats`` from the checkpoint into
        ``target``, keeping the target's fresh optimizer state, step
        counter, and rng — so a fine-tuning run starts its own LR
        schedule from step 0.  The checkpoint must come from the same
        model topology (the full-state template is used for structure).
        """
        full, _ = self.restore_with_cursor(target, step)
        return target._replace(params=full.params,
                               batch_stats=full.batch_stats)

    def restore_with_cursor(self, target: TrainState,
                            step: Optional[int] = None):
        """Returns ``(TrainState, {"epoch": int, "batch_in_epoch": int})``."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        payload = dict(target._asdict())
        payload["loader"] = {"epoch": np.asarray(0, np.int32),
                             "batch_in_epoch": np.asarray(0, np.int32)}
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(payload))
        cursor = {k: int(v) for k, v in restored.pop("loader").items()}
        return TrainState(**restored), cursor


def save_params_npz(path: str, params) -> None:
    """Flatten a params pytree into a compressed npz (bf16 via uint16).

    The portable, in-repo form of trained weights: small enough to
    commit (bf16 halves fp32; e.g. the medium RNN-T's 2.4M params are
    ~3.8 MB), loadable with no orbax directory structure.  Keys are
    '/'-joined tree paths; bf16 leaves are stored as a uint16 view under
    a ``::bf16`` suffix (npz has no bfloat16 dtype).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for p, leaf in flat:
        key = "/".join(str(getattr(q, "key", getattr(q, "idx", q)))
                       for q in p)
        arr = np.asarray(leaf)
        if arr.dtype == np.float32:
            arr = np.asarray(jax.numpy.asarray(arr, jax.numpy.bfloat16))
        if arr.dtype == jax.numpy.bfloat16:
            out[key + "::bf16"] = arr.view(np.uint16)
        else:
            out[key] = arr
    np.savez_compressed(path, **out)


def load_params_npz(path: str, template_params):
    """Load a ``save_params_npz`` file into a template params pytree.

    Leaves are cast back to the template's dtypes; missing or extra keys
    raise (topology mismatch is a config error, not a warning).
    """
    import jax.numpy as jnp

    data = dict(np.load(path))
    loaded = {}
    for k, v in data.items():
        if k.endswith("::bf16"):
            loaded[k[:-6]] = v.view(jnp.bfloat16)
        else:
            loaded[k] = v
    flat, treedef = jax.tree_util.tree_flatten_with_path(template_params)
    leaves = []
    seen = set()
    for p, leaf in flat:
        key = "/".join(str(getattr(q, "key", getattr(q, "idx", q)))
                       for q in p)
        if key not in loaded:
            raise KeyError(f"{path} missing param {key}")
        arr = loaded[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(f"{key}: npz shape {arr.shape} != template "
                             f"{np.shape(leaf)}")
        leaves.append(jnp.asarray(arr, np.asarray(leaf).dtype))
        seen.add(key)
    extra = set(loaded) - seen
    if extra:
        raise KeyError(f"{path} has unknown params: {sorted(extra)[:5]}")
    return jax.tree_util.tree_unflatten(treedef, leaves)


class CheckpointCallback(Callback):
    """Save a checkpoint every N train epochs (and at train end).

    Tracks the train-stage batch cursor so mid-epoch stops (early stop,
    preemption via on_train_end) resume exactly where they left off.
    """

    def __init__(self, manager: CheckpointManager, every_epochs: int = 1):
        self.manager = manager
        self.every_epochs = every_epochs
        self._cursor = (0, 0)  # (epoch, batch_in_epoch) to resume at

    def on_stage_end(self, ts):
        if ts["stage"] is not Stage.TRAIN:
            return
        if ts.get("stop_epoch") or ts.get("stop_training"):
            self._cursor = (ts["epoch"], ts.get("batch_index", 0))
        else:
            self._cursor = (ts["epoch"] + 1, 0)

    def on_epoch_end(self, ts):
        state = ts.get("train_state")
        if state is None:
            return
        if (ts["epoch"] + 1) % self.every_epochs == 0:
            self.manager.save(int(state.step), state,
                              epoch=self._cursor[0],
                              batch_in_epoch=self._cursor[1])

    def on_train_end(self, ts):
        state = ts.get("train_state")
        if state is not None \
                and self.manager.latest_step() != int(state.step):
            self.manager.save(int(state.step), state, force=True,
                              epoch=self._cursor[0],
                              batch_in_epoch=self._cursor[1])
        self.manager.wait()
