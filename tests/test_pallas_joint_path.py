"""The fully-fused Pallas joint+loss path wired into training.

``build_pallas_joint_loss`` (builders/build.py) must produce exactly the
same loss value and parameter gradients as the full-logits path on a real
RNN-T task (float32, interpret mode), and the dispatcher
(``run/train.py::_select_joint_path``) must honour its gates: TPU backend
only, ``MYRTLE_DISABLE_PALLAS_JOINT``, the TP guard, and train-time joint
dropout.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
from __graft_entry__ import _example_batch, _tiny_rnnt_task  # noqa: E402

from myrtlespeech_tpu.builders.build import build_task  # noqa: E402
from myrtlespeech_tpu.config import schema as S  # noqa: E402
from myrtlespeech_tpu.models.rnn_t import RNNT  # noqa: E402
from myrtlespeech_tpu.run.train import init_state  # noqa: E402


def _task_f32(batch_size: int = 2):
    t = _tiny_rnnt_task(batch_size)
    return build_task(t.cfg, steps_per_epoch=4, dtype=jnp.float32)


def test_built_and_param_path():
    """The builder wires the path and the tail Dense params sit where the
    loss closure reads them (``params/joint_net/rest/Dense_0``)."""
    task = _task_f32()
    assert task.pallas_joint_loss is not None
    batch = _example_batch(2, samples=3200, label_len=6)
    state = init_state(task, jax.random.PRNGKey(0), batch)
    dense = state.params["joint_net"]["rest"]["Dense_0"]
    K = task.cfg.speech_to_text.model.joint.fc.hidden_size
    assert dense["kernel"].shape == (K, task.model.vocab_size)
    assert dense["bias"].shape == (task.model.vocab_size,)


def test_pallas_joint_loss_matches_full_path():
    task = _task_f32()
    batch = _example_batch(2, samples=3200, label_len=6)
    batch["labels"] = np.clip(batch["labels"], 1, 27)
    state = init_state(task, jax.random.PRNGKey(0), batch)
    feats, flens = task.preprocess(
        jax.random.PRNGKey(1), jnp.asarray(batch["wav"]),
        jnp.asarray(batch["wav_lens"]), False)
    labels = jnp.asarray(batch["labels"])
    llens = jnp.asarray(batch["label_lens"])

    def loss_full(params):
        variables = {"params": params}
        logits, f_lens = task.model.apply(
            variables, feats, flens, labels, llens, False)
        return task.loss_fn(logits, f_lens, labels, llens)

    def loss_pallas(params):
        variables = {"params": params}
        f, f_lens = task.model.apply(
            variables, feats, flens, method=RNNT.encode)
        g = task.model.apply(variables, labels, llens, method=RNNT.predict)
        return task.pallas_joint_loss(variables, f, f_lens, g, labels,
                                      llens)

    v_full, g_full = jax.value_and_grad(loss_full)(state.params)
    with pltpu.force_tpu_interpret_mode():
        v_pal, g_pal = jax.value_and_grad(loss_pallas)(state.params)
    np.testing.assert_allclose(float(v_full), float(v_pal), rtol=1e-5)
    flat_full = jax.tree_util.tree_leaves_with_path(g_full)
    flat_pal = jax.tree_util.tree_leaves(g_pal)
    for (path, a), b in zip(flat_full, flat_pal):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=3e-4, atol=3e-4,
            err_msg=jax.tree_util.keystr(path))


def test_unsupported_topology_builds_none():
    """A deep joint tail (2 hidden layers) falls outside the kernel."""
    t = _tiny_rnnt_task(2)
    stt = t.cfg.speech_to_text
    deep = S.replace(
        stt, model=S.replace(
            stt.model, joint=S.replace(
                stt.model.joint,
                fc=S.replace(stt.model.joint.fc, num_hidden_layers=2))))
    cfg = S.replace(t.cfg, speech_to_text=deep)
    task = build_task(cfg, steps_per_epoch=4, dtype=jnp.float32)
    assert task.pallas_joint_loss is None
    assert task.fused_loss_auto is not None  # fallback tiers still there


def test_dispatch_gates(monkeypatch):
    """Precedence: full joint when it fits HBM; when the memory planner
    fires, the Pallas joint path replaces the chunked fusion on TPU."""
    from myrtlespeech_tpu.parallel.sharding import PALLAS_TP_GUARD
    from myrtlespeech_tpu.run import train as RT

    task = _task_f32()
    f = jnp.zeros((2, 4, 512), jnp.float32)
    g = jnp.zeros((2, 3, 128), jnp.float32)

    # Full joint fits HBM: the full path wins even on TPU.
    monkeypatch.setenv("MYRTLE_HBM_BYTES", str(64 * 2**30))
    monkeypatch.setattr(RT.jax, "default_backend", lambda: "tpu")
    fused, chunk = RT._select_joint_path(task, f, g, backward=True)
    assert fused is None and chunk is None

    # Over budget on TPU: pallas joint replaces the chunked fusion.
    monkeypatch.setenv("MYRTLE_HBM_BYTES", "1")
    fused, chunk = RT._select_joint_path(task, f, g, backward=True)
    assert fused is task.pallas_joint_loss and chunk is None

    # Over budget on CPU: chunked fusion (pallas needs the TPU backend).
    monkeypatch.setattr(RT.jax, "default_backend", lambda: "cpu")
    fused, chunk = RT._select_joint_path(task, f, g, backward=True)
    assert fused is task.fused_loss_auto and chunk is not None

    monkeypatch.setattr(RT.jax, "default_backend", lambda: "tpu")
    # Operational kill switch -> chunked fusion again.
    monkeypatch.setenv("MYRTLE_DISABLE_PALLAS_JOINT", "1")
    fused, _ = RT._select_joint_path(task, f, g, backward=True)
    assert fused is task.fused_loss_auto
    monkeypatch.delenv("MYRTLE_DISABLE_PALLAS_JOINT")

    # TP meshes: kernel is opaque to GSPMD -> chunked fusion.
    monkeypatch.setitem(PALLAS_TP_GUARD, "model_size", 2)
    fused, _ = RT._select_joint_path(task, f, g, backward=True)
    assert fused is task.fused_loss_auto
    monkeypatch.setitem(PALLAS_TP_GUARD, "model_size", 1)

    # Config-forced chunked fusion outranks everything (explicit user).
    stt = task.cfg.speech_to_text
    forcedcfg = S.replace(
        stt, loss=S.replace(stt.loss, fused_chunk_size=16))
    forced = build_task(S.replace(task.cfg, speech_to_text=forcedcfg),
                        steps_per_epoch=4, dtype=jnp.float32)
    fused, _ = RT._select_joint_path(forced, f, g, backward=True)
    assert fused is forced.fused_loss

    # Train-time joint dropout: kernel has none -> only eval selects it.
    dropcfg = S.replace(
        stt, model=S.replace(
            stt.model, joint=S.replace(
                stt.model.joint,
                fc=S.replace(stt.model.joint.fc, dropout=0.1))))
    droptask = build_task(S.replace(task.cfg, speech_to_text=dropcfg),
                          steps_per_epoch=4, dtype=jnp.float32)
    fused, _ = RT._select_joint_path(droptask, f, g, backward=True)
    assert fused is droptask.fused_loss_auto
    fused, _ = RT._select_joint_path(droptask, f, g, backward=False)
    assert fused is droptask.pallas_joint_loss
