"""HBM memory planner (run/memory.py): projection math, chunk selection,
and end-to-end auto-fusion equivalence on a real RNN-T train step."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myrtlespeech_tpu.run import memory as M


def test_fits_budget_returns_none(monkeypatch):
    monkeypatch.setenv("MYRTLE_HBM_BYTES", str(64 * 2**30))
    assert M.plan_transducer_chunk(32, 250, 65, 1536, 29) is None


def test_over_budget_returns_fitting_chunk(monkeypatch):
    monkeypatch.setenv("MYRTLE_HBM_BYTES", str(2**30))  # 1 GB
    B, T, U1, H, V = 32, 1000, 129, 1536, 29
    chunk = M.plan_transducer_chunk(B, T, U1, H, V)
    assert chunk is not None
    assert chunk % 8 == 0 and 8 <= chunk <= T
    # The chosen chunk's own footprint fits the budget fraction.
    budget = int(2**30 * M.DEFAULT_FRACTION)
    assert M.joint_activation_bytes(B, chunk, U1, H, V) <= budget \
        or chunk == 8  # floor: can't shrink below one 8-frame chunk


def test_planner_disable_env(monkeypatch):
    monkeypatch.setenv("MYRTLE_HBM_BYTES", str(2**20))  # absurdly small
    monkeypatch.setenv("MYRTLE_DISABLE_MEM_PLANNER", "1")
    assert M.plan_transducer_chunk(32, 1000, 129, 1536, 29) is None


def test_eval_projection_cheaper_than_train():
    train = M.joint_activation_bytes(8, 100, 17, 512, 29, backward=True)
    ev = M.joint_activation_bytes(8, 100, 17, 512, 29, backward=False)
    assert ev < train


def test_auto_fusion_matches_full_joint_train_step(monkeypatch):
    """Force a tiny budget: the train step must route through the fused
    joint+loss automatically AND produce the same loss/params as the
    full-joint path (the planner is a memory lever, not a math change)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from __graft_entry__ import _example_batch, _tiny_rnnt_task
    from myrtlespeech_tpu.run.train import init_state, train_step_body

    task = _tiny_rnnt_task(batch_size=2)
    batch = _example_batch(2, samples=3200, label_len=8)
    batch["labels"] = np.clip(batch["labels"], 1, 27)
    state = init_state(task, jax.random.PRNGKey(0), batch)
    step = train_step_body(task)

    # Full joint (planner off).
    monkeypatch.setenv("MYRTLE_DISABLE_MEM_PLANNER", "1")
    s_full, m_full = jax.jit(step)(state, batch)

    # Planner on with a budget the tiny joint still exceeds -> auto-fuse.
    monkeypatch.delenv("MYRTLE_DISABLE_MEM_PLANNER", raising=False)
    monkeypatch.setenv("MYRTLE_HBM_BYTES", "1")
    chunk = M.plan_transducer_chunk(2, 100, 9, 100, 29)
    assert chunk is not None  # the planner would fire at this budget
    s_fused, m_fused = jax.jit(step)(state, batch)

    np.testing.assert_allclose(float(m_full["loss"]),
                               float(m_fused["loss"]), rtol=1e-5)
    flat_a = jax.tree_util.tree_leaves(s_full.params)
    flat_b = jax.tree_util.tree_leaves(s_fused.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-3, atol=2e-5)
