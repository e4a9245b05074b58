"""train_step/eval_step semantics (reference ``tests/run/test_train.py``
spirit): optimizer wiring, schedule threading, batch-stats mutation rules,
rng advancement — on a tiny CTC task, single device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myrtlespeech_tpu.builders.build import build_task
from myrtlespeech_tpu.config import schema as S
from myrtlespeech_tpu.run.train import (eval_step_body, init_state,
                                        make_eval_step, make_train_step,
                                        train_step_body)


def _cfg(**train_kw):
    tc = dict(batch_size=2, epochs=1,
              optimizer=S.AdamConfig(learning_rate=1e-3),
              compute_dtype="float32")
    tc.update(train_kw)
    return S.TaskConfig(
        speech_to_text=S.SpeechToTextConfig(
            alphabet="_ab",
            pre_process_steps=(
                S.PreProcessStepConfig(S.MFCCConfig(n_mels=8,
                                                    log_mel_only=True)),),
            model=S.DeepSpeech2Config(
                conv_block=(S.Conv2dConfig(out_channels=2, kernel_time=3,
                                           kernel_feature=3, stride_time=1,
                                           stride_feature=1),),
                rnn=S.RNNConfig(hidden_size=8, num_layers=1,
                                batch_norm=False),
                fully_connected=S.FullyConnectedConfig()),
            loss=S.CTCLossConfig(blank_index=0),
            post_process=S.CTCGreedyDecoderConfig(blank_index=0)),
        train_config=S.TrainConfig(**tc),
        train_dataset=S.FakeSpeechToTextConfig(dataset_len=2),
    )


def _batch(B=2, samples=1600):
    rng = np.random.default_rng(0)
    return {
        "wav": rng.standard_normal((B, samples)).astype(np.float32),
        "wav_lens": np.asarray([samples, samples // 2], np.int32),
        "labels": np.asarray([[1, 2], [1, 0]], np.int32),
        "label_lens": np.asarray([2, 1], np.int32),
    }


def test_step_increments_and_rng_advances():
    task = build_task(_cfg(), steps_per_epoch=2)
    batch = _batch()
    state = init_state(task, jax.random.PRNGKey(0), batch)
    step = train_step_body(task)  # un-jitted: state not donated
    s1, m1 = step(state, batch)
    s2, m2 = step(s1, batch)
    assert int(s1.step) == 1 and int(s2.step) == 2
    assert not np.array_equal(np.asarray(s1.rng), np.asarray(state.rng))
    assert np.isfinite(float(m1["loss"]))
    # Fixed batch, Adam: loss must decrease over steps.
    assert float(m2["loss"]) < float(m1["loss"])


def test_lr_metric_matches_schedule():
    cfg = _cfg(lr_scheduler=S.StepLRConfig(step_size_epochs=1, gamma=0.5))
    task = build_task(cfg, steps_per_epoch=1)  # decay every step
    batch = _batch()
    state = init_state(task, jax.random.PRNGKey(0), batch)
    step = train_step_body(task)
    _, m0 = step(state, batch)
    assert np.isclose(float(m0["lr"]), float(task.lr_schedule(0)))
    assert np.isclose(float(task.lr_schedule(2)), 1e-3 * 0.25)


def test_grad_clip_caps_update_magnitude():
    task_clip = build_task(_cfg(grad_clip_norm=1e-8), steps_per_epoch=2)
    task_free = build_task(_cfg(), steps_per_epoch=2)
    batch = _batch()
    st = init_state(task_clip, jax.random.PRNGKey(0), batch)
    st_free = init_state(task_free, jax.random.PRNGKey(0), batch)
    s_clip, m_clip = train_step_body(task_clip)(st, batch)
    s_free, _ = train_step_body(task_free)(st_free, batch)

    def delta(a, b):
        return max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(
            jax.tree_util.tree_leaves(a.params),
            jax.tree_util.tree_leaves(b.params)))

    # grad_norm metric reports the RAW gradient norm (pre-clip).
    assert float(m_clip["grad_norm"]) > 1e-6
    # The clipped update must move params far less than the unclipped one
    # (Adam renormalises per-coordinate, but the first-step moments scale
    # with the clipped gradient, bounding the update).
    assert delta(s_clip, st) <= delta(s_free, st)


def test_batch_stats_update_only_in_train():
    cfg = _cfg()
    cfg = S.replace(cfg, speech_to_text=S.replace(
        cfg.speech_to_text, model=S.replace(
            cfg.speech_to_text.model,
            rnn=S.RNNConfig(hidden_size=8, num_layers=2, batch_norm=True))))
    task = build_task(cfg, steps_per_epoch=2)
    batch = _batch()
    state = init_state(task, jax.random.PRNGKey(0), batch)
    assert state.batch_stats, "BN model must own batch_stats"
    s1, _ = train_step_body(task)(state, batch)
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.batch_stats),
                        jax.tree_util.tree_leaves(s1.batch_stats)))
    assert changed, "train step must update running BN stats"
    metrics = eval_step_body(task, decode=False)(s1, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_eval_step_decodes_with_padding_invariance():
    """Eval decode output for an utterance must not depend on other rows'
    padding (mask correctness through the whole stack)."""
    task = build_task(_cfg(), steps_per_epoch=2)
    batch = _batch(samples=1600)
    state = init_state(task, jax.random.PRNGKey(0), batch)
    ev = eval_step_body(task, decode=True)
    m1 = ev(state, batch)
    # Poison the padding region of row 1 (beyond wav_lens).
    b2 = dict(batch)
    wav = batch["wav"].copy()
    wav[1, 800:] = 37.0
    b2["wav"] = wav
    m2 = ev(state, b2)
    t1, l1 = np.asarray(m1["decoded_tokens"]), np.asarray(m1["decoded_lens"])
    t2, l2 = np.asarray(m2["decoded_tokens"]), np.asarray(m2["decoded_lens"])
    assert l1[1] == l2[1]
    np.testing.assert_array_equal(t1[1, :l1[1]], t2[1, :l2[1]])


def test_n_real_masks_duplicated_pad_rows():
    """Eval/train losses must exclude BucketedLoader's remainder-fill
    duplicates: a batch with n_real=2 scores identically to the 2-row
    batch, for both CTC mean loss and gradient weighting (VERDICT r2 #8).

    BatchNorm is disabled here: BN batch statistics are computed over the
    whole (padded) batch by design — remainder duplicates are real
    samples, so the stats stay in-distribution, but they make the forward
    depend on batch composition, which is exactly what this test isolates
    away from."""
    cfg = _cfg()
    conv = S.replace(cfg.speech_to_text.model.conv_block[0],
                     batch_norm=False)
    cfg = S.replace(cfg, speech_to_text=S.replace(
        cfg.speech_to_text, model=S.replace(
            cfg.speech_to_text.model, conv_block=(conv,))))
    task = build_task(cfg, steps_per_epoch=2)
    b2 = _batch()
    # 4-row batch where rows 2,3 duplicate row 1 (loader remainder fill).
    b4 = {k: np.concatenate([v, v[1:], v[1:]], axis=0) for k, v in b2.items()}
    b4["n_real"] = np.asarray(2, np.int32)
    state = init_state(task, jax.random.PRNGKey(0), b2)

    ev = eval_step_body(task, decode=False)
    loss2 = float(ev(state, b2)["loss"])
    loss4 = float(ev(state, b4)["loss"])
    np.testing.assert_allclose(loss4, loss2, rtol=1e-5)

    # Gradients: the duplicated rows must contribute nothing.
    step = train_step_body(task)
    s_a, _ = step(state, b2)
    # n_real present but full batch: weights all-ones == no mask.
    b2_full = dict(b2, n_real=np.asarray(2, np.int32))
    s_b, _ = step(state, b2_full)
    pa = jax.tree_util.tree_leaves(s_a.params)
    pb = jax.tree_util.tree_leaves(s_b.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    s_c, _ = step(state, b4)
    pc = jax.tree_util.tree_leaves(s_c.params)
    for a, c in zip(pa, pc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)


def test_params_npz_roundtrip(tmp_path):
    """save_params_npz/load_params_npz: bf16 leaves survive bit-exact,
    topology mismatches raise (the bundled-trained-weights path that
    bench.py's decode_beam_trained loads)."""
    import jax
    import jax.numpy as jnp

    from myrtlespeech_tpu.run.checkpoint import (load_params_npz,
                                                 save_params_npz)

    params = {
        "dense": {"kernel": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
                  "bias": jnp.ones((4,), jnp.bfloat16)},
        "step": jnp.asarray(7, jnp.int32),
    }
    path = str(tmp_path / "p.npz")
    save_params_npz(path, params)
    back = load_params_npz(path, params)
    # fp32 leaves round-trip through bf16 (lossy but deterministic).
    kb = jnp.asarray(params["dense"]["kernel"], jnp.bfloat16)
    assert jnp.array_equal(back["dense"]["kernel"],
                           kb.astype(jnp.float32))
    assert jnp.array_equal(back["dense"]["bias"], params["dense"]["bias"])
    assert int(back["step"]) == 7
    import pytest as _pytest
    bad = {"dense": {"kernel": params["dense"]["kernel"]}}
    with _pytest.raises(KeyError):
        load_params_npz(path, bad)  # extra stored keys must raise


def test_eval_ignores_forced_fusion_when_planner_allows():
    """_select_joint_path: config-forced chunked fusion is a TRAINING
    knob; at eval (backward=False) the planner decides (round-5 eval
    rework — the forced fusion was 52% of the eval wall)."""
    from myrtlespeech_tpu.builders.build import build_task
    from myrtlespeech_tpu.config import schema as S
    from myrtlespeech_tpu.run.train import _select_joint_path
    import jax.numpy as jnp

    from configs.synthetic_hard_rnnt import task_config
    task = build_task(task_config, steps_per_epoch=4)
    assert task.fused_loss is not None  # recipe forces fused_chunk_size
    f = jnp.zeros((4, 16, 512), jnp.bfloat16)
    g = jnp.zeros((4, 9, 128), jnp.bfloat16)
    fused_t, _ = _select_joint_path(task, f, g, backward=True)
    assert fused_t is task.fused_loss
    fused_e, chunk_e = _select_joint_path(task, f, g, backward=False)
    # On the CPU test backend the HBM planner has no limit -> full joint
    # (None); on devices it may still pick a planner chunk — either way
    # the config-forced callable must NOT be the eval choice here.
    assert fused_e is not task.fused_loss or chunk_e is not None
