"""Builder property tests: random-ish configs -> build -> introspect.

Mirrors the reference's ``tests/builders/`` strategy: draw configs, build,
assert the returned objects reflect every config field (layer counts,
sizes, flags); invalid cross-field combos raise.
"""

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from myrtlespeech_tpu.builders import build as B
from myrtlespeech_tpu.config import schema as S


def test_vocab_size_rules():
    stt = S.SpeechToTextConfig(alphabet="_abc",
                               loss=S.CTCLossConfig(blank_index=0),
                               post_process=S.CTCGreedyDecoderConfig(0))
    assert B.vocab_size(stt) == 4  # blank shares index 0 (placeholder '_')
    stt2 = S.SpeechToTextConfig(alphabet="abc",
                                loss=S.CTCLossConfig(blank_index=3),
                                post_process=S.CTCGreedyDecoderConfig(3))
    assert B.vocab_size(stt2) == 4  # dedicated blank row appended


def test_validate_rejects_mismatches():
    with pytest.raises(ValueError):
        B.validate(S.SpeechToTextConfig(
            model=S.RNNTConfig(), loss=S.CTCLossConfig(),
            post_process=S.RNNTGreedyDecoderConfig()))
    with pytest.raises(ValueError):
        B.validate(S.SpeechToTextConfig(
            model=S.DeepSpeech2Config(), loss=S.CTCLossConfig(),
            post_process=S.RNNTGreedyDecoderConfig()))
    with pytest.raises(ValueError):
        B.validate(S.SpeechToTextConfig(
            model=S.DeepSpeech2Config(),
            loss=S.CTCLossConfig(blank_index=0),
            post_process=S.CTCGreedyDecoderConfig(blank_index=1)))


def test_preprocess_feature_dims():
    steps = (
        S.PreProcessStepConfig(S.MFCCConfig(n_mfcc=13, n_mels=40)),
        S.PreProcessStepConfig(S.ContextFramesConfig(n_context=4)),
    )
    assert B.preprocess_out_features(steps) == 13 * 9
    steps2 = (S.PreProcessStepConfig(S.MFCCConfig(n_mels=64,
                                                  log_mel_only=True)),)
    assert B.preprocess_out_features(steps2) == 64


def test_preprocess_stage_gating():
    import jax
    steps = (
        S.PreProcessStepConfig(S.MFCCConfig(n_mels=16, log_mel_only=True)),
        S.PreProcessStepConfig(S.SpecAugmentConfig(feature_mask=16,
                                                   n_feature_masks=8,
                                                   time_mask=50,
                                                   n_time_masks=8),
                               stage=S.StageSelector.TRAIN),
    )
    fn = B.build_preprocess(steps)
    rng = jax.random.PRNGKey(0)
    wav = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 3200)).astype(np.float32))
    lens = jnp.asarray(np.array([3200, 1600], np.int32))
    feats_eval, _ = fn(rng, wav, lens, False)
    feats_eval2, _ = fn(jax.random.PRNGKey(9), wav, lens, False)
    # eval path is deterministic and unmasked
    np.testing.assert_allclose(np.asarray(feats_eval),
                               np.asarray(feats_eval2))
    feats_train, _ = fn(rng, wav, lens, True)
    assert (np.asarray(feats_train) == 0).sum() \
        > (np.asarray(feats_eval) == 0).sum()


@pytest.mark.parametrize("model_cfg,cls", [
    (S.DeepSpeech1Config(n_hidden=8), "DeepSpeech1"),
    (S.DeepSpeech2Config(
        conv_block=(S.Conv2dConfig(out_channels=2),),
        rnn=S.RNNConfig(hidden_size=8),
        fully_connected=S.FullyConnectedConfig()), "DeepSpeech2"),
    (S.EncoderDecoderConfig(), "EncoderDecoder"),
])
def test_build_model_types(model_cfg, cls):
    stt = S.SpeechToTextConfig(model=model_cfg)
    m = B.build_model(stt, dtype=jnp.float32)
    assert type(m).__name__ == cls
    assert m.out_features == B.vocab_size(stt)


def test_build_rnnt_model():
    stt = S.SpeechToTextConfig(model=S.RNNTConfig(),
                               loss=S.RNNTLossConfig(),
                               post_process=S.RNNTGreedyDecoderConfig())
    m = B.build_model(stt, dtype=jnp.float32)
    assert type(m).__name__ == "RNNT"
    assert m.vocab_size == B.vocab_size(stt)


def test_build_loss_partials():
    ctc = B.build_loss(S.SpeechToTextConfig(
        loss=S.CTCLossConfig(blank_index=2,
                             reduction=S.Reduction.SUM)))
    # Backend-dispatching closure; check it computes with the config's
    # blank/reduction by comparing against the op called directly.
    import jax.numpy as jnp
    import numpy as np
    from myrtlespeech_tpu.ops.ctc import ctc_loss as raw
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((2, 6, 4)).astype(np.float32))
    tl = jnp.asarray([6, 5], dtype=jnp.int32)
    labels = jnp.asarray([[1, 3], [0, 1]], dtype=jnp.int32)
    ll = jnp.asarray([2, 1], dtype=jnp.int32)
    np.testing.assert_allclose(
        float(ctc(logits, tl, labels, ll)),
        float(raw(logits, tl, labels, ll, blank_index=2, reduction="sum")),
        rtol=1e-5)
    rnnt = B.build_loss(S.SpeechToTextConfig(
        model=S.RNNTConfig(), loss=S.RNNTLossConfig(blank_index=0),
        post_process=S.RNNTGreedyDecoderConfig()))
    assert callable(rnnt)  # backend-dispatching closure (pallas on TPU)


def test_build_optimizer_and_schedule():
    tc = S.TrainConfig(optimizer=S.SGDConfig(learning_rate=0.1),
                       lr_scheduler=S.StepLRConfig(step_size_epochs=2,
                                                   gamma=0.5),
                       lr_warmup_steps=10, grad_clip_norm=1.0)
    tx, sched = B.build_optimizer(tc, steps_per_epoch=5)
    assert float(sched(0)) == 0.0  # warmup start
    assert float(sched(10)) == pytest.approx(0.1)  # post warmup
    assert float(sched(10 + 10)) == pytest.approx(0.05)  # one decay step
    # optimizer is a valid optax transform
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    g = {"w": jnp.full((3,), 100.0)}  # should be clipped
    updates, _ = tx.update(g, state, params)
    assert float(jnp.abs(updates["w"]).max()) <= 0.2


def test_build_dataset():
    ds = B.build_dataset(S.FakeSpeechToTextConfig(dataset_len=5))
    assert len(ds) == 5
    with pytest.raises(FileNotFoundError):
        B.build_dataset(S.LibriSpeechConfig(data_dir="/nonexistent"))


def test_build_task_end_to_end():
    from configs.ctc_tiny_fake import task_config
    task = B.build_task(task_config, steps_per_epoch=8)
    assert not task.transducer
    assert len(task.alphabet) == 29
    assert len(task.train_dataset) == 64
    assert task.eval_dataset is not None
