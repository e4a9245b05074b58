"""Property-test the WHOLE config surface end-to-end (VERDICT r2 #7).

The reference's signature test pattern (SURVEY.md §4: random *valid*
proto strategies -> build -> introspect) applied at task granularity:
for every model family (DS1, DS2, EncoderDecoder, RNNT) draw random
valid ``TaskConfig``s, build the full Task, run ONE real jitted
train_step and eval_step (with decoding) on a loader batch, and assert

- the built objects reflect the config (vocab width, blank indices,
  transducer-ness, optimizer/schedule callables),
- the step math is healthy (finite loss, params actually move, step
  counter advances, decoded tokens lie in the alphabet),
- nothing in the generated space crashes at trace or run time.

This is the test that would have caught the round-1 builder shape-crash
class by construction.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from myrtlespeech_tpu.builders import build as B
from myrtlespeech_tpu.config import schema as S
from myrtlespeech_tpu.data.batch import BucketedLoader
from myrtlespeech_tpu.run.train import (init_state, make_eval_step,
                                        make_train_step)
from tests.test_config_properties import (activations, ds2_configs,
                                          fc_configs, rnn_configs,
                                          rnnt_configs)

_SETTINGS = dict(max_examples=5, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow,
                                        HealthCheck.data_too_large])

ALPHABET = "_ abc"
V = len(ALPHABET)  # blank_index=0 sits INSIDE the alphabet ("_")


@st.composite
def encoder_decoder_configs(draw):
    """The 4th model family: optional VGG/conv frontend + RNN + FC."""
    frontend = draw(st.sampled_from(["none", "vgg", "conv"]))
    enc = S.EncoderConfig(
        vgg=S.VGGConfig(vgg_cfg=S.VGGCfg.A, batch_norm=draw(st.booleans()),
                        use_output_from_block=draw(st.integers(1, 2)))
        if frontend == "vgg" else None,
        conv_block=(S.Conv2dConfig(out_channels=2, kernel_time=3,
                                   kernel_feature=3, stride_time=1,
                                   stride_feature=1,
                                   activation=draw(activations)),)
        if frontend == "conv" else (),
        rnn=draw(st.one_of(st.none(), rnn_configs())))
    return S.EncoderDecoderConfig(encoder=enc, decoder=draw(fc_configs()))


def _model_strategy(family):
    if family == "ds1":
        return st.builds(S.DeepSpeech1Config,
                         n_hidden=st.sampled_from([8, 16]),
                         relu_clip=st.sampled_from([5.0, 20.0]),
                         forget_gate_bias=st.just(1.0))
    if family == "ds2":
        return ds2_configs()
    if family == "encdec":
        return encoder_decoder_configs()
    return rnnt_configs()


@st.composite
def family_task_configs(draw, family):
    """A random valid TaskConfig pinned to one model family."""
    model = draw(_model_strategy(family))
    # Reduction NONE is a loss-fn surface, not a trainable objective —
    # the train step needs a scalar.
    red = draw(st.sampled_from([S.Reduction.MEAN, S.Reduction.SUM]))
    if family == "rnnt":
        loss = S.RNNTLossConfig(blank_index=0, reduction=red)
        post = draw(st.one_of(
            st.builds(S.RNNTGreedyDecoderConfig, blank_index=st.just(0),
                      max_symbols_per_step=st.sampled_from([1, 4])),
            st.builds(S.RNNTBeamDecoderConfig, blank_index=st.just(0),
                      beam_width=st.sampled_from([2, 4]),
                      length_norm=st.booleans())))
    else:
        loss = S.CTCLossConfig(blank_index=0, reduction=red)
        post = draw(st.one_of(
            st.builds(S.CTCGreedyDecoderConfig, blank_index=st.just(0)),
            st.builds(S.CTCBeamDecoderConfig, blank_index=st.just(0),
                      beam_width=st.sampled_from([2, 4]))))
    steps = (S.PreProcessStepConfig(S.MFCCConfig(
        n_mels=8, log_mel_only=draw(st.booleans()))),)
    if draw(st.booleans()):
        steps = steps + (S.PreProcessStepConfig(S.StandardizeConfig()),)
    if draw(st.booleans()):
        steps = steps + (S.PreProcessStepConfig(S.SpecAugmentConfig(
            feature_mask=2, time_mask=2, n_feature_masks=1,
            n_time_masks=1)),)
    stt = S.SpeechToTextConfig(alphabet=ALPHABET, pre_process_steps=steps,
                               model=model, loss=loss, post_process=post)
    opt = draw(st.one_of(
        st.builds(S.SGDConfig, learning_rate=st.just(0.01),
                  momentum=st.sampled_from([0.0, 0.9])),
        st.builds(S.AdamConfig, learning_rate=st.just(1e-3))))
    return S.TaskConfig(
        speech_to_text=stt,
        train_config=S.TrainConfig(batch_size=2, epochs=1, optimizer=opt,
                                   grad_clip_norm=draw(
                                       st.one_of(st.none(), st.just(1.0))),
                                   compute_dtype="float32"),
        train_dataset=S.FakeSpeechToTextConfig(
            dataset_len=3, audio_ms=S.IntRange(60, 90),
            label_symbols="abc ", label_len=S.IntRange(1, 3)),
    )


def _tree_l2_delta(a, b):
    leaves = jax.tree_util.tree_map(
        lambda x, y: float(jnp.sum(jnp.abs(x.astype(jnp.float32)
                                           - y.astype(jnp.float32)))),
        a, b)
    return sum(jax.tree_util.tree_leaves(leaves))


def _drive(cfg):
    """build -> one train step -> one decoding eval step, with checks."""
    try:
        task = B.build_task(cfg, steps_per_epoch=2)
    except ValueError as e:
        # Only the static-shape diagnostic may reject a generated config.
        assert "collapses" in str(e)
        assume(False)
        return

    # --- reflection checks ------------------------------------------------
    stt = cfg.speech_to_text
    assert task.transducer == isinstance(stt.model, S.RNNTConfig)
    if task.transducer:
        assert task.model.vocab_size == V
    else:
        assert task.model.out_features == V
    assert len(task.alphabet) == len(ALPHABET)
    assert callable(task.optimizer.update) and callable(task.lr_schedule)
    lr0 = float(task.lr_schedule(0))
    assert np.isfinite(lr0) and lr0 >= 0

    # --- one real train + eval step --------------------------------------
    loader = BucketedLoader(task.train_dataset, task.alphabet,
                            cfg.train_config.batch_size, shuffle=False)
    batch = next(k for k in loader)
    arrays = {k: v for k, v in batch.items() if k != "texts"}
    try:
        state = init_state(task, jax.random.PRNGKey(0), arrays)
    except ValueError as e:
        # The static-shape diagnostic can also fire at trace time: the
        # bucketed batch's ACTUAL frame count may collapse under a conv
        # stack even when the builder's nominal check passed (e.g. a
        # 100 ms utterance -> T=4 frames vs kernel_time=5, padding NONE).
        # That rejection is the intended behaviour, not a failure.
        assert "collapses" in str(e)
        assume(False)
        return
    # make_train_step donates state; keep a host copy for the before/after
    # param-movement check.
    params_before = jax.tree_util.tree_map(np.asarray, state.params)
    new_state, metrics = make_train_step(task)(state, arrays)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    assert int(new_state.step) == 1
    # Params must move — unless every example in the batch is
    # CTC-infeasible (labels longer than the model's output frames, e.g.
    # 100 ms audio through two unpadded k_t=5 convs).  The losses clamp
    # infeasible lattices to the finite NEG_INF constant (soft-fail,
    # deliberately unlike torch's inf/NaN), whose gradient is exactly 0;
    # the huge loss value is the fingerprint of that case.
    if _tree_l2_delta(new_state.params, params_before) == 0:
        assert float(metrics["loss"]) > 1e9, \
            "zero param movement with a normal-scale loss"

    ev = make_eval_step(task, decode=True, max_output_len=12)(
        new_state, arrays)
    assert np.isfinite(float(ev["loss"]))
    toks = np.asarray(ev["decoded_tokens"])
    lens = np.asarray(ev["decoded_lens"])
    assert toks.shape[0] == arrays["wav"].shape[0]
    assert (lens >= 0).all() and (lens <= toks.shape[1]).all()
    for i, n in enumerate(lens):
        valid = toks[i, :n]
        assert ((valid >= 0) & (valid < V)).all()


@pytest.mark.parametrize("family", ["ds1", "ds2", "encdec", "rnnt"])
def test_family_tasks_train_and_eval(family):
    @given(family_task_configs(family))
    @settings(**_SETTINGS)
    def run(cfg):
        _drive(cfg)

    run()
