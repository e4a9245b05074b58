"""Model-module tests: shapes, seq-lens correctness, gradient flow.

Mirrors the reference's ``tests/model/`` strategy: random shapes ->
forward -> assert output shape and sequence-length correctness; padding
independence (the masked-conv/masked-RNN contract); gradient flow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myrtlespeech_tpu.config.schema import (
    Activation, Conv2dConfig, DeepSpeech1Config, DeepSpeech2Config,
    EncoderConfig, EncoderDecoderConfig, FullyConnectedConfig,
    LookaheadConfig, PaddingMode, RNNConfig, RNNTConfig, RNNTEncoderConfig,
    RNNTJointNetConfig, RNNTPredictNetConfig, RNNType, VGGConfig,
)
from myrtlespeech_tpu.models.cnn import ConvBlock, conv_block_out_features
from myrtlespeech_tpu.models.deep_speech_1 import DeepSpeech1
from myrtlespeech_tpu.models.deep_speech_2 import DeepSpeech2
from myrtlespeech_tpu.models.encoder_decoder import EncoderDecoder
from myrtlespeech_tpu.models.rnn import RNN
from myrtlespeech_tpu.models.rnn_t import RNNT, time_reduce
from myrtlespeech_tpu.models.vgg import VGG, vgg_output_size


def _data(B=2, T=20, F=8, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    lens = jnp.asarray(np.array([T, T // 2][:B] + [T] * max(0, B - 2),
                                np.int32))
    return x, lens


def test_conv_block_shapes_and_lens():
    cfgs = (Conv2dConfig(out_channels=4, kernel_time=5, kernel_feature=5,
                         stride_time=2, stride_feature=2,
                         padding=PaddingMode.SAME),)
    x, lens = _data(T=21, F=9)
    m = ConvBlock(cfgs, dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x, lens, False)
    y, out_lens = m.apply(vars_, x, lens, False,
                          mutable=["batch_stats"])[0]
    assert y.shape[0] == 2
    assert y.shape[2] == conv_block_out_features(cfgs, 9)
    # stride 2, SAME pad 2, k 5: out = floor((L + 4 - 4 - 1)/2 + 1)
    np.testing.assert_array_equal(np.asarray(out_lens), [11, 5])


def test_conv_block_padding_independence():
    """Changing padded region must not change valid outputs."""
    cfgs = (Conv2dConfig(out_channels=3, kernel_time=3, kernel_feature=3,
                         stride_time=1, stride_feature=1, batch_norm=False),)
    x, lens = _data(T=12, F=6)
    m = ConvBlock(cfgs, dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x, lens, False)
    y1, l1 = m.apply(vars_, x, lens, False)
    x2 = x.at[:, 6:, :].add(100.0)  # corrupt row 1's padding (len 6)
    y2, _ = m.apply(vars_, x2, lens, False)
    np.testing.assert_allclose(np.asarray(y1[1, :int(l1[1])]),
                               np.asarray(y2[1, :int(l1[1])]), atol=1e-5)


@pytest.mark.parametrize("rnn_type", [RNNType.LSTM, RNNType.GRU,
                                      RNNType.BASIC_RNN])
@pytest.mark.parametrize("bidirectional", [False, True])
def test_rnn_module(rnn_type, bidirectional):
    cfg = RNNConfig(rnn_type=rnn_type, hidden_size=12, num_layers=2,
                    bidirectional=bidirectional, forget_gate_bias=1.0)
    x, lens = _data()
    m = RNN(cfg, dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x, lens)
    y, out_lens, states = m.apply(vars_, x, lens)
    dirs = 2 if bidirectional else 1
    assert y.shape == (2, 20, 12 * dirs)
    np.testing.assert_array_equal(np.asarray(out_lens), np.asarray(lens))
    # padded outputs must be zero
    assert float(jnp.abs(y[1, 10:]).sum()) == 0.0
    assert len(states) == 2


def test_rnn_forget_gate_bias_applied():
    cfg = RNNConfig(rnn_type=RNNType.LSTM, hidden_size=4, num_layers=1,
                    forget_gate_bias=2.5)
    x, lens = _data(F=8)
    m = RNN(cfg, dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x, lens)
    b = np.asarray(vars_["params"]["l0_fwd_b"])
    np.testing.assert_allclose(b[4:8], 2.5)
    np.testing.assert_allclose(b[:4], 0.0)


def test_deep_speech_1():
    cfg = DeepSpeech1Config(n_hidden=16, drop_prob=0.1)
    x, lens = _data(F=10)
    m = DeepSpeech1(cfg, out_features=29, dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x, lens, False)
    logits, out_lens = m.apply(vars_, x, lens, False)
    assert logits.shape == (2, 20, 29)
    np.testing.assert_array_equal(np.asarray(out_lens), np.asarray(lens))


def test_deep_speech_2_full():
    cfg = DeepSpeech2Config(
        conv_block=(Conv2dConfig(out_channels=4, kernel_time=5,
                                 kernel_feature=5, stride_time=2,
                                 stride_feature=2),),
        rnn=RNNConfig(hidden_size=16, num_layers=2, bidirectional=True,
                      batch_norm=True),
        fully_connected=FullyConnectedConfig(num_hidden_layers=1,
                                             hidden_size=32,
                                             activation=Activation.RELU))
    x, lens = _data(T=20, F=12)
    m = DeepSpeech2(cfg, out_features=29, dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x, lens, False)
    (logits, out_lens), _ = m.apply(vars_, x, lens, True,
                                    mutable=["batch_stats"],
                                    rngs={"dropout": jax.random.PRNGKey(1)})
    assert logits.shape[0] == 2 and logits.shape[2] == 29
    assert int(out_lens[0]) == 10


def test_deep_speech_2_lookahead_unidirectional():
    cfg = DeepSpeech2Config(
        conv_block=(),
        rnn=RNNConfig(hidden_size=8, num_layers=1, bidirectional=False),
        lookahead=LookaheadConfig(context=3),
        fully_connected=FullyConnectedConfig())
    x, lens = _data(F=6)
    m = DeepSpeech2(cfg, out_features=5, dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x, lens, False)
    logits, out_lens = m.apply(vars_, x, lens, False)
    assert logits.shape == (2, 20, 5)


def test_lookahead_rejected_for_bidirectional():
    cfg = DeepSpeech2Config(
        conv_block=(),
        rnn=RNNConfig(hidden_size=8, bidirectional=True),
        lookahead=LookaheadConfig(context=3))
    x, lens = _data(F=6)
    m = DeepSpeech2(cfg, out_features=5, dtype=jnp.float32)
    with pytest.raises(ValueError):
        m.init(jax.random.PRNGKey(0), x, lens, False)


def test_vgg_shapes():
    cfg = VGGConfig(use_output_from_block=2)
    x, lens = _data(T=20, F=16)
    m = VGG(cfg, dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x, lens, False)
    y, out_lens = m.apply(vars_, x, lens, False)
    assert y.shape == (2, 5, vgg_output_size(cfg, 16))
    np.testing.assert_array_equal(np.asarray(out_lens), [5, 2])


def test_encoder_decoder():
    cfg = EncoderDecoderConfig(
        encoder=EncoderConfig(
            conv_block=(Conv2dConfig(out_channels=4, kernel_time=3,
                                     kernel_feature=3),),
            rnn=RNNConfig(hidden_size=8, num_layers=1)),
        decoder=FullyConnectedConfig(num_hidden_layers=1, hidden_size=16,
                                     activation=Activation.RELU))
    x, lens = _data(F=8)
    m = EncoderDecoder(cfg, out_features=11, dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x, lens, False)
    (logits, out_lens), _ = m.apply(vars_, x, lens, True,
                                    mutable=["batch_stats"])
    assert logits.shape[-1] == 11


def test_time_reduce():
    x = jnp.arange(2 * 5 * 3, dtype=jnp.float32).reshape(2, 5, 3)
    y, lens = time_reduce(x, jnp.asarray([5, 3]), 2)
    assert y.shape == (2, 3, 6)
    np.testing.assert_array_equal(np.asarray(lens), [3, 2])
    np.testing.assert_array_equal(np.asarray(y[0, 0]),
                                  np.asarray(x[0, :2].reshape(-1)))


def _small_rnnt():
    return RNNTConfig(
        encoder=RNNTEncoderConfig(
            rnn1=RNNConfig(hidden_size=8, num_layers=1),
            time_reduction_factor=2,
            rnn2=RNNConfig(hidden_size=8, num_layers=1)),
        prediction=RNNTPredictNetConfig(
            embedding_dim=6, rnn=RNNConfig(hidden_size=8, num_layers=1)),
        joint=RNNTJointNetConfig(
            fc=FullyConnectedConfig(num_hidden_layers=1, hidden_size=8,
                                    activation=Activation.RELU)))


def test_rnnt_forward_shapes():
    cfg = _small_rnnt()
    V = 7
    x, lens = _data(T=10, F=5)
    labels = jnp.asarray(np.array([[1, 2, 3], [2, 1, 0]], np.int32))
    label_lens = jnp.asarray(np.array([3, 2], np.int32))
    m = RNNT(cfg, vocab_size=V, dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x, lens, labels, label_lens, False)
    logits, f_lens = m.apply(vars_, x, lens, labels, label_lens, False)
    assert logits.shape == (2, 5, 4, V)  # T'=ceil(10/2), U+1=4
    np.testing.assert_array_equal(np.asarray(f_lens), [5, 3])


@pytest.mark.parametrize("num_hidden", [0, 1, 2])
def test_rnnt_joint_factoring_matches_concat(num_hidden):
    """RNNTJoint's factored first layer == explicit broadcast-concat MLP.

    The factored joint computes ``act(f) @ K[:Hf] + act(g) @ K[Hf:] + b``;
    the unfactored reference semantics (SURVEY.md §3.3) build the
    ``(B, T, U+1, Hf+Hg)`` concat and run the whole MLP on it.  Both must
    agree to fp32 tolerance for every num_hidden_layers, including the
    single-step (ndim==2) decode path.
    """
    from myrtlespeech_tpu.models.activations import apply_activation
    from myrtlespeech_tpu.models.rnn_t import RNNTJoint

    rng = np.random.RandomState(0)
    B, T, U1, Hf, Hg, V = 2, 4, 3, 6, 5, 7
    jc = RNNTJointNetConfig(
        activation=Activation.RELU,
        fc=FullyConnectedConfig(num_hidden_layers=num_hidden, hidden_size=8,
                                activation=Activation.RELU))
    f = jnp.asarray(rng.randn(B, T, Hf).astype(np.float32))
    g = jnp.asarray(rng.randn(B, U1, Hg).astype(np.float32))
    m = RNNTJoint(jc, vocab_size=V, h_enc=Hf, h_pred=Hg, dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(1), f, g, False)
    out = m.apply(vars_, f, g, False)
    assert out.shape == (B, T, U1, V)

    # Reference: explicit broadcast concat through the same parameters.
    fa = apply_activation(jc.activation, f)
    ga = apply_activation(jc.activation, g)
    h = jnp.concatenate([
        jnp.broadcast_to(fa[:, :, None, :], (B, T, U1, Hf)),
        jnp.broadcast_to(ga[:, None, :, :], (B, T, U1, Hg))], axis=-1)
    h = h @ vars_["params"]["kernel"] + vars_["params"]["bias"]
    ref = m.apply(vars_, h, False, method=RNNTJoint.tail)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # Single-step decode path agrees with the (t, u) cell of the full grid.
    out2 = m.apply(vars_, f[:, 1, :], g[:, 2, :], False)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out[:, 1, 2]),
                               atol=1e-5)


def test_rnnt_exposed_parts_consistent():
    """encode + predict + joint == __call__ (decoders rely on the parts)."""
    cfg = _small_rnnt()
    V = 7
    x, lens = _data(T=8, F=5)
    labels = jnp.asarray(np.array([[1, 2], [3, 1]], np.int32))
    label_lens = jnp.asarray(np.array([2, 2], np.int32))
    m = RNNT(cfg, vocab_size=V, dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x, lens, labels, label_lens, False)
    full, f_lens = m.apply(vars_, x, lens, labels, label_lens, False)
    f, f_lens2 = m.apply(vars_, x, lens, method=RNNT.encode)
    g = m.apply(vars_, labels, label_lens, method=RNNT.predict)
    parts = m.apply(vars_, f, g, method=RNNT.joint)
    np.testing.assert_allclose(np.asarray(full), np.asarray(parts),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(f_lens), np.asarray(f_lens2))


def test_rnnt_predict_step_matches_predict():
    """Stepping token-by-token must equal the batched predict() path."""
    cfg = _small_rnnt()
    V, B = 7, 2
    x, lens = _data(T=8, F=5)
    labels = jnp.asarray(np.array([[1, 2, 3], [3, 1, 2]], np.int32))
    label_lens = jnp.asarray(np.array([3, 3], np.int32))
    m = RNNT(cfg, vocab_size=V, dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x, lens, labels, label_lens, False)
    g_full = m.apply(vars_, labels, label_lens, method=RNNT.predict)

    from myrtlespeech_tpu.ops.rnn import LSTMState
    H = cfg.prediction.rnn.hidden_size
    state = [[LSTMState(h=jnp.zeros((B, H)), c=jnp.zeros((B, H)))]]
    g, state = m.apply(vars_, jnp.full((B,), -1, jnp.int32), state,
                       method=RNNT.predict_step)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_full[:, 0]),
                               atol=1e-5)
    for u in range(3):
        g, state = m.apply(vars_, labels[:, u], state,
                           method=RNNT.predict_step)
        np.testing.assert_allclose(np.asarray(g),
                                   np.asarray(g_full[:, u + 1]), atol=1e-5)


def test_gradient_flow_ds2():
    cfg = DeepSpeech2Config(
        conv_block=(Conv2dConfig(out_channels=2, kernel_time=3,
                                 kernel_feature=3, batch_norm=False),),
        rnn=RNNConfig(hidden_size=8, num_layers=1, bidirectional=True),
        fully_connected=FullyConnectedConfig())
    x, lens = _data(F=6)
    m = DeepSpeech2(cfg, out_features=5, dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x, lens, False)

    def loss(params):
        logits, _ = m.apply({"params": params}, x, lens, False)
        return jnp.sum(logits ** 2)

    grads = jax.grad(loss)(vars_["params"])
    total = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert total > 0
    assert all(bool(jnp.isfinite(g).all())
               for g in jax.tree_util.tree_leaves(grads))


def test_masked_batch_norm_excludes_padding():
    """MaskedBatchNorm statistics must come only from valid frames: a
    batch whose padding is poisoned must normalise identically to one
    with zero padding (torch BN over packed frames semantics)."""
    from myrtlespeech_tpu.models.normalization import MaskedBatchNorm

    B, T, F = 3, 8, 4
    rng = np.random.default_rng(3)
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    lens = np.asarray([8, 5, 3], np.int32)
    x2 = x.copy()
    for b, l in enumerate(lens):
        x2[b, l:] = 99.0

    m = MaskedBatchNorm(dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), jnp.asarray(x),
                   jnp.asarray(lens), use_running_average=False)
    y1, st1 = m.apply(vars_, jnp.asarray(x), jnp.asarray(lens),
                      use_running_average=False, mutable=["batch_stats"])
    y2, st2 = m.apply(vars_, jnp.asarray(x2), jnp.asarray(lens),
                      use_running_average=False, mutable=["batch_stats"])
    mask = (np.arange(T)[None, :] < lens[:, None])[..., None]
    np.testing.assert_allclose(np.asarray(y1) * mask, np.asarray(y2) * mask,
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st1["batch_stats"]),
                    jax.tree_util.tree_leaves(st2["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_masked_batch_norm_matches_torch_on_valid_frames():
    """Against torch.nn.BatchNorm1d over the packed (valid-only) frames."""
    import torch

    from myrtlespeech_tpu.models.normalization import MaskedBatchNorm

    B, T, F = 2, 6, 3
    rng = np.random.default_rng(4)
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    lens = np.asarray([6, 4], np.int32)

    m = MaskedBatchNorm(dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), jnp.asarray(x),
                   jnp.asarray(lens), use_running_average=False)
    y, _ = m.apply(vars_, jnp.asarray(x), jnp.asarray(lens),
                   use_running_average=False, mutable=["batch_stats"])

    packed = np.concatenate([x[b, :l] for b, l in enumerate(lens)])
    tm = torch.nn.BatchNorm1d(F, affine=True)
    torch.nn.init.ones_(tm.weight); torch.nn.init.zeros_(tm.bias)
    ref = tm(torch.tensor(packed)).detach().numpy()
    got = np.concatenate(
        [np.asarray(y)[b, :l] for b, l in enumerate(lens)])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
