"""Builders: TaskConfig -> runnable objects.

TPU-native counterpart of the reference's ``src/myrtlespeech/builders/``
package (one ``build`` per proto message).  The same validate-and-recurse
pattern applies, but the product is functional: flax modules, pure
preprocess/loss/decode callables, an optax optimizer — everything the
jitted train/eval steps close over.

Blank-index convention (mirrors reference semantics): the model's output
vocabulary is ``max(len(alphabet), blank_index + 1)``.  If ``blank_index ==
len(alphabet)`` the blank gets a dedicated extra row; if it is inside the
alphabet range, the config's alphabet contains a placeholder symbol at that
position (how the reference's example configs do it).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from myrtlespeech_tpu.config import schema as S
from myrtlespeech_tpu.data.alphabet import Alphabet
from myrtlespeech_tpu.data.dataset.fake import FakeSpeechToText
from myrtlespeech_tpu.data.dataset.librispeech import LibriSpeech
from myrtlespeech_tpu.decoding.ctc_beam import ctc_beam_decode
from myrtlespeech_tpu.decoding.ctc_greedy import ctc_greedy_decode
from myrtlespeech_tpu.decoding.rnnt_beam import rnnt_beam_decode
from myrtlespeech_tpu.decoding.rnnt_greedy import rnnt_greedy_decode
from myrtlespeech_tpu.models.deep_speech_1 import DeepSpeech1
from myrtlespeech_tpu.models.deep_speech_2 import DeepSpeech2
from myrtlespeech_tpu.models.encoder_decoder import EncoderDecoder
from myrtlespeech_tpu.models.rnn_t import RNNT
from myrtlespeech_tpu.ops import features as F
from myrtlespeech_tpu.ops.ctc import ctc_loss
from myrtlespeech_tpu.ops.rnn import LSTMState
from myrtlespeech_tpu.ops.rnnt import rnnt_loss
from myrtlespeech_tpu.ops.specaugment import spec_augment


# ---------------------------------------------------------------------------
# Alphabet / vocab
# ---------------------------------------------------------------------------


def build_alphabet(cfg: S.SpeechToTextConfig) -> Alphabet:
    return Alphabet(cfg.alphabet)


def _loss_blank_index(cfg: S.SpeechToTextConfig) -> int:
    return cfg.loss.blank_index


def vocab_size(cfg: S.SpeechToTextConfig) -> int:
    return max(len(cfg.alphabet), _loss_blank_index(cfg) + 1)


# ---------------------------------------------------------------------------
# Pre-processing
# ---------------------------------------------------------------------------


def build_preprocess(steps: Tuple[S.PreProcessStepConfig, ...]):
    """Build ``fn(rng, wav, wav_lens, train) -> (feats, frame_lens)``.

    The whole chain runs on device inside jit.  If no feature step is
    configured the raw waveform is framed as 1-dim features (degenerate but
    valid, mirrors reference behaviour of requiring an MFCC step in real
    configs).
    """

    def apply(rng, wav, wav_lens, train: bool):
        x, lens = wav, wav_lens
        is_features = False
        for step_cfg in steps:
            if step_cfg.stage is S.StageSelector.TRAIN and not train:
                continue
            if step_cfg.stage is S.StageSelector.EVAL and train:
                continue
            st = step_cfg.step
            if isinstance(st, S.MFCCConfig):
                n_fft = st.n_fft or _next_pow2(
                    int(st.win_length_ms * st.sample_rate / 1000))
                win = int(st.win_length_ms * st.sample_rate / 1000)
                hop = int(st.hop_length_ms * st.sample_rate / 1000)
                if st.log_mel_only:
                    x, lens = F.log_mel_spectrogram(
                        x, lens, sample_rate=st.sample_rate, n_fft=n_fft,
                        win_length=win, hop_length=hop, n_mels=st.n_mels)
                else:
                    x, lens = F.mfcc(
                        x, lens, sample_rate=st.sample_rate, n_fft=n_fft,
                        win_length=win, hop_length=hop, n_mels=st.n_mels,
                        n_mfcc=st.n_mfcc)
                is_features = True
            elif isinstance(st, S.StandardizeConfig):
                x = F.standardize(x, lens, eps=st.eps)
            elif isinstance(st, S.ContextFramesConfig):
                x = F.add_context_frames(x, st.n_context)
            elif isinstance(st, S.SpecAugmentConfig):
                rng, key = jax.random.split(rng)
                x = spec_augment(
                    key, x, lens, feature_mask=st.feature_mask,
                    time_mask=st.time_mask,
                    n_feature_masks=st.n_feature_masks,
                    n_time_masks=st.n_time_masks,
                    time_mask_ratio=st.time_mask_ratio)
            else:
                raise ValueError(f"unknown preprocess step {st}")
        if not is_features:
            x = x[..., None]  # (B, S, 1) raw-sample "features"
        return x, lens

    return apply


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def preprocess_out_features(steps: Tuple[S.PreProcessStepConfig, ...]) -> int:
    """Static feature dim produced by :func:`build_preprocess`."""
    f = 1
    for step_cfg in steps:
        st = step_cfg.step
        if isinstance(st, S.MFCCConfig):
            f = st.n_mels if st.log_mel_only else st.n_mfcc
        elif isinstance(st, S.ContextFramesConfig):
            f = f * (2 * st.n_context + 1)
    return f


# ---------------------------------------------------------------------------
# Models
# ---------------------------------------------------------------------------


def validate_model_shapes(model_cfg: S.ModelConfig, in_features: int) -> None:
    """Static feature-shape validation (reference builders thread feature
    sizes downward, SURVEY.md §2.2; here the formulas live in
    ``models/cnn.py::conv_block_out_features`` / ``models/vgg.py::
    vgg_output_size``).  Raises ``ValueError`` with a per-layer diagnostic
    when a conv/VGG frontend collapses the feature dim to <= 0."""
    from myrtlespeech_tpu.models.vgg import vgg_output_size
    from myrtlespeech_tpu.ops.masking import conv_out_size, same_padding

    def walk_conv_block(layers, f, where):
        for li, c in enumerate(layers):
            pad_f = (same_padding(c.kernel_feature)
                     if c.padding is S.PaddingMode.SAME else 0)
            f_out = conv_out_size(f, c.kernel_feature, c.stride_feature,
                                  pad_f)
            if f_out <= 0:
                raise ValueError(
                    f"{where} conv layer {li} collapses the feature dim "
                    f"{f} -> {f_out} (kernel_feature={c.kernel_feature}, "
                    f"stride_feature={c.stride_feature}, "
                    f"padding={c.padding.name}); with {in_features} input "
                    f"features every conv output dim must be > 0")
            f = f_out
        return f

    if isinstance(model_cfg, S.DeepSpeech2Config):
        walk_conv_block(model_cfg.conv_block, in_features, "DeepSpeech2")
    elif isinstance(model_cfg, S.EncoderDecoderConfig):
        f = in_features
        enc = model_cfg.encoder
        if enc.vgg is not None:
            f = vgg_output_size(enc.vgg, f)
            if f <= 0:
                raise ValueError(
                    f"VGG frontend collapses the feature dim to {f} from "
                    f"{in_features} input features; reduce "
                    f"use_output_from_block or increase n_mels")
        if enc.conv_block:
            # ConvBlock sees the (possibly VGG-flattened) features as its
            # input width (models/encoder_decoder.py::Encoder order).
            walk_conv_block(enc.conv_block, f, "Encoder")


def build_model(cfg: S.SpeechToTextConfig, dtype=jnp.bfloat16,
                in_features: Optional[int] = None):
    V = vocab_size(cfg)
    m = cfg.model
    if in_features is not None:
        validate_model_shapes(m, in_features)
    if isinstance(m, S.DeepSpeech1Config):
        return DeepSpeech1(m, out_features=V, dtype=dtype)
    if isinstance(m, S.DeepSpeech2Config):
        return DeepSpeech2(m, out_features=V, dtype=dtype)
    if isinstance(m, S.EncoderDecoderConfig):
        return EncoderDecoder(m, out_features=V, dtype=dtype)
    if isinstance(m, S.RNNTConfig):
        return RNNT(m, vocab_size=V, dtype=dtype)
    raise ValueError(f"unknown model config {type(m)}")


def is_transducer(cfg: S.SpeechToTextConfig) -> bool:
    return isinstance(cfg.model, S.RNNTConfig)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def weighted_reduce(nll, reduction: str, weights=None, label_lens=None,
                    ctc_mean: bool = False):
    """Apply loss reduction with optional per-example weights.

    ``weights`` (``(B,)`` 0/1 floats or bools, or None) masks duplicated
    pad rows out of the batch statistic: ``BucketedLoader`` fills the last
    chunk of a bucket by repeating the final sample (``data/batch.py``),
    and without the mask those duplicates bias the mean loss and get
    double gradient weight (VERDICT r2 weak #7).  ``ctc_mean`` selects the
    torch-CTC 'mean' semantics (per-example loss divided by target length
    before averaging); transducer 'mean' is the plain batch mean
    (warp-transducer semantics).
    """
    if ctc_mean and reduction == "mean":
        nll = nll / jnp.maximum(label_lens, 1).astype(nll.dtype)
    if reduction == "none":
        return nll
    if weights is None:
        return jnp.sum(nll) if reduction == "sum" else jnp.mean(nll)
    w = weights.astype(nll.dtype)
    if reduction == "sum":
        return jnp.sum(nll * w)
    if reduction == "mean":
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)
    raise ValueError(f"unknown reduction {reduction!r}")


def build_loss(cfg: S.SpeechToTextConfig) -> Callable:
    lc = cfg.loss
    red = lc.reduction.value
    if isinstance(lc, S.CTCLossConfig):
        def ctc(logits, logit_lens, labels, label_lens, weights=None):
            from myrtlespeech_tpu.ops.pallas import pallas_lattice_supported
            if jax.default_backend() == "tpu" \
                    and pallas_lattice_supported(logits.shape[0]):
                from myrtlespeech_tpu.ops.pallas.ctc_kernel import \
                    ctc_loss_pallas as fn
            else:
                fn = ctc_loss
            nll = fn(logits, logit_lens, labels, label_lens,
                     blank_index=lc.blank_index, reduction="none")
            return weighted_reduce(nll, red, weights, label_lens,
                                   ctc_mean=True)

        return ctc
    if isinstance(lc, S.RNNTLossConfig):
        def transducer(logits, logit_lens, labels, label_lens, weights=None):
            # Pallas lattice kernels on TPU; pure-lax elsewhere.
            from myrtlespeech_tpu.ops.pallas import pallas_lattice_supported
            if jax.default_backend() == "tpu" \
                    and pallas_lattice_supported(logits.shape[0]):
                from myrtlespeech_tpu.ops.pallas.rnnt_kernel import \
                    rnnt_loss_pallas as fn
            else:
                fn = rnnt_loss
            nll = fn(logits, logit_lens, labels, label_lens,
                     blank_index=lc.blank_index, reduction="none")
            return weighted_reduce(nll, red, weights)

        return transducer
    raise ValueError(f"unknown loss config {type(lc)}")


def build_fused_transducer_loss(cfg: S.SpeechToTextConfig, model,
                                force: bool = False) -> Optional[Callable]:
    """Joint+loss fusion for transducer tasks (ops/rnnt.py::rnnt_loss_fused).

    Returns ``fused(variables, f, f_lens, g, labels, label_lens, train,
    rngs, chunk_size) -> loss`` or None (CTC task / fusion disabled via
    ``RNNTLossConfig.fused_chunk_size=None`` — unless ``force``, used for
    the HBM memory planner's auto-fusion, ``run/memory.py``).
    """
    lc = cfg.loss
    if not isinstance(lc, S.RNNTLossConfig):
        return None
    if lc.fused_chunk_size is None and not force:
        return None
    from myrtlespeech_tpu.ops.rnnt import rnnt_loss_fused

    default_chunk = lc.fused_chunk_size or 32
    red = lc.reduction.value

    def fused(variables, f, f_lens, g, labels, label_lens,
              train: bool = False, rngs=None, chunk_size=None, weights=None):
        def joint_apply(f_chunk):
            # NB: dropout rngs (if any) repeat across chunks — the joint
            # net's dropout mask is per-chunk-position, which is fine for
            # the MLPerf recipe (joint dropout unset).
            return model.apply(variables, f_chunk, g, train,
                               method=RNNT.joint,
                               rngs=rngs if train else None)

        nll = rnnt_loss_fused(f, f_lens, g, labels, label_lens, joint_apply,
                              blank_index=lc.blank_index, reduction="none",
                              chunk_size=chunk_size or default_chunk)
        return weighted_reduce(nll, red, weights)

    return fused


def build_pallas_joint_loss(cfg: S.SpeechToTextConfig, model
                            ) -> Optional[Callable]:
    """Fully-fused transducer joint tail + blank/emit + lattice.

    The fastest/leanest transducer loss path: after the factored joint
    projections (``RNNTJoint.project`` — two small matmuls), the Pallas
    joint-tail kernel (``ops/pallas/joint_kernel.py``) evaluates
    ``act(fp+gp) @ W2 + b2`` tile by tile and emits only the two
    ``(B, T, U+1)`` lattice inputs, in forward AND backward — no
    ``(B, T, U+1, K)`` hidden or ``(B, T, U+1, V)`` logits tensor ever
    exists (SURVEY.md §3.3 memory hot spot; the reference materialises the
    full joint for warp-transducer, ``src/myrtlespeech/loss/rnn_t_loss.py``).
    The lattice then runs in Pallas too (``rnnt_kernel.rnnt_lattice``).

    Returns a callable with the ``build_fused_transducer_loss`` signature,
    or None when the joint topology falls outside the kernel (>1 hidden
    layer, exotic activation) — dispatch and the train-time dropout gate
    live in ``run/train.py::_select_joint_path``.
    """
    lc = cfg.loss
    if not isinstance(lc, S.RNNTLossConfig):
        return None
    from myrtlespeech_tpu.ops.pallas.joint_kernel import joint_tail_supported

    jfc = cfg.model.joint.fc
    act = jfc.activation.name.lower()
    # Static topology gate only (eval-mode flags): train-time dropout is
    # checked per-step by the dispatcher, which knows ``train``.
    if not joint_tail_supported(act, jfc.num_hidden_layers, 0.0, False):
        return None
    red = lc.reduction.value
    blank = lc.blank_index
    mxu_dtype = jnp.dtype(model.dtype).name

    def pallas_joint(variables, f, f_lens, g, labels, label_lens,
                     train: bool = False, rngs=None, chunk_size=None,
                     weights=None):
        from myrtlespeech_tpu.ops.pallas import pallas_lattice_supported
        from myrtlespeech_tpu.ops.pallas.joint_kernel import \
            joint_tail_blank_emit
        from myrtlespeech_tpu.ops.pallas.rnnt_kernel import rnnt_lattice
        from myrtlespeech_tpu.ops.rnnt import \
            rnnt_log_likelihood_from_blank_emit

        del rngs, chunk_size  # no dropout in-kernel; nothing to chunk
        fp, gp = model.apply(variables, f, g, method=RNNT.joint_project)
        dense = variables["params"]["joint_net"]["rest"]["Dense_0"]
        lp_blank, lp_emit = joint_tail_blank_emit(
            fp, gp, dense["kernel"], dense["bias"], labels, blank, act,
            20.0, 0, mxu_dtype)
        if jax.default_backend() == "tpu" \
                and pallas_lattice_supported(lp_blank.shape[0]):
            ll = rnnt_lattice(lp_blank, lp_emit, f_lens, label_lens)
        else:
            ll = rnnt_log_likelihood_from_blank_emit(
                lp_blank, lp_emit, f_lens, label_lens)
        return weighted_reduce(-ll, red, weights)

    return pallas_joint


def validate(cfg: S.SpeechToTextConfig) -> None:
    """Cross-field checks the reference's builders enforce."""
    transducer_model = is_transducer(cfg)
    transducer_loss = isinstance(cfg.loss, S.RNNTLossConfig)
    if transducer_model != transducer_loss:
        raise ValueError("RNNT model requires rnn_t_loss and vice versa")
    transducer_decoder = isinstance(
        cfg.post_process,
        (S.RNNTGreedyDecoderConfig, S.RNNTBeamDecoderConfig))
    if transducer_model != transducer_decoder:
        raise ValueError("model family and decoder family must match")
    if cfg.post_process.blank_index != cfg.loss.blank_index:
        raise ValueError("decoder and loss blank_index must agree")


# ---------------------------------------------------------------------------
# Decoders
# ---------------------------------------------------------------------------


def build_rnnt_decode_helpers(model: RNNT, cfg: S.RNNTConfig):
    """Closures (predict_step, joint_step, init_state_fn) over model.apply."""

    def init_state_fn(n: int):
        c = cfg.prediction.rnn
        return [
            [LSTMState(h=jnp.zeros((n, c.hidden_size), jnp.float32),
                       c=jnp.zeros((n, c.hidden_size), jnp.float32))]
            for _ in range(c.num_layers)
        ]

    def make(variables):
        def predict_step(token, state):
            return model.apply(variables, token, state,
                               method=RNNT.predict_step)

        def joint_step(f_t, g):
            return model.apply(variables, f_t, g, method=RNNT.joint)

        return predict_step, joint_step

    def make_projected(variables):
        """Decode-time factored-joint hoist: ``project_f`` maps encoder
        output to first-layer space ONCE per utterance; ``joint_fp_step``
        then costs one small matmul + tail per evaluation instead of
        re-projecting f every (frame, hypothesis, round).  Drive the
        decoders with ``fp = project_f(f)`` in place of ``f`` — they are
        agnostic to what the 'encoder features' are."""
        predict_step, _ = make(variables)

        def project_f(f):
            return model.apply(variables, f, method=RNNT.joint_project_f)

        def joint_fp_step(fp_t, g):
            return model.apply(variables, fp_t, g,
                               method=RNNT.joint_from_fp)

        return predict_step, joint_fp_step, project_f

    return make, make_projected, init_state_fn


def build_decoder(cfg: S.SpeechToTextConfig, model) -> Callable:
    """Build ``decode(variables, batch_feats...) -> (tokens, lens)``.

    For CTC decoders the callable takes ``(logits, logit_lens)``.
    For transducer decoders it takes ``(variables, f, f_lens)`` (encoder
    output) since it must drive the prediction/joint nets.
    """
    pc = cfg.post_process
    if isinstance(pc, S.CTCGreedyDecoderConfig):
        return functools.partial(ctc_greedy_decode,
                                 blank_index=pc.blank_index)
    if isinstance(pc, S.CTCBeamDecoderConfig):
        lm_bigram = None
        if pc.lm_bigram_path is not None:
            from myrtlespeech_tpu.decoding.lm import load_bigram_lm
            lm_bigram = load_bigram_lm(pc.lm_bigram_path,
                                       vocab_size=vocab_size(cfg))
        word_lm = None
        if pc.word_lm_path is not None:
            from myrtlespeech_tpu.decoding.lm import load_word_lm
            if pc.separator_index is None:
                raise ValueError(
                    "word_lm_path requires separator_index (the word "
                    "boundary symbol the LM scores on)")
            word_lm = load_word_lm(pc.word_lm_path)
        return functools.partial(
            ctc_beam_decode, blank_index=pc.blank_index,
            beam_width=pc.beam_width, prune_threshold=pc.prune_threshold,
            word_count_beta=pc.word_count_beta,
            separator_index=pc.separator_index,
            lm_alpha=pc.lm_alpha if lm_bigram is not None else None,
            lm_bigram=lm_bigram,
            word_lm_alpha=pc.word_lm_alpha if word_lm is not None else None,
            word_lm=word_lm, expand_topk=pc.expand_topk)
    # Both transducer decoders run in PROJECTED joint space: the encoder
    # side of the factored joint (models/rnn_t.py::RNNTJoint) is hoisted
    # out of the decode loops — project_f(f) runs once per batch and each
    # in-loop joint evaluation is one small matmul + tail (measured
    # round 4: the loops are op-latency-bound, docs/performance.md).
    _, make_projected, init_state_fn = build_rnnt_decode_helpers(
        model, cfg.model)
    if isinstance(pc, S.RNNTGreedyDecoderConfig):
        def greedy(variables, f, f_lens, max_output_len: int = 200):
            predict_step, joint_fp_step, project_f = make_projected(
                variables)
            B = f.shape[0]
            return rnnt_greedy_decode(
                project_f(f), f_lens, predict_step, joint_fp_step,
                init_state_fn(B), blank_index=pc.blank_index,
                max_symbols_per_step=pc.max_symbols_per_step,
                max_output_len=max_output_len)
        return greedy
    if isinstance(pc, S.RNNTBeamDecoderConfig):
        def beam(variables, f, f_lens, max_output_len: int = 200):
            predict_step, joint_fp_step, project_f = make_projected(
                variables)
            return rnnt_beam_decode(
                project_f(f), f_lens, predict_step, joint_fp_step,
                init_state_fn, blank_index=pc.blank_index,
                beam_width=pc.beam_width, length_norm=pc.length_norm,
                max_symbols_per_step=pc.max_symbols_per_step,
                max_output_len=max_output_len,
                expand_topk=pc.expand_topk,
                speculative_frames=pc.speculative_frames)
        return beam
    raise ValueError(f"unknown decoder config {type(pc)}")


# ---------------------------------------------------------------------------
# Optimizer / schedule
# ---------------------------------------------------------------------------


def build_lr_schedule(cfg: S.TrainConfig, steps_per_epoch: int):
    sc = cfg.lr_scheduler
    base = _base_lr(cfg.optimizer)
    if sc is None or isinstance(sc, S.ConstantLRConfig):
        # No scheduler configured = constant LR (the reference's optional
        # lr_scheduler oneof left unset).
        sched = optax.constant_schedule(base)
    elif isinstance(sc, S.StepLRConfig):
        sched = optax.exponential_decay(
            base, transition_steps=sc.step_size_epochs * steps_per_epoch,
            decay_rate=sc.gamma, staircase=True)
    elif isinstance(sc, S.ExponentialLRConfig):
        sched = optax.exponential_decay(
            base, transition_steps=steps_per_epoch, decay_rate=sc.gamma,
            staircase=True)
    elif isinstance(sc, S.CosineAnnealingLRConfig):
        sched = optax.cosine_decay_schedule(
            base, decay_steps=max(sc.t_max_epochs * steps_per_epoch, 1),
            alpha=sc.eta_min / base if base else 0.0)
    else:
        raise ValueError(f"unknown lr scheduler {type(sc)}")
    if cfg.lr_warmup_steps > 0:
        warm = optax.linear_schedule(0.0, base, cfg.lr_warmup_steps)
        sched_inner = sched
        warmup_steps = cfg.lr_warmup_steps

        def sched(step):  # noqa: F811 - composed schedule
            return jnp.where(step < warmup_steps, warm(step),
                             sched_inner(step - warmup_steps))
    return sched


def _base_lr(oc: S.OptimizerConfig) -> float:
    return oc.learning_rate


def build_optimizer(cfg: S.TrainConfig, steps_per_epoch: int):
    sched = build_lr_schedule(cfg, steps_per_epoch)
    oc = cfg.optimizer
    if isinstance(oc, S.SGDConfig):
        tx = optax.sgd(sched, momentum=oc.momentum, nesterov=oc.nesterov)
        wd = oc.l2_weight_decay
    elif isinstance(oc, S.AdamConfig):
        tx = optax.adam(sched, b1=oc.beta_1, b2=oc.beta_2, eps=oc.eps)
        wd = oc.l2_weight_decay
    else:
        raise ValueError(f"unknown optimizer {type(oc)}")
    chain = []
    if cfg.grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if wd:
        chain.append(optax.add_decayed_weights(wd))
    chain.append(tx)
    return optax.chain(*chain) if len(chain) > 1 else tx, sched


# ---------------------------------------------------------------------------
# Datasets
# ---------------------------------------------------------------------------


def build_dataset(cfg: S.DatasetConfig):
    if isinstance(cfg, S.FakeSpeechToTextConfig):
        return FakeSpeechToText(cfg)
    if isinstance(cfg, S.LibriSpeechConfig):
        return LibriSpeech(cfg)
    if isinstance(cfg, S.SyntheticSpeechConfig):
        from myrtlespeech_tpu.data.dataset.synthetic import SyntheticSpeech
        return SyntheticSpeech(cfg)
    raise ValueError(f"unknown dataset config {type(cfg)}")


# ---------------------------------------------------------------------------
# Task bundle
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Task:
    """Everything built from one TaskConfig (reference: builders/task_config
    returning the SeqToSeq bundle + datasets)."""

    cfg: S.TaskConfig
    alphabet: Alphabet
    model: Any
    preprocess: Callable
    loss_fn: Callable
    decoder: Callable
    optimizer: Any
    lr_schedule: Callable
    train_dataset: Any
    eval_dataset: Optional[Any]
    # Transducer-only: joint+loss fusion that takes (variables, f, f_lens,
    # g, labels, label_lens, train, rngs) and never materialises the full
    # joint logits.  None for CTC tasks or when fusion is disabled.
    fused_loss: Optional[Callable] = None
    # Always set for transducer tasks: the same fused loss with a
    # per-call ``chunk_size``, used by the HBM memory planner
    # (run/memory.py) to auto-fuse long buckets that would not fit the
    # full-joint path.  None for CTC tasks.
    fused_loss_auto: Optional[Callable] = None
    # Transducer-only: the fully-fused Pallas joint-tail + lattice loss
    # (build_pallas_joint_loss).  Preferred on TPU when the joint topology
    # fits the kernel; None for CTC tasks / unsupported topologies.
    pallas_joint_loss: Optional[Callable] = None

    @property
    def transducer(self) -> bool:
        return is_transducer(self.cfg.speech_to_text)


def build_task(cfg: S.TaskConfig, steps_per_epoch: int = 1000,
               dtype=None) -> Task:
    stt = cfg.speech_to_text
    validate(stt)
    dtype = dtype or jnp.dtype(cfg.train_config.compute_dtype)
    model = build_model(stt, dtype=dtype,
                        in_features=preprocess_out_features(
                            stt.pre_process_steps))
    tx, sched = build_optimizer(cfg.train_config, steps_per_epoch)
    return Task(
        cfg=cfg,
        alphabet=build_alphabet(stt),
        model=model,
        preprocess=build_preprocess(stt.pre_process_steps),
        loss_fn=build_loss(stt),
        decoder=build_decoder(stt, model),
        optimizer=tx,
        lr_schedule=sched,
        train_dataset=build_dataset(cfg.train_dataset),
        eval_dataset=(build_dataset(cfg.eval_dataset)
                      if cfg.eval_dataset is not None else None),
        fused_loss=build_fused_transducer_loss(stt, model),
        fused_loss_auto=build_fused_transducer_loss(stt, model, force=True),
        pallas_joint_loss=build_pallas_joint_loss(stt, model),
    )
