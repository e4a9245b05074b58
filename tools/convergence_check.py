"""Convergence check: overfit the tiny CTC task until WER collapses.

Proves the full learning pipeline (on-device features -> DS2 -> CTC loss ->
Adam -> greedy decode -> WER) optimizes end-to-end: 64 fixed random
utterances memorized to near-zero WER.

All training steps run inside ONE jitted ``lax.scan`` over stacked batches
(per-step host dispatch costs seconds over this sandbox's tunnel), with a
single on-device greedy decode at the end.

Usage: python tools/convergence_check.py [--epochs 120]
"""

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=120)
    p.add_argument("--model", choices=["ctc", "rnnt"], default="ctc")
    args = p.parse_args()

    sys.path.insert(0, ".")
    jax.config.update("jax_compilation_cache_dir", "/tmp/myrtle_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.model == "ctc":
        from configs.ctc_tiny_fake import task_config
    else:
        from myrtlespeech_tpu.config.schema import TaskConfig  # noqa
        import importlib.util, os
        spec = importlib.util.spec_from_file_location(
            "_graft", os.path.join(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
                "__graft_entry__.py"))
        graft = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(graft)
        task_config = graft._tiny_rnnt_task(batch_size=8).cfg
    from myrtlespeech_tpu.builders.build import build_task
    from myrtlespeech_tpu.config import schema as S
    from myrtlespeech_tpu.data.batch import BucketedLoader
    from myrtlespeech_tpu.decoding.wer import cer, wer
    from myrtlespeech_tpu.run.train import (init_state, make_eval_step,
                                            train_step_body)

    # Single audio bucket (fixed length) so every batch shares one shape.
    cfg = S.replace(
        task_config,
        train_dataset=S.replace(task_config.train_dataset,
                                audio_ms=S.IntRange(500, 501)),
        eval_dataset=None,
        train_config=S.replace(task_config.train_config,
                               optimizer=S.AdamConfig(learning_rate=2e-3)),
    )
    task = build_task(cfg, steps_per_epoch=8)
    loader = BucketedLoader(task.train_dataset, task.alphabet,
                            cfg.train_config.batch_size, shuffle=False)
    batches, texts = [], []
    for b in loader:
        texts.extend(b["texts"])
        batches.append({k: v for k, v in b.items()
                        if k not in ("texts", "n_real")})
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *batches)
    n_batches = len(batches)

    state = init_state(task, jax.random.PRNGKey(0), batches[0])
    body = train_step_body(task)

    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def train_epochs(state, stacked, n_epochs):
        def epoch(state, _):
            def step(state, batch):
                state, m = body(state, batch)
                return state, m["loss"]
            state, losses = jax.lax.scan(step, state, stacked)
            return state, jnp.mean(losses)
        return jax.lax.scan(epoch, state, None, length=n_epochs)

    chunk = 30
    losses = []
    for k in range(0, args.epochs, chunk):
        state, mean_losses = train_epochs(state, stacked, chunk)
        losses.extend(np.asarray(mean_losses).tolist())
        print(f"epochs {k}-{k+chunk}: mean loss "
              f"{float(mean_losses[-1]):.3f}", flush=True)

    eval_step = make_eval_step(task, decode=True, max_output_len=32)
    refs, hyps = [], []
    for i in range(n_batches):
        batch = jax.tree_util.tree_map(lambda x: x[i], stacked)
        m = eval_step(state, batch)
        toks = np.asarray(m["decoded_tokens"])
        lens = np.asarray(m["decoded_lens"])
        B = toks.shape[0]
        for j in range(B):
            refs.append(texts[i * B + j])
            hyps.append(task.alphabet.get_symbols(toks[j, :lens[j]]))
    w, c = wer(refs, hyps), cer(refs, hyps)
    print(json.dumps({"first_loss": losses[0], "final_loss": losses[-1],
                      "wer": w, "cer": c,
                      "sample": {"ref": refs[0], "hyp": hyps[0]}}))
    assert w < 0.5, f"pipeline failed to learn (wer={w})"
    print("CONVERGED")


if __name__ == "__main__":
    main()
