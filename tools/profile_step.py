"""Train-step profiler: sweep batch size / kernel toggles on the chip.

Usage: python tools/profile_step.py [--batch 8,16,32] [--no-pallas-lstm]
       [--no-pallas-rnnt] [--seconds 5] [--steps 10]

Times N steps inside one compiled fori_loop (per-step host dispatch rides a
high-variance tunnel in the sandbox and must stay out of the measurement).
"""

import argparse
import sys
import time

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", default="8")
    p.add_argument("--no-pallas-lstm", action="store_true")
    p.add_argument("--no-pallas-rnnt", action="store_true")
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--fused-chunk", type=int, default=None,
                   help="enable joint+loss fusion with this T-chunk size")
    p.add_argument("--config", default="configs.rnn_t_en",
                   help="task config module (e.g. configs.deep_speech_2_en)")
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()

    sys.path.insert(0, ".")
    jax.config.update("jax_compilation_cache_dir", "/tmp/myrtle_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from __graft_entry__ import _example_batch
    from myrtlespeech_tpu.builders.build import build_task
    from myrtlespeech_tpu.config import schema as S
    from myrtlespeech_tpu.run.train import init_state, train_step_body
    import myrtlespeech_tpu.models.rnn as rnn_mod
    import myrtlespeech_tpu.builders.build as build_mod

    if args.no_pallas_lstm:
        rnn_mod._use_pallas_lstm = lambda *a, **k: False
    if args.no_pallas_rnnt:
        from myrtlespeech_tpu.ops import rnnt as rnnt_mod
        import myrtlespeech_tpu.ops.pallas.rnnt_kernel as rk
        rk.rnnt_loss_pallas = rnnt_mod.rnnt_loss

    cfg_mod = __import__(args.config.replace("/", ".").removesuffix(".py"),
                         fromlist=["task_config"])
    for B in [int(x) for x in args.batch.split(",")]:
        cfg = S.replace(
            cfg_mod.task_config,
            train_dataset=S.FakeSpeechToTextConfig(dataset_len=64),
            eval_dataset=None,
            train_config=S.replace(cfg_mod.task_config.train_config,
                                   batch_size=B))
        if isinstance(cfg.speech_to_text.loss, S.RNNTLossConfig):
            cfg = S.replace(cfg, speech_to_text=S.replace(
                cfg.speech_to_text, loss=S.replace(
                    cfg.speech_to_text.loss,
                    fused_chunk_size=args.fused_chunk)))
        samples = int(16000 * args.seconds)
        batch = _example_batch(B, samples=samples, label_len=64)
        V = len(cfg.speech_to_text.alphabet)
        batch["labels"] = np.clip(batch["labels"], 1, V - 2)
        task = build_task(cfg, steps_per_epoch=100)
        state = init_state(task, jax.random.PRNGKey(0), batch)
        body = train_step_body(task)
        n = args.steps

        @jax.jit
        def run_n(state, batch):
            st = jax.lax.fori_loop(
                0, n, lambda _, s: body(s, batch)[0], state)
            return body(st, batch)

        state, m = run_n(state, batch)
        _ = float(m["loss"])
        t0 = time.perf_counter()
        state, m = run_n(state, batch)
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / (n + 1)
        print(f"B={B} pallas_lstm={not args.no_pallas_lstm} "
              f"pallas_rnnt={not args.no_pallas_rnnt} "
              f"fused_chunk={args.fused_chunk}: "
              f"{dt*1000:.1f} ms/step -> "
              f"{B*args.seconds/dt:.0f} audio-s/s", flush=True)


if __name__ == "__main__":
    main()
