"""Per-kernel accounting of the flagship train step (VERDICT r2 #1).

Captures a ``jax.profiler`` device trace of a few compiled train steps on
the chip and aggregates XLA-op durations into a per-kernel table, printed
alongside each kernel's share of the step.  Falls back to component-level
sub-jit timing when the platform produces no device trace (the sandbox's
remote ``axon`` platform may not support tracing).

Usage:
  python tools/profile_kernels.py [--batch 32] [--seconds 5]
  python tools/profile_kernels.py --components   # sub-jit timing only
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np


V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def _aggregate_trace(logdir: str):
    """Parse the trace.json.gz into per-op (us, flops, bytes) rows.

    Shared implementation lives in ``myrtlespeech_tpu.utils.trace`` so
    ``bench.py``'s ``ms_per_step_device`` field and this table agree by
    construction (same lanes, same newest-capture rule).
    """
    from myrtlespeech_tpu.utils.trace import aggregate_trace
    return aggregate_trace(logdir)


def _bucket(name: str, cat: str) -> str:
    """Map an XLA op to a framework kernel bucket.

    Pallas kernels surface as custom-calls named after their jax scope
    (``enc_rnn1.N`` = fused LSTM fwd/bwd, ``jvp``/``transpose_jvp`` =
    the lattice custom_vjp fwd/bwd, ``jt_`` = the fused joint tail);
    everything else is grouped by XLA's own hlo_category.
    """
    n = name.lower()
    if n.startswith(("enc_rnn", "pred_rnn")) or "lstm" in n:
        return "LSTM pallas kernels (recurrent fwd+bwd)"
    if "jt_" in n or "joint_tail" in n:
        return "fused joint-tail pallas kernel"
    if ("jvp" in n or "lattice" in n or "pallas" in n
            or "blank_emit" in n):
        return "lattice/front pallas kernels"
    if n.startswith("while"):
        return "lax while/scan bodies (pred-net, misc)"
    if cat == "convolution fusion" or cat == "convolution":
        return "MXU matmul fusions (x-proj, joint, dW)"
    if cat == "loop fusion":
        return "elementwise loop fusions (HBM-bound)"
    if cat == "custom-call":
        return "custom-calls (other)"
    return cat


def _print_table(rows, n_steps: int):
    agg = collections.defaultdict(lambda: [0, 0, 0])
    for name, cat, us, fl, by in rows:
        b = _bucket(name, cat)
        agg[b][0] += us
        agg[b][1] += fl
        agg[b][2] += by
    total = sum(v[0] for v in agg.values())
    n = n_steps
    print(f"\n== device per-kernel table "
          f"({total/1e3/n:.2f} ms/step over {n} steps; "
          f"TFLOP/s + GB/s are trace-reported, pallas custom-calls "
          f"report 0 FLOPs) ==")
    print(f"{'bucket':44s} {'ms/step':>8s} {'%':>6s} "
          f"{'TFLOP/s':>8s} {'%MXU':>5s} {'GB/s':>6s} {'%HBM':>5s}")
    for b, (us, fl, by) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        tf = fl / (us * 1e-6) / 1e12 if us else 0.0
        gb = by / (us * 1e-6) / 1e9 if us else 0.0
        print(f"{b:44s} {us/1e3/n:8.2f} {100*us/total:6.1f} "
              f"{tf:8.1f} {100*tf/V5E_BF16_TFLOPS:5.0f} "
              f"{min(gb, 9999):6.0f} {100*gb/V5E_HBM_GBPS:5.0f}")
    durs = collections.Counter()
    for name, cat, us, fl, by in rows:
        durs[name] += us
    print("\n== top 20 ops ==")
    for name, us in durs.most_common(20):
        print(f"{us/1e3/n:9.3f} ms/step  {name[:100]}")


def _profile_features(jax, jnp, task, batch, args):
    """Device-time + SOL bound for the preprocess chain alone.

    The chain (ops/features.py): mask -> frame -> window -> DFT matmuls
    -> power -> mel matmul -> log -> standardize -> SpecAugment.  The
    committed per-kernel tables fold it into XLA fusion buckets, so the
    north star's "STFT at speed-of-light" clause had no number
    (VERDICT r4 missing #4).  This traces N chained calls (data
    dependency threaded between iterations — a fori_loop of identical
    calls gets loop-invariant-hoisted, see bench.py) and prints device
    ms/call next to the analytic HBM and MXU bounds.
    """
    import shutil
    import tempfile

    n = args.steps if args.steps > 3 else 10
    key = jax.random.PRNGKey(1)
    wav, lens = batch["wav"], batch["wav_lens"]

    def make_run_n(train):
        @jax.jit
        def run_n(wav, lens):
            def one(_, carry):
                w, acc = carry
                f, _fl = task.preprocess(key, w, lens, train)
                # Thread the FEATURES back into both the next input and
                # the returned accumulator: without the dependency on
                # the returned value, XLA dead-codes the whole chain
                # (first cut measured 0.000 ms/call); without the input
                # dependency it hoists the loop-invariant call (see
                # bench.py).
                upd = jnp.sum(f[:, 0, :], axis=-1) * 1e-9
                return (w.at[:, 0].add(upd.astype(w.dtype)),
                        acc + jnp.sum(upd))
            _, acc = jax.lax.fori_loop(
                0, n, one, (wav, jnp.zeros((), jnp.float32)))
            return acc
        return run_n

    def capture(run_n, reps=2):
        """min-of-reps device-lane capture (chip time-shares; see
        bench.py's device-time note)."""
        _ = np.asarray(run_n(wav, lens))  # compile + warm
        best_rows, best = None, None
        for _ in range(reps):
            logdir = tempfile.mkdtemp(prefix="myrtle_feat_trace_")
            with jax.profiler.trace(logdir):
                _ = np.asarray(run_n(wav, lens))
            rows = _aggregate_trace(logdir)
            shutil.rmtree(logdir, ignore_errors=True)
            if rows:
                tot = sum(r[2] for r in rows)
                if best is None or tot < best:
                    best, best_rows = tot, rows
        return best_rows

    def chain_ms(rows):
        """Total device ms (rows are already SELF-times — container
        spans like the harness fori_loop contribute only loop control;
        see utils/trace.py::_self_time_rows)."""
        return sum(r[2] for r in rows) / 1e3

    eval_rows = capture(make_run_n(False))
    rows = capture(make_run_n(True))
    if not rows:
        print("no device trace produced")
        return
    if eval_rows:
        print(f"eval-mode chain (no SpecAugment): "
              f"{chain_ms(eval_rows) / n:.3f} ms/call")

    B, S = wav.shape
    n_fft, hop, n_mels = 512, 160, 80  # rnn_t_en MFCCConfig defaults
    T = S // hop + 1
    K = n_fft // 2 + 1
    # HBM floor: wav in, framed matrix (write+read around the DFT
    # matmul), re/im, power, mel, log-mel out, standardize read+write,
    # SpecAugment read+write — fp32 everywhere.
    bytes_per = 4 * B * (S + 2 * T * n_fft + 3 * T * K + 5 * T * n_mels)
    # MXU floor: two (T, n_fft) x (n_fft, K) DFT matmuls + mel matmul.
    flops_per = 2 * B * T * (2 * n_fft * K + K * n_mels)
    ms = chain_ms(rows) / n
    hbm_ms = bytes_per / (V5E_HBM_GBPS * 1e9) * 1e3
    mxu_fp32 = V5E_BF16_TFLOPS / 2  # fp32 matmuls run at half bf16 peak
    mxu_ms = flops_per / (mxu_fp32 * 1e12) * 1e3
    print(f"== features-only device profile (B={B}, {S/16000:.1f} s, "
          f"{n} chained calls) ==")
    print(f"measured        : {ms:.3f} ms/call")
    print(f"HBM bound       : {hbm_ms:.3f} ms  "
          f"({bytes_per/1e6:.0f} MB @ {V5E_HBM_GBPS:.0f} GB/s)")
    print(f"MXU bound (fp32): {mxu_ms:.3f} ms  ({flops_per/1e9:.1f} GFLOP)")
    print(f"SOL fraction    : {max(hbm_ms, mxu_ms)/ms*100:.0f}% of "
          f"roofline; {ms/31.90*100:.1f}% of the 31.90 ms train step")
    durs = collections.Counter()
    for name, cat, us, fl, by in rows:
        durs[name] += us
    print("-- top ops --")
    for name, us in durs.most_common(8):
        print(f"{us/1e3/n:9.4f} ms/call  {name[:90]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--label_len", type=int, default=64,
                   help="labels per utterance (the 15 s production shape "
                        "uses 192, matching bench.py's long measurement)")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--components", action="store_true")
    p.add_argument("--features", action="store_true",
                   help="trace ONLY the preprocess chain (STFT->mel->log"
                        "->standardize->SpecAugment) and compare against "
                        "its analytic HBM/MXU bound (VERDICT r4 #5: the "
                        "north star's 'STFT at speed-of-light' clause)")
    p.add_argument("--logdir", default="/tmp/myrtle_profile")
    p.add_argument("--parse-only", action="store_true",
                   help="re-aggregate an existing trace (no device needed)")
    args = p.parse_args()

    sys.path.insert(0, ".")
    if args.parse_only:
        rows = _aggregate_trace(args.logdir)
        if not rows:
            print("no trace found in", args.logdir)
            return
        # Prefer the step count recorded at capture time over --steps:
        # a trace captured with a different count would otherwise yield
        # silently wrong per-step figures (ADVICE r3).
        meta_path = os.path.join(args.logdir, "capture_meta.json")
        steps = args.steps
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                steps = int(json.load(fh).get("steps", steps))
            if steps != args.steps:
                print(f"(using steps={steps} from capture_meta.json, "
                      f"not --steps={args.steps})")
        else:
            print(f"(no capture_meta.json in {args.logdir}; assuming the "
                  f"trace covers --steps={steps} steps)")
        _print_table(rows, steps)
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/myrtle_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from __graft_entry__ import _example_batch
    from myrtlespeech_tpu.builders.build import build_task
    from myrtlespeech_tpu.config import schema as S
    from myrtlespeech_tpu.run.train import init_state, train_step_body

    cfg_mod = __import__("configs.rnn_t_en", fromlist=["task_config"])
    cfg = S.replace(
        cfg_mod.task_config,
        train_dataset=S.FakeSpeechToTextConfig(dataset_len=64),
        eval_dataset=None,
        train_config=S.replace(cfg_mod.task_config.train_config,
                               batch_size=args.batch))
    task = build_task(cfg, steps_per_epoch=100)
    B = args.batch
    samples = int(16000 * args.seconds)
    batch = _example_batch(B, samples=samples, label_len=args.label_len)
    batch["labels"] = np.clip(batch["labels"], 1, 27)
    import jax.numpy as jnp
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    if args.features:
        _profile_features(jax, jnp, task, batch, args)
        return

    state = init_state(task, jax.random.PRNGKey(0), batch)
    step = jax.jit(train_step_body(task))

    # Warm up / compile.
    s, m = step(state, batch)
    _ = float(m["loss"])

    if not args.components:
        os.makedirs(args.logdir, exist_ok=True)
        with jax.profiler.trace(args.logdir):
            for _ in range(args.steps):
                s, m = step(s, batch)
            _ = float(m["loss"])
        # Record how many steps the trace covers so --parse-only divides
        # by the right count later (ADVICE r3).
        with open(os.path.join(args.logdir, "capture_meta.json"), "w") as fh:
            json.dump({"steps": args.steps}, fh)
        rows = _aggregate_trace(args.logdir)
        if rows:
            _print_table(rows, args.steps)
            return
        print("no device trace produced; falling back to components")

    # Component-level timing: time sub-jits of the step's pieces.
    from myrtlespeech_tpu.models.rnn_t import RNNT

    feats, flens = jax.jit(
        lambda r, w, l: task.preprocess(r, w, l, True))(
            jax.random.PRNGKey(1), batch["wav"], batch["wav_lens"])
    variables = {"params": state.params}
    f, f_lens = task.model.apply(variables, feats, flens,
                                 method=RNNT.encode)
    g = task.model.apply(variables, batch["labels"], batch["label_lens"],
                         method=RNNT.predict)
    f, g = jax.block_until_ready((f, g))

    def timeit(fn, *a, n=10):
        fn(*a)
        out = jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1e3

    comp = {}
    comp["preprocess (fwd)"] = timeit(jax.jit(
        lambda r, w, l: task.preprocess(r, w, l, True)),
        jax.random.PRNGKey(1), batch["wav"], batch["wav_lens"])
    comp["encoder (fwd)"] = timeit(jax.jit(
        lambda v, x, l: task.model.apply(v, x, l, method=RNNT.encode)),
        variables, feats, flens)
    comp["prediction (fwd)"] = timeit(jax.jit(
        lambda v, y, l: task.model.apply(v, y, l, method=RNNT.predict)),
        variables, batch["labels"], batch["label_lens"])
    if task.pallas_joint_loss is not None:
        comp["joint+loss pallas (fwd)"] = timeit(jax.jit(
            lambda v, f_, g_: task.pallas_joint_loss(
                v, f_, f_lens, g_, batch["labels"], batch["label_lens"])),
            variables, f, g)
        comp["joint+loss pallas (fwd+bwd)"] = timeit(jax.jit(
            jax.grad(lambda v, f_, g_: task.pallas_joint_loss(
                v, f_, f_lens, g_, batch["labels"], batch["label_lens"]),
                argnums=(1, 2))),
            variables, f, g)

    def enc_loss(v, x, l):
        ff, fl = task.model.apply(v, x, l, method=RNNT.encode)
        return jnp.sum(ff.astype(jnp.float32))

    comp["encoder (fwd+bwd)"] = timeit(jax.jit(
        jax.grad(enc_loss, argnums=1)), variables, feats, flens)
    comp["full step"] = timeit(lambda s_, b_: step(s_, b_)[1]["loss"],
                               state, batch)
    print(f"\n== component timings (B={B}, {args.seconds}s audio) ==")
    for k, v in comp.items():
        print(f"{v:9.2f} ms  {k}")


if __name__ == "__main__":
    main()
