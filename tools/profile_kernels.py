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


def _aggregate_trace(logdir: str):
    """Parse the TensorBoard/perfetto trace.json.gz into (name -> us)."""
    paths = glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        return None
    events = []
    for p in paths:
        with gzip.open(p, "rt") as f:
            events.extend(json.load(f).get("traceEvents", []))
    # Keep complete events from device lanes (TensorCore/XLA ops).
    durs = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        durs[name] += e["dur"]
    return durs


def _bucket(name: str) -> str:
    """Map an XLA/Mosaic op name to a framework kernel bucket."""
    n = name.lower()
    if "lstm" in n:
        return "lstm kernels"
    if "joint" in n or "jt_" in n:
        return "joint tail kernel"
    if "lattice" in n or "rnnt" in n or "ctc" in n:
        return "lattice kernels"
    if "fusion" in n or "custom-call" in n:
        return "xla fusions/custom-calls"
    if "copy" in n or "transpose" in n or "reshape" in n:
        return "layout/copies"
    if "dot" in n or "conv" in n:
        return "matmuls"
    if "all-reduce" in n or "psum" in n:
        return "collectives"
    return "other"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--components", action="store_true")
    p.add_argument("--logdir", default="/tmp/myrtle_profile")
    args = p.parse_args()

    sys.path.insert(0, ".")
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
    batch = _example_batch(B, samples=samples, label_len=64)
    batch["labels"] = np.clip(batch["labels"], 1, 27)
    import jax.numpy as jnp
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
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
        durs = _aggregate_trace(args.logdir)
        if durs:
            total = sum(durs.values())
            buckets = collections.Counter()
            for name, us in durs.items():
                buckets[_bucket(name)] += us
            print(f"\n== trace buckets (total {total/1e3:.1f} ms over "
                  f"{args.steps} steps) ==")
            for b, us in buckets.most_common():
                print(f"{us/1e3/args.steps:9.2f} ms/step  "
                      f"{100*us/total:5.1f}%  {b}")
            print("\n== top 25 ops ==")
            for name, us in durs.most_common(25):
                print(f"{us/1e3/args.steps:9.3f} ms/step  {name[:100]}")
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
