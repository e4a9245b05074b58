"""Scaling harness: audio-s/s vs device count on the flagship train step.

BASELINE.json's north star demands >= 80% linear audio-s/s scaling from
1 host to N hosts.  This harness measures it wherever it runs:

- On a pod slice (run one process per host; jax.distributed auto-inits):
  sweeps device counts 1, 2, 4, ..., N by building a ``(data, model=1)``
  mesh over a device prefix, timing the sharded train step at a fixed
  PER-DEVICE batch (weak scaling, the production regime), and reporting
  audio-s/s, audio-s/s/chip, and efficiency vs the 1-device rate.
- On the 1-chip sandbox it degenerates to the bench.py measurement
  (single row), so the harness is exercised end-to-end in CI-like runs;
  the CPU virtual mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8
  with jax.config platform cpu) exercises the sweep logic itself.

Output: one JSON line per device count +
``{"scaling_efficiency": ...}`` summarising N-device rate / (N * 1-device
rate).

Usage: PYTHONPATH=/root/repo python tools/bench_scaling.py [--per_device_batch 8]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/myrtle_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def measure(n_devices: int, per_device_batch: int, seconds_per_utt: float,
            n_steps: int = 8) -> float:
    """Audio-s/s for the tiny-flagship RNN-T train step on n devices."""
    import __graft_entry__ as graft
    from myrtlespeech_tpu.parallel.mesh import make_mesh
    from myrtlespeech_tpu.parallel.sharding import make_sharded_train_step
    from myrtlespeech_tpu.run.train import (init_state, make_train_step,
                                            train_step_body)

    B = per_device_batch * n_devices
    task = graft._tiny_rnnt_task(B)
    samples = int(16000 * seconds_per_utt)
    batch = graft._example_batch(B, samples=samples, label_len=16)
    state = init_state(task, jax.random.PRNGKey(0), batch)

    if n_devices == 1:
        step = jax.jit(train_step_body(task), donate_argnums=(0,))
        place = lambda b: b  # noqa: E731
    else:
        mesh = make_mesh(data=n_devices, model=1,
                         devices=jax.devices()[:n_devices])
        step, state, place = make_sharded_train_step(task, mesh, state,
                                                     batch)

    placed = place(batch)
    state, m = step(state, placed)          # compile + warmup
    _ = float(m["loss"])
    dt = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, m = step(state, placed)
        _ = float(m["loss"])                # fence
        dt = min(dt, time.perf_counter() - t0)
    return n_steps * B * seconds_per_utt / dt


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--per_device_batch", type=int, default=8)
    p.add_argument("--seconds_per_utt", type=float, default=2.0)
    args = p.parse_args()

    n = len(jax.devices())
    counts = [c for c in (1, 2, 4, 8, 16, 32, 64) if c <= n]
    base = None
    rows = []
    for c in counts:
        rate = measure(c, args.per_device_batch, args.seconds_per_utt)
        base = rate if base is None else base
        row = {"devices": c, "audio_s_per_s": round(rate, 2),
               "audio_s_per_s_per_chip": round(rate / c, 2),
               "efficiency_vs_1": round(rate / (base * c), 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    if len(rows) > 1:
        print(json.dumps({"scaling_efficiency": rows[-1]["efficiency_vs_1"],
                          "devices": rows[-1]["devices"],
                          "target": ">=0.8 (BASELINE north star)"}))


if __name__ == "__main__":
    main()
