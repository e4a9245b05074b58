"""TP x LSTM layout A/B on the virtual 8-device CPU mesh (VERDICT r2 #4).

The round-1 ``PALLAS_TP_GUARD`` routes RNNs to the lax scan whenever a
TP mesh is active, because a pallas_call is opaque to GSPMD.  That left
two open questions this tool answers with measurements:

1. **Which TP layout should the lax path use?**  Column-sharding the RNN
   gate matrices over ``model`` (Megatron-style, the current rule) vs
   replicating the RNN weights and TP-sharding only the joint/FC/
   embedding matrices ("replicated-RNN + TP-joint",
   ``MYRTLE_TP_RNN_WEIGHTS=0``).  Measured here on the virtual CPU mesh
   (collective cost trends, not absolute chip speed) at mesh
   (data=4, model=2) vs a pure-DP (8, 1) reference.

2. **What does the guard's lax fallback cost on a real chip?**  Run
   ``MYRTLE_DISABLE_PALLAS_LSTM=1 python bench.py`` on the TPU and
   compare with the default — that single-chip delta bounds what a
   hypothetical shard_map'd TP kernel could ever win back.

Usage (CPU, no chip needed):
  python tools/bench_tp_lstm.py [--batch 16] [--steps 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--seconds", type=float, default=2.0)
    args = p.parse_args()

    sys.path.insert(0, ".")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from __graft_entry__ import _example_batch, _tiny_rnnt_task
    from myrtlespeech_tpu.parallel import sharding as sh
    from myrtlespeech_tpu.parallel.mesh import make_mesh
    from myrtlespeech_tpu.run.train import init_state

    B = args.batch
    samples = int(16000 * args.seconds)

    def time_layout(name, data, model, tp_rnn):
        task = _tiny_rnnt_task(batch_size=B)
        batch = _example_batch(B, samples=samples, label_len=32)
        batch["labels"] = np.clip(batch["labels"], 1, 27)
        mesh = make_mesh(data=data, model=model)
        state = init_state(task, jax.random.PRNGKey(0), batch)
        step, placed, place_batch = sh.make_sharded_train_step(
            task, mesh, state, batch, tp_rnn_weights=tp_rnn)
        b = place_batch(batch)
        placed, m = step(placed, b)           # compile
        _ = float(m["loss"])
        t0 = time.perf_counter()
        for _i in range(args.steps):
            placed, m = step(placed, b)
        _ = float(m["loss"])
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        print(f"{name:44s} {ms:8.1f} ms/step")
        return ms

    print(f"== TP x LSTM layout A/B (B={B}, {args.seconds}s audio, "
          f"{args.steps} steps, virtual CPU mesh) ==")
    dp = time_layout("DP only (8,1)", 8, 1, True)
    tp = time_layout("TP gate matrices sharded (4,2)", 4, 2, True)
    rep = time_layout("replicated RNN + TP joint (4,2)", 4, 2, False)
    print(f"\nTP-sharded-RNN / DP: {tp/dp:.2f}x   "
          f"replicated-RNN / DP: {rep/dp:.2f}x   "
          f"replicated / TP-sharded: {rep/tp:.2f}x")


if __name__ == "__main__":
    main()
