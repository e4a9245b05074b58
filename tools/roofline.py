"""Roofline/speed-of-light analysis for the flagship RNN-T train step.

Computes the analytic FLOP count of one train step from the config (the
north-star asks for per-kernel speed-of-light accounting, BASELINE.md),
optionally times the step on the current backend, and reports achieved
model FLOPs/s vs the chip's bf16 peak plus the sequential-recurrence bound.

Usage:
  python tools/roofline.py [--batch 32] [--seconds 5.0] [--measure]
  python tools/roofline.py --ms-per-step 82.6        # use a recorded time
"""

from __future__ import annotations

import argparse
import sys

V5E_BF16_TFLOPS = 197.0  # per chip, MXU peak
V5E_HBM_GBPS = 819.0


def lstm_flops(T, B, F, H, layers):
    """Forward FLOPs for a unidirectional LSTM stack (matmuls only).

    Per layer: x_proj (T*B, F)x(F, 4H) hoisted + recurrent (B, H)x(H, 4H)
    per step.  First layer consumes F features, the rest H.
    """
    total = 0
    fin = F
    for _ in range(layers):
        total += 2 * T * B * fin * 4 * H      # x W_ih
        total += 2 * T * B * H * 4 * H        # h W_hh (T sequential steps)
        fin = H
    return total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--measure", action="store_true",
                   help="time the real step on the current backend")
    p.add_argument("--ms-per-step", type=float, default=None)
    args = p.parse_args()

    sys.path.insert(0, ".")
    from configs.rnn_t_en import task_config as cfg

    B = args.batch
    enc = cfg.speech_to_text.model.encoder
    pred = cfg.speech_to_text.model.prediction
    joint = cfg.speech_to_text.model.joint
    n_mels = cfg.speech_to_text.pre_process_steps[0].step.n_mels
    V = len(cfg.speech_to_text.alphabet)

    # Shapes for --seconds of 16 kHz audio, 10 ms hop, reduction factor.
    T0 = int(args.seconds * 100)                   # frames
    r = enc.time_reduction_factor
    T1 = (T0 + r - 1) // r                          # post-reduction
    U1 = 64 + 1                                     # bench label length + 1
    He, Hp = enc.rnn1.hidden_size, pred.rnn.hidden_size
    Hj = joint.fc.hidden_size

    f = {}
    f["encoder pre-reduction LSTMs"] = lstm_flops(
        T0, B, n_mels, He, enc.rnn1.num_layers)
    f["encoder post-reduction LSTMs"] = lstm_flops(
        T1, B, He * r, He, enc.rnn2.num_layers if enc.rnn2 else 0)
    f["prediction net"] = lstm_flops(U1, B, pred.embedding_dim, Hp,
                                     pred.rnn.num_layers)
    cells = B * T1 * U1
    # Round 3: the joint's first layer is factored (models/rnn_t.py::
    # RNNTJoint) — act(f) @ W_f + act(g) @ W_g costs 2*B*(T1*He + U1*Hp)*Hj
    # instead of 2*cells*(He+Hp)*Hj (a T*U/(T+U) ~ 52x reduction); the
    # remaining per-cell work is the bandwidth-bound broadcast add.
    f["joint hidden (factored)"] = 2 * B * (T1 * He + U1 * Hp) * Hj
    f["joint logits"] = 2 * cells * Hj * V
    fwd = sum(f.values())
    total = 3 * fwd  # backward ~= 2x forward for matmul-dominated nets

    print(f"Analytic FLOPs per train step (B={B}, {args.seconds}s audio):")
    for k, v in f.items():
        print(f"  {k:32s} {v/1e9:8.1f} GFLOP fwd")
    print(f"  {'TOTAL (fwd+bwd ~ 3x fwd)':32s} {total/1e12:8.2f} TFLOP")

    # Sequential-recurrence lower bound: the recurrent matmuls cannot batch
    # across time.  Steps = sum of per-layer T; each step's (B,H)x(H,4H)
    # matmul has B/128 MXU row occupancy.  NOTE (round 3, measured): the
    # naive B/128 model UNDERESTIMATES Mosaic by ~2x — the fused LSTM
    # kernels sustain ~95 TFLOP/s at B=32 (tools/profile_kernels.py trace)
    # vs the 49 TFLOP/s this model predicts, so treat the recurrent bound
    # as conservative by that factor.
    steps = T0 * enc.rnn1.num_layers \
        + T1 * (enc.rnn2.num_layers if enc.rnn2 else 0) + U1 * pred.rnn.num_layers
    rec_flops = 0
    rec_flops += T0 * enc.rnn1.num_layers * 2 * B * He * 4 * He
    rec_flops += T1 * (enc.rnn2.num_layers if enc.rnn2 else 0) * 2 * B * He * 4 * He
    rec_flops += U1 * pred.rnn.num_layers * 2 * B * Hp * 4 * Hp
    occupancy = min(B, 128) / 128
    rec_bound_ms = rec_flops / (V5E_BF16_TFLOPS * 1e12 * occupancy) * 1e3
    par_bound_ms = (3 * fwd - 3 * rec_flops) / (V5E_BF16_TFLOPS * 1e12) * 1e3
    sol_ms = 3 * rec_bound_ms + par_bound_ms
    print(f"\nSpeed-of-light model (v5e, {V5E_BF16_TFLOPS:.0f} bf16 TFLOPs):")
    print(f"  sequential recurrent steps: {steps} "
          f"(fwd; MXU row occupancy {occupancy:.0%})")
    print(f"  recurrent bound  ~{3*rec_bound_ms:6.1f} ms (fwd+bwd)")
    print(f"  parallel matmuls ~{par_bound_ms:6.1f} ms")
    print(f"  step lower bound ~{sol_ms:6.1f} ms "
          f"-> {B*args.seconds/(sol_ms/1e3):6.0f} audio-s/s/chip")

    ms = args.ms_per_step
    if args.measure:
        import json
        import subprocess
        print("\nmeasuring on current backend via tools/profile_step.py ...")
        out = subprocess.run(
            [sys.executable, "tools/profile_step.py", "--batch", str(B),
             "--seconds", str(args.seconds)],
            capture_output=True, text=True, timeout=1800).stdout
        ms = float(out.rsplit(":", 1)[1].split("ms")[0])
    if ms:
        print(f"\nMeasured: {ms:.1f} ms/step -> "
              f"{total/(ms/1e3)/1e12:.1f} model TFLOP/s "
              f"({total/(ms/1e3)/1e12/V5E_BF16_TFLOPS:.0%} of bf16 peak; "
              f"{sol_ms/ms:.0%} of the speed-of-light bound)")


if __name__ == "__main__":
    main()
