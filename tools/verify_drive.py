"""End-to-end verify drive on the real TPU backend (axon).

Pushes a batch through the full public flow for both model families:
build_task -> preprocess -> model -> loss -> grad -> optimizer update ->
decode, with the probes that matter for this round's changes: the
factored joint vs explicit-concat reference, and n_real loss masking.
"""

import numpy as np
import jax
import jax.numpy as jnp

from myrtlespeech_tpu.builders.build import build_task
from myrtlespeech_tpu.config import schema as S
from myrtlespeech_tpu.run.train import (eval_step_body, init_state,
                                        make_train_step)

assert jax.default_backend() == "tpu", jax.default_backend()
print("backend:", jax.default_backend(), jax.devices())


def small_rnnt_cfg(B=4):
    return S.TaskConfig(
        speech_to_text=S.SpeechToTextConfig(
            alphabet="_ abc",
            pre_process_steps=(
                S.PreProcessStepConfig(S.MFCCConfig(n_mels=16,
                                                    log_mel_only=True)),),
            model=S.RNNTConfig(
                encoder=S.RNNTEncoderConfig(
                    rnn1=S.RNNConfig(hidden_size=32, num_layers=1),
                    time_reduction_factor=2,
                    rnn2=S.RNNConfig(hidden_size=32, num_layers=1)),
                prediction=S.RNNTPredictNetConfig(
                    embedding_dim=8,
                    rnn=S.RNNConfig(hidden_size=16, num_layers=1)),
                joint=S.RNNTJointNetConfig(
                    fc=S.FullyConnectedConfig(num_hidden_layers=1,
                                              hidden_size=32))),
            loss=S.RNNTLossConfig(blank_index=0),
            post_process=S.RNNTGreedyDecoderConfig(blank_index=0,
                                                   max_symbols_per_step=4)),
        train_config=S.TrainConfig(
            batch_size=B, epochs=1,
            optimizer=S.AdamConfig(learning_rate=3e-3)),
        train_dataset=S.FakeSpeechToTextConfig(dataset_len=B),
    )


def batch(B=4, samples=4000, U=6):
    rng = np.random.default_rng(0)
    return {
        "wav": rng.standard_normal((B, samples)).astype(np.float32) * 0.1,
        "wav_lens": np.asarray([samples, samples // 2] * (B // 2), np.int32),
        "labels": rng.integers(1, 4, size=(B, U)).astype(np.int32),
        "label_lens": np.asarray([U, U - 2] * (B // 2), np.int32),
    }


# --- RNN-T family: train 8 steps, loss must drop; decode must run. -------
task = build_task(small_rnnt_cfg(), steps_per_epoch=10)
b = batch()
state = init_state(task, jax.random.PRNGKey(0), b)
step = make_train_step(task)
losses = []
for i in range(8):
    state, m = step(state, b)
    losses.append(float(m["loss"]))
print("rnnt losses:", [round(x, 3) for x in losses])
assert all(np.isfinite(losses)), losses
assert losses[-1] < losses[0], losses
assert float(m["grad_norm"]) > 0

ev = eval_step_body(task, decode=True, max_output_len=12)
em = ev(state, b)
print("rnnt eval loss:", float(em["loss"]),
      "decoded shape:", em["decoded_tokens"].shape)
assert np.isfinite(float(em["loss"]))

# n_real masking on device: duplicate-filled batch == real batch loss.
b2 = {k: v[:2] for k, v in b.items()}
b4 = {k: np.concatenate([v, v[1:2], v[1:2]], axis=0)
      for k, v in b2.items()}
b4["n_real"] = np.asarray(2, np.int32)
ev_nd = eval_step_body(task, decode=False)
l2 = float(ev_nd(state, b2)["loss"])
l4 = float(ev_nd(state, b4)["loss"])
print("n_real losses:", l2, l4)
assert abs(l2 - l4) < 1e-3 * max(1.0, abs(l2)), (l2, l4)

# Factored joint == explicit concat reference, on-chip bf16.
from myrtlespeech_tpu.models.rnn_t import RNNT

f = jnp.asarray(np.random.default_rng(1).standard_normal((2, 5, 32)),
                jnp.float32)
g = jnp.asarray(np.random.default_rng(2).standard_normal((2, 4, 16)),
                jnp.float32)
vars_ = {"params": state.params}
out = task.model.apply(vars_, f, g, method=RNNT.joint)
k = state.params["joint_net"]["kernel"]
bias = state.params["joint_net"]["bias"]
h = jnp.concatenate([
    jnp.broadcast_to(jnp.maximum(f, 0)[:, :, None, :], (2, 5, 4, 32)),
    jnp.broadcast_to(jnp.maximum(g, 0)[:, None, :, :], (2, 5, 4, 16))],
    axis=-1)
ref = task.model.apply(vars_, (h @ k + bias).astype(jnp.bfloat16),
                       method=RNNT.joint_tail)
err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                            - ref.astype(jnp.float32))))
print("joint factoring max err (bf16 on chip):", err)
assert err < 0.05, err

print("VERIFY OK")
