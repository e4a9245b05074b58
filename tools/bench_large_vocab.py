"""Large-vocabulary stress: losses, joint fronts, decode, word-LM scale.

VERDICT r4 missing #6: every committed loss/decode number uses V=29
chars; the lattice kernels' 29/128-lane occupancy excuse, the Pallas
joint's memory niche, beam ``expand_topk`` and the word-LM probe budget
are all unstressed exactly where they get hard.  This tool measures the
wordpiece-scale regime (V=1024 by default, BPE-size):

  losses : RNN-T + CTC value+grad, lax vs Pallas lattice at V
  joint  : full vs chunked vs Pallas fused front at V (bench_joint.py)
  decode : RNN-T greedy + beam W=8 (expand_topk=16) on a random
           256-wide model with a V-symbol alphabet, on-chip audio-s/s
  wordlm : build a >=10k-word bigram table, report load factor / probe
           histogram / build fallbacks, and device-lookup correctness

Usage:
  PYTHONPATH=/root/repo python tools/bench_large_vocab.py [--v 1024]
      [--parts losses,joint,decode,wordlm] [--out benchmarks/data/large_vocab]

Artifacts land in --out as one text file per part; docs/performance.md
reads the numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def part_losses(v: int, out):
    import jax
    import jax.numpy as jnp

    from tools.bench_lattice import bench_one

    for op in ("rnnt", "ctc"):
        # Large-V RNN-T at the flagship (T', U) would make the FULL
        # logits tensor (B,T,U+1,V) ~1 GB fp32 grads; keep the committed
        # flagship T/U but drop B for the lax-vs-pallas comparison so
        # both paths fit comfortably (the fused joint owns training at
        # this scale — measured in part_joint).
        B = 8 if op == "rnnt" else 32
        for impl in ("lax", "pallas"):
            try:
                dt = bench_one(op, impl, B=B, V=v)
                line = json.dumps({"part": "losses", "op": op, "impl": impl,
                                   "B": B, "V": v,
                                   "ms": round(dt * 1e3, 2)})
            except Exception as e:
                line = json.dumps({"part": "losses", "op": op, "impl": impl,
                                   "B": B, "V": v,
                                   "error": f"{type(e).__name__}: {e}"})
            print(line, flush=True)
            out.write(line + "\n")


def part_joint(v: int, out):
    # bench_joint's three fronts share a process; run as a subprocess so
    # its prints land in the artifact verbatim.
    cmd = [sys.executable, "tools/bench_joint.py", "--V", str(v),
           "--B", "32"]
    p = subprocess.run(cmd, text=True, capture_output=True, timeout=3000)
    print(p.stdout, flush=True)
    out.write(f"$ {' '.join(cmd[1:])}\n{p.stdout}")
    if p.returncode != 0:
        out.write(f"STDERR:\n{p.stderr[-2000:]}\n")


def part_decode(v: int, out):
    """Greedy + beam decode on a random model with a V-symbol alphabet."""
    import jax
    import jax.numpy as jnp

    from myrtlespeech_tpu.builders.build import (build_rnnt_decode_helpers,
                                                 build_task)
    from myrtlespeech_tpu.config import schema as S
    from myrtlespeech_tpu.decoding.rnnt_beam import rnnt_beam_decode
    from myrtlespeech_tpu.decoding.rnnt_greedy import rnnt_greedy_decode
    from myrtlespeech_tpu.models.rnn_t import RNNT
    from myrtlespeech_tpu.run.train import init_state

    # V-1 real symbols + blank: a unicode alphabet at wordpiece scale.
    alphabet = "_" + "".join(chr(0x4E00 + i) for i in range(v - 1))
    cfg = S.TaskConfig(
        speech_to_text=S.SpeechToTextConfig(
            alphabet=alphabet,
            pre_process_steps=(
                S.PreProcessStepConfig(S.MFCCConfig(n_mels=64,
                                                    log_mel_only=True)),
                S.PreProcessStepConfig(S.StandardizeConfig()),
            ),
            model=S.RNNTConfig(
                encoder=S.RNNTEncoderConfig(
                    rnn1=S.RNNConfig(hidden_size=256, num_layers=2),
                    time_reduction_factor=2,
                    rnn2=S.RNNConfig(hidden_size=256, num_layers=2)),
                prediction=S.RNNTPredictNetConfig(
                    embedding_dim=128,
                    rnn=S.RNNConfig(hidden_size=128, num_layers=1)),
                joint=S.RNNTJointNetConfig(
                    fc=S.FullyConnectedConfig(num_hidden_layers=1,
                                              hidden_size=256,
                                              activation=S.Activation.RELU)),
            ),
            loss=S.RNNTLossConfig(blank_index=0, fused_chunk_size=32),
            post_process=S.RNNTGreedyDecoderConfig(blank_index=0),
        ),
        train_config=S.TrainConfig(batch_size=32),
        train_dataset=S.FakeSpeechToTextConfig(
            dataset_len=32, audio_ms=S.IntRange(4500, 5000),
            label_symbols=alphabet[1:41], label_len=S.IntRange(30, 60)),
    )
    task = build_task(cfg, steps_per_epoch=10)
    B, sec = 32, 5.0
    rng = np.random.default_rng(0)
    batch = {
        "wav": rng.standard_normal((B, int(16000 * sec))).astype(np.float32),
        "wav_lens": np.full((B,), int(16000 * sec), np.int32),
        "labels": rng.integers(1, v, (B, 64)).astype(np.int32),
        "label_lens": np.full((B,), 64, np.int32),
    }
    state = init_state(task, jax.random.PRNGKey(0), batch)
    variables = {"params": state.params}

    @jax.jit
    def encode(wav, wav_lens):
        feats, flens = task.preprocess(
            jax.random.PRNGKey(0), wav, wav_lens, False)
        return task.model.apply(variables, feats, flens, method=RNNT.encode)

    f, f_lens = encode(np.asarray(batch["wav"]),
                       np.asarray(batch["wav_lens"]))
    f = jax.block_until_ready(f)
    _, make_projected, init_fn = build_rnnt_decode_helpers(
        task.model, task.cfg.speech_to_text.model)
    predict_step, joint_step, project_f = make_projected(variables)
    f = jax.jit(project_f)(f)

    n_dec, reps = 5, 5

    def timed(decode_fn):
        @jax.jit
        def run_n(f, f_lens):
            def one(_, carry):
                acc, f_cur = carry
                _, lens = decode_fn(f_cur, f_lens)
                s = jnp.sum(lens)
                f_next = f + (s % 2).astype(f.dtype) * 1e-6
                return acc + s, f_next
            acc, _ = jax.lax.fori_loop(
                0, n_dec, one, (jnp.asarray(0, jnp.int32), f))
            return acc
        _ = int(run_n(f, f_lens))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = int(run_n(f, f_lens))
            best = min(best, time.perf_counter() - t0)
        return n_dec * B * sec / best

    greedy = lambda f, fl: rnnt_greedy_decode(  # noqa: E731
        f, fl, predict_step, joint_step, init_fn(B), blank_index=0,
        max_symbols_per_step=8, max_output_len=128)
    for name, fn, kw in (
            ("greedy", greedy, {}),
            ("beam8_topk16", None, dict(beam_width=8, expand_topk=16)),
            ("beam8_topk64", None, dict(beam_width=8, expand_topk=64))):
        if fn is None:
            fn = lambda f, fl, kw=kw: rnnt_beam_decode(  # noqa: E731
                f, fl, predict_step, joint_step, init_fn, blank_index=0,
                max_symbols_per_step=4, max_output_len=128, **kw)
        rate = timed(fn)
        line = json.dumps({"part": "decode", "decoder": name, "V": v,
                           "B": B, "audio_s_per_s": round(rate, 2)})
        print(line, flush=True)
        out.write(line + "\n")


def part_wordlm(n_words: int, out):
    """Build stats + correctness for a >=10k-word bigram hash table."""
    from myrtlespeech_tpu.data.alphabet import Alphabet
    from myrtlespeech_tpu.decoding.lm import (WORD_LM_PROBES,
                                              estimate_word_lm, word_hashes)

    alphabet = Alphabet("_ abcdefghijklmnopqrstuvwxyz'")
    rng = np.random.default_rng(0)
    letters = "abcdefghijklmnopqrstuvwxyz"
    vocab = set()
    while len(vocab) < n_words:
        L = int(rng.integers(3, 11))
        vocab.add("".join(rng.choice(list(letters), L)))
    vocab = sorted(vocab)
    # Zipf-ish draws PLUS one guaranteed appearance per word, so the
    # table genuinely stores the full vocabulary (load-factor stress);
    # Zipf alone covers only ~1/3 of a 12k vocab in a finite corpus.
    probs = 1.0 / np.arange(1, len(vocab) + 1) ** 1.1
    probs /= probs.sum()
    sents = []
    for _ in range(4000):
        n = int(rng.integers(3, 12))
        idx = rng.choice(len(vocab), n, p=probs)
        sents.append(" ".join(vocab[i] for i in idx))
    shuf = list(vocab)
    rng.shuffle(shuf)
    for k in range(0, len(shuf), 8):
        sents.append(" ".join(shuf[k:k + 8]))
    seen = set(w for s in sents for w in s.split())
    t0 = time.perf_counter()
    lm = estimate_word_lm(sents, alphabet, order=2)
    build_s = time.perf_counter() - t0

    S_uni = lm.key1.shape[0]
    used = int(np.sum((lm.key1 != 0) | (lm.key2 != 0)))
    S_bi = lm.bkey1.shape[0] if lm.bkey1 is not None else 0
    used_bi = int(np.sum((lm.bkey1 != 0) | (lm.bkey2 != 0))) if S_bi else 0

    # Probe-depth histogram: how many probes each STORED word needs
    # (the build only stores corpus-seen words, by design).
    depth = np.zeros(WORD_LM_PROBES + 1, np.int64)
    misplaced = 0
    for w in sorted(seen):
        h1, h2 = word_hashes(alphabet.get_indices(w))
        if h1 == 0 and h2 == 0:
            h1 = np.uint32(1)
        step = np.uint32(h2 | 1)
        for j in range(WORD_LM_PROBES):
            with np.errstate(over="ignore"):
                idx = int((h1 + np.uint32(j) * step) & np.uint32(S_uni - 1))
            if lm.key1[idx] == h1 and lm.key2[idx] == h2:
                depth[j] += 1
                break
        else:
            misplaced += 1
    stats = {
        "part": "wordlm", "n_vocab": len(vocab), "n_stored": len(seen),
        "build_s": round(build_s, 2),
        "uni_slots": S_uni, "uni_load": round(used / S_uni, 3),
        "bi_slots": S_bi,
        "bi_load": round(used_bi / max(S_bi, 1), 3),
        "probe_hist": depth[:WORD_LM_PROBES].tolist(),
        "unreachable_words": misplaced,
        "probes_budget": WORD_LM_PROBES,
    }
    line = json.dumps(stats)
    print(line, flush=True)
    out.write(line + "\n")
    assert misplaced == 0, "build must guarantee every word reachable"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--v", type=int, default=1024)
    p.add_argument("--wordlm_vocab", type=int, default=12000)
    p.add_argument("--parts", default="losses,joint,decode,wordlm")
    p.add_argument("--out", default="benchmarks/data/large_vocab")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    parts = args.parts.split(",")
    for part in parts:
        path = os.path.join(args.out, f"{part}_v.txt")
        with open(path, "a") as f:
            f.write(f"# bench_large_vocab {part} v={args.v} "
                    f"({time.strftime('%Y-%m-%d %H:%M')})\n")
            if part == "losses":
                part_losses(args.v, f)
            elif part == "joint":
                part_joint(args.v, f)
            elif part == "decode":
                part_decode(args.v, f)
            elif part == "wordlm":
                part_wordlm(args.wordlm_vocab, f)


if __name__ == "__main__":
    main()
