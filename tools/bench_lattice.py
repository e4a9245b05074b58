"""A/B the Pallas lattice kernels vs the pure-lax lattices on the TPU.

Flagship-bench shapes (bench.py: B=32, 5 s audio): RNN-T lattice at
(B=32, T'=250, U+1=65, V=29) and CTC at (B=32, T=250, S=2*64+1).  Times
value+grad (the training-path usage) inside one compiled fori_loop so the
tunnel dispatch overhead is amortised; best-of-3.

Decision data for VERDICT r1 #3: either the batch-slab Pallas path beats
lax at the production batch or lax stays the documented default.

Usage: PYTHONPATH=/root/repo python tools/bench_lattice.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/myrtle_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_STEPS = 10


def timeit(fn, *args):
    @jax.jit
    def run_n(*a):
        def one(_, acc):
            return acc + fn(*a)
        return jax.lax.fori_loop(0, N_STEPS, one, jnp.zeros(()))

    out = float(run_n(*args))  # compile + warmup; host fetch fences
    assert np.isfinite(out), out
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_n(*args))
        dt = min(dt, time.perf_counter() - t0)
    return dt / N_STEPS


def _fns(op: str, impl: str):
    if op == "rnnt":
        if impl == "lax":
            from myrtlespeech_tpu.ops.rnnt import rnnt_loss as fn
        else:
            from myrtlespeech_tpu.ops.pallas.rnnt_kernel import \
                rnnt_loss_pallas as fn
    else:
        if impl == "lax":
            from myrtlespeech_tpu.ops.ctc import ctc_loss as fn
        else:
            from myrtlespeech_tpu.ops.pallas.ctc_kernel import \
                ctc_loss_pallas as fn
    return fn


def bench_one(op: str, impl: str, B=32, T=250, U=64, V=29, seed=0):
    fn = _fns(op, impl)
    rng = np.random.default_rng(seed)
    shape = (B, T, U + 1, V) if op == "rnnt" else (B, T, V)
    logits = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    logit_lens = jnp.asarray(rng.integers(T // 2, T + 1, B), jnp.int32)
    labels = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)
    label_lens = jnp.asarray(rng.integers(U // 2, U + 1, B), jnp.int32)

    def value_and_grad(lg):
        loss, g = jax.value_and_grad(
            lambda x: fn(x, logit_lens, labels, label_lens))(lg)
        return loss + jnp.mean(g ** 2)

    return timeit(value_and_grad, logits)


def main():
    import sys
    op, impl = sys.argv[1], sys.argv[2]
    print("backend:", jax.default_backend(), flush=True)
    dt = bench_one(op, impl)
    print(json.dumps({"op": f"{op} value+grad B=32 T=250 U=64 V=29",
                      "impl": impl, "ms": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
