"""A/B the fused Pallas joint-tail kernel vs the XLA joint paths on chip.

Flagship shape (bench.py): B=32, T'=250, U=64, K=512, V=29.  Compares
value+grad of the full transducer loss through three fronts:

  full   : act(fp+gp) @ W2 + b2 full logits -> blank_emit_from_logits
  chunked: rnnt_loss_fused-style T-chunked joint with remat
  pallas : ops/pallas/joint_kernel.joint_tail_blank_emit

All three feed the same lattice (lax log-semiring scan) so the delta is
the front alone.  Prints per-path ms (best of 3 over a compiled loop)
and max |grad| deviation vs the full path.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from myrtlespeech_tpu.ops.pallas.joint_kernel import joint_tail_blank_emit
from myrtlespeech_tpu.ops.rnnt import (blank_emit_from_logits,
                                       rnnt_log_likelihood_from_blank_emit)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=32)
    p.add_argument("--T", type=int, default=250)
    p.add_argument("--U", type=int, default=64)
    p.add_argument("--K", type=int, default=512)
    p.add_argument("--V", type=int, default=29)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--fwd_only", action="store_true")
    p.add_argument("--paths", default="full,chunked,pallas")
    args = p.parse_args()
    B, T, U, K, V = args.B, args.T, args.U, args.K, args.V
    dt = jnp.dtype(args.dtype)

    rng = np.random.default_rng(0)
    fp = jnp.asarray(rng.standard_normal((B, T, K)), dt)
    gp = jnp.asarray(rng.standard_normal((B, U + 1, K)), dt)
    w2 = jnp.asarray(rng.standard_normal((K, V)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((V,)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)
    f_lens = jnp.full((B,), T, jnp.int32)
    l_lens = jnp.full((B,), U, jnp.int32)

    def tail_full(fp, gp, w2, b2):
        h = jnp.maximum(fp[:, :, None, :] + gp[:, None, :, :], 0)
        logits = h.astype(dt) @ w2.astype(dt) + b2
        return blank_emit_from_logits(logits, labels, 0)

    def tail_chunked(fp, gp, w2, b2, chunk=32):
        pad = (-T) % chunk
        n = (T + pad) // chunk

        @jax.checkpoint
        def one(fc):
            h = jnp.maximum(fc[:, :, None, :] + gp[:, None, :, :], 0)
            logits = h.astype(dt) @ w2.astype(dt) + b2
            return blank_emit_from_logits(logits, labels, 0)

        fpp = jnp.pad(fp, ((0, 0), (0, pad), (0, 0)))
        fcs = jnp.moveaxis(fpp.reshape(B, n, chunk, K), 1, 0)
        _, (lpb, lpe) = jax.lax.scan(lambda c, fc: (None, one(fc)),
                                     None, fcs)
        lpb = jnp.moveaxis(lpb, 0, 1).reshape(B, T + pad, U + 1)[:, :T]
        lpe = jnp.moveaxis(lpe, 0, 1).reshape(B, T + pad, U + 1)[:, :T]
        return lpb, lpe

    def tail_pallas(fp, gp, w2, b2):
        return joint_tail_blank_emit(fp, gp, w2, b2, labels, 0, "relu",
                                     20.0, 0, args.dtype)

    def loss_of(tail):
        def loss(fp, gp, w2, b2):
            lpb, lpe = tail(fp, gp, w2, b2)
            ll = rnnt_log_likelihood_from_blank_emit(lpb, lpe, f_lens,
                                                     l_lens)
            return -jnp.mean(ll)
        return loss

    def bench(loss):
        if args.fwd_only:
            g = jax.jit(lambda *a: (loss(*a), (a[0], a[1], a[2], a[3])))
        else:
            g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))

        @jax.jit
        def loop(fp, gp, w2, b2):
            def body(_, carry):
                v, gs = g(fp, gp, w2, b2)
                return (v, gs)
            return jax.lax.fori_loop(0, args.steps, body,
                                     g(fp, gp, w2, b2))
        # Host-fetch fencing: on the experimental remote TPU platform
        # block_until_ready does NOT wait (measured); only a host fetch
        # fences the dispatch chain (same methodology as bench.py).
        out = loop(fp, gp, w2, b2)
        _ = float(out[0])
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = loop(fp, gp, w2, b2)
            _ = float(out[0])
            best = min(best, (time.perf_counter() - t0) / args.steps)
        return best * 1e3, out

    results = {}
    grads = {}
    wanted = args.paths.split(",")
    for name, tail in [("full", tail_full), ("chunked", tail_chunked),
                       ("pallas", tail_pallas)]:
        if name not in wanted:
            continue
        try:
            ms, (v, gs) = bench(loss_of(tail))
            results[name] = ms
            grads[name] = (float(v), [np.asarray(x, np.float32) for x in gs])
            print(f"{name:8s} {ms:7.3f} ms  loss={float(v):.4f}")
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name:8s} FAILED: {type(e).__name__}: {e}")

    if "full" in grads:
        v0, g0 = grads["full"]
        for name, (v, gs) in grads.items():
            if name == "full":
                continue
            dev = max(float(np.max(np.abs(a - b)))
                      / (float(np.max(np.abs(b))) + 1e-30)
                      for a, b in zip(gs, g0))
            print(f"{name}: dloss={abs(v - v0):.2e} "
                  f"max rel grad dev vs full={dev:.2e}")


if __name__ == "__main__":
    main()
