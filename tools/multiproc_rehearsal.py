"""Two-process distributed rehearsal on the CPU backend (VERDICT r4 #2).

Everything multi-chip before round 5 ran in ONE process over 8 virtual
devices; the actual multi-host path — ``jax.distributed.initialize`` via
the CLI's ``--coordinator/--num_processes/--process_id`` flags, the
loader's global-plan batch sharding, host-local→global array assembly,
and cross-host WER count aggregation — had zero runtime coverage.  This
harness exercises BASELINE config 5's process topology for real:

1. Reference run: ONE process, 8 virtual CPU devices
   (``--xla_force_host_platform_device_count=8``), global batch B.
2. Rehearsal: TWO OS processes, 4 virtual CPU devices each, a localhost
   coordinator, the SAME config and global batch — each process loads
   its slice of every global batch through the real CLI path.
3. Assert: final train/eval mean loss and WER/CER agree across the two
   topologies (same global batches, same 8-device mesh arithmetic).

Usage:
    python tools/multiproc_rehearsal.py [--config configs/ctc_tiny_fake.py]
        [--epochs 1] [--max_batches N] [--out FILE]

The reference framework has no distributed layer at all (SURVEY.md
§2.11) — this rehearses the flagship NEW subsystem without pod hardware.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(n_devices: int) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count={n_devices}"
                        ).strip()
    # NB: platform forcing goes through the CLI's --platform flag (an
    # in-process jax.config.update), NOT JAX_PLATFORMS: this sandbox's
    # TPU plugin sitecustomize hangs any interpreter started with that
    # env var set.  The plugin's site dir must ALSO drop out of
    # PYTHONPATH entirely: its sitecustomize initialises the XLA backend
    # at interpreter start, which forecloses jax.distributed.initialize
    # (must run before any backend init).
    env.pop("JAX_PLATFORMS", None)
    paths = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([REPO] + paths)
    return env


def _cli_cmd(config: str, epochs: int, max_batches: int | None,
             extra: list) -> list:
    cmd = [sys.executable, "-m", "myrtlespeech_tpu.run.cli",
           "--config", config, "--epochs", str(epochs),
           "--platform", "cpu"]
    if max_batches:
        cmd += ["--max_batches", str(max_batches)]
    return cmd + extra


def _reports(stdout: str) -> dict:
    """The CLI's final ``json.dumps(reports, indent=2)`` block."""
    m = re.findall(r"^\{\n(?:.|\n)*?^\}", stdout, re.M)
    if not m:
        raise RuntimeError(f"no reports JSON in output:\n{stdout[-2000:]}")
    return json.loads(m[-1])


def run_single(config: str, epochs: int, max_batches) -> dict:
    cmd = _cli_cmd(config, epochs, max_batches, [])
    p = subprocess.run(cmd, env=_env(8), cwd=REPO, text=True,
                       capture_output=True, timeout=1500)
    if p.returncode != 0:
        raise RuntimeError(f"single-process run failed:\n{p.stderr[-3000:]}")
    return _reports(p.stdout)


def run_two_process(config: str, epochs: int, max_batches) -> list:
    port = _free_port()
    procs = []
    for pid in range(2):
        cmd = _cli_cmd(config, epochs, max_batches, [
            "--coordinator", f"127.0.0.1:{port}",
            "--num_processes", "2", "--process_id", str(pid)])
        procs.append(subprocess.Popen(
            cmd, env=_env(4), cwd=REPO, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=1500)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:  # exact PIDs we started, never patterns
            if p.poll() is None:
                p.kill()
    for pid, (rc, out, err) in enumerate(outs):
        with open(f"/tmp/myrtle_rehearsal_p{pid}.log", "w") as f:
            f.write(f"rc={rc}\n=== stdout ===\n{out}\n=== stderr ===\n{err}")
    for rc, out, err in outs:
        if rc != 0:
            raise RuntimeError(
                f"2-process run failed (rc={rc}; full logs in "
                f"/tmp/myrtle_rehearsal_p*.log):\n{err[-3000:]}")
    return [_reports(out) for _, out, _ in outs]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/ctc_tiny_fake.py")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--max_batches", type=int, default=None)
    ap.add_argument("--out", default=None, help="write JSON artifact here")
    ap.add_argument("--rtol", type=float, default=2e-4,
                    help="relative tolerance on mean losses (same global "
                         "batches; residue = reduction-order differences "
                         "between 1x8 and 2x4 device layouts)")
    args = ap.parse_args()

    print("== single process, 8 virtual devices ==", flush=True)
    ref = run_single(args.config, args.epochs, args.max_batches)
    print(json.dumps(ref))

    print("== two processes, 4+4 virtual devices, localhost coordinator ==",
          flush=True)
    r0, r1 = run_two_process(args.config, args.epochs, args.max_batches)
    print(json.dumps(r0))
    print(json.dumps(r1))

    result = {"single": ref, "proc0": r0, "proc1": r1, "checks": {}}
    ok = True
    # WER/CER are exact corpus-level counts aggregated across hosts —
    # both processes must report the identical value, equal to the
    # single-process run's.
    for key in ("wer", "cer"):
        if key in ref:
            same = (abs(r0.get(key, -1) - ref[key]) < 1e-12
                    and abs(r1.get(key, -1) - ref[key]) < 1e-12)
            result["checks"][key] = same
            ok &= same
    for key in ("train_mean_loss", "eval_mean_loss"):
        if key in ref:
            rel = abs(r0.get(key, 0) - ref[key]) / max(abs(ref[key]), 1e-9)
            result["checks"][key] = rel <= args.rtol
            result["checks"][key + "_rel"] = rel
            ok &= rel <= args.rtol
    result["ok"] = ok
    print(json.dumps(result["checks"]))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    print("REHEARSAL " + ("PASSED" if ok else "FAILED"))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
