"""Pallas TPU kernels: fused LSTM, CTC/transducer lattices."""


def pallas_lattice_supported(batch_size: int) -> bool:
    """Whether the Pallas lattice kernels serve this batch size.

    The kernels' in-kernel row shifts are Mosaic-correct only for <= 8
    rows per call (narrow concat fills mis-compile for larger B and
    pltpu.roll hangs the compiler; observed on v5e, JAX 0.9), so larger
    batches are tiled into ceil(B/8) slab calls
    (``rnnt_kernel.rnnt_lattice`` / ``ctc_kernel.ctc_lattice``).  The cap
    here only bounds unrolled slab count; whether Pallas or the pure-lax
    lattice (ops/ctc.py, ops/rnnt.py) wins at a given shape is measured
    in docs/performance.md.
    """
    import os
    if os.environ.get("MYRTLE_DISABLE_PALLAS_LATTICE"):
        # Operational escape hatch (and triage bisect lever for kernel
        # faults): force the pure-lax lattices.
        return False
    return batch_size <= 512  # 64 slabs; beyond this unrolling is silly
