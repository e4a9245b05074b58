"""Pallas TPU kernels: fused LSTM, CTC/transducer lattices."""


def pallas_lattice_supported(batch_size: int) -> bool:
    """The lattice kernels' in-kernel row shifts are gated to B <= 8:
    narrow concat fills mis-compile for larger B and pltpu.roll hangs the
    Mosaic compiler (both observed on v5e, JAX 0.9).  Larger batches use
    the pure-lax lattice (ops/ctc.py, ops/rnnt.py)."""
    return batch_size <= 8
