"""JAX/XLA/Pallas compute kernels (the TPU hot path)."""
from . import dispersion, instantaneous, spectral, structure, timecorr, transport

__all__ = ["dispersion", "instantaneous", "spectral", "structure",
           "timecorr", "transport"]
