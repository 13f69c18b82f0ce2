"""JAX/XLA/Pallas compute kernels (the TPU hot path)."""
from . import dispersion, spectral, transport

__all__ = ["dispersion", "spectral", "transport"]
