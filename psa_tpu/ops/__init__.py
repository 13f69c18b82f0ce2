"""JAX/XLA/Pallas compute kernels (the TPU hot path)."""
from . import dispersion, spectral

__all__ = ["dispersion", "spectral"]
