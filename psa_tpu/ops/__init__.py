"""JAX/XLA/Pallas compute kernels (the TPU hot path)."""
from . import spectral

__all__ = ["spectral"]
