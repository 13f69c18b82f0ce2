"""Multi-device sharding: mesh construction, sharded SED sweeps."""
from .sharded import make_mesh, mesh_shape_for, sharded_sed_spectrum

__all__ = ["make_mesh", "mesh_shape_for", "sharded_sed_spectrum"]
