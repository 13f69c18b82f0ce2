"""Multi-device sharding: mesh construction, sharded SED sweeps."""
from .sharded import (ArrayBlockSource, BlockSource, DumpBlockSource,
                      TiledBlockSource, make_mesh, mesh_shape_for,
                      sharded_dsf, sharded_dsf_self, sharded_sed_spectrum,
                      sharded_isf, sharded_isf_self, sharded_sk,
                      sharded_timecorr)

__all__ = ["ArrayBlockSource", "BlockSource", "DumpBlockSource",
           "TiledBlockSource", "make_mesh", "mesh_shape_for",
           "sharded_dsf", "sharded_dsf_self", "sharded_sed_spectrum",
           "sharded_isf", "sharded_isf_self", "sharded_sk",
           "sharded_timecorr"]
