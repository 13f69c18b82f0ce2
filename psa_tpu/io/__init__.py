"""Trajectory I/O: native parsers, npy caches, writers."""
from .loader import TrajectoryLoader
from .writer import TrajectoryWriter, out_to_qdump

__all__ = ["TrajectoryLoader", "TrajectoryWriter", "out_to_qdump"]
