"""psa_tpu — TPU-native phonon Spectral Energy Density analysis framework.

A ground-up JAX/XLA rebuild of the capabilities of the PSA reference package
(phonon SED from MD trajectories: k-path dispersions, k-grid heatmaps, chiral
phase maps, iSED mode reconstruction, CLI + GUI), designed TPU-first: the hot
projection+FFT path runs as fused MXU matmuls under jit, k-grid sweeps shard
over a device mesh, and oversized trajectories stream through HBM.

Public API mirrors the reference package root (reference: src/psa/__init__.py).
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: first compiles of the fused sweep
# programs cost minutes on remote-compile runtimes; cached reloads take
# seconds.  Opt out with PSA_TPU_NO_COMPILE_CACHE=1 (see
# utils/compile_cache.py).
from .utils.compile_cache import enable_persistent_cache as _epc

_epc()

from .core.trajectory import Trajectory
from .core.sed import SED, average_seds
from .core.calculator import SEDCalculator
from .io.loader import TrajectoryLoader
from .io.writer import TrajectoryWriter, out_to_qdump
from .visualization import SEDPlotter
from .visualization.styles import (
    DEFAULT_STYLE, COLOR_SCHEMES, apply_style, get_colormap,
    get_color_cycle, set_color_cycle, get_style_params, reset_style,
)
from .utils.helpers import (
    parse_direction, update_dict_recursively, ensure_directory,
    validate_array_shape, safe_divide, direction_label,
)
from .utils.config_manager import ConfigManager

__all__ = [
    "Trajectory", "SED", "SEDCalculator", "average_seds",
    "TrajectoryLoader", "TrajectoryWriter", "out_to_qdump",
    "SEDPlotter",
    "DEFAULT_STYLE", "COLOR_SCHEMES", "apply_style", "get_colormap",
    "get_color_cycle", "set_color_cycle", "get_style_params", "reset_style",
    "parse_direction", "update_dict_recursively", "ensure_directory",
    "validate_array_shape", "safe_divide", "direction_label",
    "ConfigManager",
    "__version__",
]
