"""SED visualization."""
from .sed_plotter import SEDPlotter
from .styles import DEFAULT_STYLE, COLOR_SCHEMES, apply_style

__all__ = ["SEDPlotter", "DEFAULT_STYLE", "COLOR_SCHEMES", "apply_style"]
