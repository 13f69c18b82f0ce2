"""Plot styling presets and color schemes (reference: src/psa/visualization/styles.py)."""
from __future__ import annotations

from typing import Any, Dict, Optional

import matplotlib as mpl
import matplotlib.pyplot as plt

DEFAULT_STYLE: Dict[str, Any] = {
    'figure.figsize': (10, 8),
    'figure.dpi': 100,
    'figure.autolayout': True,
    'font.size': 12,
    'axes.labelsize': 14,
    'axes.titlesize': 16,
    'xtick.labelsize': 12,
    'ytick.labelsize': 12,
    'legend.fontsize': 12,
    'lines.linewidth': 2,
    'lines.markersize': 6,
    'image.cmap': 'viridis',
    'axes.grid': True,
    'grid.alpha': 0.3,
    'grid.linestyle': '--',
    'axes.spines.top': False,
    'axes.spines.right': False,
}

COLOR_SCHEMES: Dict[str, Dict[str, str]] = {
    'default': {
        'primary': '#1f77b4', 'secondary': '#ff7f0e', 'tertiary': '#2ca02c',
        'quaternary': '#d62728', 'background': '#ffffff', 'grid': '#cccccc',
    },
    'dark': {
        'primary': '#4c72b0', 'secondary': '#dd8452', 'tertiary': '#55a868',
        'quaternary': '#c44e52', 'background': '#2d2d2d', 'grid': '#404040',
    },
    'scientific': {
        'primary': '#000000', 'secondary': '#e41a1c', 'tertiary': '#377eb8',
        'quaternary': '#4daf4a', 'background': '#ffffff', 'grid': '#dddddd',
    },
}


def apply_style(style: Optional[Dict[str, Any]] = None, color_scheme: str = 'default') -> None:
    """Apply DEFAULT_STYLE-style rcParams overlaid with a named color scheme."""
    if style is None:
        style = {}
    if color_scheme not in COLOR_SCHEMES:
        raise ValueError(f"Unknown color scheme: {color_scheme}. "
                         f"Must be one of: {list(COLOR_SCHEMES.keys())}")
    colors = COLOR_SCHEMES[color_scheme]
    style.update({
        'axes.facecolor': colors['background'],
        'figure.facecolor': colors['background'],
        'grid.color': colors['grid'],
        'axes.edgecolor': colors['primary'],
        'axes.labelcolor': colors['primary'],
        'xtick.color': colors['primary'],
        'ytick.color': colors['primary'],
        'text.color': colors['primary'],
    })
    plt.style.use(style)


def get_colormap(name: str = 'viridis') -> mpl.colors.Colormap:
    return plt.get_cmap(name)


def get_color_cycle() -> list:
    return plt.rcParams['axes.prop_cycle'].by_key()['color']


def set_color_cycle(colors: list) -> None:
    plt.rcParams['axes.prop_cycle'] = plt.cycler(color=colors)


def get_style_params() -> Dict[str, Any]:
    return {k: v for k, v in plt.rcParams.items() if k in DEFAULT_STYLE}


def reset_style() -> None:
    plt.style.use('default')
