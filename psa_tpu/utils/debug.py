"""Developer-mode numerics sanitizers.

The reference's only "sanitizer" is threading-by-convention (SURVEY.md §5.2);
the JAX-native equivalents are NaN/Inf trapping and disabling jit for
step-through debugging.
"""
from __future__ import annotations

import contextlib
import logging

logger = logging.getLogger(__name__)


def enable_debug_mode(nans: bool = True, infs: bool = True,
                      disable_jit: bool = False) -> None:
    """Trap NaNs/Infs at the op level; optionally run op-by-op (no jit).

    NaN trapping recompiles kernels with result checks — use in development,
    never in production sweeps.
    """
    import jax
    if nans:
        jax.config.update("jax_debug_nans", True)
    if infs:
        jax.config.update("jax_debug_infs", True)
    if disable_jit:
        jax.config.update("jax_disable_jit", True)
    logger.info("Debug mode: nans=%s infs=%s disable_jit=%s", nans, infs, disable_jit)


def disable_debug_mode() -> None:
    import jax
    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_debug_infs", False)
    jax.config.update("jax_disable_jit", False)


@contextlib.contextmanager
def debug_numerics(nans: bool = True, infs: bool = True):
    """Context-scoped NaN/Inf trapping."""
    enable_debug_mode(nans=nans, infs=infs)
    try:
        yield
    finally:
        disable_debug_mode()
