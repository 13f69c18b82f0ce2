"""glibc arena tuning for streamed multi-GB host buffers.

On Firecracker-class VMs with lazy memory, FIRST-TOUCH page faults on fresh
anonymous pages can run at single-digit MB/s (measured on this host class:
0.4 GB first-touch in 169 s vs 0.03 s for the same allocation reused from
the arena — docs/PERF_NOTES.md).  Every streamed superchunk that allocates
a fresh multi-GB numpy buffer then pays minutes of kernel time per chunk,
burying the actual device transfer.

glibc serves allocations above M_MMAP_THRESHOLD with a fresh mmap and
returns them to the kernel on free — so each superchunk faults its pages
again.  Raising M_MMAP_THRESHOLD and M_TRIM_THRESHOLD keeps the big blocks
in the main arena where freed pages stay mapped: the first superchunk
faults once and every later one reuses warm pages at memcpy speed.

The streamed sweep entry points call :func:`enable_arena_reuse` lazily (the
trade — steady-state RSS holds a few superchunks' worth of arena — is right
exactly when multi-GB host staging is in play).  ``PSA_TPU_NO_ARENA_REUSE=1``
opts out; non-glibc platforms are a silent no-op.
"""
from __future__ import annotations

import ctypes
import logging
import os

logger = logging.getLogger(__name__)

# glibc mallopt parameter numbers (malloc.h)
_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_state: bool | None = None


def enable_arena_reuse(threshold_bytes: int = 1 << 40) -> bool:
    """Keep large freed blocks in the glibc arena (idempotent).

    Returns True when the tuning is active (now or from an earlier call),
    False when opted out or unavailable (non-glibc libc).
    """
    global _state
    if _state is not None:
        return _state
    if os.environ.get("PSA_TPU_NO_ARENA_REUSE") == "1":
        _state = False
        return False
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        ok = (libc.mallopt(_M_MMAP_THRESHOLD, threshold_bytes) == 1
              and libc.mallopt(_M_TRIM_THRESHOLD, threshold_bytes) == 1)
    except (OSError, AttributeError):
        ok = False
    if ok:
        logger.info("glibc arena reuse enabled for streamed host buffers "
                    "(mmap/trim threshold %d bytes)", threshold_bytes)
    else:
        logger.debug("glibc mallopt unavailable; streamed host buffers "
                     "use default allocation")
    _state = ok
    return ok
