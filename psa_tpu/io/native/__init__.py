"""Native (C) fast parsing for trajectory I/O, bound via ctypes.

The shared library is compiled once from ``fastparse.c`` on first use (the
toolchain ships with the image); all callers fall back transparently to the
NumPy text path when no compiler is available.
"""
from __future__ import annotations

import ctypes
import logging
import subprocess
import sysconfig
import threading
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_HERE = Path(__file__).parent
_SRC = _HERE / "fastparse.c"
_LIB_PATH = _HERE / "libpsa_fastparse.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    for cc in ('cc', 'gcc', 'clang'):
        try:
            subprocess.run([cc, '-O3', '-march=native', '-shared', '-fPIC',
                            str(_SRC), '-o', str(_LIB_PATH)],
                           check=True, capture_output=True, timeout=120)
            logger.info("Compiled native parser with %s -> %s", cc, _LIB_PATH.name)
            return True
        except (FileNotFoundError, subprocess.CalledProcessError,
                subprocess.TimeoutExpired) as e:
            logger.debug("Native parser build with %s failed: %s", cc, e)
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists():
            if not _SRC.exists() or not _compile():
                logger.info("Native parser unavailable; using NumPy text parsing.")
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.psa_parse_doubles.restype = ctypes.c_long
            lib.psa_parse_doubles.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_double), ctypes.c_long]
            _lib = lib
        except OSError as e:
            logger.warning("Failed to load native parser: %s", e)
        return _lib


def available() -> bool:
    return get_lib() is not None


def parse_doubles(text: bytes, n_vals: int) -> np.ndarray:
    """Parse exactly ``n_vals`` whitespace-separated numbers from ``text``.

    Raises ValueError on malformed input or a count mismatch.
    """
    lib = get_lib()
    if lib is None:
        out = np.fromstring(text.decode('ascii'), dtype=np.float64, sep=' ')
        if out.size != n_vals:
            raise ValueError(f"Expected {n_vals} values, parsed {out.size}")
        return out
    out = np.empty(n_vals, dtype=np.float64)
    got = lib.psa_parse_doubles(
        text, len(text),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n_vals)
    if got < 0:
        offset = -(got + 1)
        snippet = text[max(0, offset - 10):offset + 10]
        raise ValueError(f"Malformed number at byte {offset}: {snippet!r}")
    if got != n_vals:
        raise ValueError(f"Expected {n_vals} values, parsed {got}")
    return out
