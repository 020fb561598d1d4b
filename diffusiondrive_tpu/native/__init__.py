"""Lazy-built native extension (see `_native.cpp`).

On first import, compiles `_native.cpp` with g++ into a cached .so next to
the source. Falls back to pure-python implementations when no compiler is
available — every consumer treats this module as optional.
"""

from __future__ import annotations

import logging
import subprocess
import sys
import sysconfig
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_DIR = Path(__file__).parent
_SO_PATH = _DIR / f"_native{sysconfig.get_config_var('EXT_SUFFIX') or '.so'}"
_module = None
_build_attempted = False


def _build() -> bool:
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}",
        str(_DIR / "_native.cpp"),
        "-o", str(_SO_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as exc:  # noqa: BLE001
        logger.warning("native extension build failed (%s); using python fallbacks", exc)
        return False


def get_native():
    """The compiled module, or None when unavailable."""
    global _module, _build_attempted
    if _module is not None:
        return _module
    if not _SO_PATH.exists():
        if _build_attempted:
            return None
        _build_attempted = True
        if not _build():
            return None
    import importlib.util

    spec = importlib.util.spec_from_file_location("diffusiondrive_tpu.native._native", _SO_PATH)
    _module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(_module)
    return _module


def lzf_decompress(data: bytes, expected_size: int) -> Optional[bytes]:
    """Native LZF decompress; None when the extension is unavailable."""
    native = get_native()
    if native is None:
        return None
    return native.lzf_decompress(data, expected_size)


def histogram2d(
    x: np.ndarray, y: np.ndarray, min_x: float, max_x: float, min_y: float, max_y: float, bins: int
) -> Optional[np.ndarray]:
    """Native 2D histogram (np.histogramdd regular-grid semantics)."""
    native = get_native()
    if native is None:
        return None
    raw = native.histogram2d(
        np.ascontiguousarray(x, np.float32).tobytes(),
        np.ascontiguousarray(y, np.float32).tobytes(),
        float(min_x), float(max_x), float(min_y), float(max_y), int(bins),
    )
    return np.frombuffer(raw, np.uint32).reshape(bins, bins)
