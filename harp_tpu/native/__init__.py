"""Native (C++) runtime components, built on first use and cached.

`load_frameloader()` returns the compiled extension module or None when the
toolchain/libjpeg is unavailable — callers fall back to the PIL path.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys
import sysconfig

_CACHED = None
_TRIED = False


def _build_dir() -> str:
    d = os.path.join(os.path.dirname(__file__), "_build")
    os.makedirs(d, exist_ok=True)
    return d


def load_frameloader():
    global _CACHED, _TRIED
    if _TRIED:
        return _CACHED
    _TRIED = True
    src = os.path.join(os.path.dirname(__file__), "frameloader.cpp")
    with open(src, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    out = os.path.join(_build_dir(), f"_frameloader_{tag}.so")
    if not os.path.exists(out):
        include = sysconfig.get_paths()["include"]
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            f"-I{include}", src, "-ljpeg", "-o", out,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            _CACHED = None
            return None
    import importlib.util

    spec = importlib.util.spec_from_file_location("_frameloader", out)
    try:
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _CACHED = mod
    except Exception:
        _CACHED = None
    return _CACHED


def decode_jpeg_batch(paths, gray: bool = False, n_threads: int = 0):
    """Decode a list of same-size JPEGs -> float32 array in [0,1].

    Returns (N, H, W, 3) for color or (N, H, W) for grayscale, or None if
    the native loader is unavailable.
    """
    import numpy as np

    mod = load_frameloader()
    if mod is None:
        return None
    buf, n, h, w, c = mod.decode_jpeg_batch(list(paths), int(gray), n_threads)
    arr = np.frombuffer(bytes(buf), np.float32).reshape(n, h, w, c)
    return arr[..., 0] if gray else arr


def erode_masks(masks, iterations: int = 2):
    """3x3 min-filter erosion of (N, H, W) float32 masks (native), or None."""
    import numpy as np

    mod = load_frameloader()
    if mod is None:
        return None
    masks = np.ascontiguousarray(masks, np.float32)
    n, h, w = masks.shape
    out = mod.erode_masks(masks.tobytes(), n, h, w, iterations)
    return np.frombuffer(bytes(out), np.float32).reshape(n, h, w)
