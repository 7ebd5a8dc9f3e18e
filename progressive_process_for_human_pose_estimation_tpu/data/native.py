"""ctypes binding for the native C++ JPEG feeder (native/jpeg_feeder.cc).

The reference's data path is 16-20 forked Python DataLoader workers doing
per-sample PIL decode+resize (/root/reference/train.py:821-826); here the
hot host work is one C call per batch: a std::thread pool decodes with
libjpeg (the codec PIL itself wraps) and bilinear-resizes straight into a
numpy buffer — no per-image Python, no GIL. Opt-in via
``HostLoader(decode_backend="native")``; builds on first use with g++ and
falls back to PIL if the toolchain or libjpeg is unavailable.

Resize semantics: non-antialiased bilinear with half-pixel centers (the
``jax.image.resize(..., "bilinear")`` convention). PIL's default resize is
an antialiased filter, so downscaled pixels differ slightly — decode
output is bit-identical (same codec), and label coordinates are unaffected
(they scale from the original dims, which both paths return identically).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "jpeg_feeder.cc",
)


def _build_and_load() -> Optional[ctypes.CDLL]:
    so = os.path.join(os.path.dirname(_SRC), "_jpeg_feeder.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(_SRC):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", so, _SRC, "-ljpeg",
               "-pthread"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.decode_resize_batch.restype = ctypes.c_int
    lib.decode_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    return lib


def native_available() -> bool:
    """True when the feeder is built (building it on first call)."""
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _LIB = _build_and_load()
            _TRIED = True
        return _LIB is not None


def decode_resize_batch(
    paths: List[str], staging: int, n_threads: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode+resize a batch of JPEG files.

    Returns (images float32 (N, staging, staging, 3) in [0,1],
    dims int32 (N, 2) original (h, w)). Raises RuntimeError if the library
    is unavailable or any file fails to decode (matching PIL's fail-loud
    behaviour)."""
    if not native_available():
        raise RuntimeError("native jpeg feeder unavailable (g++/libjpeg)")
    n = len(paths)
    out = np.empty((n, staging, staging, 3), np.float32)
    dims = np.empty((n, 2), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = _LIB.decode_resize_batch(
        arr, n, staging,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads or (os.cpu_count() or 1),
    )
    if failures:
        bad = [p for p, (h, w) in zip(paths, dims) if h == 0 and w == 0]
        raise RuntimeError(f"{failures} JPEG(s) failed to decode: {bad[:5]}")
    return out, dims
