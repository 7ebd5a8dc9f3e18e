"""ctypes binding for the native C++ JPEG feeder (native/jpeg_feeder.cc).

The reference's data path is 16-20 forked Python DataLoader workers doing
per-sample PIL decode+resize (/root/reference/train.py:821-826); here the
hot host work is one C call per batch: a std::thread pool decodes with
libjpeg (the codec PIL itself wraps) and bilinear-resizes straight into a
numpy buffer — no per-image Python, no GIL. Opt-in via
``HostLoader(decode_backend="native")``; builds on first use with g++ and
falls back to PIL if the toolchain or libjpeg is unavailable.

Resize semantics (default): Pillow-parity separable antialiased bicubic —
the same convolution resampling ``Image.resize``'s default BICUBIC filter
performs (support widened by the downscale factor, a = -0.5 Keys kernel),
within ~1/255 of PIL (PIL rounds its intermediate pass to uint8; the C
path keeps float). ``antialias=False`` selects the legacy non-antialiased
bilinear (the ``jax.image.resize(..., "bilinear")`` convention).
``dct_scale=True`` opts into libjpeg scaled decode (1/2^k DCT scaling when
the source is >= 4x the staging edge) — faster on large photos, no longer
bit-parity with a full-resolution decode. Decode output is bit-identical
to PIL (same codec), and label coordinates are unaffected (they scale from
the original dims, which both paths return identically).
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
    # A prebuilt .so with no source alongside (packaged install / cleaned
    # tree) is loaded as-is; rebuild only when the source is present and
    # newer. Never raise from here — the contract is PIL fallback.
    has_src = os.path.exists(_SRC)
    stale = (
        not os.path.exists(so)
        or (has_src and os.path.getmtime(so) < os.path.getmtime(_SRC))
    )
    if stale:
        if not has_src:
            return None
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
        ctypes.c_int,  # antialias (PIL-parity bicubic)
        ctypes.c_int,  # dct_scale
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
    paths: List[str],
    staging: int,
    n_threads: Optional[int] = None,
    antialias: bool = True,
    dct_scale: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode+resize a batch of JPEG files.

    ``antialias=True`` (default) is Pillow-parity bicubic (the filter
    ``Image.resize`` applies by default, /root/reference/train.py:654);
    False is the legacy non-antialiased bilinear. ``dct_scale=True`` lets
    libjpeg decode at a reduced DCT scale on large sources (faster,
    non-bit-parity; see module docstring).

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
        int(antialias),
        int(dct_scale),
    )
    if failures:
        bad = [p for p, (h, w) in zip(paths, dims) if h == 0 and w == 0]
        raise RuntimeError(f"{failures} JPEG(s) failed to decode: {bad[:5]}")
    return out, dims
