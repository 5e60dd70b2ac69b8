"""Native (C++) host runtime pieces, loaded via ctypes with numpy fallbacks.

``load_mel_batch`` assembles a padded [B, C, T] batch from .npy mel files by
mmapping them in a C++ thread pool (see ``batch_loader.cpp``) — the GIL-free
replacement for per-item ``np.load`` + pad in the data workers. Build lazily
with ``ensure_built()`` (g++ is in the image); every call falls back to pure
numpy when the shared object is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libvbloader.so")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def ensure_built(force: bool = False) -> bool:
    """Compile the loader if needed. Returns availability."""
    global _LIB, _TRIED
    if _LIB is not None and not force:
        return True
    if _TRIED and not force:
        return _LIB is not None
    _TRIED = True
    src = os.path.join(_DIR, "batch_loader.cpp")
    if force or not os.path.exists(_SO) or \
            os.path.getmtime(_SO) < os.path.getmtime(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _SO,
                 src, "-lpthread"],
                check=True, capture_output=True)
        except Exception as e:
            print(f"native loader build failed ({e}); using numpy fallback")
            return False
    try:
        lib = ctypes.CDLL(_SO)
        lib.vb_load_mel_batch.restype = ctypes.c_int
        lib.vb_load_mel_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_long), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_long), ctypes.c_int]
        _LIB = lib
        return True
    except OSError as e:
        print(f"native loader unavailable ({e}); using numpy fallback")
        return False


def _numpy_fallback(paths, starts, channels, t_target, pad_value):
    out = np.full((len(paths), channels, t_target), pad_value, np.float32)
    lengths = np.full(len(paths), -1, np.int64)
    for i, p in enumerate(paths):
        try:
            arr = np.load(p, mmap_mode="r")
        except Exception:
            continue
        s = int(starts[i]) if starts is not None else 0
        s = max(0, min(s, arr.shape[1]))
        valid = min(arr.shape[1] - s, t_target)
        out[i, :, :valid] = arr[:channels, s: s + valid]
        lengths[i] = valid
    return out, lengths


def load_mel_batch(paths: Sequence[str], channels: int, t_target: int,
                   pad_value: float = -5.0,
                   starts: Optional[Sequence[int]] = None,
                   num_threads: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Load B mel .npy files into one padded [B, C, T] float32 batch.

    Returns (batch, lengths); lengths[i] = -1 marks a corrupted/missing file
    (batch row is all pad_value — apply the dataset's fallback semantics).
    """
    if not ensure_built():
        return _numpy_fallback(paths, starts, channels, t_target, pad_value)
    n = len(paths)
    out = np.empty((n, channels, t_target), np.float32)
    lengths = np.empty(n, np.int64)
    c_paths = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    starts_arr = np.asarray(starts if starts is not None else np.zeros(n),
                            np.int64)
    _LIB.vb_load_mel_batch(
        c_paths, n, starts_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        channels, t_target, pad_value,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), num_threads)
    return out, lengths
