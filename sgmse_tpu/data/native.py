"""ctypes binding for the native C++ batch WAV loader (native/wavload.cc).

The shared library is compiled on demand at first use and cached next to the
source — the same build-at-import pattern the reference uses for its CUDA op
(reference op/upfirdn2d.py:11-18, torch.utils.cpp_extension.load), applied to
the host data path: one native call decodes, crops, pads and normalizes a
whole (clean, noisy) batch with a C++ thread pool, no GIL.

Falls back gracefully: ``get_lib()`` returns None when no C++ toolchain is
available, and callers keep using the pure-Python loader.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import warnings
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_SRC = Path(__file__).parent / "native" / "wavload.cc"
_LIB_PATH = Path(__file__).parent / "native" / "libwavload.so"
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _compile() -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           str(_SRC), "-o", str(_LIB_PATH)]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    except (OSError, subprocess.TimeoutExpired) as e:
        warnings.warn(f"native wav loader build failed to launch: {e}")
        return False
    if res.returncode != 0:
        warnings.warn(f"native wav loader build failed:\n{res.stderr[:2000]}")
        return False
    return True


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if (not _LIB_PATH.exists()
                    or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime):
                if not _compile():
                    _lib_failed = True
                    return None
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError as e:
            warnings.warn(f"native wav loader unavailable: {e}")
            _lib_failed = True
            return None
        lib.sgmse_load_pair_batch.restype = ctypes.c_int
        lib.sgmse_load_pair_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_long, ctypes.c_int, ctypes.c_ulonglong,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_char_p, ctypes.c_int,
        ]
        lib.sgmse_read_wav.restype = ctypes.c_int
        lib.sgmse_read_wav.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
            ctypes.c_char_p, ctypes.c_int,
        ]
        _lib = lib
    return _lib


_NORM_MODES = {"not": 0, "none": 0, "noisy": 1, "clean": 2}


def load_pair_batch(clean_paths, noisy_paths, target_len: int,
                    random_crop: bool, seed: int, normalize: str,
                    ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Decode + crop + normalize a batch of pairs natively.

    Returns (x, y) float32 arrays of shape (n, target_len), or None when the
    native library is unavailable (caller falls back to Python).
    Raises RuntimeError on decode errors (bad file, unsupported encoding).
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(clean_paths)
    assert len(noisy_paths) == n
    x = np.zeros((n, target_len), dtype=np.float32)
    y = np.zeros((n, target_len), dtype=np.float32)
    c_arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in clean_paths])
    n_arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in noisy_paths])
    err = ctypes.create_string_buffer(1024)
    rc = lib.sgmse_load_pair_batch(
        c_arr, n_arr, n, target_len, int(random_crop), seed,
        _NORM_MODES[normalize],
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        err, len(err))
    if rc != 0:
        raise RuntimeError(f"native wav batch load failed: {err.value.decode()}")
    return x, y


def read_wav_native(path) -> Optional[Tuple[np.ndarray, int]]:
    """Decode one WAV (first channel) natively; None if lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out_len = ctypes.c_long(0)
    out_sr = ctypes.c_int(0)
    err = ctypes.create_string_buffer(1024)
    # One decode pass: the file size in bytes upper-bounds the sample count
    # (>= 1 byte per mono sample for every supported encoding), so allocate
    # once and trim instead of decoding twice for the length.
    max_len = max(os.path.getsize(path), 1)
    buf = np.zeros((max_len,), dtype=np.float32)
    rc = lib.sgmse_read_wav(os.fsencode(str(path)),
                            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                            max_len, ctypes.byref(out_len),
                            ctypes.byref(out_sr), err, len(err))
    if rc != 0:
        raise RuntimeError(f"native wav read failed: {err.value.decode()}")
    return buf[: out_len.value].copy(), out_sr.value
