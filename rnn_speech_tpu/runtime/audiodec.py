"""ctypes binding to the native audio decoder, with a pure-Python fallback.

The production decode path is ``librst_runtime.so`` (built from
``native/flacdec.cpp``); it is compiled on first use if a toolchain is
available.  The pure-Python FLAC decoder in ``flac_py`` exists to (a) keep
the framework functional without a C++ toolchain and (b) cross-check the
native decoder in tests.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librst_runtime.so")

_lib_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_load_failed = False


def _build_native() -> bool:
    try:
        proc = subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            capture_output=True,
            text=True,
            timeout=120,
        )
    except (OSError, subprocess.TimeoutExpired) as exc:
        logger.warning("Native runtime build failed to launch: %s", exc)
        return False
    if proc.returncode != 0:
        logger.warning("Native runtime build failed:\n%s", proc.stderr)
        return False
    return True


def get_native_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native runtime library, else None."""
    global _lib, _lib_load_failed
    if _lib is not None or _lib_load_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _lib_load_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build_native():
            _lib_load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as exc:
            logger.warning("Failed to load native runtime: %s", exc)
            _lib_load_failed = True
            return None
        lib.rst_flac_decode.restype = ctypes.c_int
        lib.rst_flac_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.rst_free.restype = None
        lib.rst_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def decode_flac_native(path: str) -> Tuple[np.ndarray, int]:
    """Decode via the C++ library -> (float32 (n, ch) in [-1, 1], rate)."""
    lib = get_native_lib()
    if lib is None:
        raise RuntimeError("Native runtime library unavailable")

    samples = ctypes.POINTER(ctypes.c_int32)()
    count = ctypes.c_int64()
    channels = ctypes.c_int32()
    rate = ctypes.c_int32()
    bps = ctypes.c_int32()
    rc = lib.rst_flac_decode(
        path.encode(),
        ctypes.byref(samples),
        ctypes.byref(count),
        ctypes.byref(channels),
        ctypes.byref(rate),
        ctypes.byref(bps),
    )
    if rc != 0:
        raise ValueError(f"FLAC decode failed (code {rc}): {path}")
    # Same corrupt-STREAMINFO guard as the C++ consumer (loader.cpp): rc 0
    # with bogus header fields must fail cleanly, not crash on a negative
    # shift or a zero-channel reshape downstream.
    if not (0 < rate.value <= 1_000_000 and channels.value > 0
            and 4 <= bps.value <= 32):
        lib.rst_free(samples)
        raise ValueError(
            f"FLAC decode returned corrupt STREAMINFO (rate {rate.value}, "
            f"channels {channels.value}, bps {bps.value}): {path}"
        )
    try:
        n = count.value * channels.value
        arr = np.ctypeslib.as_array(samples, shape=(n,)).copy()
    finally:
        lib.rst_free(samples)
    scale = float(1 << (bps.value - 1))
    out = (arr.astype(np.float32) / scale).reshape(-1, channels.value)
    return out, rate.value


def decode_flac(path: str) -> Tuple[np.ndarray, int]:
    """Decode FLAC: native C++ first, pure-Python bitstream fallback."""
    if get_native_lib() is not None:
        return decode_flac_native(path)
    from rnn_speech_tpu.runtime import flac_py

    return flac_py.decode_flac(path)
