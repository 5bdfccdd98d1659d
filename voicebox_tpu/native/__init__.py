"""ctypes bindings for the native audio loader (`wavio.cpp`).

The shared library is built on first import with g++ (cached next to the
source); every entry point degrades gracefully to the pure-Python path when
the toolchain or build is unavailable, so the framework never hard-depends on
the native component.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

__all__ = [
    "native_available", "wav_read", "wav_read_batch", "wav_info",
    "flac_available", "flac_read", "flac_info",
]

_HERE = Path(__file__).parent
_SRC = _HERE / "wavio.cpp"
_LIB_PATH = _HERE / "libvbwavio.so"

_lib = None
_tried = False

_FLAC_SRC = _HERE / "flacio.cpp"
_FLAC_LIB_PATH = _HERE / "libvbflac.so"

_flac_lib = None
_flac_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                str(_SRC), "-o", str(_LIB_PATH), "-lpthread",
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.vb_wav_info.restype = ctypes.c_longlong
        lib.vb_wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
        lib.vb_wav_read.restype = ctypes.c_longlong
        lib.vb_wav_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.vb_wav_read_batch.restype = ctypes.c_int
        lib.vb_wav_read_batch.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def wav_info(path) -> Optional[Tuple[int, int]]:
    """-> (n_samples, sample_rate) or None."""
    lib = _load()
    if lib is None:
        return None
    sr = ctypes.c_int(0)
    n = lib.vb_wav_info(str(path).encode(), ctypes.byref(sr))
    if n < 0:
        return None
    return int(n), int(sr.value)


def wav_read(path) -> Optional[Tuple[np.ndarray, int]]:
    """Decode one wav -> (float32 mono wave, sample_rate) or None."""
    lib = _load()
    if lib is None:
        return None
    info = wav_info(path)
    if info is None:
        return None
    n, _ = info
    buf = np.empty(n, dtype=np.float32)
    sr = ctypes.c_int(0)
    got = lib.vb_wav_read(
        str(path).encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        ctypes.byref(sr),
    )
    if got < 0:
        return None
    return buf[:got], int(sr.value)


def wav_read_batch(
    paths: List, max_samples: int, num_threads: int = 0
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Threaded batch decode -> (batch (n, max_samples) float32 zero-padded,
    lengths (n,) int64 with -1 for failures), or None if native is
    unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    joined = b"\0".join(str(p).encode() for p in paths) + b"\0"
    out = np.zeros((n, max_samples), dtype=np.float32)
    lengths = np.zeros(n, dtype=np.int64)
    lib.vb_wav_read_batch(
        joined,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        num_threads,
    )
    return out, lengths


# ----------------------------------------------------------------------
# FLAC (flacio.cpp) — the reference dataset's format (reference
# data.py:26-53); no flac-capable library ships in this image, so the
# framework carries its own decoder. Same graceful-degradation contract.
# ----------------------------------------------------------------------


def _load_flac():
    global _flac_lib, _flac_tried
    if _flac_tried:
        return _flac_lib
    _flac_tried = True
    try:
        if (not _FLAC_LIB_PATH.exists()
                or _FLAC_LIB_PATH.stat().st_mtime < _FLAC_SRC.stat().st_mtime):
            subprocess.run(
                [
                    "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                    str(_FLAC_SRC), "-o", str(_FLAC_LIB_PATH),
                ],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(str(_FLAC_LIB_PATH))
        lib.vb_flac_info.restype = ctypes.c_longlong
        lib.vb_flac_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.vb_flac_read.restype = ctypes.c_longlong
        lib.vb_flac_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int),
        ]
        _flac_lib = lib
    except Exception:
        _flac_lib = None
    return _flac_lib


def flac_available() -> bool:
    return _load_flac() is not None


def flac_info(path) -> Optional[Tuple[int, int]]:
    """-> (n_samples, sample_rate) from STREAMINFO (header-only), or None
    (including streams that do not declare their length)."""
    lib = _load_flac()
    if lib is None:
        return None
    sr = ctypes.c_int(0)
    ch = ctypes.c_int(0)
    n = lib.vb_flac_info(str(path).encode(), ctypes.byref(sr),
                         ctypes.byref(ch))
    if n < 0:
        return None
    return int(n), int(sr.value)


def flac_read(path) -> Optional[Tuple[np.ndarray, int]]:
    """Decode one flac -> (float32 mono wave, sample_rate) or None."""
    lib = _load_flac()
    if lib is None:
        return None
    info = flac_info(path)
    declared = info is not None
    if declared:
        cap = info[0]
    else:
        # stream without a declared length: start from the compressed size
        # (a heuristic only — FLAC COMPRESSES, so silence/constant-heavy
        # audio can exceed any fixed expansion factor). The retry loop below
        # makes the guess safe: got == cap means the decoder may have been
        # truncated at the buffer edge, so grow and decode again until the
        # result fits strictly inside the buffer.
        try:
            cap = max(os.path.getsize(str(path)) * 4, 1 << 16)
        except OSError:
            return None
    while True:
        if cap > (1 << 31):
            # > 2^31 samples (24+ hours mono at 24 kHz) is far past any real
            # training utterance — treat as undecodable (most likely a
            # corrupt stream) rather than exhausting host memory
            return None
        try:
            buf = np.empty(int(cap), dtype=np.float32)
        except MemoryError:
            return None
        sr = ctypes.c_int(0)
        got = lib.vb_flac_read(
            str(path).encode(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            int(cap),
            ctypes.byref(sr),
        )
        if got < 0:
            return None
        if declared or got < cap:
            # declared streams decode exactly `cap` samples by construction;
            # undeclared streams are complete once the decode fits strictly
            return buf[:got], int(sr.value)
        cap *= 4
