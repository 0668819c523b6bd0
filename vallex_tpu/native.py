"""ctypes bindings for the native host runtime (vallex_tpu/native/…cpp).

Builds the shared library on demand with the system compiler (no pybind11 in
this image) and exposes: tokenize (char→id), load_wav, resample. Every entry
point has a pure-Python fallback, so the package works without a compiler;
when the library is present it is used automatically by the frontend
tokenizer and audio loader.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# package-local: the C++ sources + Makefile ship inside the wheel, so the
# on-demand build works in installed layouts too
_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvallex_native.so")

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "vallex_native.cpp")
    if not os.path.exists(src):
        return False
    try:
        # -B: always recompile — a stale or foreign-platform binary (e.g.
        # copied from another machine) must be replaced, not kept
        subprocess.run(
            ["make", "-B", "-C", _NATIVE_DIR], check=True,
            capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception as e:  # no compiler, sandboxed, etc.
        logger.debug("native build failed: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        # binary exists but doesn't load (built on another platform):
        # rebuild for this machine and retry once
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

    lib.vn_set_vocab.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int32,
    ]
    lib.vn_tokenize.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
    ]
    lib.vn_tokenize.restype = ctypes.c_int
    lib.vn_load_wav.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.vn_load_wav.restype = ctypes.c_long
    lib.vn_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
    ]
    lib.vn_resample.restype = ctypes.c_long

    # install the production vocab once
    from .frontend.symbols import UNK_ID, char_to_id

    cps, ids = [], []
    for ch, idx in char_to_id.items():
        if len(ch) == 1:  # skip the [UNK]/[CLS]/... specials
            cps.append(ord(ch))
            ids.append(idx)
    n = len(cps)
    lib.vn_set_vocab(
        (ctypes.c_uint32 * n)(*cps), (ctypes.c_int32 * n)(*ids), n, UNK_ID
    )
    _lib = lib
    return _lib


def tokenize(phonemes: str) -> Optional[np.ndarray]:
    """Char-level encode via the native lib; None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    max_out = len(phonemes) + 1
    out = (ctypes.c_int32 * max_out)()
    n = lib.vn_tokenize(phonemes.encode("utf-8"), out, max_out)
    return np.ctypeslib.as_array(out)[:n].copy()


def load_wav(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """→ (mono float32, sample_rate) via the native decoder; None if n/a."""
    lib = get_lib()
    if lib is None:
        return None
    sr = ctypes.c_int32()
    n = lib.vn_load_wav(path.encode(), None, 0, ctypes.byref(sr))
    if n < 0:
        return None
    buf = np.zeros(n, np.float32)
    got = lib.vn_load_wav(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, ctypes.byref(sr),
    )
    if got < 0:
        return None
    return buf[:got], int(sr.value)


def resample(wav: np.ndarray, sr_in: int, sr_out: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    wav = np.ascontiguousarray(wav, np.float32)
    n_out = lib.vn_resample(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wav),
        sr_in, sr_out, None, 0,
    )
    out = np.zeros(max(n_out, 1), np.float32)
    got = lib.vn_resample(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wav),
        sr_in, sr_out,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(out),
    )
    return out[:got]
