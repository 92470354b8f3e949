"""Native (C++) host-runtime components, loaded via ctypes.

Compiled lazily on first use with g++ and cached next to the source; every
entry point has a pure-Python fallback so the framework works without a
toolchain. See lamp_native.cpp for what lives here and why.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "lamp_native.cpp")
_SO = os.path.join(_DIR, "lamp_native.so")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> Optional[str]:
    try:
        src_mtime = os.path.getmtime(_SRC)
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= src_mtime:
            return _SO
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o",
             _SO + ".tmp"],
            check=True, capture_output=True,
        )
        os.replace(_SO + ".tmp", _SO)
        return _SO
    except Exception:
        return None


def get_lib():
    """The loaded ctypes library, or None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.bpe_create.restype = ctypes.c_void_p
        lib.bpe_create.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.bpe_destroy.argtypes = [ctypes.c_void_p]
        lib.bpe_encode.restype = ctypes.c_int64
        lib.bpe_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p,
        ]
        lib.tree_apply.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.forest_predict.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.bpe_count_build.restype = ctypes.c_void_p
        lib.bpe_count_build.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ]
        lib.bpe_count_size.restype = ctypes.c_int64
        lib.bpe_count_size.argtypes = [ctypes.c_void_p]
        lib.bpe_count_fill.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.bpe_count_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


class NativeBpe:
    """Greedy longest-match encoder backed by the C++ table."""

    def __init__(self, encoding: List[Tuple[bytes, int]]):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        seg_bytes = b"".join(seg for seg, _ in encoding)
        offsets = np.zeros(len(encoding) + 1, np.int64)
        for i, (seg, _) in enumerate(encoding):
            offsets[i + 1] = offsets[i] + len(seg)
        tokens = np.asarray([tok for _, tok in encoding], np.int32)
        self._seg_buf = np.frombuffer(seg_bytes, np.uint8).copy()
        self._handle = lib.bpe_create(
            self._seg_buf.ctypes.data, offsets.ctypes.data,
            tokens.ctypes.data, len(encoding),
        )

    def encode(self, corpus: bytes, unknown_token: int) -> np.ndarray:
        buf = np.frombuffer(corpus, np.uint8)
        out = np.empty(len(corpus), np.int32)
        n = self._lib.bpe_encode(
            self._handle, buf.ctypes.data, len(corpus), unknown_token,
            out.ctypes.data,
        )
        return out[:n].copy()

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.bpe_destroy(self._handle)
            self._handle = None


def native_ngram_counts(corpus: bytes, max_len: int):
    """Count byte n-grams (len<=7) via C++; returns {bytes: count} or None."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(corpus, np.uint8)
    handle = lib.bpe_count_build(buf.ctypes.data, len(corpus), max_len)
    try:
        size = lib.bpe_count_size(handle)
        keys = np.empty(size, np.uint64)
        counts = np.empty(size, np.int64)
        lib.bpe_count_fill(handle, keys.ctypes.data, counts.ctypes.data)
    finally:
        lib.bpe_count_free(handle)
    out = {}
    lengths = (keys >> np.uint64(56)).astype(np.int64)
    payload = keys & np.uint64((1 << 56) - 1)
    raw = payload.astype("<u8").view(np.uint8).reshape(-1, 8)
    for i in range(size):
        out[raw[i, :lengths[i]].tobytes()] = int(counts[i])
    return out


def native_forest_predict(forest, x: np.ndarray) -> Optional[np.ndarray]:
    """Forest inference through the C++ traversal; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float64)
    trees = forest["trees"]
    n_values = trees[0].value.shape[1]
    arrs = []  # keep references alive
    fptr = (ctypes.c_void_p * len(trees))()
    tptr = (ctypes.c_void_p * len(trees))()
    lptr = (ctypes.c_void_p * len(trees))()
    rptr = (ctypes.c_void_p * len(trees))()
    vptr = (ctypes.c_void_p * len(trees))()
    mptr = (ctypes.c_void_p * len(trees))()
    for i, t in enumerate(trees):
        f = np.ascontiguousarray(t.feature, np.int32)
        th = np.ascontiguousarray(t.threshold, np.float64)
        l = np.ascontiguousarray(t.left, np.int32)
        r = np.ascontiguousarray(t.right, np.int32)
        v = np.ascontiguousarray(t.value, np.float64)
        m = np.ascontiguousarray(t.missing_less, np.uint8)
        arrs.append((f, th, l, r, v, m))
        fptr[i] = f.ctypes.data
        tptr[i] = th.ctypes.data
        lptr[i] = l.ctypes.data
        rptr[i] = r.ctypes.data
        vptr[i] = v.ctypes.data
        mptr[i] = m.ctypes.data
    out = np.zeros((x.shape[0], n_values), np.float64)
    lib.forest_predict(
        x.ctypes.data, x.shape[0], x.shape[1], len(trees),
        ctypes.cast(fptr, ctypes.c_void_p),
        ctypes.cast(tptr, ctypes.c_void_p),
        ctypes.cast(lptr, ctypes.c_void_p),
        ctypes.cast(rptr, ctypes.c_void_p),
        ctypes.cast(vptr, ctypes.c_void_p),
        ctypes.cast(mptr, ctypes.c_void_p),
        n_values, out.ctypes.data,
    )
    return out
