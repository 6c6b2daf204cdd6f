"""ctypes loader/builder for the native support library (``native/``).

Builds ``libbdna_tools.so`` on first use with the system ``g++`` (cached next
to the source, keyed by an mtime check) and exposes typed wrappers.  Every
caller must tolerate ``available() == False`` — environments without a
toolchain fall back to the NumPy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SRC = os.path.join(_HERE, "native", "bdna_tools.cpp")
LIB = os.path.join(_HERE, "native", "libbdna_tools.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    if not os.path.exists(SRC):
        return False
    if os.path.exists(LIB) and os.path.getmtime(LIB) >= os.path.getmtime(SRC):
        return True
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-o", LIB, SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _build():
        return None
    lib = ctypes.CDLL(LIB)
    i8p = np.ctypeslib.ndpointer(dtype=np.int8, flags="C_CONTIGUOUS")
    lib.bdna_generate.argtypes = [ctypes.c_uint64, ctypes.c_int64, i8p]
    lib.bdna_generate.restype = None
    lib.bdna_validate.argtypes = [i8p, ctypes.c_int64]
    lib.bdna_validate.restype = ctypes.c_int64
    lib.align_score_native.argtypes = [
        i8p, ctypes.c_int64, i8p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
    ]
    lib.align_score_native.restype = ctypes.c_int64
    lib.affine_score_native.argtypes = [
        i8p, ctypes.c_int64, i8p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int,
    ]
    lib.affine_score_native.restype = ctypes.c_int64
    i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
    lib.score_flex_native.argtypes = [
        i8p, ctypes.c_int64, i8p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.score_flex_native.restype = ctypes.c_int64
    lib.last_row_flex_native.argtypes = [
        i8p, ctypes.c_int64, i8p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, i64p,
    ]
    lib.last_row_flex_native.restype = None
    lib.locate_flex_native.argtypes = [
        i8p, ctypes.c_int64, i8p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.locate_flex_native.restype = ctypes.c_int64
    lib.traceback_native.argtypes = [
        i8p, ctypes.c_int64, i8p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        i64p, i8p,
    ]
    lib.traceback_native.restype = ctypes.c_int64
    lib.traceback_flex_native.argtypes = [
        i8p, ctypes.c_int64, i8p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        i64p, i8p,
    ]
    lib.traceback_flex_native.restype = ctypes.c_int64
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def generate(length: int, seed: int = 0) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = np.empty(length, dtype=np.int8)
    lib.bdna_generate(seed, length, out)
    return out


def validate(seq: np.ndarray) -> int:
    """Index of first invalid byte, or -1."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    seq = np.ascontiguousarray(seq, dtype=np.int8)
    return int(lib.bdna_validate(seq, seq.size))


def score(s1: np.ndarray, s2: np.ndarray, cfg=None) -> int:
    """Independent native CPU scorer (validation oracle for big pairs)."""
    from ..config import AlignMode, ScoringConfig

    if cfg is None:
        cfg = ScoringConfig()
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    s1 = np.ascontiguousarray(s1, dtype=np.int8)
    s2 = np.ascontiguousarray(s2, dtype=np.int8)
    if cfg.has_matrix or cfg.is_ends_free:
        # round-4 capabilities route through the unified flexible scorer
        mode = {AlignMode.GLOBAL: 0, AlignMode.LOCAL: 1,
                AlignMode.SEMIGLOBAL: 2, AlignMode.INFIX: 3}[cfg.mode]
        if cfg.has_matrix:
            mat = np.ascontiguousarray(
                np.asarray(cfg.matrix, dtype=np.int64))
            k = mat.shape[0]
            hi = max(int(s1.max(initial=0)), int(s2.max(initial=0)))
            if hi >= k or min(int(s1.min(initial=0)),
                              int(s2.min(initial=0))) < 0:
                raise ValueError(
                    "sequence codes outside the matrix alphabet")
            mat_ptr = mat.ctypes.data_as(ctypes.c_void_p)
        else:
            mat, mat_ptr, k = None, None, 0
        return int(
            lib.score_flex_native(
                s1, s1.size, s2, s2.size, mat_ptr, k,
                cfg.match, cfg.mismatch, cfg.gap,
                cfg.gap_open or 0, cfg.gap_extend or 0,
                1 if cfg.is_affine else 0, mode,
            )
        )
    if cfg.is_affine:
        return int(
            lib.affine_score_native(
                s1, s1.size, s2, s2.size,
                cfg.match, cfg.mismatch, cfg.gap_open, cfg.gap_extend,
                1 if cfg.is_local else 0,
            )
        )
    return int(
        lib.align_score_native(
            s1, s1.size, s2, s2.size,
            cfg.match, cfg.mismatch, cfg.gap, 1 if cfg.is_local else 0,
        )
    )


def _mat_ptr(cfg):
    """(mat_keepalive, ptr, K) for a config's matrix, or (None, None, 0)."""
    if not cfg.has_matrix:
        return None, None, 0
    mat = np.ascontiguousarray(np.asarray(cfg.matrix, dtype=np.int64))
    return mat, mat.ctypes.data_as(ctypes.c_void_p), mat.shape[0]


def last_row_flex(s1: np.ndarray, s2: np.ndarray, cfg,
                  *, zero_row: bool, zero_col: bool) -> np.ndarray:
    """Final DP row of the linear-gap fill with selectable ends-free
    boundaries — the Hirschberg building block for matrix cores."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    if cfg.is_affine:
        raise RuntimeError("last_row_flex is linear-gap only")
    s1 = np.ascontiguousarray(s1, dtype=np.int8)
    s2 = np.ascontiguousarray(s2, dtype=np.int8)
    mat, ptr, k = _mat_ptr(cfg)
    out = np.empty(s1.size + 1, dtype=np.int64)
    lib.last_row_flex_native(
        s1, s1.size, s2, s2.size, ptr, k,
        cfg.match, cfg.mismatch, cfg.gap,
        1 if zero_row else 0, 1 if zero_col else 0, out,
    )
    return out


def locate_flex(s1: np.ndarray, s2: np.ndarray, cfg, *, anchored=False):
    """(score, i, j) of an optimal cell of the linear-gap fill.

    ``anchored=False``: forward end-locate for local/semiglobal/infix modes
    (ends-free boundaries; argmax conventions match the oracle walks).
    ``anchored=True``: the reversed start-locate — global (gap-penalized)
    boundaries so every path is anchored at (0, 0), same extraction set.
    """
    from ..config import AlignMode

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    if cfg.is_affine:
        raise RuntimeError("locate_flex is linear-gap only")
    extract = {AlignMode.LOCAL: 1, AlignMode.SEMIGLOBAL: 2,
               AlignMode.INFIX: 3}[cfg.mode]
    if anchored:
        zero_row = zero_col = floor = 0
    else:
        local = cfg.mode is AlignMode.LOCAL
        zero_row = 1
        zero_col = 1 if (local or cfg.mode is AlignMode.SEMIGLOBAL) else 0
        floor = 1 if local else 0
    s1 = np.ascontiguousarray(s1, dtype=np.int8)
    s2 = np.ascontiguousarray(s2, dtype=np.int8)
    mat, ptr, k = _mat_ptr(cfg)
    ie = ctypes.c_int64(0)
    je = ctypes.c_int64(0)
    sc = lib.locate_flex_native(
        s1, s1.size, s2, s2.size, ptr, k,
        cfg.match, cfg.mismatch, cfg.gap,
        zero_row, zero_col, floor, extract,
        ctypes.byref(ie), ctypes.byref(je),
    )
    return int(sc), int(ie.value), int(je.value)


def traceback(s1: np.ndarray, s2: np.ndarray, cfg=None):
    """Full-table traceback in C++ — byte-identical output to
    ``ops.oracle.traceback`` (same diag>up>left tie order; SW starts at the
    row-major-first maximum cell and stops at the first zero), ~50x faster
    (the per-cell Python walk dominates the NumPy version).  Returns
    ``(score, a1, a2)``; raises RuntimeError if the library is missing."""
    from ..config import ScoringConfig

    if cfg is None:
        cfg = ScoringConfig()
    if cfg.is_affine:
        raise RuntimeError(
            "native traceback is linear-gap only; the oracle's three-state "
            "walk serves affine configs")
    if cfg.is_ends_free:
        raise RuntimeError(
            "native traceback covers global/local walks; the oracle walk "
            "serves the ends-free modes (their cores walk here as global)")
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    s1 = np.ascontiguousarray(s1, dtype=np.int8)
    s2 = np.ascontiguousarray(s2, dtype=np.int8)
    ops = np.empty(max(1, s1.size + s2.size), dtype=np.int8)
    score = np.zeros(3, dtype=np.int64)  # [score, start_i, start_j]
    if cfg.has_matrix:
        mat, ptr, k = _mat_ptr(cfg)
        hi = max(int(s1.max(initial=0)), int(s2.max(initial=0)))
        if hi >= k or min(int(s1.min(initial=0)),
                          int(s2.min(initial=0))) < 0:
            raise RuntimeError("sequence codes outside the matrix alphabet")
        ln = int(
            lib.traceback_flex_native(
                s1, s1.size, s2, s2.size, ptr, k,
                cfg.match, cfg.mismatch, cfg.gap,
                1 if cfg.is_local else 0, score, ops,
            )
        )
    else:
        ln = int(
            lib.traceback_native(
                s1, s1.size, s2, s2.size,
                cfg.match, cfg.mismatch, cfg.gap, 1 if cfg.is_local else 0,
                score, ops,
            )
        )
    if ln < 0:
        raise RuntimeError("native traceback failed")
    ops = ops[:ln][::-1]  # 0 = diag, 1 = up (gap in s1), 2 = left (gap in s2)
    # vectorized string rebuild: char code 0 renders as the gap symbol;
    # local paths start mid-sequence at the returned start cell
    lut = np.frombuffer(b"-ATGCRYSWKMBDHVN", dtype=np.uint8)  # io.bdna.BASES

    def render(seq, take):
        if seq.size == 0:
            return np.zeros(take.size, np.int64)
        idx = np.maximum(np.cumsum(take) - 1, 0)
        return np.where(take, seq[idx], 0).astype(np.int64)

    a1 = lut[render(s1[int(score[2]):], ops != 1)].tobytes().decode()
    a2 = lut[render(s2[int(score[1]):], ops != 2)].tobytes().decode()
    return int(score[0]), a1, a2
