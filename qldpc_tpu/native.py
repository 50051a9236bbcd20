"""ctypes bindings to the native bit-packed GF(2) library (native/gf2.cpp).

Auto-builds the shared library on first use when a compiler is available;
every entry point has a NumPy fallback, so the framework works without the
native layer (it is a fast path, not a requirement).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["available", "rank", "rref", "solve", "osd0", "nullspace"]

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libqldpc_gf2.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        c = ctypes.c_int
        lib.gf2_rank.argtypes = [u8, c, c]
        lib.gf2_rank.restype = c
        lib.gf2_rref.argtypes = [u8, u8, c, c, i32]
        lib.gf2_rref.restype = c
        lib.gf2_solve.argtypes = [u8, u8, c, c, u8]
        lib.gf2_solve.restype = c
        lib.gf2_osd0.argtypes = [u8, u8, f64, u8, c, c, u8]
        lib.gf2_osd0.restype = c
        lib.gf2_nullspace.argtypes = [u8, c, c, u8]
        lib.gf2_nullspace.restype = c
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _as_u8(M) -> np.ndarray:
    return np.ascontiguousarray((np.asarray(M) % 2).astype(np.uint8))


def rank(M) -> int:
    lib = _load()
    M = _as_u8(M)
    if lib is None:
        from qldpc_tpu.codes import gf2

        return gf2.rank(M)
    m, n = M.shape
    return int(lib.gf2_rank(M, m, n))


def rref(M, b=None):
    """Full RREF of [M | b]; returns (R, b_reduced, pivot_cols)."""
    lib = _load()
    M = _as_u8(M).copy()
    m, n = M.shape
    bb = _as_u8(b).copy().ravel() if b is not None else np.zeros(m, np.uint8)
    if lib is None:
        from qldpc_tpu.codes import gf2

        R, piv = gf2.row_reduce(np.hstack([M, bb[:, None]]), ncols=n)
        return R[:, :n], R[:, n], piv
    piv = np.full(m, -1, np.int32)
    r = int(lib.gf2_rref(M, bb, m, n, piv))
    return M, bb, [int(c) for c in piv[:r]]


def solve(H, s):
    lib = _load()
    H = _as_u8(H)
    s = _as_u8(s).ravel()
    if lib is None:
        from qldpc_tpu.codes import gf2

        return gf2.solve(H, s)
    m, n = H.shape
    x = np.zeros(n, np.uint8)
    ok = int(lib.gf2_solve(H, s, m, n, x))
    return x if ok else None


def osd0(H, syndrome, llr, hard):
    """Native OSD-0 (reference semantics, decoding/OSD.py:3-28)."""
    lib = _load()
    H = _as_u8(H)
    m, n = H.shape
    syndrome = _as_u8(syndrome).ravel()
    hard = _as_u8(hard).ravel()
    llr = np.ascontiguousarray(np.asarray(llr, np.float64).ravel())
    if lib is None:
        raise RuntimeError("native gf2 library unavailable")
    sol = np.zeros(n, np.uint8)
    lib.gf2_osd0(H, syndrome, llr, hard, m, n, sol)
    return sol


def nullspace(M) -> np.ndarray:
    lib = _load()
    M = _as_u8(M)
    if lib is None:
        from qldpc_tpu.codes import gf2

        return gf2.null_space(M)
    m, n = M.shape
    r = int(lib.gf2_rank(M, m, n))
    basis = np.zeros(((n - r), n), np.uint8)
    if n - r:
        lib.gf2_nullspace(M, m, n, basis)
    return basis
