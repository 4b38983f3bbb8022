"""Native (C++) host-runtime components.

The verify DP — the per-candidate hot loop on the host side of the
filter->verify pipeline — is built as a C-ABI shared library on first use
(g++ is part of the deployment image; pybind11 is not, so binding is plain
ctypes).  All callers fall back to the pure-Python implementation when the
toolchain is unavailable."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_TRIED = False


def _build_dir() -> str:
    d = os.environ.get(
        "SAT_TPU_NATIVE_DIR",
        os.path.join(
            os.path.expanduser("~"), ".cache", "sat_tpu_native"
        ),
    )
    os.makedirs(d, exist_ok=True)
    return d


def load_verify_lib():
    """Load (building if needed) the native verify DP; None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("SAT_TPU_NO_NATIVE"):
        return None
    src = os.path.join(_HERE, "verify_dp.cpp")
    out = os.path.join(_build_dir(), "libsatverify.so")
    try:
        if (not os.path.exists(out)
                or os.path.getmtime(out) < os.path.getmtime(src)):
            r = subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", out + ".tmp", src],
                capture_output=True,
            )
            if r.returncode != 0:
                return None
            os.replace(out + ".tmp", out)
        lib = ctypes.CDLL(out)
    except Exception:
        return None
    c_i8p = ctypes.POINTER(ctypes.c_int8)
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    lib.sat_verify_align.restype = ctypes.c_int
    lib.sat_verify_align.argtypes = [
        ctypes.c_char_p, ctypes.c_int32,       # pat
        ctypes.c_char_p, ctypes.c_int32,       # buffer
        c_i8p,                                 # cids
        ctypes.c_int32, ctypes.c_uint8,        # k, eos
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # wc, tn, indels
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # dm, trans, yesno
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,  # esb, eeb, free
        c_u8p, c_i8p, c_i8p,                   # compat, aasub, aacodonsub
        c_i32p, c_i32p, c_i32p, c_i32p,        # found, bestval, bs, endt
        c_i32p, ctypes.c_int32, c_i32p,        # codes, cap, ncodes
        c_i64p,                                # stats
    ]
    lib.sat_extend_align.restype = ctypes.c_int
    lib.sat_extend_align.argtypes = [
        ctypes.c_char_p, ctypes.c_int32,       # text
        ctypes.c_char_p, ctypes.c_int32,       # pattern
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # dirn, lm, rm
        ctypes.c_int32, ctypes.c_uint8,        # k, eos
        ctypes.c_int32, ctypes.c_int32,        # wc, textn
        ctypes.c_int32, ctypes.c_int32,        # indels, dna_mut
        c_u8p, c_i8p,                          # compat, aasub
        c_i32p, c_i32p, c_i32p,                # ok, matchlen, value
    ]
    _LIB = lib
    return _LIB
