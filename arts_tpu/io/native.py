"""ctypes bindings for the native (C++) ingestion library.

Builds native/parloader.cpp on first use (g++ -O2 -shared; cached next to
the source) and exposes the fast HITRAN .par reader.  Falls back to the
pure-Python parser if the toolchain is unavailable.
"""

import ctypes
import functools
import os
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_SO = _NATIVE_DIR / "libparloader.so"
_SRC = _NATIVE_DIR / "parloader.cpp"


@functools.lru_cache(maxsize=1)
def _lib():
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)],
            check=True,
        )
    lib = ctypes.CDLL(str(_SO))
    lib.par_count.restype = ctypes.c_long
    lib.par_count.argtypes = [ctypes.c_char_p]
    dptr = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    iptr = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.par_parse.restype = ctypes.c_long
    lib.par_parse.argtypes = [ctypes.c_char_p, ctypes.c_long, iptr, iptr] + [
        dptr
    ] * 10
    return lib


def native_available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


def read_par_arrays(path):
    """Parse a .par file into struct-of-arrays (native fast path).

    Returns dict of numpy arrays: mol, iso, nu, S, A, gair, gself, E,
    nair, delta, gup, glow (HITRAN native units).
    """
    lib = _lib()
    n = lib.par_count(str(path).encode())
    if n < 0:
        raise OSError(f"cannot read {path}")
    out = dict(
        mol=np.empty(n, np.int32),
        iso=np.empty(n, np.int32),
        nu=np.empty(n, np.float64),
        S=np.empty(n, np.float64),
        A=np.empty(n, np.float64),
        gair=np.empty(n, np.float64),
        gself=np.empty(n, np.float64),
        E=np.empty(n, np.float64),
        nair=np.empty(n, np.float64),
        delta=np.empty(n, np.float64),
        gup=np.empty(n, np.float64),
        glow=np.empty(n, np.float64),
    )
    got = lib.par_parse(
        str(path).encode(),
        n,
        out["mol"],
        out["iso"],
        out["nu"],
        out["S"],
        out["A"],
        out["gair"],
        out["gself"],
        out["E"],
        out["nair"],
        out["delta"],
        out["gup"],
        out["glow"],
    )
    if got != n:
        raise RuntimeError(f"parsed {got}/{n} records from {path}")
    return out
