"""Native (C++) CSV reader binding via ctypes.

The longitudinal datasets ship as wide CSVs (1296 pixel columns); pandas
parses the 4000×1296 Health MNIST train file in seconds of pure-Python
overhead. The C++ reader (``native/csv_reader.cc``) memory-maps the file and
parses with a tight scalar loop — the runtime-side native component of the
framework (the reference delegates all native work to torch/pandas).

Falls back cleanly (returns ``None``) when the shared library has not been
built; ``lvae_tpu/native/build.sh`` builds it with g++ -O3.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_LIB_TRIED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cand = os.path.join(here, "native", "liblvae_io.so")
    return cand if os.path.exists(cand) else None


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.lvae_csv_dims.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.lvae_csv_dims.restype = ctypes.c_int
        lib.lvae_csv_read.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_long,
        ]
        lib.lvae_csv_read.restype = ctypes.c_int
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def read_csv_native(path: str, skip_header: int = 0) -> Optional[np.ndarray]:
    """Parse a numeric CSV into a float64 array, or None if lib unavailable."""
    lib = _load()
    if lib is None:
        return None
    rows = ctypes.c_long(0)
    cols = ctypes.c_long(0)
    rc = lib.lvae_csv_dims(path.encode(), skip_header, ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0 or rows.value <= 0 or cols.value <= 0:
        return None
    out = np.empty((rows.value, cols.value), dtype=np.float64)
    rc = lib.lvae_csv_read(
        path.encode(),
        skip_header,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.size,
    )
    if rc != 0:
        return None
    return out


def native_available() -> bool:
    return _load() is not None
