"""Optional ctypes bridge to the real CFITSIO shared library.

The reference writes/reads every FITS product through CFITSIO
(rayio.c:364-474, galsio.c:75-356, maputils.c).  Our io.fits is a pure-numpy
implementation of the same byte layout; this module lets tests (and users)
cross-validate those bytes against the canonical library: if CFITSIO parses
our files into identical headers/columns, a reference-era reader will too.

Only the read path is bound — enough to load image HDUs, header keys, and
BINTABLE columns.  Gracefully unavailable when no libcfitsio is installed
(`available()` returns False; tests skip).
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

# CFITSIO datatype codes (fitsio.h)
TLOGICAL = 14
TSTRING = 16
TINT = 31
TLONG = 41
TLONGLONG = 81
TFLOAT = 42
TDOUBLE = 82

READONLY = 0

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    for name in ("libcfitsio.so", "libcfitsio.so.10", "libcfitsio.so.9",
                 ctypes.util.find_library("cfitsio")):
        if not name:
            continue
        try:
            _lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    return _lib


def available() -> bool:
    return _load() is not None


class CFitsError(RuntimeError):
    pass


def _check(status):
    if status.value != 0:
        lib = _load()
        buf = ctypes.create_string_buffer(81)
        lib.ffgerr(status.value, buf)
        raise CFitsError(f"cfitsio status {status.value}: "
                         f"{buf.value.decode()}")


class CFitsFile:
    """Minimal read-only CFITSIO file handle."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise CFitsError("libcfitsio not available")
        self.lib = lib
        self.fptr = ctypes.c_void_p()
        status = ctypes.c_int(0)
        lib.ffopen(ctypes.byref(self.fptr), path.encode(), READONLY,
                   ctypes.byref(status))
        _check(status)

    def close(self):
        status = ctypes.c_int(0)
        self.lib.ffclos(self.fptr, ctypes.byref(status))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------------
    def num_hdus(self) -> int:
        n = ctypes.c_int(0)
        status = ctypes.c_int(0)
        self.lib.ffthdu(self.fptr, ctypes.byref(n), ctypes.byref(status))
        _check(status)
        return n.value

    def move_to(self, hdunum: int):
        """1-based absolute HDU move; returns HDU type (0 img, 2 bintable)."""
        t = ctypes.c_int(0)
        status = ctypes.c_int(0)
        self.lib.ffmahd(self.fptr, hdunum, ctypes.byref(t),
                        ctypes.byref(status))
        _check(status)
        return t.value

    def key_long(self, name: str) -> int:
        v = ctypes.c_longlong(0)
        status = ctypes.c_int(0)
        comm = ctypes.create_string_buffer(81)
        self.lib.ffgky(self.fptr, TLONGLONG, name.encode(),
                       ctypes.byref(v), comm, ctypes.byref(status))
        _check(status)
        return v.value

    def key_double(self, name: str) -> float:
        v = ctypes.c_double(0)
        status = ctypes.c_int(0)
        comm = ctypes.create_string_buffer(81)
        self.lib.ffgky(self.fptr, TDOUBLE, name.encode(),
                       ctypes.byref(v), comm, ctypes.byref(status))
        _check(status)
        return v.value

    def key_string(self, name: str) -> str:
        buf = ctypes.create_string_buffer(81)
        comm = ctypes.create_string_buffer(81)
        status = ctypes.c_int(0)
        self.lib.ffgky(self.fptr, TSTRING, name.encode(), buf, comm,
                       ctypes.byref(status))
        _check(status)
        return buf.value.decode()

    def image(self) -> np.ndarray:
        """Current image HDU pixels as float64 (cfitsio converts)."""
        naxis = self.key_long("NAXIS")
        shape = [self.key_long(f"NAXIS{i}") for i in range(naxis, 0, -1)]
        n = int(np.prod(shape)) if shape else 0
        out = np.zeros(n, np.float64)
        anynul = ctypes.c_int(0)
        status = ctypes.c_int(0)
        self.lib.ffgpv(self.fptr, TDOUBLE, ctypes.c_longlong(1),
                       ctypes.c_longlong(n), None,
                       out.ctypes.data_as(ctypes.c_void_p),
                       ctypes.byref(anynul), ctypes.byref(status))
        _check(status)
        return out.reshape(shape)

    def colnames(self) -> list:
        n = self.key_long("TFIELDS")
        return [self.key_string(f"TTYPE{i}").strip()
                for i in range(1, n + 1)]

    def column(self, name: str, dtype="f8") -> np.ndarray:
        """Read a full BINTABLE column (scalar repeat) by name."""
        names = [c.upper() for c in self.colnames()]
        colnum = names.index(name.upper()) + 1
        nrows = self.key_long("NAXIS2")
        code = TDOUBLE if np.dtype(dtype).kind == "f" else TLONGLONG
        out = np.zeros(nrows, np.float64 if code == TDOUBLE else np.int64)
        anynul = ctypes.c_int(0)
        status = ctypes.c_int(0)
        self.lib.ffgcv(self.fptr, code, colnum, ctypes.c_longlong(1),
                       ctypes.c_longlong(1), ctypes.c_longlong(nrows), None,
                       out.ctypes.data_as(ctypes.c_void_p),
                       ctypes.byref(anynul), ctypes.byref(status))
        _check(status)
        return out.astype(dtype)
