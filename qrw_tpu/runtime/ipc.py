"""ctypes bindings for the native IPC runtime (native/qrw_ipc.cpp).

Seqlock shared-memory mailboxes + real-time pacer, replacing the
reference's multiprocessing Value/Array mailboxes and busy-wait pacing
(scripts/MPC_Wrapper.py:52-57, scripts/PyBulletSimulator.py:702-706).
The library is built on demand with the in-tree Makefile (g++ only, no
external deps) and cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..",
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libqrw_ipc.so")
_lib = None


def _build_lib() -> str:
    src = os.path.join(_NATIVE_DIR, "qrw_ipc.cpp")
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    return _LIB_PATH


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_build_lib())
    lib.qrw_mailbox_create.restype = ctypes.c_void_p
    lib.qrw_mailbox_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                       ctypes.c_int]
    lib.qrw_mailbox_destroy.argtypes = [ctypes.c_void_p]
    lib.qrw_mailbox_write.restype = ctypes.c_uint64
    lib.qrw_mailbox_write.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_uint64]
    lib.qrw_mailbox_read.restype = ctypes.c_uint64
    lib.qrw_mailbox_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_uint64, ctypes.c_uint64]
    lib.qrw_mailbox_seq.restype = ctypes.c_uint64
    lib.qrw_mailbox_seq.argtypes = [ctypes.c_void_p]
    lib.qrw_pacer_create.restype = ctypes.c_void_p
    lib.qrw_pacer_create.argtypes = [ctypes.c_long, ctypes.c_long]
    lib.qrw_pacer_destroy.argtypes = [ctypes.c_void_p]
    lib.qrw_pacer_wait.restype = ctypes.c_long
    lib.qrw_pacer_wait.argtypes = [ctypes.c_void_p]
    lib.qrw_pacer_overruns.restype = ctypes.c_uint64
    lib.qrw_pacer_overruns.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class Mailbox:
    """Latest-value shared-memory mailbox for a fixed-shape f64 array.

    Writers publish whole arrays (seqlock: never blocks); readers poll
    `read()` which returns the newest consistent snapshot or None when
    nothing new arrived since the last read."""

    def __init__(self, name: str, shape, create: bool = True):
        self._lib = load_library()
        self.shape = tuple(shape)
        self.nbytes = int(np.prod(self.shape)) * 8
        self._buf = np.zeros(self.shape, np.float64)
        self._h = self._lib.qrw_mailbox_create(
            name.encode(), self.nbytes, 1 if create else 0)
        if not self._h:
            raise OSError(f"mailbox {name!r} create failed")
        self._seen = 0

    def write(self, arr) -> int:
        a = np.ascontiguousarray(arr, np.float64)
        assert a.shape == self.shape, (a.shape, self.shape)
        return int(self._lib.qrw_mailbox_write(
            self._h, a.ctypes.data_as(ctypes.c_void_p), self.nbytes))

    def read(self) -> Optional[np.ndarray]:
        seq = int(self._lib.qrw_mailbox_read(
            self._h, self._buf.ctypes.data_as(ctypes.c_void_p),
            self.nbytes, self._seen))
        if seq == self._seen:
            return None
        self._seen = seq
        return self._buf.copy()

    @property
    def seq(self) -> int:
        return int(self._lib.qrw_mailbox_seq(self._h))

    def close(self):
        if self._h:
            self._lib.qrw_mailbox_destroy(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class Pacer:
    """Absolute-deadline real-time pacer (clock_nanosleep + spin tail)."""

    def __init__(self, period_s: float, spin_s: float = 100e-6):
        self._lib = load_library()
        self._h = self._lib.qrw_pacer_create(int(period_s * 1e9),
                                             int(spin_s * 1e9))

    def wait(self) -> float:
        """Block until the next period boundary; returns lateness [s]."""
        return self._lib.qrw_pacer_wait(self._h) * 1e-9

    @property
    def overruns(self) -> int:
        return int(self._lib.qrw_pacer_overruns(self._h))

    def close(self):
        if self._h:
            self._lib.qrw_pacer_destroy(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
