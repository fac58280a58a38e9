"""ctypes binding for the native trajectory store (``native/traj_store.cpp``).

The C++ library is compiled on first use with the system toolchain and
cached next to the source; no pip packages involved. Falls back with a clear
error if no compiler is available.

Usage::

    with TrajStore("demos.ftr", "w") as ts:
        ts.append(actions, rewards)            # [T,A], [T] float32
    with TrajStore("demos.ftr", "r") as ts:
        actions, rewards, extras = ts.read(0)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "native" / "traj_store.cpp"
_LIB_CACHE = None


def _build_lib() -> ctypes.CDLL:
    global _LIB_CACHE
    if _LIB_CACHE is not None:
        return _LIB_CACHE
    so_path = _SRC.with_suffix(".so")
    if (not so_path.exists()) or so_path.stat().st_mtime < _SRC.stat().st_mtime:
        cmd = [
            "g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
            str(_SRC), "-o", str(so_path),
        ]
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(str(so_path))
    lib.ts_open.restype = ctypes.c_void_p
    lib.ts_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.ts_append.restype = ctypes.c_int
    lib.ts_append.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.c_uint32,
    ]
    lib.ts_flush.argtypes = [ctypes.c_void_p]
    lib.ts_count.restype = ctypes.c_int
    lib.ts_count.argtypes = [ctypes.c_void_p]
    lib.ts_record_info.restype = ctypes.c_int
    lib.ts_record_info.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.POINTER(ctypes.c_uint32)
    ]
    lib.ts_read.restype = ctypes.c_int
    lib.ts_read.argtypes = [
        ctypes.c_void_p,
        ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.ts_close.argtypes = [ctypes.c_void_p]
    _LIB_CACHE = lib
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class TrajStore:
    """Append-only trajectory store with background native writer threads."""

    def __init__(self, path: str | os.PathLike, mode: str = "r"):
        self._lib = _build_lib()
        self._h = self._lib.ts_open(str(path).encode(), mode.encode())
        if not self._h:
            raise OSError(f"traj_store: cannot open {path!r} mode={mode!r}")
        self._mode = mode

    def append(self, actions, rewards, extras=None) -> None:
        actions = np.ascontiguousarray(actions, dtype=np.float32)
        rewards = np.ascontiguousarray(rewards, dtype=np.float32)
        T, A = actions.shape
        assert rewards.shape == (T,), rewards.shape
        if extras is not None:
            extras = np.ascontiguousarray(extras, dtype=np.float32)
            E = extras.shape[1]
            eptr = _fptr(extras)
        else:
            E, eptr = 0, None
        rc = self._lib.ts_append(self._h, _fptr(actions), _fptr(rewards), eptr, T, A, E)
        if rc != 0:
            raise OSError("traj_store: append failed (read-only handle?)")

    def flush(self) -> None:
        self._lib.ts_flush(self._h)

    def __len__(self) -> int:
        n = self._lib.ts_count(self._h)
        if self._mode == "w":
            # the index materializes on close; count queued+written instead
            return max(n, 0)
        return n

    def read(self, idx: int):
        info = (ctypes.c_uint32 * 3)()
        if self._lib.ts_record_info(self._h, idx, info) != 0:
            raise IndexError(idx)
        T, A, E = info[0], info[1], info[2]
        actions = np.empty((T, A), np.float32)
        rewards = np.empty((T,), np.float32)
        extras = np.empty((T, E), np.float32) if E else np.empty((T, 0), np.float32)
        rc = self._lib.ts_read(
            self._h, idx, _fptr(actions), _fptr(rewards),
            _fptr(extras) if E else None,
        )
        if rc != 0:
            raise OSError(f"traj_store: read {idx} failed")
        return actions, rewards, extras

    def close(self) -> None:
        if self._h:
            self._lib.ts_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
