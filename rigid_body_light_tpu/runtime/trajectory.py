"""Trajectory I/O: native async writer (C++/ctypes) with a pure-Python
fallback, plus a numpy reader.

The native writer (``traj_writer.cpp``) flushes frames from a background
thread through a bounded queue, so the BD loop's ``append`` is a memcpy —
the device never waits on disk.  The .so is built on first use with the
system g++ and cached next to the source; environments without a compiler
fall back to the synchronous Python writer (same file format).
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_MAGIC = 0x544C4252  # "RBLT"
_VERSION = 1
_HEADER_BYTES = 32
_DTYPES = {0: np.float32, 1: np.float64}
_DTYPE_CODES = {np.dtype(np.float32): 0, np.dtype(np.float64): 1}

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "traj_writer.cpp")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_traj_writer.so")
_lib = None
_lib_lock = threading.Lock()


def _load_native() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            try:
                subprocess.run(
                    ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
                     _SRC, "-o", _SO],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.rblt_tw_open.restype = ctypes.c_void_p
        lib.rblt_tw_open.argtypes = [ctypes.c_char_p, ctypes.c_uint32,
                                     ctypes.c_uint32, ctypes.c_uint32,
                                     ctypes.c_uint32]
        lib.rblt_tw_append.restype = ctypes.c_int
        lib.rblt_tw_append.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                       ctypes.c_double, ctypes.c_void_p,
                                       ctypes.c_void_p]
        lib.rblt_tw_flush.argtypes = [ctypes.c_void_p]
        lib.rblt_tw_frames.restype = ctypes.c_uint64
        lib.rblt_tw_frames.argtypes = [ctypes.c_void_p]
        lib.rblt_tw_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_native() is not None


class TrajectoryWriter:
    """Append (step, time, X, Q) frames to a binary trajectory file."""

    def __init__(self, path: str, n_bodies: int, dtype=np.float32,
                 queue_capacity: int = 64, force_python: bool = False,
                 append: bool = False):
        self.path = path
        self.n_bodies = int(n_bodies)
        self.dtype = np.dtype(dtype)
        if self.dtype not in _DTYPE_CODES:
            raise ValueError(f"unsupported dtype {dtype}")
        self._code = _DTYPE_CODES[self.dtype]
        self._handle = None
        self._file = None
        append = append and os.path.exists(path)
        existing_frames = 0
        if append:
            # validate the existing header matches before appending
            with open(path, "rb") as f:
                magic, _, nb, code = struct.unpack("<4I", f.read(16))
            if magic != _MAGIC or nb != self.n_bodies or code != self._code:
                raise RuntimeError(
                    f"cannot append to {path}: header mismatch "
                    f"(bodies {nb} vs {self.n_bodies}, dtype code {code} vs {self._code})"
                )
            frame_size = 16 + self.n_bodies * 7 * self.dtype.itemsize
            existing_frames = (os.path.getsize(path) - _HEADER_BYTES) // frame_size
        lib = None if force_python else _load_native()
        if lib is not None:
            self._lib = lib
            self._handle = lib.rblt_tw_open(
                path.encode(), self.n_bodies, self._code, queue_capacity,
                1 if append else 0,
            )
            if not self._handle:
                raise OSError(f"native trajectory writer failed to open {path}")
        else:
            self._file = open(path, "ab" if append else "wb")
            if not append:
                self._file.write(struct.pack(
                    "<8I", _MAGIC, _VERSION, self.n_bodies, self._code, 0, 0, 0, 0
                ))
        self._frames = existing_frames

    def append(self, step: int, sim_time: float, X, Q) -> None:
        X = np.ascontiguousarray(np.asarray(X, self.dtype).reshape(self.n_bodies, 3))
        Q = np.ascontiguousarray(np.asarray(Q, self.dtype).reshape(self.n_bodies, 4))
        if self._handle is not None:
            rc = self._lib.rblt_tw_append(
                self._handle, step, float(sim_time),
                X.ctypes.data_as(ctypes.c_void_p), Q.ctypes.data_as(ctypes.c_void_p),
            )
            if rc != 0:
                raise OSError("trajectory append failed (disk error?)")
        else:
            self._file.write(struct.pack("<Qd", step, float(sim_time)))
            self._file.write(X.tobytes())
            self._file.write(Q.tobytes())
        self._frames += 1

    def flush(self) -> None:
        if self._handle is not None:
            self._lib.rblt_tw_flush(self._handle)
        elif self._file is not None:
            self._file.flush()

    def close(self) -> None:
        if self._handle is not None:
            self._lib.rblt_tw_close(self._handle)
            self._handle = None
        elif self._file is not None:
            self._file.close()
            self._file = None

    @property
    def frames(self) -> int:
        return self._frames

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_trajectory(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Read a trajectory file → (steps (T,), times (T,), X (T,B,3), Q (T,B,4))."""
    with open(path, "rb") as f:
        header = f.read(_HEADER_BYTES)
    magic, version, n_bodies, code = struct.unpack("<4I", header[:16])
    if magic != _MAGIC:
        raise RuntimeError(f"{path} is not an RBLT trajectory (bad magic)")
    if version > _VERSION:
        raise RuntimeError(f"{path}: format v{version} newer than supported v{_VERSION}")
    dtype = np.dtype(_DTYPES[code])
    frame_payload = n_bodies * 7 * dtype.itemsize
    frame_size = 16 + frame_payload
    data = np.fromfile(path, dtype=np.uint8, offset=_HEADER_BYTES)
    n_frames = data.size // frame_size
    data = data[: n_frames * frame_size].reshape(n_frames, frame_size)
    steps = data[:, 0:8].copy().view(np.uint64).reshape(n_frames)
    times = data[:, 8:16].copy().view(np.float64).reshape(n_frames)
    payload = data[:, 16:].copy().view(dtype).reshape(n_frames, n_bodies * 7)
    X = payload[:, : n_bodies * 3].reshape(n_frames, n_bodies, 3)
    Q = payload[:, n_bodies * 3 :].reshape(n_frames, n_bodies, 4)
    return steps, times, X, Q
