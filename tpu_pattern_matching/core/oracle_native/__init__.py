"""ctypes wrapper for the C++ conformance oracle.

Builds ``liboracle.so`` from oracle.cpp on first use (g++ is in the image;
pybind11 is not — plain C ABI + ctypes keeps the binding dependency-free).
Falls back cleanly: callers should catch ``OracleUnavailable`` and use the
pure-Python oracle instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "oracle.cpp")
_SO = os.path.join(_HERE, "liboracle.so")
_LOCK = threading.Lock()
_LIB = None


class OracleUnavailable(RuntimeError):
    pass


def _build() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        raise OracleUnavailable(f"cannot build native oracle: {e}") from e


def _lib():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.oracle_create.restype = ctypes.c_void_p
        lib.oracle_create.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.oracle_free.argtypes = [ctypes.c_void_p]
        lib.oracle_match.restype = ctypes.c_int64
        lib.oracle_match.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.oracle_match_bytes.restype = ctypes.c_int64
        lib.oracle_match_bytes.argtypes = list(lib.oracle_match.argtypes)
        _LIB = lib
        return lib


class NativeOracle:
    """Streaming C++ Aho-Corasick oracle."""

    def __init__(
        self, patterns: Sequence[bytes | Sequence[int]], alphabet: int = 256
    ):
        lib = _lib()
        pats = [np.asarray(list(p), np.int32) for p in patterns]
        lens = np.asarray([len(p) for p in pats], np.int32)
        starts = np.zeros(len(pats), np.int64)
        if len(pats) > 1:
            starts[1:] = np.cumsum(lens[:-1])
        symbols = (
            np.concatenate(pats) if pats else np.zeros(0, np.int32)
        ).astype(np.int32)
        self._lib = lib
        self._h = lib.oracle_create(
            symbols.ctypes.data_as(ctypes.c_void_p),
            starts.ctypes.data_as(ctypes.c_void_p),
            lens.ctypes.data_as(ctypes.c_void_p),
            len(pats),
            alphabet,
        )
        self._state = ctypes.c_int32(0)

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.oracle_free(self._h)
        except Exception:
            pass

    def reset(self) -> None:
        self._state = ctypes.c_int32(0)

    def match(
        self,
        data: bytes | np.ndarray,
        offset_base: int = 0,
        cap: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray, int]:
        """Scan ``data`` continuing from the current stream state.

        Returns (end_offsets int64[n], pattern_indices int32[n], total).
        ``total`` may exceed len(end_offsets) if ``cap`` was hit.
        """
        if isinstance(data, (bytes, bytearray, memoryview)):
            arr = np.frombuffer(bytes(data), np.uint8)
            fn = self._lib.oracle_match_bytes
        else:
            arr = np.ascontiguousarray(data, np.int32)
            fn = self._lib.oracle_match
        if cap is None:
            cap = max(1024, 4 * len(arr))
        out_off = np.zeros(cap, np.int64)
        out_pid = np.zeros(cap, np.int32)
        total = fn(
            self._h,
            arr.ctypes.data_as(ctypes.c_void_p),
            len(arr),
            offset_base,
            ctypes.byref(self._state),
            out_off.ctypes.data_as(ctypes.c_void_p),
            out_pid.ctypes.data_as(ctypes.c_void_p),
            cap,
        )
        n = min(total, cap)
        return out_off[:n], out_pid[:n], int(total)

    def match_events(self, data) -> list[tuple[int, int]]:
        off, pid, total = self.match(data)
        if total > len(off):
            raise RuntimeError("oracle capacity exceeded")
        return sorted(zip(off.tolist(), pid.tolist()))
