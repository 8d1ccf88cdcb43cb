"""ctypes binding for the native FASTA/FASTQ reader (csrc/fastx.c).

Builds the shared library on first use with the system compiler (the image
has no pybind11; the C ABI + ctypes keeps the binding dependency-free).
Falls back to the pure-Python reader when compilation is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Iterator, List, Optional, Tuple

import numpy as np

_LIB = None
_LIB_LOCK = threading.Lock()
_BUILD_FAILED = False


def _csrc_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "csrc")


def _build_lib() -> Optional[str]:
    src = os.path.join(_csrc_dir(), "fastx.c")
    import hashlib

    # rebuild keyed on the source hash (mtimes don't survive git checkout)
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_csrc_dir(), f"libfastx-{tag}.so")
    if os.path.exists(out):
        return out
    try:
        subprocess.run(
            ["cc", "-O3", "-fPIC", "-shared", "-o", out, src, "-lz"],
            check=True, capture_output=True, timeout=120)
        return out
    except Exception as e:  # noqa: BLE001
        print(f"[krepp-tpu] native fastx build failed ({e}); "
              "using the Python reader", file=sys.stderr)
        return None


def get_lib():
    global _LIB, _BUILD_FAILED
    with _LIB_LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        path = _build_lib()
        if path is None:
            _BUILD_FAILED = True
            return None
        lib = ctypes.CDLL(path)
        lib.fastx_open.restype = ctypes.c_void_p
        lib.fastx_open.argtypes = [ctypes.c_char_p]
        lib.fastx_close.argtypes = [ctypes.c_void_p]
        lib.fastx_read_chunk.restype = ctypes.c_int64
        lib.fastx_read_chunk.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]
        _LIB = lib
        return _LIB


class NativeFastxReader:
    """Chunked reader: (names, codes arena, offsets) per chunk."""

    def __init__(self, path: str, max_records: int = 4096,
                 max_bases: int = 8 << 20):
        self.lib = get_lib()
        if self.lib is None:
            raise RuntimeError("native fastx unavailable")
        self.h = self.lib.fastx_open(path.encode())
        if not self.h:
            raise FileNotFoundError(f"Failed to open the file at {path}")
        self.max_records = max_records
        self.max_bases = max_bases
        self._codes = np.empty(max_bases + (1 << 20), np.uint8)
        self._seq_off = np.zeros(max_records + 1, np.int64)
        self._names = ctypes.create_string_buffer(max_records * 256)
        self._name_off = np.zeros(max_records + 1, np.int64)

    def __iter__(self) -> Iterator[Tuple[List[str], np.ndarray, np.ndarray]]:
        lib = self.lib
        try:
            while True:
                self._seq_off[0] = 0
                self._name_off[0] = 0
                n = lib.fastx_read_chunk(
                    self.h, self.max_records, self.max_bases,
                    self._codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    self._seq_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    self._names,
                    self._name_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
                if n < 0:
                    raise ValueError("Unrecognised FASTA/FASTQ format")
                if n == 0:
                    return
                raw = self._names.raw
                names = [
                    raw[self._name_off[i]: self._name_off[i + 1]].decode()
                    for i in range(n)]
                yield (names, self._codes[: self._seq_off[n]].copy(),
                       self._seq_off[: n + 1].copy())
        finally:
            self.close()

    def close(self):
        if self.h:
            self.lib.fastx_close(self.h)
            self.h = None


def native_available() -> bool:
    return get_lib() is not None


def read_fastx_native(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (name, codes) records through the native reader."""
    for names, arena, off in NativeFastxReader(path):
        for i, name in enumerate(names):
            yield name, arena[off[i]: off[i + 1]]
