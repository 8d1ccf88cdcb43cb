"""ctypes binding for the bulk jplace emitter (csrc/report.c).

Python object-string assembly of the per-read jplace nesting costs
~10 us/read — the dominant host cost of the pipelined place driver. The C
emitter renders a whole batch fragment into one buffer. Falls back to the
pure-Python emitter when compilation is unavailable.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading

import numpy as np

_LIB = None
_LIB_LOCK = threading.Lock()
_BUILD_FAILED = False


def _csrc_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "csrc")


def _build_lib():
    src = os.path.join(_csrc_dir(), "report.c")
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_csrc_dir(), f"libreport-{tag}.so")
    if os.path.exists(out):
        return out
    try:
        subprocess.run(["cc", "-O3", "-fPIC", "-shared", "-o", out, src,
                        "-lm"], check=True, capture_output=True, timeout=120)
        return out
    except Exception as e:  # noqa: BLE001
        print(f"[krepp-tpu] native report build failed ({e}); "
              "using the Python emitter", file=sys.stderr)
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
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.jplace_emit.restype = ctypes.c_int64
        lib.jplace_emit.argtypes = [
            ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            u8p, i64p, u8p, i64p, i64p, i64p,
            i64p, f64p, f64p, i64p, f64p, f64p, f64p, f64p,
            ctypes.c_char_p, i64p]
        _LIB = lib
        return _LIB


def _p(a, ct):
    return a.ctypes.data_as(ct)


def jplace_emit(names_list, kind, s_of, starts, ends, s_q, s_d, s_v,
                c_q, c_d, c_v, c_w, blen, multi: bool,
                has_previous: bool):
    """Render one batch's jplace fragment. Returns (str, emitted_count) or
    None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    B = len(kind)
    nb = "".join(names_list).encode("ascii", "replace")
    name_off = np.zeros(B + 1, np.int64)
    np.cumsum([len(n) for n in names_list], out=name_off[1:])
    names_a = np.frombuffer(nb, np.uint8) if nb else np.zeros(1, np.uint8)
    i64 = ctypes.POINTER(ctypes.c_int64)
    f64 = ctypes.POINTER(ctypes.c_double)
    u8 = ctypes.POINTER(ctypes.c_uint8)

    def asi64(x):
        return np.ascontiguousarray(x, np.int64)

    def asf64(x):
        return np.ascontiguousarray(x, np.float64)

    kind = np.ascontiguousarray(kind, np.uint8)
    s_of, starts, ends = asi64(s_of), asi64(starts), asi64(ends)
    s_q, c_q = asi64(s_q), asi64(c_q)
    s_d, s_v = asf64(s_d), asf64(s_v)
    c_d, c_v, c_w, blen = asf64(c_d), asf64(c_v), asf64(c_w), asf64(blen)
    nrows = len(s_q) + len(c_q)
    cap = 192 * (B + nrows) + int(name_off[-1]) + 64
    buf = ctypes.create_string_buffer(cap)
    emitted = ctypes.c_int64(0)
    n = lib.jplace_emit(
        B, int(multi), int(has_previous),
        _p(names_a, u8), _p(name_off, i64), _p(kind, u8),
        _p(s_of, i64), _p(starts, i64), _p(ends, i64),
        _p(s_q, i64), _p(s_d, f64), _p(s_v, f64),
        _p(c_q, i64), _p(c_d, f64), _p(c_v, f64), _p(c_w, f64),
        _p(blen, f64), buf, ctypes.byref(emitted))
    return buf.raw[:n].decode("ascii"), int(emitted.value)
