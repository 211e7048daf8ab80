"""ctypes bindings for the native (C++) runtime components.

The reference's runtime leans on native Rust crates (`fsst-rs` for string
compression, `t4` for the on-disk KV store — liquid-cache
src/core/Cargo.toml).  Ours are C++ (no Rust in this image), built
lazily from `native/` into this package directory on first import.
pybind11 is not available, so the ABI is plain C + ctypes.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))
_SO = os.path.join(_HERE, "libliquidtpu.so")
_SRC_DIR = os.path.join(_REPO, "native")
_LOCK = threading.Lock()
_lib = None


def _needs_build() -> bool:
    if not os.path.exists(_SO):
        return True
    so_mtime = os.path.getmtime(_SO)
    for f in os.listdir(_SRC_DIR):
        if f.endswith((".cpp", ".h")):
            if os.path.getmtime(os.path.join(_SRC_DIR, f)) > so_mtime:
                return True
    return False


def _build() -> None:
    srcs = sorted(
        os.path.join(_SRC_DIR, f) for f in os.listdir(_SRC_DIR)
        if f.endswith(".cpp"))
    os.makedirs(_HERE, exist_ok=True)
    tmp = _SO + f".tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
           "-Wall", "-o", tmp] + srcs
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, _SO)  # atomic: concurrent builders race safely


def lib() -> ctypes.CDLL:
    """The loaded native library, building it if stale/missing."""
    global _lib
    if _lib is not None:
        return _lib
    with _LOCK:
        if _lib is not None:
            return _lib
        if _needs_build():
            _build()
        l = ctypes.CDLL(_SO)
        _declare(l)
        _lib = l
    return _lib


def available() -> bool:
    try:
        return lib() is not None
    except Exception:
        return False


_u8p = ctypes.POINTER(ctypes.c_uint8)
_u64p = ctypes.POINTER(ctypes.c_uint64)


def _declare(l: ctypes.CDLL) -> None:
    u64, i64, vp, cp = (ctypes.c_uint64, ctypes.c_int64, ctypes.c_void_p,
                        ctypes.c_char_p)
    # fsst
    l.lqt_fsst_train.restype = vp
    l.lqt_fsst_train.argtypes = [_u8p, _u64p, u64]
    l.lqt_fsst_free.argtypes = [vp]
    l.lqt_fsst_compress.restype = u64
    l.lqt_fsst_compress.argtypes = [vp, _u8p, u64, _u8p, u64]
    l.lqt_fsst_decompress.restype = u64
    l.lqt_fsst_decompress.argtypes = [vp, _u8p, u64, _u8p, u64]
    l.lqt_fsst_decompressed_len.restype = u64
    l.lqt_fsst_decompressed_len.argtypes = [vp, _u8p, u64]
    l.lqt_fsst_table_serialize.restype = u64
    l.lqt_fsst_table_serialize.argtypes = [vp, _u8p, u64]
    l.lqt_fsst_table_deserialize.restype = vp
    l.lqt_fsst_table_deserialize.argtypes = [_u8p, u64]
    l.lqt_fsst_num_symbols.restype = ctypes.c_int
    l.lqt_fsst_num_symbols.argtypes = [vp]
    l.lqt_fsst_compress_batch.restype = u64
    l.lqt_fsst_compress_batch.argtypes = [vp, _u8p, _u64p, u64, _u8p, u64, _u64p]
    l.lqt_fsst_decompress_batch.restype = u64
    l.lqt_fsst_decompress_batch.argtypes = [vp, _u8p, _u64p, u64, _u8p, u64, _u64p]
    # block store
    l.lqt_store_open.restype = vp
    l.lqt_store_open.argtypes = [cp]
    l.lqt_store_close.argtypes = [vp]
    l.lqt_store_put.restype = ctypes.c_int
    l.lqt_store_put.argtypes = [vp, u64, _u8p, u64, _u64p]
    l.lqt_store_get_len.restype = i64
    l.lqt_store_get_len.argtypes = [vp, u64]
    l.lqt_store_get.restype = ctypes.c_int
    l.lqt_store_get.argtypes = [vp, u64, _u8p, u64]
    l.lqt_store_read_range.restype = ctypes.c_int
    l.lqt_store_read_range.argtypes = [vp, u64, u64, _u8p]
    l.lqt_store_remove.restype = u64
    l.lqt_store_remove.argtypes = [vp, u64]
    l.lqt_store_contains.restype = ctypes.c_int
    l.lqt_store_contains.argtypes = [vp, u64]
    l.lqt_store_range_of.restype = ctypes.c_int
    l.lqt_store_range_of.argtypes = [vp, u64, _u64p, _u64p]
    l.lqt_store_file_bytes.restype = u64
    l.lqt_store_file_bytes.argtypes = [vp]
    l.lqt_store_live_bytes.restype = u64
    l.lqt_store_live_bytes.argtypes = [vp]
    l.lqt_store_compact.restype = ctypes.c_int
    l.lqt_store_compact.argtypes = [vp]


def buf_ptr(b) -> _u8p:
    """Pointer to a bytes/bytearray/np.uint8 buffer (no copy)."""
    if isinstance(b, bytes):
        return ctypes.cast(b, _u8p)
    return (ctypes.c_uint8 * len(b)).from_buffer(b)
