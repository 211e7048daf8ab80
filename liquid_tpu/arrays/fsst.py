"""FSST-compressed byte buffers (native codec + compact offsets).

Reference behavior: `raw::FsstArray` / `RawFsstBuffer` / `CompactOffsets`
(liquid-cache `src/core/src/liquid_array/raw/fsst_buffer.rs:25,162,261`):
dictionary values compressed with a trained FSST symbol table; offsets
stored compactly; decompression can target single entries (random
access), which is what makes "decompress only ambiguous dictionary
entries" cheap.

The codec itself is native C++ (`native/fsst.cpp`), bound via ctypes.
"""
from __future__ import annotations

import ctypes
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

from liquid_tpu import _native


class FsstCompressor:
    """A trained FSST symbol table (shared per column, like the
    reference's `LiquidCompressorStates`, cache/utils.rs:90-130)."""

    def __init__(self, handle: int):
        self._h = handle
        self._lib = _native.lib()

    def __del__(self):
        try:
            self._lib.lqt_fsst_free(self._h)
        except Exception:
            pass

    # -- training ------------------------------------------------------

    @classmethod
    def train(cls, values: Sequence[bytes]) -> "FsstCompressor":
        lib = _native.lib()
        data = b"".join(values)
        offsets = np.zeros(len(values) + 1, dtype=np.uint64)
        np.cumsum([len(v) for v in values], out=offsets[1:])
        h = lib.lqt_fsst_train(
            _native.buf_ptr(data),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            len(values))
        return cls(h)

    @classmethod
    def train_on_arrow(cls, arr: pa.Array) -> "FsstCompressor":
        data, offsets = _arrow_bytes(arr)
        lib = _native.lib()
        offs = offsets.astype(np.uint64)
        h = lib.lqt_fsst_train(
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            len(arr))
        return cls(h)

    @property
    def num_symbols(self) -> int:
        return self._lib.lqt_fsst_num_symbols(self._h)

    # -- single-buffer --------------------------------------------------

    def compress(self, data: bytes) -> bytes:
        out = bytearray(2 * len(data))
        n = self._lib.lqt_fsst_compress(
            self._h, _native.buf_ptr(data), len(data),
            _native.buf_ptr(out), len(out))
        assert n != 2**64 - 1
        return bytes(out[:n])

    def decompress(self, data: bytes) -> bytes:
        n = self._lib.lqt_fsst_decompressed_len(
            self._h, _native.buf_ptr(data), len(data))
        assert n != 2**64 - 1, "corrupt fsst stream"
        out = bytearray(n)
        m = self._lib.lqt_fsst_decompress(
            self._h, _native.buf_ptr(data), len(data),
            _native.buf_ptr(out), n)
        assert m == n
        return bytes(out)

    # -- batch (one ctypes crossing per dictionary) ----------------------

    def compress_batch(self, data: np.ndarray, offsets: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
        lib = self._lib
        n = len(offsets) - 1
        cap = max(2 * int(offsets[-1]), 1)
        out = np.empty(cap, dtype=np.uint8)
        out_offs = np.zeros(n + 1, dtype=np.uint64)
        offs = offsets.astype(np.uint64)
        data = np.ascontiguousarray(data, dtype=np.uint8)
        if data.size == 0:
            data = np.zeros(1, dtype=np.uint8)
        w = lib.lqt_fsst_compress_batch(
            self._h,
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
            out_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
        assert w != 2**64 - 1
        return out[:w].copy(), out_offs

    def decompress_batch(self, data: np.ndarray, offsets: np.ndarray,
                         uncompressed_bytes: int
                         ) -> Tuple[np.ndarray, np.ndarray]:
        lib = self._lib
        n = len(offsets) - 1
        cap = max(int(uncompressed_bytes), 1)
        out = np.empty(cap, dtype=np.uint8)
        out_offs = np.zeros(n + 1, dtype=np.uint64)
        offs = offsets.astype(np.uint64)
        data = np.ascontiguousarray(data, dtype=np.uint8)
        if data.size == 0:
            data = np.zeros(1, dtype=np.uint8)
        w = lib.lqt_fsst_decompress_batch(
            self._h,
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
            out_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
        assert w != 2**64 - 1, "corrupt fsst stream"
        return out[:w], out_offs

    # -- serialization (ships inside Liquid IPC, ref LiquidIPCContext) ---

    def to_bytes(self) -> bytes:
        need = self._lib.lqt_fsst_table_serialize(self._h, None, 0)
        out = bytearray(need)
        n = self._lib.lqt_fsst_table_serialize(
            self._h, _native.buf_ptr(out), need)
        assert n == need
        return bytes(out)

    @classmethod
    def from_bytes(cls, data: bytes) -> "FsstCompressor":
        lib = _native.lib()
        h = lib.lqt_fsst_table_deserialize(_native.buf_ptr(data), len(data))
        assert h, "corrupt fsst symbol table"
        return cls(h)


def _arrow_bytes(arr: pa.Array) -> Tuple[np.ndarray, np.ndarray]:
    """(data u8[], offsets i64[n+1]) view of a string/binary array."""
    b = arr.cast(pa.large_binary())
    offsets = np.frombuffer(b.buffers()[1], dtype=np.int64, count=len(b) + 1,
                            offset=b.offset * 8)
    base = offsets[0]
    data_buf = b.buffers()[2]
    data = (np.frombuffer(data_buf, dtype=np.uint8)
            if data_buf is not None else np.zeros(0, np.uint8))
    return data[base:offsets[-1]].copy(), (offsets - base).copy()


class FsstBuffer:
    """Compressed value buffer with per-entry random access
    (ref RawFsstBuffer, fsst_buffer.rs:261)."""

    def __init__(self, comp_data: np.ndarray, comp_offsets: np.ndarray,
                 compressor: FsstCompressor, uncompressed_bytes: int):
        self.comp_data = comp_data          # u8[]
        self.comp_offsets = comp_offsets    # u64[n+1]
        self.compressor = compressor
        self.uncompressed_bytes = uncompressed_bytes

    def __len__(self) -> int:
        return len(self.comp_offsets) - 1

    @classmethod
    def from_arrow(cls, values: pa.Array,
                   compressor: Optional[FsstCompressor] = None) -> "FsstBuffer":
        data, offsets = _arrow_bytes(values)
        if compressor is None:
            lib = _native.lib()
            offs = offsets.astype(np.uint64)
            d = data if data.size else np.zeros(1, np.uint8)
            h = lib.lqt_fsst_train(
                d.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                offs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                len(values))
            compressor = FsstCompressor(h)
        comp, comp_offs = compressor.compress_batch(data, offsets)
        return cls(comp, comp_offs, compressor, int(offsets[-1]))

    def memory_bytes(self) -> int:
        return int(self.comp_data.nbytes + self.comp_offsets.nbytes + 64)

    def to_numpy(self) -> Tuple[np.ndarray, np.ndarray]:
        """Decompress everything -> (data u8[], offsets u64[n+1])."""
        return self.compressor.decompress_batch(
            self.comp_data, self.comp_offsets, self.uncompressed_bytes)

    def to_arrow(self, arrow_type: pa.DataType = None) -> pa.Array:
        data, offsets = self.to_numpy()
        arr = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), len(self),
            [None, pa.py_buffer(offsets.astype(np.int64).tobytes()),
             pa.py_buffer(data.tobytes())])
        if arrow_type is not None and not arrow_type.equals(pa.large_binary()):
            arr = arr.cast(arrow_type)
        return arr

    def get(self, i: int) -> bytes:
        lo, hi = int(self.comp_offsets[i]), int(self.comp_offsets[i + 1])
        return self.compressor.decompress(self.comp_data[lo:hi].tobytes())

    def take_bytes(self, indices: np.ndarray) -> List[bytes]:
        """Decompress only the requested entries (the 'ambiguous only'
        path of encoded comparison, ref comparisons.rs:93-165)."""
        return [self.get(int(i)) for i in indices]

    # -- serialization ----------------------------------------------------

    def to_bytes(self, include_table: bool = True) -> bytes:
        import struct
        table = self.compressor.to_bytes() if include_table else b""
        head = struct.pack("<QQQQ", len(self), self.uncompressed_bytes,
                           len(table), len(self.comp_data))
        return b"".join([head, table,
                         self.comp_offsets.astype(np.uint64).tobytes(),
                         self.comp_data.tobytes()])

    @classmethod
    def from_bytes(cls, data: bytes,
                   compressor: Optional[FsstCompressor] = None) -> "FsstBuffer":
        import struct
        n, unc, tlen, dlen = struct.unpack_from("<QQQQ", data, 0)
        off = 32
        if tlen:
            compressor = FsstCompressor.from_bytes(data[off:off + tlen])
        assert compressor is not None, "no compressor in stream or context"
        off += tlen
        comp_offsets = np.frombuffer(data, dtype=np.uint64, count=n + 1,
                                     offset=off).copy()
        off += (n + 1) * 8
        comp_data = np.frombuffer(data, dtype=np.uint8, count=dlen,
                                  offset=off).copy()
        return cls(comp_data, comp_offsets, compressor, unc)
