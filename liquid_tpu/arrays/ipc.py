"""Liquid IPC: self-describing serialization of encoded arrays.

Reference behavior: liquid-cache `src/core/src/liquid_array/ipc.rs`:
16-byte header {magic "LQDA", version, logical_type_id,
physical_type_id}, then encoding-specific payload;
`read_from_bytes(bytes, ctx)` dispatches on the type ids.

Ours: magic "LQTP", version 1.  Header (16 bytes, little-endian):
  magic[4] | u16 version | u16 physical_id | u16 logical_id | u16 flags
  | u32 meta_len
then a JSON metadata blob (scalar fields) and raw buffers back to back.
Every array is disk-persistable through this path (squeeze backing bytes
and DiskLiquid entries use it).
"""
from __future__ import annotations

import json
import struct
from typing import Optional

import jax.numpy as jnp
import numpy as np
import pyarrow as pa

MAGIC = b"LQTP"
VERSION = 1

PHYS_PRIMITIVE = 1
PHYS_BYTEVIEW = 2
PHYS_FLOAT = 3
PHYS_DECIMAL = 4
PHYS_FIXEDLEN = 5
PHYS_LINEAR = 6
PHYS_DELTA = 7

_LOGICAL = [
    pa.bool_(),
    pa.int8(), pa.int16(), pa.int32(), pa.int64(),
    pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64(),
    pa.float32(), pa.float64(),
    pa.date32(), pa.date64(),
    pa.timestamp("s"), pa.timestamp("ms"), pa.timestamp("us"), pa.timestamp("ns"),
    pa.string(), pa.large_string(), pa.binary(), pa.large_binary(),
    pa.string_view(), pa.binary_view(),
]


def logical_id(t: pa.DataType) -> int:
    for i, c in enumerate(_LOGICAL):
        if t.equals(c):
            return i
    raise ValueError(f"unsupported logical type {t}")


def logical_from_id(i: int) -> pa.DataType:
    return _LOGICAL[i]


def _emit(physical: int, logical: int, meta: dict, buffers: list) -> bytes:
    meta = dict(meta)
    meta["buf_lens"] = [len(b) for b in buffers]
    mb = json.dumps(meta).encode()
    head = struct.pack("<4sHHHHI", MAGIC, VERSION, physical, logical, 0, len(mb))
    return b"".join([head, mb] + buffers)


def _parse(data: bytes):
    magic, version, physical, logical, _flags, meta_len = struct.unpack_from(
        "<4sHHHHI", data, 0)
    assert magic == MAGIC, "bad magic"
    assert version == VERSION, version
    off = 16
    meta = json.loads(data[off:off + meta_len])
    off += meta_len
    buffers = []
    for ln in meta["buf_lens"]:
        buffers.append(data[off:off + ln])
        off += ln
    return physical, logical, meta, buffers



def _host_planes(a) -> np.ndarray:
    """Planes/codes as numpy WITHOUT forcing a device upload or fetch
    (hot classes keep host-resident forms; see LiquidPrimitiveArray)."""
    if hasattr(type(a), "planes_np"):
        return a.planes_np
    return np.asarray(a.planes)


def _host_validity(a):
    if hasattr(type(a), "validity_np"):
        return a.validity_np
    return a.validity


def _np_bytes(arr) -> bytes:
    return np.ascontiguousarray(np.asarray(arr)).tobytes()


def _opt_validity_bytes(validity) -> bytes:
    return b"" if validity is None else _np_bytes(validity)


def _validity_from(buf: bytes):
    if not buf:
        return None
    # stays numpy: consumers upload lazily on first device use
    return np.frombuffer(buf, dtype=np.uint32).copy()


def _arrow_to_bytes(arr: pa.Array) -> bytes:
    batch = pa.record_batch([arr], names=["v"])
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, batch.schema) as w:
        w.write_batch(batch)
    return sink.getvalue().to_pybytes()


def _arrow_from_bytes(buf: bytes) -> pa.Array:
    with pa.ipc.open_stream(pa.BufferReader(buf)) as r:
        t = r.read_all()
    return t.column(0).combine_chunks()


# -- per-encoding ----------------------------------------------------------

def serialize_primitive(a) -> bytes:
    planes = _host_planes(a)
    meta = {"width": a.width, "ref": a.reference_value, "length": a.length,
            "rows": int(planes.shape[0]), "words": int(planes.shape[1])}
    bufs = [_np_bytes(planes), _opt_validity_bytes(_host_validity(a))]
    return _emit(PHYS_PRIMITIVE, logical_id(a.arrow_type), meta, bufs)


def serialize_byteview(a) -> bytes:
    meta = {"length": a.length,
            "has_fp": a._fingerprints is not None,
            "fsst": a.is_fsst}
    if a.is_fsst:
        bufs = [_np_bytes(a.codes_np), _opt_validity_bytes(a.validity_np),
                a.fsst.to_bytes(),
                a.prefix_meta.prefixes.tobytes(),
                a.prefix_meta.rest_lens.tobytes(),
                a.prefix_meta.shared]
    else:
        bufs = [_np_bytes(a.codes_np), _opt_validity_bytes(a.validity_np),
                _arrow_to_bytes(a.dictionary)]
    if a._fingerprints is not None:
        bufs.append(a._fingerprints.tobytes())
    return _emit(PHYS_BYTEVIEW, logical_id(a.arrow_type), meta, bufs)


def serialize_float(a) -> bytes:
    planes = _host_planes(a)
    meta = {"width": a.width, "ref": a.reference_value, "exp": a.exponent,
            "length": a.length,
            "rows": int(planes.shape[0]), "words": int(planes.shape[1])}
    bufs = [_np_bytes(planes), _opt_validity_bytes(_host_validity(a)),
            _np_bytes(a.patch_idx), _np_bytes(a.patch_vals)]
    return _emit(PHYS_FLOAT, logical_id(a.arrow_type), meta, bufs)


def _decimal_meta(t: pa.DataType) -> dict:
    return {"prec": t.precision, "scale": t.scale,
            "is256": pa.types.is_decimal256(t)}


def _decimal_type(meta: dict) -> pa.DataType:
    mk = pa.decimal256 if meta.get("is256") else pa.decimal128
    return mk(meta["prec"], meta["scale"])


def serialize_decimal(a) -> bytes:
    planes = _host_planes(a)
    meta = {"width": a.width, "ref": a.reference_value, "length": a.length,
            "rows": int(planes.shape[0]), "words": int(planes.shape[1])}
    meta.update(_decimal_meta(a.arrow_type))
    bufs = [_np_bytes(planes), _opt_validity_bytes(_host_validity(a))]
    return _emit(PHYS_DECIMAL, 0, meta, bufs)


def serialize_fixedlen(a) -> bytes:
    meta = {"length": a.length, "bw": a.byte_width}
    meta.update(_decimal_meta(a.arrow_type))
    bufs = [_np_bytes(a.codes), _opt_validity_bytes(a.validity),
            a.fsst.to_bytes()]
    return _emit(PHYS_FIXEDLEN, 0, meta, bufs)


def serialize_linear(a) -> bytes:
    r = a.residuals
    rp = _host_planes(r)
    meta = {"slope": a.slope, "length": a.length,
            "width": r.width, "ref": r.reference_value,
            "rows": int(rp.shape[0]), "words": int(rp.shape[1])}
    bufs = [_np_bytes(rp), _opt_validity_bytes(_host_validity(r))]
    return _emit(PHYS_LINEAR, logical_id(a.arrow_type), meta, bufs)


def serialize_delta(a) -> bytes:
    d = a.deltas
    dp = _host_planes(d)
    meta = {"first": a.first_value, "length": a.length,
            "width": d.width, "ref": d.reference_value,
            "rows": int(dp.shape[0]), "words": int(dp.shape[1])}
    bufs = [_np_bytes(dp), _opt_validity_bytes(_host_validity(a))]
    return _emit(PHYS_DELTA, logical_id(a.arrow_type), meta, bufs)


def deserialize(data: bytes):
    """Self-describing dispatch (ref ipc.rs read_from_bytes)."""
    physical, logical, meta, bufs = _parse(data)
    t = logical_from_id(logical)
    if physical == PHYS_PRIMITIVE:
        from liquid_tpu.arrays.primitive import LiquidPrimitiveArray
        planes = np.frombuffer(bufs[0], dtype=np.uint32).copy() \
                             .reshape(meta["rows"], meta["words"])
        return LiquidPrimitiveArray(planes, meta["width"], meta["ref"],
                                    _validity_from(bufs[1]), meta["length"], t)
    if physical == PHYS_BYTEVIEW:
        from liquid_tpu.arrays.byteview import LiquidByteViewArray
        codes = np.frombuffer(bufs[0], dtype=np.int32).copy()
        if meta.get("fsst"):
            from liquid_tpu.arrays.fsst import FsstBuffer
            from liquid_tpu.arrays.prefixkeys import PrefixMeta
            fsst = FsstBuffer.from_bytes(bufs[2])
            pm = PrefixMeta(bytes(bufs[5]),
                            np.frombuffer(bufs[3], dtype=np.uint64).copy(),
                            np.frombuffer(bufs[4], dtype=np.int32).copy())
            fps = (np.frombuffer(bufs[6], dtype=np.uint32)
                   if meta.get("has_fp") else None)
            return LiquidByteViewArray(codes, None, _validity_from(bufs[1]),
                                       meta["length"], t, fps,
                                       fsst=fsst, prefix_meta=pm)
        fps = (np.frombuffer(bufs[3], dtype=np.uint32)
               if meta.get("has_fp") else None)
        return LiquidByteViewArray(codes, _arrow_from_bytes(bufs[2]),
                                   _validity_from(bufs[1]), meta["length"], t,
                                   fps)
    if physical == PHYS_FLOAT:
        from liquid_tpu.arrays.float_alp import LiquidFloatArray
        planes = np.frombuffer(bufs[0], dtype=np.uint32).copy() \
                             .reshape(meta["rows"], meta["words"])
        return LiquidFloatArray(planes, meta["width"], meta["ref"], meta["exp"],
                                np.frombuffer(bufs[2], dtype=np.int32).copy(),
                                np.frombuffer(bufs[3], dtype=np.float64).copy(),
                                _validity_from(bufs[1]), meta["length"], t)
    if physical == PHYS_DECIMAL:
        from liquid_tpu.arrays.decimal import LiquidDecimalArray
        planes = np.frombuffer(bufs[0], dtype=np.uint32).copy() \
                             .reshape(meta["rows"], meta["words"])
        return LiquidDecimalArray(planes, meta["width"], meta["ref"],
                                  _validity_from(bufs[1]), meta["length"],
                                  _decimal_type(meta))
    if physical == PHYS_FIXEDLEN:
        from liquid_tpu.arrays.decimal import LiquidFixedLenByteArray
        from liquid_tpu.arrays.fsst import FsstBuffer
        codes = np.frombuffer(bufs[0], dtype=np.int32).copy()
        return LiquidFixedLenByteArray(codes, FsstBuffer.from_bytes(bufs[2]),
                                       meta["bw"], _validity_from(bufs[1]),
                                       meta["length"], _decimal_type(meta))
    if physical in (PHYS_LINEAR, PHYS_DELTA):
        from liquid_tpu.arrays.linear import (
            LiquidLinearArray, LiquidPrimitiveDeltaArray)
        from liquid_tpu.arrays.primitive import LiquidPrimitiveArray
        planes = np.frombuffer(bufs[0], dtype=np.uint32).copy() \
                             .reshape(meta["rows"], meta["words"])
        if physical == PHYS_LINEAR:
            inner = LiquidPrimitiveArray(planes, meta["width"], meta["ref"],
                                         _validity_from(bufs[1]),
                                         meta["length"], pa.int64())
            return LiquidLinearArray(inner, meta["slope"], meta["length"], t)
        inner = LiquidPrimitiveArray(planes, meta["width"], meta["ref"],
                                     None, meta["length"], pa.int64())
        return LiquidPrimitiveDeltaArray(inner, meta["first"],
                                         _validity_from(bufs[1]),
                                         meta["length"], t)
    raise ValueError(f"unknown physical id {physical}")
