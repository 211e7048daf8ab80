"""Float squeeze (VERDICT missing #4; ref FloatSqueezePolicy +
LiquidFloatArray::squeeze, float_array.rs:61,338): ALP floats downshift
to a bucketized integer lane with exact disk backing instead of
evicting whole; comparisons stay IO-free unless the threshold bucket
is occupied."""
import numpy as np
import pyarrow as pa
import pytest

from liquid_tpu.arrays.base import Predicate
from liquid_tpu.arrays.float_alp import LiquidFloatArray, squeeze_float
from liquid_tpu.arrays import ipc


class CountingIo:
    """SqueezeIoHandler double that serves the backing bytes and counts
    reads (the reference's TestSqueezeIo, io_context.rs:142-180)."""

    def __init__(self, backing: bytes):
        self.backing = backing
        self.reads = 0

    def read(self, rng):
        self.reads += 1
        if rng is None:
            return self.backing
        off, ln = rng
        return self.backing[off: off + ln]


def _mk(vals, typ=pa.float64()):
    arr = pa.array(vals, typ)
    fl = LiquidFloatArray.from_arrow(arr)
    out = squeeze_float(fl)
    assert out is not None
    sq, backing = out
    sq._disk_range = None  # CountingIo serves the whole backing
    return arr, sq, CountingIo(backing)


def _mask_np(sq, pred, io, n):
    from liquid_tpu.ops import mask as mops
    m = sq.try_eval_predicate(pred, io)
    assert m is not None
    sel = np.asarray(mops.unpack_bits(m.to_selection()))[:n]
    return sel


@pytest.mark.parametrize("op,lit", [
    ("lt", 3.5), ("lt_eq", 3.5), ("gt", 3.5), ("gt_eq", 3.5),
    ("eq", 2.25), ("ne", 2.25), ("lt", -10.0), ("gt", 1e6),
])
def test_squeezed_float_predicates_exact(op, lit):
    rng = np.random.default_rng(3)
    vals = np.round(rng.uniform(-5, 10, 4096), 2)
    arr, sq, io = _mk(list(vals))
    got = _mask_np(sq, Predicate(op, lit), io, len(vals))
    fns = {"eq": np.equal, "ne": np.not_equal, "lt": np.less,
           "lt_eq": np.less_equal, "gt": np.greater,
           "gt_eq": np.greater_equal}
    expect = fns[op](vals, lit)
    assert (got == expect).all()


def test_squeezed_float_io_free_when_bucket_empty():
    # values cluster far from the literal: threshold bucket is empty,
    # the squeezed compare must not touch the backing
    vals = list(np.round(np.linspace(100.0, 200.0, 4096), 1))
    arr, sq, io = _mk(vals)
    got = _mask_np(sq, Predicate("lt", 100.0), io, len(vals))
    assert got.sum() == 0
    got = _mask_np(sq, Predicate("gt", 99.0), io, len(vals))
    assert got.sum() == len(vals)
    assert io.reads == 0, "IO-free fast path regressed"


def test_squeezed_float_ambiguous_reads_backing():
    vals = [float(i) / 4 for i in range(4096)]
    arr, sq, io = _mk(vals)
    lit = vals[2048] + 0.01  # lands inside an occupied bucket
    got = _mask_np(sq, Predicate("lt", lit), io, len(vals))
    assert (got == (np.asarray(vals) < lit)).all()
    assert io.reads >= 1


def test_squeezed_float_patches_resident():
    # values that defeat ALP round-trip become patches; they must be
    # settled from the RESIDENT patch values without IO
    vals = [1.5, 2.5, np.pi, 4.5, np.e] + [0.5] * 4091
    arr, sq, io = _mk(vals)
    assert len(sq.patch_idx) >= 2
    got = _mask_np(sq, Predicate("gt", 3.0), io, len(vals))
    expect = np.asarray(vals) > 3.0
    assert (got == expect).all()
    assert io.reads == 0


def test_squeezed_float_nulls_and_roundtrip():
    vals = [1.25, None, 3.75, None, 5.0] * 100
    arr, sq, io = _mk(vals)
    out = sq.to_arrow(io)
    assert out.cast(pa.float64()).to_pylist() == \
        pa.array(vals, pa.float64()).to_pylist()
    got = _mask_np(sq, Predicate("gt_eq", 3.75), io, len(vals))
    df = np.array([v is not None and v >= 3.75 for v in vals])
    assert (got == df).all()


def test_float32_squeeze():
    rng = np.random.default_rng(9)
    vals = np.round(rng.uniform(0, 50, 2048), 1).astype(np.float32)
    arr, sq, io = _mk(list(vals), pa.float32())
    got = _mask_np(sq, Predicate("lt", 25.0), io, len(vals))
    expect = vals.astype(np.float64) < 25.0
    assert (got == expect).all()


def test_cache_pipeline_squeezes_floats(tmp_path):
    """End-to-end: a float column under memory pressure squeezes instead
    of evicting whole, stays queryable, and hydrates exactly."""
    from liquid_tpu.cache import LiquidCacheBuilder
    cache = (LiquidCacheBuilder()
             .with_max_memory_bytes(1 << 24)
             .with_disk_path(str(tmp_path / "s.bin"))
             .build())
    rng = np.random.default_rng(4)
    vals = np.round(rng.uniform(0, 1000, 8192), 2)
    cache.insert(7, pa.array(vals))
    cache._squeeze_victim(7)  # liquid float -> squeezed
    st = cache.entry_state(7) if hasattr(cache, "entry_state") else None
    m = cache.eval_predicate(7, Predicate("gt", 500.0))
    assert m is not None
    from liquid_tpu.ops import mask as mops
    got = np.asarray(mops.unpack_bits(m.to_selection()))[:8192]
    assert (got == (vals > 500.0)).all()
    out = cache.get(7)
    assert np.allclose(np.asarray(out.cast(pa.float64())), vals)
