"""Parquet-facing cache integration.

Reference behavior: `LiquidCacheParquet` + the plantime reader stack
(liquid-cache `src/datafusion/src/cache/mod.rs:230-391`,
`reader/plantime/`): a file-path -> file_id registry, 64-bit packed
entry ids `(file<<48)|(rowgroup<<32)|(column<<16)|batch`
(cache/id.rs:8-33), a process-global parquet-metadata cache
(source.rs:41-163), and row-group pruning by min/max statistics
(row_group_filter.rs).

Batches are BLOCK_ROWS-sized row slices of a row group; a cache miss
reads the parquet column chunk once and inserts every batch of it.
"""
from __future__ import annotations

import datetime
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from liquid_tpu.arrays.base import BLOCK_ROWS, Predicate

# -- entry id packing (ref cache/id.rs) ------------------------------------

_B_BATCH = 16
_B_COL = 16
_B_RG = 16


def pack_id(file_id: int, rg: int, col: int, batch: int) -> int:
    assert file_id < (1 << 16) and rg < (1 << 16)
    assert col < (1 << 16) and batch < (1 << 16)
    return (file_id << 48) | (rg << 32) | (col << 16) | batch


def unpack_id(eid: int) -> Tuple[int, int, int, int]:
    return (eid >> 48) & 0xFFFF, (eid >> 32) & 0xFFFF, (eid >> 16) & 0xFFFF, eid & 0xFFFF


# -- metadata cache (ref META_CACHE, source.rs:41-163) ----------------------

_META_LOCK = threading.Lock()
_META_CACHE: Dict[str, "pq.FileMetaData"] = {}


def cached_metadata(path: str):
    with _META_LOCK:
        md = _META_CACHE.get(path)
    if md is None:
        md = pq.ParquetFile(path).metadata
        with _META_LOCK:
            _META_CACHE[path] = md
    return md


class ParquetTable:
    """One registered parquet file, scanned through the cache.

    `open_file` (optional) returns a fresh file-like for the path --
    used to scan remote objects through an ObjectStore/ByteCache
    (ref: object-store registration wrapping remote stores in ByteCache,
    datafusion-server service.rs:90-126)."""

    def __init__(self, name: str, path: str, cache, file_id: int,
                 open_file=None):
        self.name = name
        self.path = path
        self.cache = cache
        self.file_id = file_id
        self._pf = pq.ParquetFile(open_file() if open_file else path)
        if open_file is None:
            self.metadata = cached_metadata(path)
        else:
            self.metadata = self._pf.metadata
        self.schema = self._pf.schema_arrow
        self.column_names = list(self.schema.names)
        self._col_index = {n: i for i, n in enumerate(self.column_names)}
        self._zones: Dict[tuple, tuple] = {}  # batch-level min/max zone maps
        self.zone_prunes = 0  # batches skipped by zone maps (scan metric)
        self.bloom_prunes = 0  # row groups skipped by bloom filters
        self.pageindex_seeds = 0  # columns whose zones came from the page index
        from liquid_tpu.io.bloom import BloomReader
        self._bloom = BloomReader(path, self.metadata, open_file)
        from liquid_tpu.io.pageindex import PageIndexReader
        self._pageindex = PageIndexReader(path, open_file)
        self._pi_seeded: set = set()  # (rg, col) already seeded
        self._lock = threading.Lock()

    @property
    def num_rows(self) -> int:
        return self.metadata.num_rows

    @property
    def num_row_groups(self) -> int:
        return self.metadata.num_row_groups

    def rg_num_rows(self, rg: int) -> int:
        return self.metadata.row_group(rg).num_rows

    def num_batches(self, rg: int) -> int:
        return (self.rg_num_rows(rg) + BLOCK_ROWS - 1) // BLOCK_ROWS

    def batch_length(self, rg: int, batch: int) -> int:
        n = self.rg_num_rows(rg)
        return min(BLOCK_ROWS, n - batch * BLOCK_ROWS)

    def entry_id(self, rg: int, col_name: str, batch: int) -> int:
        return pack_id(self.file_id, rg, self._col_index[col_name], batch)

    def field(self, col_name: str) -> pa.Field:
        return self.schema.field(col_name)

    # -- row-group pruning (ref row_group_filter.rs) -----------------------

    def prune_row_groups(self, pushed: List[Tuple[str, Predicate]]) -> List[int]:
        """Row groups that may contain matching rows, by min/max stats.
        `pushed` are AND-ed (column, predicate) pairs."""
        keep = []
        for rg in range(self.num_row_groups):
            if self._rg_may_match(rg, pushed):
                keep.append(rg)
        return keep

    def _rg_may_match(self, rg: int, pushed) -> bool:
        meta = self.metadata.row_group(rg)
        for col, pred in pushed:
            if pred.op not in ("eq", "lt", "lt_eq", "gt", "gt_eq"):
                continue
            ci = self._col_index.get(col)
            if ci is None:
                continue
            stats = meta.column(ci).statistics
            if stats is None or not stats.has_min_max:
                continue
            lo, hi = stats.min, stats.max
            v = pred.literal
            try:
                if pred.op == "eq" and (v < lo or v > hi):
                    return False
                if pred.op in ("lt",) and lo >= v:
                    return False
                if pred.op in ("lt_eq",) and lo > v:
                    return False
                if pred.op in ("gt",) and hi <= v:
                    return False
                if pred.op in ("gt_eq",) and hi < v:
                    return False
            except TypeError:
                continue  # incomparable stats (e.g. bytes vs str)
        # min/max passed: for equality predicates, probe the column chunk's
        # bloom filter (ref row_group_filter.rs:103 prune_by_bloom_filters)
        for col, pred in pushed:
            if pred.op != "eq":
                continue
            ci = self._col_index.get(col)
            if ci is None:
                continue
            phys = meta.column(ci).physical_type
            verdict = self._bloom.might_contain(rg, ci, pred.literal, phys)
            if verdict is False:
                self.bloom_prunes += 1
                return False
        return True

    # -- batch-level zone maps (ref page-index pruning, opener.rs:314-327:
    # the reference prunes parquet PAGES by their column-index stats; our
    # unit of caching is the 8192-row batch, so min/max zone maps at batch
    # granularity are the equivalent -- built once on first load, pruning
    # every later scan without touching the encoded data) -----------------

    def _zone_key(self, rg: int, col_name: str, batch: int):
        return (rg, col_name, batch)

    def _record_zone(self, rg: int, col_name: str, batch: int,
                     chunk: pa.Array) -> None:
        t = chunk.type
        if not (pa.types.is_integer(t) or pa.types.is_floating(t)
                or pa.types.is_date(t) or pa.types.is_timestamp(t)):
            return
        import pyarrow.compute as pc
        mm = pc.min_max(chunk)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        nan_free = True
        if pa.types.is_floating(t):
            # pc.min_max SKIPS NaN on mixed input (all-NaN -> NaN bounds)
            # so the bounds alone cannot prove NaN-absence; keep_nan
            # predicates need the explicit flag
            if isinstance(lo, float) and (lo != lo or hi != hi):
                return  # all-NaN: every comparison is False, no pruning
            nan_free = not pc.any(pc.is_nan(
                chunk.drop_null() if chunk.null_count else chunk)).as_py()
        if isinstance(lo, datetime.date) and not isinstance(
                lo, datetime.datetime):
            # predicates arrive in the raw date32 domain (days since epoch)
            epoch = datetime.date(1970, 1, 1)
            lo, hi = (lo - epoch).days, (hi - epoch).days
        if lo is not None and not isinstance(lo, datetime.datetime):
            self._zones[self._zone_key(rg, col_name, batch)] = (lo, hi,
                                                                nan_free)

    def _seed_zones_from_pageindex(self, rg: int, col_name: str) -> None:
        """First-read pruning (ref opener.rs:314-327): derive batch-level
        zones from the parquet ColumnIndex min/max stats before ANY
        column data IO.  A batch spanning several pages gets the merged
        range; batches touching a page without stats stay unknown."""
        key = (rg, col_name)
        if key in self._pi_seeded:
            return
        self._pi_seeded.add(key)
        ci = self._col_index[col_name]
        phys = self.metadata.row_group(rg).column(ci).physical_type
        zones = self._pageindex.page_zones(rg, ci, phys, self.rg_num_rows(rg))
        if not zones:
            return
        n_b = self.num_batches(rg)
        # timestamp/datetime stats don't participate (predicates arrive
        # as datetime objects; lazy zones skip them too)
        t = self.schema.field(col_name).type
        if pa.types.is_timestamp(t) or pa.types.is_date64(t):
            return
        for b in range(n_b):
            b_lo, b_hi = b * BLOCK_ROWS, b * BLOCK_ROWS + self.batch_length(rg, b)
            lo = hi = None
            covered = 0
            for frow, end, plo, phi in zones:
                if end <= b_lo or frow >= b_hi:
                    continue
                covered += min(end, b_hi) - max(frow, b_lo)
                lo = plo if lo is None else min(lo, plo)
                hi = phi if hi is None else max(hi, phi)
            # only trust the zone if stat-carrying pages cover every row
            # of the batch (all-null pages are exempt: NULL rows can't
            # match a comparison predicate anyway)
            if lo is not None and covered >= b_hi - b_lo - self._null_rows_upper(rg, ci):
                # parquet float stats exclude NaN, so page-index zones
                # cannot prove NaN-absence
                self._zones.setdefault(self._zone_key(rg, col_name, b),
                                       (lo, hi, phys not in ("FLOAT",
                                                             "DOUBLE")))
        self.pageindex_seeds += 1

    def _null_rows_upper(self, rg: int, ci: int) -> int:
        """Upper bound on NULL rows in the column chunk (stats, else inf)."""
        stats = self.metadata.row_group(rg).column(ci).statistics
        if stats is not None and stats.null_count is not None:
            return stats.null_count
        return 0

    def batch_may_match(self, rg: int, col_name: str, batch: int,
                        pred: Predicate) -> bool:
        """False only when the zone map PROVES no row in the batch can
        match `pred` (unknown zones always pass)."""
        if (rg, col_name) not in self._pi_seeded:
            self._seed_zones_from_pageindex(rg, col_name)
        z = self._zones.get(self._zone_key(rg, col_name, batch))
        if z is None:
            return True
        lo, hi, nan_free = z
        if pred.keep_nan and not nan_free:
            return True  # batch may hold NaN rows, which match
        v = pred.literal
        if isinstance(v, datetime.date) and not isinstance(
                v, datetime.datetime):
            v = (v - datetime.date(1970, 1, 1)).days
        try:
            if pred.op == "eq":
                return not (v < lo or v > hi)
            if pred.op == "lt":
                return lo < v
            if pred.op == "lt_eq":
                return lo <= v
            if pred.op == "gt":
                return hi > v
            if pred.op == "gt_eq":
                return hi >= v
        except TypeError:
            return True
        return True

    # -- column loading through the cache ----------------------------------

    def ensure_cached(self, rg: int, col_name: str, hint=None) -> List[int]:
        """Make sure all batches of (rg, col) are cached; returns entry ids.
        A miss reads the parquet column chunk once and inserts every batch
        (ref ParquetFallback insert-all, liquid_cache_reader.rs:393-434)."""
        n_batches = self.num_batches(rg)
        ids = [self.entry_id(rg, col_name, b) for b in range(n_batches)]
        if all(self.cache.contains(eid) for eid in ids):
            return ids
        with self._lock:
            if all(self.cache.contains(eid) for eid in ids):
                return ids
            data = self._pf.read_row_group(
                rg, columns=[col_name]).column(0).combine_chunks()
            for b, eid in enumerate(ids):
                chunk = data.slice(b * BLOCK_ROWS, BLOCK_ROWS)
                if self._zone_key(rg, col_name, b) not in self._zones:
                    self._record_zone(rg, col_name, b, chunk)
                if not self.cache.contains(eid):
                    self.cache.insert(eid, chunk, hint=hint)
        return ids

    def get_batch(self, rg: int, col_name: str, batch: int,
                  hint=None) -> pa.Array:
        from liquid_tpu.cache.expressions import VariantGet
        eid = self.entry_id(rg, col_name, batch)
        if isinstance(hint, VariantGet):
            # squeezed-variant shortcut: typed path struct, zero IO when
            # all requested paths are resident (ref core.rs:747-788)
            if not self.cache.contains(eid):
                self.ensure_cached(rg, col_name, hint)
            out = self.cache.get_variant_paths(eid, hint.requests)
            if out is not None:
                return out
        out = self.cache.get(eid)
        if out is None:
            self.ensure_cached(rg, col_name, hint)
            out = self.cache.get(eid)
            if out is None:
                # cache refused (pressure): read straight from parquet
                data = self._pf.read_row_group(
                    rg, columns=[col_name]).column(0).combine_chunks()
                out = data.slice(batch * BLOCK_ROWS, BLOCK_ROWS)
        if pa.types.is_dictionary(out.type):
            out = out.cast(out.type.value_type)
        return out

    def eval_predicate(self, rg: int, col_name: str, batch: int,
                       pred: Predicate, hint=None):
        eid = self.entry_id(rg, col_name, batch)
        if not self.cache.contains(eid):
            self.ensure_cached(rg, col_name, hint)
        return self.cache.eval_predicate(eid, pred)

    def get_batches(self, rg: int, col_name: str, hint=None, batches=None):
        """Materialize the requested batches of (rg, col) in one batched
        cache decode; -> {batch: pa.Array}."""
        ids = self.ensure_cached(rg, col_name, hint)
        want = list(range(len(ids)) if batches is None else batches)
        arrays = self.cache.get_arrow_many([ids[b] for b in want])
        out = {}
        for b, arr in zip(want, arrays):
            if arr is None:  # cache refused under pressure: direct read
                arr = self.get_batch(rg, col_name, b, hint)
            if pa.types.is_dictionary(arr.type):
                arr = arr.cast(arr.type.value_type)
            out[b] = arr
        return out

    def eval_predicate_many(self, rg: int, col_name: str, pred: Predicate,
                            hint=None, batches=None):
        """Evaluate `pred` over the requested batches of (rg, col) in one
        batched cache call; -> {batch: BoolMask|None}."""
        ids = self.ensure_cached(rg, col_name, hint)
        want = range(len(ids)) if batches is None else batches
        eids = [ids[b] for b in want]
        masks = self.cache.eval_predicate_many(eids, pred)
        return dict(zip(want, masks))
