"""Session API: the user-facing entry point.

Reference behavior: `LiquidCacheLocalBuilder` (liquid-cache
`src/datafusion-local/src/lib.rs:57-197`): builds a SessionContext with
the lineage + local-mode optimizers installed and returns
`(ctx, cache_ref)`; `ctx.register_parquet(...)`; `ctx.sql(...)`.
"""
from __future__ import annotations

import os
import tempfile
from typing import Dict, Optional, Tuple

import pyarrow as pa

from liquid_tpu.cache.core import LiquidCache, LiquidCacheBuilder
from liquid_tpu.io.parquet import ParquetTable
from liquid_tpu.sql.exec import QueryExecutor


class DataFrame:
    def __init__(self, table: pa.Table):
        self._t = table

    def to_arrow(self) -> pa.Table:
        return self._t

    def to_pandas(self):
        return self._t.to_pandas()

    def collect(self) -> pa.Table:
        return self._t

    def show(self, n: int = 20) -> None:
        print(self._t.slice(0, n))

    def __repr__(self):
        return repr(self._t)


class SessionContext:
    def __init__(self, cache: LiquidCache):
        self.cache = cache
        self._tables: Dict[str, ParquetTable] = {}
        self._next_file_id = 0
        self._exec = QueryExecutor(self._tables)

    def register_parquet(self, name: str, path: str) -> None:
        old = self._tables.get(name)
        if old is not None:
            # re-registration replaces the table object: release its
            # fused-prep budget reservations and drop its cache entries
            # (both would otherwise outlive the dead table)
            from liquid_tpu.sql.fused_agg import release_prep_cache
            release_prep_cache(old)
            self.cache.remove_file(old.file_id)
        fid = self._next_file_id
        self._next_file_id += 1
        self._tables[name] = ParquetTable(name, path, self.cache, fid)

    def table_names(self):
        return list(self._tables)

    def sql(self, query: str) -> DataFrame:
        return DataFrame(self._exec.execute_sql(query))


class LiquidCacheLocalBuilder:
    """Fluent builder mirroring the reference's local-mode API."""

    def __init__(self):
        self._b = LiquidCacheBuilder()
        self._cache_dir: Optional[str] = None

    def with_max_memory_bytes(self, n: int) -> "LiquidCacheLocalBuilder":
        self._b.with_max_memory_bytes(n)
        return self

    def with_max_disk_bytes(self, n: int) -> "LiquidCacheLocalBuilder":
        self._b.with_max_disk_bytes(n)
        return self

    def with_cache_dir(self, d: str) -> "LiquidCacheLocalBuilder":
        self._cache_dir = d
        return self

    def with_squeeze_policy(self, p) -> "LiquidCacheLocalBuilder":
        self._b.with_squeeze_policy(p)
        return self

    def with_cache_policy(self, p) -> "LiquidCacheLocalBuilder":
        self._b.with_cache_policy(p)
        return self

    def with_transcode_on_insert(self, b: bool) -> "LiquidCacheLocalBuilder":
        self._b.with_transcode_on_insert(b)
        return self

    def build(self) -> Tuple[SessionContext, LiquidCache]:
        d = self._cache_dir or tempfile.mkdtemp(prefix="liquid_tpu_")
        self._b.with_disk_path(os.path.join(d, "liquid_cache.bin"))
        cache = self._b.build()
        return SessionContext(cache), cache
