"""Distributed SQL: queries over row-sharded device tables on a Mesh.

SURVEY.md section 7 step 7 ("multi-host: hash-partitioned tables,
all-to-all shuffle, scaling"): the reference scales by putting ONE cache
server behind many compute nodes (section 2.10); the TPU-native design
instead shards table rows across the mesh and executes the
filter+aggregate pipeline as ONE shard_map'd XLA program per query
shape -- partial aggregates merge with psum/pmin/pmax over ICI, and
high-cardinality aggregation / joins ride the all-to-all primitives in
`parallel/dist.py`.

Scope (documented): single-table SELECT with AND-of-comparison WHERE,
GROUP BY <=1 integer or string column, COUNT/COUNT(col)/SUM/MIN/MAX/AVG.
Everything beyond falls back to the local engine if one is attached.
Strings are globally dictionary-encoded at registration so predicates
and group keys are device-side code compares.
"""
from __future__ import annotations

import datetime
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from liquid_tpu.parallel import dist
from liquid_tpu.sql import ast
from liquid_tpu.sql.parser import parse_sql
from liquid_tpu.sql.planner import split_conjuncts
from liquid_tpu.sql.physical import AGG_FUNCS, render

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

P = jax.sharding.PartitionSpec

_CMP = {"=": "eq", "<>": "ne", "<": "lt", "<=": "le", ">": "gt", ">=": "ge"}


class ShardedColumn:
    __slots__ = ("data", "kind", "dictionary", "lo", "hi")

    def __init__(self, data, kind, dictionary=None, lo=0, hi=0):
        self.data = data            # sharded device array [N_padded]
        self.kind = kind            # "int" | "float" | "dict"
        self.dictionary = dictionary  # list[str] | None (host)
        self.lo, self.hi = lo, hi   # int range (for dense grouping)


class DistributedTable:
    def __init__(self, mesh, table: pa.Table):
        self.mesh = mesh
        n_dev = mesh.shape[dist.DATA_AXIS]
        n = table.num_rows
        pad = (-n) % n_dev
        self.num_rows = n
        self.padded = n + pad
        valid = np.zeros(self.padded, dtype=bool)
        valid[:n] = True
        self.valid = dist.shard_rows(mesh, jnp.asarray(valid))
        self.columns: Dict[str, ShardedColumn] = {}
        for name in table.column_names:
            col = table.column(name).combine_chunks()
            self.columns[name] = self._shard_column(mesh, col, pad)

    def _shard_column(self, mesh, col: pa.Array, pad: int) -> ShardedColumn:
        t = col.type
        if col.null_count:
            raise NotImplementedError(
                "distributed mode requires NULL-free columns (validity "
                "masks are a follow-up); register through the local "
                "engine instead")
        if pa.types.is_string(t) or pa.types.is_large_string(t) \
                or pa.types.is_string_view(t):
            enc = pc.dictionary_encode(col)
            codes = np.asarray(enc.indices.fill_null(-1), dtype=np.int32)
            codes = np.concatenate([codes, np.full(pad, -1, np.int32)])
            dictionary = enc.dictionary.to_pylist()
            return ShardedColumn(dist.shard_rows(mesh, jnp.asarray(codes)),
                                 "dict", dictionary)
        if pa.types.is_floating(t):
            vals = np.asarray(col.fill_null(0), dtype=np.float64)
            vals = np.concatenate([vals, np.zeros(pad)])
            return ShardedColumn(dist.shard_rows(mesh, jnp.asarray(vals)),
                                 "float")
        if pa.types.is_date32(t):
            vals = np.asarray(col.fill_null(0)).astype("datetime64[D]")
            vals = vals.astype(np.int64)
        else:
            vals = np.asarray(col.fill_null(0), dtype=np.int64)
        vals = np.concatenate([vals, np.zeros(pad, np.int64)])
        lo = int(vals[: self.num_rows].min()) if self.num_rows else 0
        hi = int(vals[: self.num_rows].max()) if self.num_rows else 0
        return ShardedColumn(dist.shard_rows(mesh, jnp.asarray(vals)),
                             "int", lo=lo, hi=hi)


class DistributedSession:
    """`sql()` over sharded tables; one compiled shard_map program per
    query SHAPE (literals are traced args, so constants don't recompile)."""

    MAX_DENSE_GROUPS = 1 << 16

    def __init__(self, mesh=None):
        self.mesh = mesh or dist.make_mesh()
        self.tables: Dict[str, DistributedTable] = {}

    def register_table(self, name: str, table: pa.Table) -> None:
        self.tables[name] = DistributedTable(self.mesh, table)

    def register_parquet(self, name: str, path: str) -> None:
        import pyarrow.parquet as pq
        self.register_table(name, pq.read_table(path))

    # -- planning ------------------------------------------------------------

    def sql(self, query: str) -> pa.Table:
        q = parse_sql(query)
        assert isinstance(q.from_, ast.TableRef) and q.from_.name in self.tables, \
            "distributed mode: single registered table FROM"
        dt = self.tables[q.from_.name]
        preds, never = self._plan_where(q.where, dt)
        group_col, aggs, names = self._plan_items(q, dt)
        if never:
            out = self._zero_outputs(dt, group_col, aggs)
        else:
            out = self._execute(dt, preds, group_col, aggs)
        table = self._finalize(q, dt, group_col, aggs, names, out)
        return table

    def _plan_where(self, where, dt):
        """-> (preds, never): preds are (col, op, value) with values kept
        EXACT (int literals never round-trip through float64 -- a UserID
        above 2^53 would compare wrong); fractional literals against int
        columns normalize to floor/ceil ops or prove the query empty."""
        import math
        preds = []
        never = False
        for conj in split_conjuncts(where):
            assert isinstance(conj, ast.Binary) and conj.op in _CMP, \
                f"distributed mode supports AND of comparisons, got {conj}"
            col, lit = conj.left, conj.right
            op = _CMP[conj.op]
            if isinstance(lit, ast.Column) and isinstance(col, ast.Literal):
                col, lit = lit, col
                op = {"lt": "gt", "le": "ge", "gt": "lt", "ge": "le",
                      "eq": "eq", "ne": "ne"}[op]
            assert isinstance(col, ast.Column) and isinstance(lit, ast.Literal)
            sc = dt.columns[col.name]
            v = lit.value
            if isinstance(v, datetime.date):
                v = (v - datetime.date(1970, 1, 1)).days
            if sc.kind == "dict":
                assert op in ("eq", "ne"), "dict compare: eq/ne only"
                v = sc.dictionary.index(v) if v in sc.dictionary else -2
            elif sc.kind == "int" and isinstance(v, float):
                if v != int(v):
                    if op == "eq":
                        never = True
                        continue
                    if op == "ne":
                        continue  # always true for a NULL-free int column
                    if op in ("lt", "le"):
                        v, op = math.floor(v), "le"
                    else:
                        v, op = math.ceil(v), "ge"
                v = int(v)
            preds.append((col.name, op, v))
        return preds, never

    def _plan_items(self, q, dt):
        group_col: Optional[str] = None
        if q.group_by:
            assert len(q.group_by) == 1 and isinstance(q.group_by[0], ast.Column)
            group_col = q.group_by[0].name
        aggs: List[Tuple[str, Optional[str]]] = []
        names: List[str] = []
        for it in q.items:
            e = it.expr
            if isinstance(e, ast.Column) and e.name == group_col:
                names.append(it.alias or e.name)
                aggs.append(("key", None))
                continue
            assert isinstance(e, ast.Func) and e.name in AGG_FUNCS, render(e)
            names.append(it.alias or render(e))
            if e.star or not e.args:
                aggs.append(("count_star", None))
            else:
                assert isinstance(e.args[0], ast.Column)
                aggs.append((e.name, e.args[0].name))
        return group_col, aggs, names

    def _group_k(self, dt, group_col):
        if group_col is None:
            return 1, 0
        gc = dt.columns[group_col]
        if gc.kind == "dict":
            return len(gc.dictionary), 0
        return gc.hi - gc.lo + 1, gc.lo

    def _zero_outputs(self, dt, group_col, aggs):
        """Outputs of a provably-empty query (a fractional equality on an
        int column) without touching the device."""
        k, _ = self._group_k(dt, group_col)
        outs = []
        for kind, cname in aggs:
            if kind == "key":
                continue
            dtype = (np.float64 if cname and
                     dt.columns[cname].kind == "float" else np.int64)
            if kind in ("count_star", "count"):
                outs.append(np.zeros(k, np.int64))
            elif kind == "sum":
                outs.append(np.zeros(k, dtype))
            elif kind == "avg":
                outs.append(np.zeros(k, np.float64))
                outs.append(np.zeros(k, np.int64))
            elif kind in ("min", "max"):
                outs.append(np.zeros(k, dtype))
        outs.append(np.zeros(k, np.int64))  # group_count
        return outs

    # -- execution -----------------------------------------------------------

    def _execute(self, dt, preds, group_col, aggs):
        mesh = self.mesh
        cols_needed = sorted({c for c, _, _ in preds}
                             | {c for _, c in aggs if c}
                             | ({group_col} if group_col else set()))
        arrays = [dt.columns[c].data for c in cols_needed]
        idx = {c: i for i, c in enumerate(cols_needed)}
        nlit = max(len(preds), 1)
        lits_i = np.zeros(nlit, np.int64)
        lits_f = np.zeros(nlit, np.float64)
        use_float = []
        for j, (c, _, v) in enumerate(preds):
            if dt.columns[c].kind == "float":
                lits_f[j] = float(v)
                use_float.append(True)
            else:
                lits_i[j] = int(v)
                use_float.append(False)
        lits_i = jnp.asarray(lits_i)
        lits_f = jnp.asarray(lits_f)
        use_float = tuple(use_float)  # static
        ops = tuple(op for _, op, _ in preds)  # static
        pred_cols = tuple(idx[c] for c, _, _ in preds)
        agg_specs = tuple((k, idx[c] if c else -1) for k, c in aggs)
        if group_col is not None:
            k, key_off = self._group_k(dt, group_col)
            assert k <= self.MAX_DENSE_GROUPS, \
                "distributed group-by: key cardinality too large"
            gidx = idx[group_col]
        else:
            (k, key_off), gidx = (1, 0), -1

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(dist.DATA_AXIS),) * (len(arrays) + 1)
                 + (P(), P()),
                 out_specs=P())
        def step(*args):
            *cols, valid, li_, lf_ = args
            m = valid
            for j, (ci, op) in enumerate(zip(pred_cols, ops)):
                c = cols[ci]
                v = (lf_[j] if use_float[j] else li_[j]).astype(c.dtype)
                cmp = {"eq": c == v, "ne": c != v, "lt": c < v,
                       "le": c <= v, "gt": c > v, "ge": c >= v}[op]
                m = m & cmp
            if gidx >= 0:
                keys = jnp.clip(cols[gidx] - key_off, 0, k - 1).astype(jnp.int32)
            else:
                keys = jnp.zeros(m.shape, jnp.int32)
            outs = []
            for kind, ci in agg_specs:
                if kind == "key":
                    continue
                if kind == "count_star" or kind == "count":
                    part = jnp.zeros((k,), jnp.int64).at[keys].add(
                        m.astype(jnp.int64))
                    outs.append(jax.lax.psum(part, dist.DATA_AXIS))
                elif kind in ("sum", "avg"):
                    c = cols[ci]
                    z = jnp.where(m, c, jnp.zeros_like(c))
                    part = jnp.zeros((k,), c.dtype).at[keys].add(z)
                    outs.append(jax.lax.psum(part, dist.DATA_AXIS))
                    if kind == "avg":
                        cnt = jnp.zeros((k,), jnp.int64).at[keys].add(
                            m.astype(jnp.int64))
                        outs.append(jax.lax.psum(cnt, dist.DATA_AXIS))
                elif kind in ("min", "max"):
                    c = cols[ci]
                    if kind == "min":
                        sent = (jnp.inf if jnp.issubdtype(c.dtype, jnp.floating)
                                else jnp.iinfo(c.dtype).max)
                        z = jnp.where(m, c, sent)
                        part = jnp.full((k,), sent, c.dtype).at[keys].min(z)
                        outs.append(jax.lax.pmin(part, dist.DATA_AXIS))
                    else:
                        sent = (-jnp.inf if jnp.issubdtype(c.dtype, jnp.floating)
                                else jnp.iinfo(c.dtype).min)
                        z = jnp.where(m, c, sent)
                        part = jnp.full((k,), sent, c.dtype).at[keys].max(z)
                        outs.append(jax.lax.pmax(part, dist.DATA_AXIS))
                else:
                    raise NotImplementedError(kind)
            group_count = jnp.zeros((k,), jnp.int64).at[keys].add(
                m.astype(jnp.int64))
            outs.append(jax.lax.psum(group_count, dist.DATA_AXIS))
            return tuple(outs)

        return step(*arrays, dt.valid, lits_i, lits_f)

    def _finalize(self, q, dt, group_col, aggs, names, outs) -> pa.Table:
        outs = [np.asarray(o) for o in outs]
        group_count = outs[-1]
        present = group_count > 0 if group_col is not None \
            else np.ones(1, bool)
        cols: Dict[str, object] = {}
        oi = 0
        for (kind, cname), name in zip(aggs, names):
            if kind == "key":
                gc = dt.columns[group_col]
                keys = np.flatnonzero(present)
                if gc.kind == "dict":
                    cols[name] = pa.array(
                        [gc.dictionary[i] for i in keys])
                else:
                    cols[name] = pa.array(keys + gc.lo, pa.int64())
                continue
            if kind == "avg":
                s, c = outs[oi], outs[oi + 1]
                oi += 2
                with np.errstate(invalid="ignore", divide="ignore"):
                    v = np.where(c > 0, s.astype(np.float64) / c, np.nan)
                cols[name] = pa.array(v[present], pa.float64())
                continue
            v = outs[oi]
            oi += 1
            if kind in ("min", "max"):
                # groups with no rows -> NULL (sentinel scrub)
                vv = v[present].astype(np.float64) \
                    if np.issubdtype(v.dtype, np.floating) else v[present]
                mask = group_count[present] == 0
                cols[name] = pa.array(
                    np.ma.masked_array(vv, mask=mask))
            else:
                cols[name] = pa.array(v[present])
        out = pa.table(cols)
        # ORDER BY / LIMIT on the (small) host-side result
        if q.order_by:
            keys = []
            for o in q.order_by:
                nm = (o.expr.name if isinstance(o.expr, ast.Column)
                      else names[o.expr.value - 1]
                      if isinstance(o.expr, ast.Literal) else None)
                if nm is None or nm not in out.column_names:
                    raise NotImplementedError("distributed ORDER BY target")
                keys.append((nm, "descending" if o.desc else "ascending"))
            out = out.sort_by(keys)
        if q.limit is not None:
            out = out.slice(0, q.limit)
        return out
