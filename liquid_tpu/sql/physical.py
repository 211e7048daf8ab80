"""Physical execution: scan -> filter -> aggregate/join/sort -> result.

This is the liquid-tpu equivalent of the reference's runtime reader +
DataFusion operators:

- The scan/filter loop mirrors `LiquidCacheReader` (liquid-cache
  `reader/runtime/liquid_cache_reader.rs:118-161`): per 8192-row batch,
  chain predicates over the selection via cache-side ENCODED evaluation
  (build_predicate_filter :296-339), fall back to materialize+evaluate
  for residual expressions, then materialize only projected columns
  under the surviving selection (read_from_cache :341-391).
- Multi-column OR groups combine per-column encoded masks with Kleene
  OR (ref cache/mod.rs:111-150).
- Aggregation runs as per-batch partial aggregates merged at the end
  (count->sum, sum->sum, min->min, max->max, avg->(sum,count)).  The
  partial step routes through `sql/device_agg.py` (device hash/dense-key
  aggregation in JAX) when key/agg types are supported; this module's
  `GroupedAggregator` (pyarrow group_by) is the typed fallback for
  irregular inputs (nested types, exotic aggregates).
- Equi-joins route through `sql/device_join.py` (device sort-merge
  build/probe); non-equi residuals evaluate post-join.
"""
from __future__ import annotations

import datetime
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from liquid_tpu.arrays.base import BLOCK_ROWS, Predicate
from liquid_tpu.ops import mask as mops
from liquid_tpu.sql import ast
from liquid_tpu.sql.eval import Batch, Evaluator
from liquid_tpu.sql.planner import (
    ScanPlan, column_hints, plan_scan_filters, split_conjuncts,
)

AGG_FUNCS = {"count", "sum", "avg", "min", "max", "median",
             "approx_distinct", "stddev", "var"}


def render(e: ast.Expr) -> str:
    """DataFusion-style display name for an unaliased expression."""
    if isinstance(e, ast.Column):
        return e.name
    if isinstance(e, ast.Literal):
        v = e.value
        return f"'{v}'" if isinstance(v, str) else str(v)
    if isinstance(e, ast.Func):
        if e.star:
            return f"{e.name}(*)"
        inner = ",".join(render(a) for a in e.args)
        d = "DISTINCT " if e.distinct else ""
        return f"{e.name}({d}{inner})"
    if isinstance(e, ast.Binary):
        return f"{render(e.left)} {e.op} {render(e.right)}"
    if isinstance(e, ast.Unary):
        return f"{e.op} {render(e.operand)}"
    if isinstance(e, ast.Extract):
        return f"extract({e.field} from {render(e.operand)})"
    if isinstance(e, ast.Cast):
        return f"cast({render(e.operand)} as {e.type_name})"
    if isinstance(e, ast.WindowFunc):
        return f"{render(e.func)} over (...)"
    return type(e).__name__.lower()


def find_aggs(e: ast.Expr, out: List[ast.Func]) -> None:
    if isinstance(e, ast.WindowFunc):
        return  # window args are evaluated by the window stage, not here
    if isinstance(e, ast.Func) and e.name in AGG_FUNCS:
        if e not in out:
            out.append(e)
        return
    for f_ in getattr(e, "__dataclass_fields__", {}):
        v = getattr(e, f_)
        if isinstance(v, ast.Expr):
            find_aggs(v, out)
        elif isinstance(v, (list, tuple)):
            for x in v:
                if isinstance(x, ast.Expr):
                    find_aggs(x, out)
                elif isinstance(x, tuple):
                    for y in x:
                        if isinstance(y, ast.Expr):
                            find_aggs(y, out)


def substitute(e: ast.Expr, mapping: Dict[ast.Expr, str]) -> ast.Expr:
    """Replace sub-expressions (structural equality) with column refs."""
    if e in mapping:
        return ast.Column(mapping[e])
    if isinstance(e, ast.Binary):
        return ast.Binary(e.op, substitute(e.left, mapping),
                          substitute(e.right, mapping))
    if isinstance(e, ast.Unary):
        return ast.Unary(e.op, substitute(e.operand, mapping))
    if isinstance(e, ast.Case):
        whens = tuple((substitute(c, mapping), substitute(v, mapping))
                      for c, v in e.whens)
        return ast.Case(whens,
                        substitute(e.else_, mapping) if e.else_ else None,
                        substitute(e.operand, mapping) if e.operand else None)
    if isinstance(e, ast.Cast):
        return ast.Cast(substitute(e.operand, mapping), e.type_name)
    if isinstance(e, ast.Extract):
        return ast.Extract(e.field, substitute(e.operand, mapping))
    if isinstance(e, ast.Func):
        return ast.Func(e.name, tuple(substitute(a, mapping) for a in e.args),
                        e.distinct, e.star)
    if isinstance(e, ast.Between):
        return ast.Between(substitute(e.operand, mapping),
                           substitute(e.low, mapping),
                           substitute(e.high, mapping), e.negated)
    if isinstance(e, ast.InList):
        return ast.InList(substitute(e.operand, mapping),
                          tuple(substitute(i, mapping) for i in e.items),
                          e.negated)
    if isinstance(e, ast.IsNull):
        return ast.IsNull(substitute(e.operand, mapping), e.negated)
    return e


def collect_columns(e, out: set) -> None:
    if isinstance(e, ast.Column):
        out.add(e.name)
        return
    for f_ in getattr(e, "__dataclass_fields__", {}):
        v = getattr(e, f_)
        if isinstance(v, ast.Expr):
            collect_columns(v, out)
        elif isinstance(v, (list, tuple)):
            for x in v:
                if isinstance(x, ast.Expr):
                    collect_columns(x, out)
                elif isinstance(x, tuple):
                    for y in x:
                        if isinstance(y, ast.Expr):
                            collect_columns(y, out)


# -- the scan/filter hot loop ---------------------------------------------

@dataclass
class ScanBlock:
    table: object          # ParquetTable
    rg: int
    batch: int
    length: int
    sel_idx: np.ndarray    # int64 indices of surviving rows within the block
    _cols: dict

    def col(self, name: str, hint=None) -> pa.Array:
        """Materialize column under the selection."""
        arr = self._cols.get(name)
        if arr is None:
            arr = self.table.get_batch(self.rg, name, self.batch, hint)
            self._cols[name] = arr
        return arr.take(pa.array(self.sel_idx, pa.int64()))

    def full_col(self, name: str, hint=None) -> pa.Array:
        arr = self._cols.get(name)
        if arr is None:
            arr = self.table.get_batch(self.rg, name, self.batch, hint)
            self._cols[name] = arr
        return arr

    @property
    def num_selected(self) -> int:
        return len(self.sel_idx)


def _pred_to_expr_mask(block_cols: Batch, conj: ast.Expr) -> pa.Array:
    out = Evaluator(block_cols).arr(conj)
    return out


def scan_blocks(table, plan: ScanPlan, hints: Dict[str, object],
                needed_cols: List[str], observer=None, dynamic=None):
    """Yield ScanBlocks with selections applied.

    `dynamic`, when given, is a zero-arg callable returning the current
    [(column, Predicate)] runtime filters (TopK thresholds, join-key
    bounds -- ref DynamicFilterPhysicalExpr unwrapping, liquid-cache
    liquid_expr.rs:58 + dynamic-filter file pruning opener.rs:185).  It
    is consulted at every ROW GROUP start, so filters that tighten
    mid-query prune later row groups; application is best-effort
    (encoded-eval only, no fallback) since dynamic filters are always
    conservative refinements of the static plan.

    Mirrors LiquidCacheReader::poll_next (encoded predicate chain, then
    residual expressions on materialized data, early-exit on empty) --
    but BATCHED per row group: each pushdown predicate evaluates over
    every live batch in one vmapped dispatch, and batch emptiness is
    checked with ONE host fetch per group (the reference loops per batch
    because CPU dispatch is free; per-block dispatch and per-block count
    syncs dominated the scan on TPU, PERF_NOTES.md).
    """
    import jax.numpy as jnp

    # Selections are DUAL-representation: numpy uint32 words while every
    # contributing mask is host-origin (arrow-mode pyarrow fallbacks,
    # residual expressions), promoted to device words the moment an
    # encoded predicate mask (device) joins in.  Arrow mode therefore
    # never touches the device in this loop -- through the axon tunnel a
    # single count fetch costs more than a whole 1M-row host popcount.
    def _sel_and(a, b):
        if isinstance(a, np.ndarray) and isinstance(b, np.ndarray):
            return a & b
        return jnp.asarray(a) & jnp.asarray(b)

    def _sel_counts(live_sels):
        if all(isinstance(s, np.ndarray) for s in live_sels):
            return np.array([mops.count_host(s) for s in live_sels])
        return np.asarray(mops.count_many(
            jnp.stack([jnp.asarray(s) for s in live_sels])))

    rgs = table.prune_row_groups(plan.stats_preds)
    for rg in rgs:
        n_b = table.num_batches(rg)
        lengths = [table.batch_length(rg, b) for b in range(n_b)]
        sels = [mops.all_set_host(BLOCK_ROWS, lengths[b])
                for b in range(n_b)]
        alive = [True] * n_b
        deferred: List[List] = [[] for _ in range(n_b)]  # arrow-fallback exprs
        may = getattr(table, "batch_may_match", None)
        many = getattr(table, "eval_predicate_many", None)

        for group in plan.pushdown:
            # batch-level zone-map pruning (the page-index equivalent,
            # ref opener.rs:314-327): the whole OR group must be provably
            # empty for the batch to be skipped
            if may is not None:
                for b in range(n_b):
                    if alive[b] and all(not may(rg, col, b, pred)
                                        for col, pred in group.alternatives):
                        alive[b] = False
                        table.zone_prunes += 1
            live = [b for b in range(n_b) if alive[b]]
            if not live:
                break
            combined: Dict[int, object] = {}
            fallback = False
            for col, pred in group.alternatives:
                if many is not None:
                    masks = many(rg, col, pred, hints.get(col), batches=live)
                else:
                    masks = {b: table.eval_predicate(rg, col, b, pred,
                                                     hints.get(col))
                             for b in live}
                if any(masks.get(b) is None for b in live):
                    fallback = True
                    break
                for b in live:
                    bm = masks[b]
                    combined[b] = (bm if b not in combined
                                   else combined[b].or_kleene(bm))
            if fallback:
                for b in live:
                    deferred[b].append(group.source)
                continue
            for b in live:
                sels[b] = _sel_and(sels[b], combined[b].to_selection())
            # ONE count fetch for the whole group across live batches
            counts = _sel_counts([sels[b] for b in live])
            for j, b in enumerate(live):
                if counts[j] == 0:
                    alive[b] = False

        # runtime filters (consulted per row group: later groups see
        # thresholds tightened by earlier ones)
        for col, pred in (dynamic() if dynamic is not None else ()):
            live = [b for b in range(n_b) if alive[b]]
            if not live:
                break
            if may is not None:
                for b in live:
                    if not may(rg, col, b, pred):
                        alive[b] = False
                        _bump_dynamic(table)
                live = [b for b in range(n_b) if alive[b]]
                if not live:
                    break
            if many is None:
                continue
            masks = many(rg, col, pred, hints.get(col), batches=live)
            if any(masks.get(b) is None for b in live):
                continue  # best-effort: encoded path only
            for b in live:
                sels[b] = _sel_and(sels[b], masks[b].to_selection())
            counts = _sel_counts([sels[b] for b in live])
            for j, b in enumerate(live):
                if counts[j] == 0:
                    alive[b] = False
                    _bump_dynamic(table)

        survivors = [b for b in range(n_b) if alive[b]]
        if not survivors:
            continue
        # batched materialization: decode every surviving batch of every
        # column the projection/residuals touch in one dispatch per column
        mats: Dict[int, dict] = {b: {} for b in survivors}
        gb = getattr(table, "get_batches", None)
        if gb is not None:
            prefetch: set = set(needed_cols) & set(table.column_names)
            for b in survivors:
                for conj in deferred[b] + plan.residual:
                    collect_columns(conj, prefetch)
            from liquid_tpu.cache.expressions import VariantGet
            for c in sorted(prefetch & set(table.column_names)):
                if isinstance(hints.get(c), VariantGet):
                    continue  # variant struct shortcut stays per-block
                for b, arr in gb(rg, c, hints.get(c),
                                 batches=survivors).items():
                    mats[b][c] = arr

        # residual expressions per block (device mask ops only -- dispatch
        # is async and cheap; host syncs are the ~28ms cost, PERF_NOTES.md)
        touched = {b: bool(plan.pushdown) for b in survivors}
        final: List[Tuple[int, object]] = []
        for b in survivors:
            length = lengths[b]
            sel = sels[b]
            cols_cache = mats.setdefault(b, {})
            for conj in deferred[b] + plan.residual:
                cols = set()
                collect_columns(conj, cols)
                # decorrelated lookups reference inner-table / __outer
                # names that are not scan columns: fetch only real ones
                cols &= set(table.column_names)
                batch = Batch({c: _full(table, rg, b, c, cols_cache, hints)
                               for c in cols}, length)
                m = _pred_to_expr_mask(batch, conj)
                sel = _sel_and(sel, _bool_to_packed(m, length))
                touched[b] = True
            final.append((b, sel))
        # untouched full-scan selections are known: no device fetch at
        # all; host-resident (numpy) selections unpack on the host
        fetched = [b for b, s in final
                   if touched[b] and not isinstance(s, np.ndarray)]
        if fetched:
            stacked = jnp.stack([s for b, s in final if b in set(fetched)])
            # ONE host transfer for the whole row group's selections
            allbits = np.asarray(mops.unpack_many(stacked))
            row = {b: j for j, b in enumerate(fetched)}
        for b, s in final:
            if not touched[b]:
                idx = np.arange(lengths[b], dtype=np.int64)
            elif isinstance(s, np.ndarray):
                idx = np.flatnonzero(
                    mops.unpack_bits_host(s)[:lengths[b]])
                if idx.size == 0:
                    continue
            else:
                idx = np.flatnonzero(allbits[row[b]][:lengths[b]])
                if idx.size == 0:
                    continue
            yield ScanBlock(table, rg, b, lengths[b], idx, mats.get(b, {}))


class TopKTracker:
    """Running ORDER BY col LIMIT k threshold (ref: the reference's
    TopK dynamic filter flowing through DynamicFilterPhysicalExpr).

    Once k non-null key values are seen, `current()` publishes a
    NON-STRICT threshold predicate (ties kept; secondary sort keys
    unaffected): rows strictly worse than the current k-th best can
    never reach the top k, so later blocks/row groups prune them
    before materialization."""

    def __init__(self, col: str, desc: bool, k: int, typ: pa.DataType):
        self.col = col
        self.desc = desc
        self.k = k
        self._typ = typ
        self._vals = np.empty(0, np.float64 if pa.types.is_floating(typ)
                              else np.int64)

    def update(self, arr: pa.Array) -> None:
        arr = _dedict(arr)
        if arr.null_count:
            arr = arr.drop_null()
        if len(arr) == 0:
            return
        if pa.types.is_date32(arr.type):
            v = np.asarray(arr.cast(pa.int32())).astype(np.int64)
        elif pa.types.is_floating(arr.type):
            v = np.asarray(arr.cast(pa.float64()))
            # NaN sorts greatest (pyarrow).  DESC: NaN rows occupy top-k
            # slots, so track them as +inf (the emitted predicate is
            # keep_nan so later NaN rows survive it).  ASC: a threshold
            # only exists once k non-NaN values were seen, so NaN can
            # never reach the top-k -- drop them (min/partition would
            # otherwise propagate NaN into the threshold).
            if self.desc:
                v = np.where(np.isnan(v), np.inf, v)
            else:
                v = v[~np.isnan(v)]
                if v.size == 0:
                    return
        else:
            v = np.asarray(arr.cast(pa.int64(), safe=False))
        self._vals = np.concatenate([self._vals, v.astype(self._vals.dtype)])
        if len(self._vals) > 4 * self.k:
            self._shrink()

    def _shrink(self) -> None:
        k = self.k
        if self.desc:
            part = np.partition(self._vals, len(self._vals) - k)
            self._vals = part[len(self._vals) - k:]
        else:
            self._vals = np.partition(self._vals, k - 1)[:k]

    def current(self):
        if len(self._vals) < self.k:
            return ()
        self._shrink()
        if self.desc:
            thresh = self._vals.min()
            op = "gt_eq"
        else:
            thresh = self._vals.max()
            op = "lt_eq"
        if self._vals.dtype == np.float64:
            # DESC float: NaN rows must survive the threshold (they sort
            # greatest); an all-NaN top-k clamps to the largest finite
            # f64 (over-keeps only exact-max rows, which is sound)
            lit = float(np.finfo(np.float64).max) if np.isinf(thresh) \
                else float(thresh)
            return ((self.col, Predicate(op, lit, keep_nan=self.desc)),)
        return ((self.col, Predicate(op, int(thresh))),)


def _bump_dynamic(table) -> None:
    """Count a batch skipped by a runtime filter (observer metric; the
    reference exposes pruning counters via plan metrics)."""
    cache = getattr(table, "cache", None)
    if cache is not None:
        cache.observer.stats.bump("dynamic_filter_prunes")


def _full(table, rg, b, col, cache_dict, hints):
    arr = cache_dict.get(col)
    if arr is None:
        arr = table.get_batch(rg, col, b, hints.get(col))
        cache_dict[col] = arr
    return arr


def _bool_to_packed(m: pa.Array, length: int) -> np.ndarray:
    """pyarrow bool mask -> packed uint32 words, HOST-side: the mask
    originates on the host, so packing must not pay a device round-trip
    (scan_blocks promotes to device only when an encoded mask joins)."""
    vals = np.zeros(BLOCK_ROWS, dtype=bool)
    mm = np.asarray(m.fill_null(False).cast(pa.bool_()))[:length]
    vals[:length] = mm
    return mops.pack_bools_host(vals)


# -- aggregate execution ---------------------------------------------------

@dataclass
class AggSlot:
    func: ast.Func
    name: str          # output column name
    kind: str          # count_star | count | count_distinct | sum | avg | min | max
    input: Optional[ast.Expr]


def make_slots(aggs: List[ast.Func]) -> List[AggSlot]:
    slots = []
    for i, f in enumerate(aggs):
        nm = f"__agg{i}"
        if f.name == "count" and (f.star or not f.args):
            slots.append(AggSlot(f, nm, "count_star", None))
        elif f.name == "count" and f.distinct:
            slots.append(AggSlot(f, nm, "count_distinct", f.args[0]))
        elif f.name == "count":
            slots.append(AggSlot(f, nm, "count", f.args[0]))
        elif f.name in ("sum", "avg", "min", "max"):
            assert not f.distinct, f"{f.name} DISTINCT unsupported"
            slots.append(AggSlot(f, nm, f.name, f.args[0]))
        elif f.name in ("stddev", "var"):
            # Welford-free two-pass form: (count, sum, sum of squares)
            # merged across partials; sample variance (DataFusion default)
            slots.append(AggSlot(f, nm, f.name, f.args[0]))
        elif f.name == "median":
            slots.append(AggSlot(f, nm, "median", f.args[0]))
        elif f.name == "approx_distinct":
            # exact distinct count (a strict refinement of the reference's
            # HLL-based approx_distinct)
            slots.append(AggSlot(f, nm, "count_distinct", f.args[0]))
        else:
            raise NotImplementedError(f"aggregate {f.name}")
    return slots


class GroupedAggregator:
    """Per-batch partial aggregation + final merge."""

    def __init__(self, key_names: List[str], slots: List[AggSlot]):
        self.key_names = key_names
        self.slots = slots
        self._partials: List[pa.Table] = []
        self._distinct_partials: Dict[str, List[pa.Table]] = {
            s.name: [] for s in slots if s.kind == "count_distinct"}
        self._median_partials: Dict[str, List[pa.Table]] = {
            s.name: [] for s in slots if s.kind == "median"}
        self._key_types: Optional[List[pa.DataType]] = None
        self._input_types: Dict[str, pa.DataType] = {}

    def update(self, keys: List[pa.Array], inputs: Dict[str, pa.Array],
               n_rows: int) -> None:
        cols = {}
        for nm, arr in zip(self.key_names, keys):
            cols[nm] = _dedict(arr)
        if self._key_types is None:
            self._key_types = [cols[nm].type for nm in self.key_names]
        aggs = []
        for s in self.slots:
            if s.kind == "count_star":
                cols[s.name] = pa.array(np.ones(n_rows, np.int64))
                aggs.append((s.name, "sum"))
            elif s.kind == "count":
                cols[s.name] = inputs[s.name]
                aggs.append((s.name, "count"))
            elif s.kind == "sum":
                cols[s.name] = _sum_cast(inputs[s.name])
                aggs.append((s.name, "sum"))
            elif s.kind == "avg":
                # DataFusion AvgAccumulator sums in f64 for every input type
                cols[s.name + "__s"] = _f64(inputs[s.name])
                cols[s.name + "__c"] = inputs[s.name]
                aggs.append((s.name + "__s", "sum"))
                aggs.append((s.name + "__c", "count"))
            elif s.kind in ("min", "max"):
                cols[s.name] = _dedict(inputs[s.name])
                aggs.append((s.name, s.kind))
            elif s.kind in ("stddev", "var"):
                x = _f64(inputs[s.name])
                cols[s.name + "__s"] = x
                cols[s.name + "__q"] = pc.multiply(x, x)
                cols[s.name + "__c"] = inputs[s.name]
                aggs.append((s.name + "__s", "sum"))
                aggs.append((s.name + "__q", "sum"))
                aggs.append((s.name + "__c", "count"))
            if s.input is not None and s.name in inputs:
                self._input_types.setdefault(s.name, _dedict(inputs[s.name]).type)
        if aggs:
            t = pa.table(cols)
            part = t.group_by(self.key_names, use_threads=False).aggregate(aggs)
            # pyarrow suffixes aggregate outputs with _<fn>: rename back
            suffix_map = {f"{c}_{fn}": c for c, fn in aggs}
            part = part.rename_columns(
                [suffix_map.get(n, n) for n in part.column_names])
            self._partials.append(part)
        elif self.key_names and not self._distinct_only_slots():
            t = pa.table(cols)
            part = t.group_by(self.key_names, use_threads=False).aggregate([])
            self._partials.append(part)
        # distinct streams: per-batch dedup of (keys, value)
        for s in self.slots:
            if s.kind == "median":
                mcols = {nm: _dedict(a) for nm, a in zip(self.key_names, keys)}
                mcols["__v"] = _f64(inputs[s.name])
                self._median_partials[s.name].append(pa.table(mcols))
                continue
            if s.kind != "count_distinct":
                continue
            dcols = {nm: _dedict(a) for nm, a in zip(self.key_names, keys)}
            dcols["__v"] = _dedict(inputs[s.name])
            dt = pa.table(dcols)
            dpart = dt.group_by(self.key_names + ["__v"],
                                use_threads=False).aggregate([])
            self._distinct_partials[s.name].append(dpart)

    def _distinct_only_slots(self) -> bool:
        return bool(self.slots) and all(
            s.kind in ("count_distinct", "median") for s in self.slots)

    def _empty_typed(self) -> pa.Table:
        """Zero-row result with the right schema (no block ever matched)."""
        cols = {}
        kts = self._key_types or [pa.null()] * len(self.key_names)
        for nm, t in zip(self.key_names, kts):
            cols[nm] = pa.array([], t)
        for s in self.slots:
            if s.kind in ("count_star", "count", "count_distinct"):
                cols[s.name] = pa.array([], pa.int64())
            elif s.kind == "avg":
                cols[s.name + "__s"] = pa.array([], pa.float64())
                cols[s.name + "__c"] = pa.array([], pa.int64())
            elif s.kind in ("stddev", "var"):
                cols[s.name + "__s"] = pa.array([], pa.float64())
                cols[s.name + "__q"] = pa.array([], pa.float64())
                cols[s.name + "__c"] = pa.array([], pa.int64())
            elif s.kind == "median":
                cols[s.name] = pa.array([], pa.float64())
            else:
                t = self._input_types.get(s.name, pa.null())
                cols[s.name] = pa.array([], _sum_type(t) if s.kind == "sum" else t)
        return pa.table(cols)

    def finalize(self) -> pa.Table:
        merge_aggs = []
        rename = {}
        for s in self.slots:
            if s.kind == "count_star" or s.kind == "count":
                merge_aggs.append((s.name, "sum"))
                rename[s.name + "_sum"] = s.name
            elif s.kind == "sum":
                merge_aggs.append((s.name, "sum"))
                rename[s.name + "_sum"] = s.name
            elif s.kind == "avg":
                merge_aggs.append((s.name + "__s", "sum"))
                merge_aggs.append((s.name + "__c", "sum"))
                rename[s.name + "__s_sum"] = s.name + "__s"
                rename[s.name + "__c_sum"] = s.name + "__c"
            elif s.kind in ("min", "max"):
                merge_aggs.append((s.name, s.kind))
                rename[f"{s.name}_{s.kind}"] = s.name
            elif s.kind in ("stddev", "var"):
                for suf in ("__s", "__q", "__c"):
                    merge_aggs.append((s.name + suf, "sum"))
                    rename[s.name + suf + "_sum"] = s.name + suf
        if self._partials:
            merged = pa.concat_tables(
                self._partials, promote_options="permissive")
            if merge_aggs:
                out = merged.group_by(self.key_names,
                                      use_threads=False).aggregate(merge_aggs)
            else:
                out = merged.group_by(self.key_names,
                                      use_threads=False).aggregate([])
            out = out.rename_columns(
                [rename.get(n, n) for n in out.column_names])
        elif not self._distinct_only_slots():
            out = self._empty_typed()
        else:
            out = None
        # distinct finals
        for s in self.slots:
            if s.kind != "count_distinct":
                continue
            parts = self._distinct_partials[s.name]
            if not parts and out is None:
                out = self._empty_typed()
            if parts:
                dmerged = pa.concat_tables(parts, promote_options="permissive")
                dfin = dmerged.group_by(
                    self.key_names, use_threads=False).aggregate(
                        [("__v", "count_distinct")])
                dfin = dfin.rename_columns(
                    [s.name if n == "__v_count_distinct" else n
                     for n in dfin.column_names])
            else:
                dfin = None
            if out is None:
                out = dfin
            elif dfin is not None:
                if self.key_names:
                    out = out.join(dfin, keys=self.key_names,
                                   join_type="full outer")
                else:
                    for n in dfin.column_names:
                        out = out.append_column(n, dfin.column(n))
        for s in self.slots:
            if s.kind != "median":
                continue
            parts = self._median_partials[s.name]
            if not parts and out is None:
                out = self._empty_typed()
            if parts:
                import pandas as pd
                mdf = pa.concat_tables(
                    parts, promote_options="permissive").to_pandas()
                if self.key_names:
                    mg = (mdf.groupby(self.key_names, dropna=False)["__v"]
                          .median().reset_index())
                    mg = mg.rename(columns={"__v": s.name})
                    mfin = pa.Table.from_pandas(mg, preserve_index=False)
                else:
                    mfin = pa.table({s.name: pa.array(
                        [float(mdf["__v"].median())], pa.float64())})
            else:
                mfin = None
            if out is None:
                out = mfin
            elif mfin is not None:
                if self.key_names:
                    out = out.join(mfin, keys=self.key_names,
                                   join_type="full outer")
                else:
                    for nn in mfin.column_names:
                        out = out.append_column(nn, mfin.column(nn))
        if out is None:
            out = pa.table({})
        # avg finalization: f64 sum/count
        cols = {}
        for n in out.column_names:
            cols[n] = out.column(n).combine_chunks()
        for s in self.slots:
            if s.kind == "avg":
                ssum = cols.pop(s.name + "__s")
                scnt = cols.pop(s.name + "__c")
                cols[s.name] = pc.divide(ssum.cast(pa.float64()),
                                         scnt.cast(pa.float64()))
            elif s.kind in ("stddev", "var"):
                ss = cols.pop(s.name + "__s").cast(pa.float64())
                qq = cols.pop(s.name + "__q").cast(pa.float64())
                cc = cols.pop(s.name + "__c").cast(pa.float64())
                # sample variance: (sumsq - sum^2/n) / (n - 1)
                num = pc.subtract(qq, pc.divide(pc.multiply(ss, ss), cc))
                den = pc.subtract(cc, pa.scalar(1.0))
                var = pc.if_else(pc.greater(cc, 1.0),
                                 pc.divide(num, den),
                                 pa.scalar(None, pa.float64()))
                var = pc.max_element_wise(var, pa.scalar(0.0))  # fp jitter
                cols[s.name] = (pc.sqrt(var) if s.kind == "stddev" else var)
            elif s.kind in ("count", "count_star", "count_distinct"):
                if s.name in cols:
                    cols[s.name] = pc.fill_null(
                        cols[s.name].cast(pa.int64()), 0)
        return pa.table(cols) if cols else pa.table({})


class ScalarAggregator:
    """No GROUP BY: global accumulators (DataFusion semantics: one row)."""

    def __init__(self, slots: List[AggSlot]):
        self.slots = slots
        self.state: Dict[str, object] = {}
        for s in slots:
            if s.kind in ("count_star", "count"):
                self.state[s.name] = 0
            elif s.kind == "count_distinct":
                self.state[s.name] = set()
            elif s.kind == "sum":
                self.state[s.name] = None
            elif s.kind == "avg":
                self.state[s.name] = [None, 0]
            elif s.kind in ("stddev", "var"):
                self.state[s.name] = [0.0, 0.0, 0]  # sum, sumsq, count
            elif s.kind == "median":
                self.state[s.name] = []
            else:
                self.state[s.name] = None

    def update(self, inputs: Dict[str, pa.Array], n_rows: int) -> None:
        for s in self.slots:
            if s.kind == "count_star":
                self.state[s.name] += n_rows
                continue
            arr = inputs[s.name]
            if s.kind == "count":
                self.state[s.name] += len(arr) - arr.null_count
            elif s.kind == "count_distinct":
                self.state[s.name].update(
                    x for x in _dedict(arr).to_pylist() if x is not None)
            elif s.kind == "sum":
                v = pc.sum(_sum_cast(arr)).as_py()
                if v is not None:
                    cur = self.state[s.name]
                    self.state[s.name] = v if cur is None else cur + v
            elif s.kind == "avg":
                v = pc.sum(_f64(arr)).as_py()
                c = len(arr) - arr.null_count
                st = self.state[s.name]
                if v is not None:
                    st[0] = v if st[0] is None else st[0] + v
                st[1] += c
            elif s.kind == "min":
                v = pc.min(_dedict(arr)).as_py()
                if v is not None:
                    cur = self.state[s.name]
                    self.state[s.name] = v if cur is None else min(cur, v)
            elif s.kind == "max":
                v = pc.max(_dedict(arr)).as_py()
                if v is not None:
                    cur = self.state[s.name]
                    self.state[s.name] = v if cur is None else max(cur, v)
            elif s.kind in ("stddev", "var"):
                x = _f64(arr)
                st = self.state[s.name]
                v = pc.sum(x).as_py()
                q = pc.sum(pc.multiply(x, x)).as_py()
                st[0] += v or 0.0
                st[1] += q or 0.0
                st[2] += len(arr) - arr.null_count
            elif s.kind == "median":
                self.state[s.name].extend(
                    x for x in _f64(arr).to_pylist() if x is not None)

    def finalize(self, input_types: Dict[str, pa.DataType]) -> pa.Table:
        cols = {}
        for s in self.slots:
            st = self.state[s.name]
            if s.kind in ("count_star", "count"):
                cols[s.name] = pa.array([st], pa.int64())
            elif s.kind == "count_distinct":
                cols[s.name] = pa.array([len(st)], pa.int64())
            elif s.kind == "avg":
                v = (None if st[0] is None or st[1] == 0
                     else float(st[0]) / float(st[1]))
                cols[s.name] = pa.array([v], pa.float64())
            elif s.kind == "sum":
                t = input_types.get(s.name)
                t = _sum_type(t) if t is not None else None
                cols[s.name] = pa.array([st], t)
            elif s.kind in ("stddev", "var"):
                ssum, ssq, n = st
                if n <= 1:
                    v = None
                else:
                    var = max((ssq - ssum * ssum / n) / (n - 1), 0.0)
                    v = var ** 0.5 if s.kind == "stddev" else var
                cols[s.name] = pa.array([v], pa.float64())
            elif s.kind == "median":
                import numpy as _np
                v = float(_np.median(st)) if st else None
                cols[s.name] = pa.array([v], pa.float64())
            else:
                t = input_types.get(s.name)
                cols[s.name] = pa.array([st], t)
        return pa.table(cols)


def _dedict(arr: pa.Array) -> pa.Array:
    if pa.types.is_dictionary(arr.type):
        return arr.cast(arr.type.value_type)
    return arr


def _sum_type(t: pa.DataType) -> pa.DataType:
    if pa.types.is_floating(t):
        return pa.float64()
    if pa.types.is_unsigned_integer(t):
        return pa.uint64()
    if pa.types.is_integer(t):
        return pa.int64()
    return t


def _sum_cast(arr: pa.Array) -> pa.Array:
    arr = _dedict(arr)
    return arr.cast(_sum_type(arr.type))


def _f64(arr: pa.Array) -> pa.Array:
    # unchecked: int64 -> f64 loses low bits by design (DataFusion casts
    # each input value to f64 before accumulating)
    return pc.cast(_dedict(arr), pa.float64(), safe=False)
