"""Query executor: ties the planner, scan loop, and operators together.

Equivalent of the reference's DataFusion session + LiquidParquet
runtime: SQL -> plan -> cached/pushdown scan -> aggregate/join/sort ->
pa.Table.  Single-host; the multi-chip path wraps the same operators in
shard_map (liquid_tpu.parallel).
"""
from __future__ import annotations

import datetime
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from liquid_tpu.sql import ast
from liquid_tpu.sql.eval import Batch, Evaluator
from liquid_tpu.sql.parser import parse_statement
from liquid_tpu.sql.physical import (
    AGG_FUNCS, GroupedAggregator, ScalarAggregator, collect_columns,
    find_aggs, make_slots, render, scan_blocks, substitute,
)
from liquid_tpu.sql.planner import (
    column_hints, plan_scan_filters, split_conjuncts,
)


class QueryExecutor:
    def __init__(self, catalog: Dict[str, object]):
        self.catalog = catalog       # name -> ParquetTable
        self.views: Dict[str, ast.Select] = {}

    # -- statements --------------------------------------------------------

    def execute_sql(self, sql: str) -> pa.Table:
        stmt = parse_statement(sql)
        if stmt[0] == "create_view":
            _, name, query = stmt
            self.views[name] = query
            return pa.table({})
        if stmt[0] == "drop_view":
            self.views.pop(stmt[1], None)
            return pa.table({})
        return self.execute(stmt[1])

    # -- queries -----------------------------------------------------------

    def execute(self, q: ast.Select) -> pa.Table:
        if q.from_ is None:
            batch = Batch({}, 1)
            ev = Evaluator(batch, self._scalar_subquery)
            cols = {}
            for i, it in enumerate(q.items):
                name = it.alias or render(it.expr)
                v = ev.eval(self._rewrite_subqueries(it.expr))
                cols[name] = pa.array([v.as_py()]) if isinstance(v, pa.Scalar) else v
            return pa.table(cols)

        aggs: List[ast.Func] = []
        for it in q.items:
            find_aggs(it.expr, aggs)
        if q.having is not None:
            find_aggs(q.having, aggs)
        for o in q.order_by:
            find_aggs(o.expr, aggs)
        is_agg = bool(aggs) or bool(q.group_by)

        if is_agg:
            result = self._exec_aggregate(q, aggs)
        else:
            result = self._exec_plain(q)
        return result

    # -- relation handling -------------------------------------------------

    def _leaf_relations(self, rel, out: List) -> None:
        if isinstance(rel, ast.Join):
            self._leaf_relations(rel.left, out)
            self._leaf_relations(rel.right, out)
        else:
            out.append(rel)

    def _relation_columns(self, rel) -> List[str]:
        if isinstance(rel, ast.TableRef):
            if rel.name in self.views:
                v = self.views[rel.name]
                return [it.alias or render(it.expr) for it in v.items]
            return list(self.catalog[rel.name].column_names)
        if isinstance(rel, ast.SubqueryRel):
            return [it.alias or render(it.expr) for it in rel.query.items]
        raise NotImplementedError(type(rel).__name__)

    def _scan_relation_batches(self, rel: ast.TableRef, where: Optional[ast.Expr],
                               needed: List[str]):
        """Yield filtered Batches from a base parquet table (pushdown path)."""
        table = self.catalog[rel.name]
        plan = plan_scan_filters(where)
        fake_q = ast.Select()
        hints = {}
        for block in scan_blocks(table, plan, hints, needed):
            cols = {c: block.col(c) for c in needed}
            yield Batch(cols, block.num_selected)

    def _materialize_relation(self, rel, where: Optional[ast.Expr],
                              needed: List[str]) -> pa.Table:
        if isinstance(rel, ast.TableRef) and rel.name in self.catalog:
            table = self.catalog[rel.name]
            needed = [c for c in needed if c in table.column_names] or \
                list(table.column_names[:1])
            parts = [b.to_table()
                     for b in self._scan_relation_batches(rel, where, needed)]
            if not parts:
                return pa.table(
                    {c: pa.array([], table.field(c).type) for c in needed})
            return pa.concat_tables(parts)
        if isinstance(rel, ast.TableRef) and rel.name in self.views:
            t = self.execute(self.views[rel.name])
            return self._filter_table(t, where)
        if isinstance(rel, ast.SubqueryRel):
            t = self.execute(rel.query)
            return self._filter_table(t, where)
        raise KeyError(f"unknown relation {rel}")

    def _filter_table(self, t: pa.Table, where: Optional[ast.Expr]) -> pa.Table:
        if where is None or t.num_rows == 0:
            return t
        batch = Batch.from_table(t)
        m = Evaluator(batch, self._scalar_subquery).arr(where)
        return t.filter(pc.fill_null(m.cast(pa.bool_()), False))

    def _join_source(self, q: ast.Select) -> Tuple[pa.Table, Optional[ast.Expr]]:
        """Execute the FROM tree with per-table predicate pushdown; returns
        (joined table, residual where)."""
        conjuncts = split_conjuncts(self._rewrite_subqueries(q.where)
                                    if q.where is not None else None)
        needed_all: set = set()
        for it in q.items:
            collect_columns(it.expr, needed_all)
        for e in conjuncts:
            collect_columns(e, needed_all)
        for g in q.group_by:
            collect_columns(g, needed_all)
        if q.having is not None:
            collect_columns(q.having, needed_all)
        for o in q.order_by:
            collect_columns(o.expr, needed_all)
        join_cols: set = set()
        self._collect_join_columns(q.from_, join_cols)
        needed_all |= join_cols

        leaves: List = []
        self._leaf_relations(q.from_, leaves)
        # alias -> real-name map for qualified refs is flattened: TPC-H
        # column names are globally unique, so we resolve by membership
        leaf_cols = {id(l): set(self._relation_columns(l)) for l in leaves}

        def owner(cols: set):
            owners = [l for l in leaves if cols <= leaf_cols[id(l)]]
            return owners[0] if len(owners) == 1 else None

        pushed: Dict[int, List[ast.Expr]] = {id(l): [] for l in leaves}
        residual: List[ast.Expr] = []
        for e in conjuncts:
            cols: set = set()
            collect_columns(e, cols)
            o = owner(cols)
            if o is not None and not _has_subquery(e):
                pushed[id(o)].append(e)
            else:
                residual.append(e)

        tables: Dict[int, pa.Table] = {}
        for l in leaves:
            where = _and_all(pushed[id(l)])
            need = sorted((needed_all & leaf_cols[id(l)]))
            tables[id(l)] = self._materialize_relation(l, where, need)

        joined = self._fold_join(q.from_, tables, residual)
        return joined, _and_all(residual)

    def _collect_join_columns(self, rel, out: set) -> None:
        if isinstance(rel, ast.Join):
            if rel.on is not None:
                collect_columns(rel.on, out)
            self._collect_join_columns(rel.left, out)
            self._collect_join_columns(rel.right, out)

    def _fold_join(self, rel, tables: Dict[int, pa.Table],
                   residual: List[ast.Expr]) -> pa.Table:
        if not isinstance(rel, ast.Join):
            return tables[id(rel)]
        left = self._fold_join(rel.left, tables, residual)
        right = self._fold_join(rel.right, tables, residual)
        if rel.kind == "cross" and rel.on is None:
            # cross join: add join key constant
            lk = left.append_column("__x", pa.array(np.zeros(left.num_rows, np.int8)))
            rk = right.append_column("__x", pa.array(np.zeros(right.num_rows, np.int8)))
            out = lk.join(rk, keys=["__x"], join_type="inner")
            return out.drop_columns(["__x"])
        eq_pairs = []
        extra = []
        for c in split_conjuncts(rel.on):
            pair = _equi_pair(c, left.column_names, right.column_names)
            if pair:
                eq_pairs.append(pair)
            else:
                extra.append(c)
        if not eq_pairs:
            raise NotImplementedError("non-equi join without keys")
        lkeys = [p[0] for p in eq_pairs]
        rkeys = [p[1] for p in eq_pairs]
        jt = {"inner": "inner", "left": "left outer", "right": "right outer",
              "full": "full outer"}[rel.kind]
        out = left.join(right, keys=lkeys, right_keys=rkeys, join_type=jt)
        # arrow drops right-side keys; re-add under their own names if needed
        for lk, rk in eq_pairs:
            if rk not in out.column_names and lk in out.column_names:
                out = out.append_column(rk, out.column(lk))
        if extra:
            # ON residuals: for outer joins this is approximate (applied
            # post-join); inner joins are exact
            residual.extend(extra) if rel.kind == "inner" else None
            if rel.kind != "inner":
                batch = Batch.from_table(out)
                m = Evaluator(batch).arr(_and_all(extra))
                out = out.filter(pc.fill_null(m.cast(pa.bool_()), False))
        return out

    # -- aggregate pipeline ------------------------------------------------

    def _resolve_group_exprs(self, q: ast.Select) -> List[Tuple[ast.Expr, str]]:
        alias_map = {it.alias: it.expr for it in q.items if it.alias}
        out = []
        for g in q.group_by:
            if isinstance(g, ast.Literal) and isinstance(g.value, int):
                it = q.items[g.value - 1]
                out.append((it.expr, it.alias or render(it.expr)))
                continue
            if isinstance(g, ast.Column) and g.name in alias_map:
                out.append((alias_map[g.name], g.name))
                continue
            name = None
            for it in q.items:
                if it.expr == g:
                    name = it.alias or render(it.expr)
                    break
            out.append((g, name or render(g)))
        return out

    def _exec_aggregate(self, q: ast.Select, aggs: List[ast.Func]) -> pa.Table:
        slots = make_slots(aggs)
        group = self._resolve_group_exprs(q)
        key_names = [nm for _, nm in group]
        input_types: Dict[str, pa.DataType] = {}

        # columns needed to evaluate keys + agg inputs
        needed: set = set()
        for ge, _ in group:
            collect_columns(ge, needed)
        for s in slots:
            if s.input is not None:
                collect_columns(s.input, needed)

        single = self._single_parquet_source(q)
        agg = (GroupedAggregator(key_names, slots) if group
               else ScalarAggregator(slots))

        def update_from(batch: Batch):
            ev = Evaluator(batch, self._scalar_subquery)
            inputs: Dict[str, pa.Array] = {}
            for s in slots:
                if s.input is not None:
                    arr = ev.arr(self._rewrite_subqueries(s.input))
                    inputs[s.name] = arr
                    input_types.setdefault(s.name, arr.type)
            if group:
                keys = [ev.arr(self._rewrite_subqueries(ge)) for ge, _ in group]
                agg.update(keys, inputs, batch.length)
            else:
                agg.update(inputs, batch.length)

        if single is not None:
            rel, where = single
            hints = column_hints(q)
            table = self.catalog[rel.name]
            plan = plan_scan_filters(self._rewrite_subqueries(where)
                                     if where is not None else None)
            need = sorted(c for c in needed if c in table.column_names)
            pure_count = (not need and not group
                          and all(s.kind == "count_star" for s in slots)
                          and not plan.pushdown and not plan.residual)
            if pure_count:
                # COUNT(*) with no filters: metadata only (ref: DataFusion
                # statistics-based count)
                agg.update({}, table.num_rows)
            else:
                for block in scan_blocks(table, plan, hints, need):
                    cols = {c: block.col(c, hints.get(c)) for c in need}
                    update_from(Batch(cols, block.num_selected))
        else:
            joined, _resid = self._join_source(q)
            if joined.num_rows:
                update_from(Batch.from_table(joined))
            elif group:
                pass  # empty: no groups
            else:
                agg.update({s.name: pa.array([], input_types.get(s.name) or pa.int64())
                            for s in slots if s.input is not None}, 0)

        final = (agg.finalize() if group
                 else agg.finalize(input_types))

        # post-projection over keys + slots
        mapping: Dict[ast.Expr, str] = {}
        for (ge, nm) in group:
            mapping[ge] = nm
        for s in slots:
            mapping[s.func] = s.name
        alias_cols = {}
        for it in q.items:
            if it.alias:
                alias_cols[ast.Column(it.alias)] = None  # resolved below
        batch = Batch.from_table(final)
        ev = Evaluator(batch, self._scalar_subquery)
        out_cols: Dict[str, pa.Array] = {}
        item_names: List[str] = []
        for it in q.items:
            name = it.alias or render(it.expr)
            sub = substitute(it.expr, mapping)
            arr = ev.eval(sub)
            if isinstance(arr, pa.Scalar):
                arr = pa.repeat(arr, batch.length)
            out_cols[name] = arr
            item_names.append(name)
        result = pa.table(out_cols)

        # HAVING
        if q.having is not None:
            hmap = dict(mapping)
            for it in q.items:
                if it.alias:
                    hmap[ast.Column(it.alias)] = it.alias if it.alias in result.column_names else None
            h = substitute(q.having, mapping)
            hb = Batch.from_table(_extend(result, final))
            m = Evaluator(hb, self._scalar_subquery).arr(h)
            keep = pc.fill_null(m.cast(pa.bool_()), False)
            result = result.filter(keep)
            final = final.filter(keep)

        # ORDER BY / LIMIT over the combined (items + internal) namespace
        result = self._order_limit(q, result, final, mapping)
        return result

    def _order_limit(self, q: ast.Select, result: pa.Table,
                     internal: Optional[pa.Table], mapping) -> pa.Table:
        if q.order_by and result.num_rows:
            ns = _extend(result, internal) if internal is not None else result
            batch = Batch.from_table(ns)
            alias_map = {ast.Column(it.alias): it.alias for it in q.items
                         if it.alias and it.alias in ns.column_names}
            sort_arrays = []
            directions = []
            for o in q.order_by:
                e = o.expr
                if isinstance(e, ast.Literal) and isinstance(e.value, int):
                    name = result.column_names[e.value - 1]
                    arr = result.column(name).combine_chunks()
                else:
                    sub = substitute(e, {**(mapping or {}), **alias_map})
                    arr = Evaluator(batch, self._scalar_subquery).arr(sub)
                sort_arrays.append(arr)
                directions.append("descending" if o.desc else "ascending")
            st = pa.table({f"__s{i}": a for i, a in enumerate(sort_arrays)})
            null_placement = "at_start" if q.order_by[0].desc else "at_end"
            if q.order_by[0].nulls_first is not None:
                null_placement = ("at_start" if q.order_by[0].nulls_first
                                  else "at_end")
            idx = pc.sort_indices(
                st, sort_keys=[(f"__s{i}", d) for i, d in enumerate(directions)],
                null_placement=null_placement)
            result = result.take(idx)
        if q.offset:
            result = result.slice(q.offset)
        if q.limit is not None:
            result = result.slice(0, q.limit)
        return result

    # -- plain (non-aggregate) pipeline ------------------------------------

    def _exec_plain(self, q: ast.Select) -> pa.Table:
        single = self._single_parquet_source(q)
        star = any(isinstance(it.expr, ast.Star) for it in q.items)
        # ORDER BY expressions not among the projected items must ride
        # through the pipeline as internal columns
        item_exprs = {it.expr for it in q.items}
        alias_names = {it.alias for it in q.items if it.alias}
        extras: List[Tuple[str, ast.Expr]] = []
        mapping: Dict[ast.Expr, str] = {}
        for i, o in enumerate(q.order_by):
            e = o.expr
            if isinstance(e, ast.Literal) and isinstance(e.value, int):
                continue
            if isinstance(e, ast.Column) and e.name in alias_names:
                continue
            if e in item_exprs:
                continue
            nm = f"__ob{i}"
            extras.append((nm, e))
            mapping[e] = nm
        if single is not None:
            rel, where = single
            table = self.catalog[rel.name]
            hints = column_hints(q)
            plan = plan_scan_filters(self._rewrite_subqueries(where)
                                     if where is not None else None)
            needed: set = set()
            for it in q.items:
                collect_columns(it.expr, needed)
            for o in q.order_by:
                collect_columns(o.expr, needed)
            if star:
                needed |= set(table.column_names)
            need = sorted(c for c in needed if c in table.column_names)
            parts: List[pa.Table] = []
            iparts: List[pa.Table] = []
            total = 0
            early_limit = (q.limit is not None and not q.order_by
                           and not q.distinct)
            for block in scan_blocks(table, plan, hints, need):
                cols = {c: block.col(c, hints.get(c)) for c in need}
                batch = Batch(cols, block.num_selected)
                parts.append(self._project(q, batch, table, star))
                if extras:
                    iparts.append(self._project_extras(extras, batch))
                total += block.num_selected
                if early_limit and total >= q.limit + (q.offset or 0):
                    break
            if parts:
                out = pa.concat_tables(parts)
                internal = pa.concat_tables(iparts) if extras else None
            else:
                empty = Batch({c: pa.array([], table.field(c).type)
                               for c in need}, 0)
                out = self._project(q, empty, table, star)
                internal = self._project_extras(extras, empty) if extras else None
        else:
            joined, _ = self._join_source(q)
            batch = Batch.from_table(joined)
            out = self._project(q, batch, None, star)
            internal = self._project_extras(extras, batch) if extras else None
        if q.distinct:
            out = out.group_by(out.column_names, use_threads=False).aggregate([])
            internal = None
        out = self._order_limit(q, out, internal, mapping)
        return out

    def _project_extras(self, extras, batch: Batch) -> pa.Table:
        ev = Evaluator(batch, self._scalar_subquery)
        cols = {}
        for nm, e in extras:
            v = ev.eval(self._rewrite_subqueries(e))
            if isinstance(v, pa.Scalar):
                v = pa.repeat(v, batch.length)
            cols[nm] = v
        return pa.table(cols)

    def _project(self, q: ast.Select, batch: Batch, table, star: bool) -> pa.Table:
        cols: Dict[str, pa.Array] = {}
        ev = Evaluator(batch, self._scalar_subquery)
        for it in q.items:
            if isinstance(it.expr, ast.Star):
                names = (table.column_names if table is not None
                         else list(batch.columns))
                for n in names:
                    cols[n] = ev.eval(ast.Column(n))
                continue
            name = it.alias or render(it.expr)
            v = ev.eval(self._rewrite_subqueries(it.expr))
            if isinstance(v, pa.Scalar):
                v = pa.repeat(v, batch.length)
            cols[name] = v
        return pa.table(cols)

    # -- helpers -----------------------------------------------------------

    def _single_parquet_source(self, q: ast.Select):
        rel = q.from_
        if isinstance(rel, ast.TableRef) and rel.name in self.catalog:
            if q.where is None or not _has_subquery(q.where):
                return rel, q.where
            return rel, q.where  # subqueries rewritten before planning
        return None

    def _scalar_subquery(self, sub: ast.Select):
        t = self.execute(sub)
        assert t.num_columns == 1 and t.num_rows <= 1, "scalar subquery shape"
        if t.num_rows == 0:
            return pa.scalar(None)
        return t.column(0)[0]

    def _rewrite_subqueries(self, e: ast.Expr) -> ast.Expr:
        """Uncorrelated IN-subqueries -> literal InList; scalar subqueries
        stay (handled by the evaluator via _scalar_subquery)."""
        if isinstance(e, ast.InSubquery):
            cols: set = set()
            collect_columns(e.query.where, cols) if e.query.where else None
            t = self.execute(e.query)
            vals = tuple(ast.Literal(v) for v in t.column(0).to_pylist()
                         if v is not None)
            return ast.InList(self._rewrite_subqueries(e.operand), vals, e.negated)
        if isinstance(e, ast.Binary):
            return ast.Binary(e.op, self._rewrite_subqueries(e.left),
                              self._rewrite_subqueries(e.right))
        if isinstance(e, ast.Unary):
            return ast.Unary(e.op, self._rewrite_subqueries(e.operand))
        if isinstance(e, ast.Between):
            return ast.Between(self._rewrite_subqueries(e.operand),
                               self._rewrite_subqueries(e.low),
                               self._rewrite_subqueries(e.high), e.negated)
        return e


def _and_all(exprs: List[ast.Expr]) -> Optional[ast.Expr]:
    out = None
    for e in exprs:
        out = e if out is None else ast.Binary("and", out, e)
    return out


def _has_subquery(e) -> bool:
    if isinstance(e, (ast.Subquery, ast.InSubquery, ast.Exists)):
        return True
    for f_ in getattr(e, "__dataclass_fields__", {}):
        v = getattr(e, f_)
        if isinstance(v, ast.Expr) and _has_subquery(v):
            return True
        if isinstance(v, (list, tuple)):
            for x in v:
                if isinstance(x, ast.Expr) and _has_subquery(x):
                    return True
    return False


def _equi_pair(e: ast.Expr, left_cols, right_cols):
    if isinstance(e, ast.Binary) and e.op == "=" \
            and isinstance(e.left, ast.Column) and isinstance(e.right, ast.Column):
        a, b = e.left.name, e.right.name
        if a in left_cols and b in right_cols:
            return (a, b)
        if b in left_cols and a in right_cols:
            return (b, a)
    return None


def _extend(result: pa.Table, internal: pa.Table) -> pa.Table:
    cols = {n: result.column(n) for n in result.column_names}
    for n in internal.column_names:
        if n not in cols:
            cols[n] = internal.column(n)
    return pa.table(cols)
