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
from liquid_tpu.sql.device_join import try_device_join
from liquid_tpu.sql.eval import Batch, Evaluator
from liquid_tpu.sql.parser import parse_statement
from liquid_tpu.sql.physical import (
    AGG_FUNCS, GroupedAggregator, ScalarAggregator, collect_columns,
    find_aggs, make_slots, render, scan_blocks, substitute,
)
from liquid_tpu.sql.planner import (
    column_hints, plan_scan_filters, split_conjuncts,
)
from liquid_tpu.sql.qualify import Qualifier, map_expr
from liquid_tpu.utils.tracing import TRACER


class QueryExecutor:
    def __init__(self, catalog: Dict[str, object]):
        self.catalog = catalog       # name -> ParquetTable
        self.views: Dict[str, ast.Select] = {}
        self._scalar_cache: Dict[int, object] = {}

    # -- statements --------------------------------------------------------

    def _base_columns(self, name: str):
        if name in self.views:
            v = self.views[name]
            items = (v.members[0].items if isinstance(v, ast.SetOp)
                     else v.items)
            return [it.alias or render(it.expr) for it in items]
        if name in self.catalog:
            return list(self.catalog[name].column_names)
        return None

    def _qualify(self, q: ast.Select) -> ast.Select:
        return Qualifier(self._base_columns).qualify(q)

    def execute_sql(self, sql: str) -> pa.Table:
        with TRACER.span("sql.execute", sql=sql[:120]):
            return self._execute_sql_inner(sql)

    def _try_fused_distinct(self, table, plan, hints, group, key_names,
                            slots, rew_keys, rew_inputs, q=None):
        from liquid_tpu.sql import fused_agg
        if not any(s.kind == "count_distinct" for s in slots):
            return None

        with TRACER.span("sql.fused_distinct"):
            # fully-on-device two-level reduction first (only the final
            # per-key rows transfer); host-fold two-level otherwise
            try:
                r = fused_agg.distinct_fused_device(
                    table, plan, hints, group, key_names, slots,
                    rew_keys, rew_inputs, q)
            except Exception:
                import os
                if os.environ.get("LIQUID_FUSED_STRICT"):
                    raise
                r = None
            if r is not None:
                return r

            def run_inner(g2, kn2, s2, rk2, ri2):
                return self._try_fused(table, plan, hints, g2, kn2, s2,
                                       rk2, ri2)

            return fused_agg.distinct_two_level(
                slots, group, key_names, rew_keys, rew_inputs,
                run_inner)

    @staticmethod
    def _try_fused(table, plan, hints, group, key_names, slots,
                   rew_keys, rew_inputs, q=None, eprobes=()):
        """Whole-query compiled scan->filter->aggregate on the resident
        device encodings; None when the shape is unsupported (classic
        scan path takes over)."""
        from liquid_tpu.sql.fused_agg import try_fused_aggregate
        with TRACER.span("sql.fused_aggregate"):
            return try_fused_aggregate(table, plan, hints, group,
                                       key_names, slots, rew_keys,
                                       rew_inputs, q, eprobes)

    def _plan_exist_probes(self, where, fact_table):
        """Split `where` into (remaining, probe_specs): each spec fuses
        one EXISTS / NOT EXISTS / [NOT] IN <subquery> conjunct as a
        device existence probe (fused_star.build_exist_probe).  Returns
        (where, ()) when nothing applies; specs carry their conjunct's
        render for the plan-cache key."""
        from liquid_tpu.sql.fused_star import build_exist_probe
        if where is None:
            return where, ()
        conjs = split_conjuncts(where)
        specs, rest = [], []
        for e in conjs:
            s = self._exist_spec(e, fact_table)
            if s is None:
                rest.append(e)
                continue
            inner_t, key_col, local, mm_inner, mode, fcol, fmm = s
            probe = build_exist_probe(
                inner_t, key_col, local, mm_inner,
                require_nonnull_key=(mode == "anti_nn"))
            if probe is None:
                rest.append(e)
                continue
            specs.append({"mode": mode, "col": fcol, "mmcol": fmm,
                          "probe": probe, "key": render(e)})
        if not specs:
            return where, ()
        return _and_all(rest), tuple(specs)

    def _exist_spec(self, e, fact_table):
        """-> (inner_table, inner_key, local_where, inner_mm_col, mode,
        fact_col, fact_mm_col) or None."""
        fact_cols = set(fact_table.column_names)

        def split_inner(sub, negated, operand=None):
            if not isinstance(sub, ast.Select) or sub.ctes \
                    or sub.group_by or sub.having is not None \
                    or sub.distinct or sub.limit is not None:
                return None
            if not isinstance(sub.from_, ast.TableRef) \
                    or sub.from_.name not in self.catalog:
                return None
            inner_t = self.catalog[sub.from_.name]
            pfx = sub.from_.prefix

            def unpfx(e):
                # an aliased inner relation (lineitem l2) is pure
                # namespacing here: strip its prefix so classification
                # sees base column names; outer refs stay prefixed
                if e is None or not pfx:
                    return e
                return map_expr(
                    e, lambda x: ast.Column(x.name[len(pfx):])
                    if isinstance(x, ast.Column)
                    and x.name.startswith(pfx) else None)
            inner_cols = set(inner_t.column_names)
            key_col = None
            fcol = None
            if operand is not None:  # IN <subquery>
                if not (isinstance(operand, ast.Column)
                        and operand.name in fact_cols
                        and operand.name not in inner_cols):
                    return None
                if len(sub.items) != 1 or not isinstance(
                        unpfx(sub.items[0].expr), ast.Column):
                    return None
                key_col = unpfx(sub.items[0].expr).name
                if key_col not in inner_cols:
                    return None
                fcol = operand.name
            local, mm = [], None
            for c in split_conjuncts(unpfx(sub.where)):
                if _has_subquery(c):
                    return None
                cols: set = set()
                collect_columns(c, cols)
                if cols <= inner_cols:
                    local.append(c)
                    continue
                if not isinstance(c, ast.Binary):
                    return None
                l, r = c.left, c.right
                if not (isinstance(l, ast.Column)
                        and isinstance(r, ast.Column)):
                    return None
                if l.name in fact_cols and r.name in inner_cols:
                    fc, ic = l.name, r.name
                elif r.name in fact_cols and l.name in inner_cols:
                    fc, ic = r.name, l.name
                else:
                    return None
                if fc in inner_cols or ic in fact_cols:
                    return None  # ambiguous ownership
                if c.op == "=" and key_col is None:
                    key_col, fcol = ic, fc
                elif c.op in ("<>", "!=") and mm is None:
                    mm = (ic, fc)
                else:
                    return None
            if key_col is None:
                return None
            mode = ("anti_nn" if (operand is not None and negated)
                    else "anti" if negated else "semi")
            return (inner_t, key_col, _and_all(local),
                    mm[0] if mm else None, mode, fcol,
                    mm[1] if mm else None)

        if isinstance(e, ast.Exists):
            return split_inner(e.query, e.negated)
        if isinstance(e, ast.Unary) and e.op == "not" \
                and isinstance(e.operand, ast.Exists):
            return split_inner(e.operand.query,
                               not e.operand.negated)
        if isinstance(e, ast.InSubquery):
            return split_inner(e.query, e.negated, operand=e.operand)
        return None

    def _execute_sql_inner(self, sql: str) -> pa.Table:
        stmt = parse_statement(sql)
        if stmt[0] == "create_view":
            _, name, query = stmt
            self.views[name] = query
            return pa.table({})
        if stmt[0] == "drop_view":
            self.views.pop(stmt[1], None)
            return pa.table({})
        q = stmt[1]
        if isinstance(q, ast.SetOp):
            return self._execute_setop(q)
        if q.ctes:
            # CTEs are statement-scoped views (evaluated on use; a CTE may
            # reference earlier CTEs, and may SHADOW a stored view, which
            # must be restored afterwards)
            saved = {}
            try:
                for name, sub in q.ctes:
                    saved[name] = self.views.get(name)
                    self.views[name] = sub
                return self.execute(self._qualify(q))
            finally:
                for name, prior in saved.items():
                    if prior is None:
                        self.views.pop(name, None)
                    else:
                        self.views[name] = prior
        return self.execute(self._qualify(q))

    def _execute_setop(self, u: ast.SetOp,
                       qualified: bool = False) -> pa.Table:
        """UNION / INTERSECT / EXCEPT [ALL] chain.  INTERSECT binds
        tighter (SQL standard); the rest folds left-associatively:
        `a UNION b UNION ALL c` dedups {a, b} then appends c.  Columns
        align positionally (first member's names win, SQL semantics)."""
        parts = []
        saved = {}
        try:
            for name, sub in u.members[0].ctes:
                saved[name] = self.views.get(name)
                self.views[name] = sub
            for m in u.members:
                m.ctes = []
                parts.append(self.execute(
                    m if qualified else self._qualify(m)))
        finally:
            for name, prior in saved.items():
                if prior is None:
                    self.views.pop(name, None)
                else:
                    self.views[name] = prior
        names = parts[0].column_names
        parts = [p.rename_columns(names) for p in parts]
        ops = list(u.ops) if u.ops else ["union"] * len(u.all_flags)
        alls = list(u.all_flags)
        # INTERSECT precedence pass
        i = 0
        while i < len(ops):
            if ops[i] == "intersect":
                parts[i:i + 2] = [_setop_apply(parts[i], parts[i + 1],
                                               "intersect", alls[i], names)]
                ops.pop(i)
                alls.pop(i)
            else:
                i += 1
        out = parts[0]
        for part, op, is_all in zip(parts[1:], ops, alls):
            out = _setop_apply(out, part, op, is_all, names)
        if u.order_by:
            keys = []
            for o in u.order_by:
                if isinstance(o.expr, ast.Literal) and isinstance(
                        o.expr.value, int):
                    nm = names[o.expr.value - 1]
                elif isinstance(o.expr, ast.Column):
                    nm = o.expr.name
                else:
                    raise NotImplementedError(
                        "UNION ORDER BY supports columns/positions")
                keys.append((nm, "descending" if o.desc else "ascending"))
            from liquid_tpu.sql.device_sort import try_sort_indices
            # pyarrow sort_by semantics (nulls at_end for both
            # directions), which this path always had
            idx = try_sort_indices(
                [out.column(nm).combine_chunks() for nm, _ in keys],
                [(d == "descending", False) for _, d in keys])
            if idx is not None:
                out = out.take(pa.array(idx, pa.int64()))
            else:
                out = out.sort_by(keys)
        if u.offset:
            out = out.slice(u.offset)
        if u.limit is not None:
            out = out.slice(0, u.limit)
        return out

    # -- queries -----------------------------------------------------------

    def execute(self, q) -> pa.Table:
        if isinstance(q, ast.SetOp):
            # nested chain (derived table / CTE / view body), members
            # already qualified by the enclosing pass
            return self._execute_setop(q, qualified=True)
        if q.from_ is None:
            batch = Batch({}, 1)
            ev = Evaluator(batch, self._scalar_subquery)
            cols = {}
            for i, it in enumerate(q.items):
                name = it.alias or render(it.expr)
                v = ev.eval(self._rewrite_subqueries(it.expr))
                cols[name] = pa.array([v.as_py()]) if isinstance(v, pa.Scalar) else v
            return pa.table(cols)

        from liquid_tpu.sql.window import find_windows
        wfs: List[ast.WindowFunc] = []
        for it in q.items:
            find_windows(it.expr, wfs)
        for o in q.order_by:
            find_windows(o.expr, wfs)
        if wfs:
            return self._exec_window(q, wfs)

        q = _inline_derived(q)

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

    # -- window pipeline -----------------------------------------------------
    # Ref: DataFusion's WindowAggExec, which the reference gets for free;
    # windows evaluate AFTER grouping/HAVING, before DISTINCT/ORDER BY.

    def _exec_window(self, q: ast.Select,
                     wfs: List[ast.WindowFunc]) -> pa.Table:
        from liquid_tpu.sql.window import compute_window

        # 1. register every base-level expression the window stage needs:
        #    window args/partition/order keys, plus the residual's bare
        #    columns and aggregate calls -- these become the items of an
        #    inner (window-free) Select that the normal pipelines execute
        base: Dict[ast.Expr, str] = {}

        def reg(e: ast.Expr) -> str:
            if isinstance(e, ast.Column):
                base.setdefault(e, e.name)
                return e.name
            if e not in base:
                base[e] = f"__b{len(base)}"
            return base[e]

        from liquid_tpu.sql.window import _const
        comp = []
        for wf in wfs:
            argn = [reg(a) for a in wf.func.args if _const(a) is None]
            # constant args (ntile(4), lag(x, 2, -1)) are consumed by
            # compute_window from the AST, not projected
            partn = [reg(p) for p in wf.partition_by]
            ordn = [reg(o) for o in wf.order_exprs]
            comp.append((argn, partn, ordn))

        wmap: Dict[ast.Expr, str] = {wf: f"__w{j}" for j, wf in enumerate(wfs)}

        # group keys register first so residuals substitute whole group
        # expressions (a residual may only reference group keys,
        # aggregates, and window results in an aggregate query)
        alias_map = {it.alias: it.expr for it in q.items if it.alias}
        resolved_group: List[ast.Expr] = []
        for g in q.group_by:
            if isinstance(g, ast.Literal) and isinstance(g.value, int):
                resolved_group.append(q.items[g.value - 1].expr)
            elif isinstance(g, ast.Column) and g.name in alias_map:
                resolved_group.append(alias_map[g.name])
            else:
                resolved_group.append(g)
        gmap = {g: reg(g) for g in resolved_group
                if not isinstance(g, ast.GroupingSpec)}

        def reg_residual(e: ast.Expr, skip_aliases: bool) -> ast.Expr:
            def walk(x):
                if isinstance(x, ast.Column):
                    if skip_aliases and x.name in alias_map:
                        return x  # ORDER BY alias: resolves in the outer
                    if not x.name.startswith("__w"):
                        reg(x)
                    return x
                if isinstance(x, ast.Func) and (x.name in AGG_FUNCS
                                                or x.name == "grouping"):
                    # grouping() folds per grouping set inside the inner
                    # aggregation, like an aggregate result
                    return ast.Column(reg(x))
                return None
            return map_expr(e, walk)

        def lower(e: ast.Expr, skip_aliases: bool = False) -> ast.Expr:
            return reg_residual(substitute(substitute(e, wmap), gmap),
                                skip_aliases)

        residuals = [lower(it.expr) for it in q.items]
        order_resid = [lower(o.expr, skip_aliases=True) for o in q.order_by]

        # 2. inner query: same FROM/WHERE/GROUP BY/HAVING, no windows
        inner = ast.Select()
        inner.items = [ast.SelectItem(e, nm) for e, nm in base.items()]
        inner.from_ = q.from_
        inner.where = q.where
        inner.group_by = resolved_group
        inner.having = q.having
        t = self.execute(inner)

        # 3. window columns over the inner result
        cols = {n: t.column(n) for n in t.column_names}
        for j, (wf, (argn, partn, ordn)) in enumerate(zip(wfs, comp)):
            cols[f"__w{j}"] = compute_window(t, wf, argn, partn, ordn)
        ns = pa.table(cols)

        # 4. outer projection + DISTINCT / ORDER BY / LIMIT
        batch = Batch.from_table(ns)
        ev = Evaluator(batch, self._scalar_subquery)
        out_cols: Dict[str, pa.Array] = {}
        for it, res in zip(q.items, residuals):
            name = it.alias or render(it.expr)
            v = ev.eval(self._rewrite_subqueries(res))
            if isinstance(v, pa.Scalar):
                v = pa.repeat(v, batch.length)
            out_cols[name] = v
        result = pa.table(out_cols)
        internal = None
        mapping: Dict[ast.Expr, str] = {}
        if q.order_by:
            icols = {}
            for i, (o, res) in enumerate(zip(q.order_by, order_resid)):
                if isinstance(o.expr, ast.Literal) or (
                        isinstance(o.expr, ast.Column)
                        and o.expr.name in alias_map):
                    continue
                nm = f"__ob{i}"
                try:
                    v = ev.eval(self._rewrite_subqueries(res))
                except KeyError:
                    # expression over item ALIASES (e.g. TPC-DS q36's
                    # `case when lochierarchy = 0 ...`): resolves in
                    # _order_limit over the projected result instead
                    continue
                if isinstance(v, pa.Scalar):
                    v = pa.repeat(v, batch.length)
                icols[nm] = v
                mapping[o.expr] = nm
            internal = pa.table(icols) if icols else None
        if q.distinct:
            result = result.group_by(
                result.column_names, use_threads=False).aggregate([])
            internal = None
        return self._order_limit(q, result, internal, mapping)

    # -- relation handling -------------------------------------------------

    def _leaf_relations(self, rel, out: List) -> None:
        if isinstance(rel, ast.Join):
            self._leaf_relations(rel.left, out)
            self._leaf_relations(rel.right, out)
        else:
            out.append(rel)

    def _relation_columns(self, rel) -> List[str]:
        if isinstance(rel, ast.TableRef):
            cols = self._base_columns(rel.name)
            if cols is None:
                raise KeyError(f"unknown relation {rel.name}")
            if rel.prefix:
                return [rel.prefix + c for c in cols]
            return cols
        if isinstance(rel, ast.SubqueryRel):
            # shares the qualifier's logic so `select *` derived tables
            # report their REAL columns (predicate pushdown + join-edge
            # ownership in _join_source depend on this)
            from liquid_tpu.sql.qualify import Qualifier
            cols = Qualifier(self._base_columns)._output_columns(rel.query)
            if rel.prefix:
                return [rel.prefix + c for c in cols]
            return cols
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
            pfx = rel.prefix or ""
            if pfx:
                # strip the alias prefix for the physical scan, re-apply after
                strip = {pfx + c: c for c in table.column_names}

                def unfix(e):
                    if isinstance(e, ast.Column) and e.name in strip:
                        return ast.Column(strip[e.name])
                    return None
                where = map_expr(where, unfix) if where is not None else None
                needed = [strip.get(c, c) for c in needed]
            needed = [c for c in needed if c in table.column_names] or \
                list(table.column_names[:1])
            parts = [b.to_table()
                     for b in self._scan_relation_batches(rel, where, needed)]
            if not parts:
                out = pa.table(
                    {c: pa.array([], table.field(c).type) for c in needed})
            else:
                out = pa.concat_tables(parts)
            if pfx:
                out = out.rename_columns([pfx + c for c in out.column_names])
            return out
        if isinstance(rel, ast.TableRef) and rel.name in self.views:
            t = self.execute(self._qualify(self.views[rel.name]))
            if rel.prefix:
                t = t.rename_columns([rel.prefix + c for c in t.column_names])
            return self._filter_table(t, where)
        if isinstance(rel, ast.SubqueryRel):
            t = self.execute(rel.query)
            if rel.prefix:
                t = t.rename_columns(
                    [rel.prefix + c for c in t.column_names])
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
        conjuncts = split_conjuncts(
            self._rewrite_subqueries(q.where, self._scope_cols(q))
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
        # alias -> real-name map for qualified refs is flattened by the
        # qualification pass (aliased tables carry a column prefix), so we
        # resolve ownership by membership
        leaf_cols = {id(l): set(self._relation_columns(l)) for l in leaves}

        def owner(cols: set):
            owners = [l for l in leaves if cols <= leaf_cols[id(l)]]
            return owners[0] if len(owners) == 1 else None

        # leaves on the null-producing side of an outer join must not take
        # WHERE pushdown (WHERE applies post null-extension); their ON
        # filters, conversely, MUST be applied pre-join
        protected: set = set()
        self._collect_protected(q.from_, protected)

        pushed: Dict[int, List[ast.Expr]] = {id(l): [] for l in leaves}
        residual: List[ast.Expr] = []
        for e in conjuncts:
            cols: set = set()
            collect_columns(e, cols)
            o = owner(cols)
            if o is not None and id(o) not in protected \
                    and not _has_subquery(e):
                pushed[id(o)].append(e)
            else:
                residual.append(e)

        from_ = self._push_on_filters(q.from_, pushed, leaf_cols, owner)

        # dynamic join-key bounds (ref dynamic-filter file pruning,
        # opener.rs:185): after materializing one side of an INNER
        # equi-join edge, publish its key min/max as synthetic range
        # conjuncts on the still-pending side's scan.  Conservative:
        # rows outside the range can never find a match; unmatched-row
        # preservation (outer joins) disables the edge.
        edges: List[Tuple[str, str]] = []
        for e in conjuncts:
            eq = (isinstance(e, ast.Binary) and e.op == "="
                  and isinstance(e.left, ast.Column)
                  and isinstance(e.right, ast.Column))
            if eq:
                edges.append((e.left.name, e.right.name))
        self._collect_inner_on_edges(q.from_, edges)
        bounds: Dict[int, List[ast.Expr]] = {id(l): [] for l in leaves}
        done: set = set()

        tables: Dict[int, pa.Table] = {}
        for l in leaves:
            where = _and_all(pushed[id(l)] + bounds[id(l)])
            need = sorted((needed_all & leaf_cols[id(l)]))
            t = self._materialize_relation(l, where, need)
            tables[id(l)] = t
            done.add(id(l))
            if id(l) in protected:
                continue
            for c1, c2 in edges:
                for a, b in ((c1, c2), (c2, c1)):
                    la, lb = owner({a}), owner({b})
                    if la is not l or lb is None or id(lb) in done \
                            or id(lb) in protected:
                        continue
                    for conj in _key_bounds(t, a, b):
                        bounds[id(lb)].append(conj)

        joined = self._fold_join(from_, tables, residual)
        # remaining residual (cross-leaf non-equi predicates, decorrelated
        # lookups) evaluates on the joined table
        joined = self._filter_table(joined, _and_all(residual))
        return joined, None

    def _collect_inner_on_edges(self, rel, out: List) -> None:
        """Equality edges from INNER join ON conditions (outer joins
        excluded: their null-extended rows must survive)."""
        if not isinstance(rel, ast.Join):
            return
        self._collect_inner_on_edges(rel.left, out)
        self._collect_inner_on_edges(rel.right, out)
        if rel.kind != "inner" or rel.on is None:
            return
        for c in split_conjuncts(rel.on):
            if (isinstance(c, ast.Binary) and c.op == "="
                    and isinstance(c.left, ast.Column)
                    and isinstance(c.right, ast.Column)):
                out.append((c.left.name, c.right.name))

    def _collect_protected(self, rel, out: set, under_outer: bool = False
                           ) -> None:
        """Mark leaves under the null-producing side of an outer join."""
        if isinstance(rel, ast.Join):
            self._collect_protected(
                rel.left, out, under_outer or rel.kind in ("right", "full"))
            self._collect_protected(
                rel.right, out, under_outer or rel.kind in ("left", "full"))
        elif rel is not None and under_outer:
            out.add(id(rel))

    def _push_on_filters(self, rel, pushed, leaf_cols, owner):
        """Move single-leaf non-equi ON conjuncts of outer joins into the
        leaf's pre-join filter (they apply BEFORE null extension, unlike
        WHERE; e.g. TPC-H q13's `o_comment not like ...` join filter)."""
        if not isinstance(rel, ast.Join):
            return rel
        left = self._push_on_filters(rel.left, pushed, leaf_cols, owner)
        right = self._push_on_filters(rel.right, pushed, leaf_cols, owner)
        if rel.on is None:
            return ast.Join(left, right, rel.kind, None)
        keep: List[ast.Expr] = []
        for c in split_conjuncts(rel.on):
            cols: set = set()
            collect_columns(c, cols)
            o = owner(cols)
            is_equi = (isinstance(c, ast.Binary) and c.op == "="
                       and isinstance(c.left, ast.Column)
                       and isinstance(c.right, ast.Column))
            if o is not None and not is_equi and not _has_subquery(c):
                pushed[id(o)].append(c)
            else:
                keep.append(c)
        return ast.Join(left, right, rel.kind, _and_all(keep))

    def _collect_cross(self, rel, tables, residual, comps: List) -> None:
        """Flatten a maximal cross-join subtree into component tables."""
        if isinstance(rel, ast.Join) and rel.kind == "cross" and rel.on is None:
            self._collect_cross(rel.left, tables, residual, comps)
            self._collect_cross(rel.right, tables, residual, comps)
        else:
            comps.append(self._fold_join(rel, tables, residual))

    def _join_components(self, comps: List[pa.Table],
                         residual: List[ast.Expr]) -> pa.Table:
        """Greedy equi-join ordering over cross-join components: start from
        the first component, repeatedly join the component connected by a
        WHERE equality (consumed as join keys); unconnected components
        fall back to a true cross product (rare)."""
        def equi_cols(e):
            if isinstance(e, ast.Binary) and e.op == "=" \
                    and isinstance(e.left, ast.Column) \
                    and isinstance(e.right, ast.Column):
                return e.left.name, e.right.name
            return None

        remaining = list(comps)
        cur = remaining.pop(0)
        while remaining:
            best = None  # (comp_idx, [(lkey, rkey)], [conjunct])
            for i, comp in enumerate(remaining):
                pairs, used = [], []
                for e in residual:
                    ec = equi_cols(e)
                    if ec is None:
                        continue
                    a, b = ec
                    if a in cur.column_names and b in comp.column_names:
                        pairs.append((a, b))
                        used.append(e)
                    elif b in cur.column_names and a in comp.column_names:
                        pairs.append((b, a))
                        used.append(e)
                if pairs and (best is None or len(pairs) > len(best[1])):
                    best = (i, pairs, used)
            if best is None:
                comp = remaining.pop(
                    min(range(len(remaining)),
                        key=lambda i: remaining[i].num_rows))
                lk = cur.append_column(
                    "__x", pa.array(np.zeros(cur.num_rows, np.int8)))
                rk = comp.append_column(
                    "__x", pa.array(np.zeros(comp.num_rows, np.int8)))
                cur = lk.join(rk, keys=["__x"],
                              join_type="inner").drop_columns(["__x"])
                continue
            i, pairs, used = best
            comp = remaining.pop(i)
            for e in used:
                residual.remove(e)
            lkeys = [p[0] for p in pairs]
            rkeys = [p[1] for p in pairs]
            cur = _fix_null_keys(cur, lkeys, comp, rkeys)
            comp = _fix_null_keys(comp, rkeys, cur, lkeys)
            dev = try_device_join(cur, comp, lkeys, rkeys, "inner")
            if dev is not None:
                # device join already carries both sides' key columns
                cur = dev
                continue
            cur = cur.join(comp, keys=lkeys, right_keys=rkeys,
                           join_type="inner")
            # arrow drops right-side key columns; later equalities or
            # projections may still reference them
            for lk_, rk_ in pairs:
                if rk_ not in cur.column_names and lk_ in cur.column_names:
                    cur = cur.append_column(rk_, cur.column(lk_))
        return cur

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
        if rel.kind == "cross" and rel.on is None:
            # comma-join subtree: flatten into components and order the
            # joins greedily by equality connectivity, consuming WHERE
            # equality conjuncts as join keys (ref: DataFusion's
            # cross-join-to-inner-join rewrite; without this q2/q9 would
            # build astronomically large cross products)
            comps: List[pa.Table] = []
            self._collect_cross(rel, tables, residual, comps)
            return self._join_components(comps, residual)
        left = self._fold_join(rel.left, tables, residual)
        right = self._fold_join(rel.right, tables, residual)
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
        left = _fix_null_keys(left, lkeys, right, rkeys)
        right = _fix_null_keys(right, rkeys, left, lkeys)
        dev = try_device_join(left, right, lkeys, rkeys, rel.kind)
        if dev is not None:
            # device join keeps both sides' key columns with true per-side
            # nullability — no __l__/__r__ workaround needed
            out = dev
            if extra:
                if rel.kind == "inner":
                    residual.extend(extra)
                else:
                    batch = Batch.from_table(out)
                    m = Evaluator(batch).arr(_and_all(extra))
                    out = out.filter(pc.fill_null(m.cast(pa.bool_()), False))
            return out
        if jt != "inner":
            # arrow COALESCES outer-join key columns; carry the original
            # per-side keys through so IS NULL sees true nullability
            # (TPC-DS q97's store_only/catalog_only cases)
            for lk, rk in eq_pairs:
                left = left.append_column("__l__" + lk, left.column(lk))
                right = right.append_column("__r__" + rk, right.column(rk))
        out = left.join(right, keys=lkeys, right_keys=rkeys, join_type=jt)
        if jt != "inner":
            cols = {n: out.column(n) for n in out.column_names}
            for lk, rk in eq_pairs:
                cols[lk] = cols.pop("__l__" + lk)
                cols[rk] = cols.pop("__r__" + rk)
            out = pa.table(cols)
        else:
            # arrow drops right-side keys; re-add under their own names
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
        if any(isinstance(g, ast.GroupingSpec) for g in q.group_by):
            return self._exec_grouping_sets(q)
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

        from liquid_tpu.sql.device_agg import (
            HybridGroupedAggregator, HybridScalarAggregator,
        )
        single = self._single_parquet_source(q)
        agg = (HybridGroupedAggregator(key_names, slots) if group
               else HybridScalarAggregator(slots))

        # rewrite subqueries ONCE (not per batch: correlated lookups
        # precompute their inner tables during the rewrite)
        scope = self._scope_cols(q)
        rew_inputs = {s.name: self._rewrite_subqueries(s.input, scope)
                      for s in slots if s.input is not None}
        rew_keys = [self._rewrite_subqueries(ge, scope) for ge, _ in group]

        def update_from(batch: Batch):
            ev = Evaluator(batch, self._scalar_subquery)
            inputs: Dict[str, pa.Array] = {}
            for s in slots:
                if s.input is not None:
                    arr = ev.arr(rew_inputs[s.name])
                    inputs[s.name] = arr
                    input_types.setdefault(s.name, arr.type)
            if group:
                keys = [ev.arr(ge) for ge in rew_keys]
                agg.update(keys, inputs, batch.length)
            else:
                agg.update(inputs, batch.length)

        fused_final = None
        if single is not None:
            rel, where = single
            hints = column_hints(q)
            table = self.catalog[rel.name]
            plan = plan_scan_filters(self._rewrite_subqueries(where, scope)
                                     if where is not None else None)
            # EXISTS / NOT EXISTS / IN-subquery conjuncts fuse as device
            # existence probes; the REDUCED plan serves only the fused
            # attempt (a bailout must leave classic on the full plan)
            plan_fused, eprobes = plan, ()
            try:
                rem, especs = self._plan_exist_probes(where, table)
            except Exception:
                especs = ()
            if especs:
                plan_fused = plan_scan_filters(
                    self._rewrite_subqueries(rem, scope)
                    if rem is not None else None)
                eprobes = especs
            need = sorted(c for c in needed if c in table.column_names)
            pure_count = (not need and not group
                          and all(s.kind == "count_star" for s in slots)
                          and not plan.pushdown and not plan.residual)
            if pure_count:
                # COUNT(*) with no filters: metadata only (ref: DataFusion
                # statistics-based count)
                agg.update({}, table.num_rows)
            elif (fused_final := self._try_fused_distinct(
                    table, plan, hints, group, key_names, slots,
                    rew_keys, rew_inputs, q)) is not None:
                # count(DISTINCT d): fused inner aggregation grouped by
                # keys+[d] + host fold (fused_agg.distinct_two_level)
                pass
            elif (fused_final := self._try_fused(
                    table, plan_fused, hints, group, key_names, slots,
                    rew_keys, rew_inputs, q, eprobes)) is not None:
                # whole-query compiled path: scan->filter->aggregate as
                # ONE device program straight from the resident encodings
                # (sql/fused_agg.py; VERDICT r2 #1)
                pass
            else:
                # buffer selected blocks and aggregate in ~256k-row chunks:
                # one pyarrow group_by per chunk instead of per block
                # (38 per-block partial group_bys dominated warm q1)
                buf: List[pa.Table] = []
                buf_rows = 0
                plain_rows = 0

                def flush():
                    nonlocal buf, buf_rows
                    if buf:
                        t = pa.concat_tables(buf)
                        update_from(Batch.from_table(t))
                        buf, buf_rows = [], 0

                for block in scan_blocks(table, plan, hints, need):
                    if not need:
                        if group:
                            # constant group keys: evaluate on an empty-
                            # column batch of the right length
                            update_from(Batch({}, block.num_selected))
                        else:
                            plain_rows += block.num_selected
                        continue
                    cols = {c: block.col(c, hints.get(c)) for c in need}
                    buf.append(pa.table(cols))
                    buf_rows += block.num_selected
                    if buf_rows >= (1 << 18):
                        flush()
                flush()
                if plain_rows:
                    agg.update({}, plain_rows)
        else:
            # star/snowflake joins: whole-pipeline device path (dim
            # index builds + probed fused aggregation, sql/fused_star)
            from liquid_tpu.sql.fused_star import try_fused_star
            rew_where = (self._rewrite_subqueries(q.where, scope)
                         if q.where is not None else None)
            from liquid_tpu.sql import fused_agg as _fa

            def _run_star(g2, kn2, s2, rk2, ri2):
                return try_fused_star(self, q, g2, kn2, s2, rk2, ri2,
                                      rew_where)

            with TRACER.span("sql.fused_star"):
                fused_final = _fa.distinct_two_level(
                    slots, group, key_names, rew_keys, rew_inputs,
                    _run_star)
                if fused_final is None:
                    fused_final = try_fused_star(
                        self, q, group, key_names, slots, rew_keys,
                        rew_inputs, rew_where)
            if fused_final is None:
                joined, _resid = self._join_source(q)
                if joined.num_rows:
                    update_from(Batch.from_table(joined))
                elif group:
                    pass  # empty: no groups
                else:
                    agg.update({s.name: pa.array(
                        [], input_types.get(s.name) or pa.int64())
                        for s in slots if s.input is not None}, 0)

        final = (fused_final if fused_final is not None
                 else agg.finalize() if group
                 else agg.finalize(input_types))
        if final.num_rows == 0 and single is not None:
            # zero updates leave the classic aggregators without type
            # information; recover key/slot types from the schema so
            # empty results type identically on every path (the fused
            # empty path already does)
            final = _retype_empty(final, group, slots, rew_inputs,
                                  self.catalog[single[0].name])

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
            having = self._rewrite_subqueries(q.having, scope)
            h = substitute(having, mapping)
            hb = Batch.from_table(_extend(result, final))
            m = Evaluator(hb, self._scalar_subquery).arr(h)
            keep = pc.fill_null(m.cast(pa.bool_()), False)
            result = result.filter(keep)
            final = final.filter(keep)

        # ORDER BY / LIMIT over the combined (items + internal) namespace
        result = self._order_limit(q, result, final, mapping)
        return result

    def _exec_grouping_sets(self, q: ast.Select) -> pa.Table:
        """GROUP BY ROLLUP/CUBE/GROUPING SETS: one grouped aggregation
        per set; excluded keys project as NULL; `grouping(e)` folds to
        0/1.  HAVING applies per set (uniform, so equivalent to applying
        on the union); ORDER BY / LIMIT apply to the combined result.

        Ref: DataFusion's grouping-set expansion, which the reference
        gets for free (TPC-DS q18/q22/q27/q36/q67/q86).
        """
        import itertools

        sets_per_elem: List[List[Tuple[ast.Expr, ...]]] = []
        spec_keys: List[ast.Expr] = []
        for g in q.group_by:
            if isinstance(g, ast.GroupingSpec):
                if g.kind == "rollup":
                    ss = [tuple(g.exprs[:i])
                          for i in range(len(g.exprs), -1, -1)]
                elif g.kind == "cube":
                    ss = [tuple(e for e, keep in zip(g.exprs, mask) if keep)
                          for mask in itertools.product(
                              (True, False), repeat=len(g.exprs))]
                else:
                    ss = list(g.sets)
                sets_per_elem.append(ss)
                for e in (g.exprs or
                          tuple(x for s in g.sets for x in s)):
                    if not any(e == k for k in spec_keys):
                        spec_keys.append(e)
            else:
                sets_per_elem.append([(g,)])

        full_keys: List[ast.Expr] = []
        for elem in sets_per_elem:
            for s in elem:
                for e in s:
                    if not any(e == k for k in full_keys):
                        full_keys.append(e)

        def rewrite(e: ast.Expr, included: List[ast.Expr],
                    in_agg: bool = False) -> ast.Expr:
            import dataclasses as _dc
            if isinstance(e, ast.Func) and e.name == "grouping":
                return ast.Literal(
                    0 if any(e.args[0] == k for k in included) else 1)
            if not in_agg and any(e == k for k in spec_keys) \
                    and not any(e == k for k in included):
                return ast.Literal(None)
            if not _dc.is_dataclass(e):
                return e
            child_in_agg = in_agg or (
                isinstance(e, ast.Func) and e.name in AGG_FUNCS)
            changes = {}
            for f in _dc.fields(e):
                v = getattr(e, f.name)
                if isinstance(v, ast.Expr):
                    changes[f.name] = rewrite(v, included, child_in_agg)
                elif isinstance(v, tuple):
                    changes[f.name] = tuple(
                        rewrite(x, included, child_in_agg)
                        if isinstance(x, ast.Expr)
                        else tuple(rewrite(y, included, child_in_agg)
                                   if isinstance(y, ast.Expr) else y
                                   for y in x) if isinstance(x, tuple)
                        else x for x in v)
            return _dc.replace(e, **changes) if changes else e

        parts: List[pa.Table] = []
        names = [it.alias or render(it.expr) for it in q.items]
        for combo in itertools.product(*sets_per_elem):
            included: List[ast.Expr] = []
            for s in combo:
                for e in s:
                    if not any(e == k for k in included):
                        included.append(e)
            qi = ast.Select()
            qi.items = [ast.SelectItem(rewrite(it.expr, included), nm)
                        for it, nm in zip(q.items, names)]
            qi.from_ = q.from_
            qi.where = q.where
            qi.group_by = [k for k in full_keys
                           if any(k == e for e in included)]
            qi.having = (rewrite(q.having, included)
                         if q.having is not None else None)
            parts.append(self.execute(qi))
        combined = pa.concat_tables(parts, promote_options="permissive")
        return self._order_limit(q, combined, None, {})

    def _order_limit(self, q: ast.Select, result: pa.Table,
                     internal: Optional[pa.Table], mapping) -> pa.Table:
        if q.order_by and result.num_rows:
            ns = _extend(result, internal) if internal is not None else result
            batch = Batch.from_table(ns)
            alias_map = {ast.Column(it.alias): it.alias for it in q.items
                         if it.alias and it.alias in ns.column_names}
            # an ORDER BY expr that IS a select item evaluates against
            # the projected table, where the item's OUTPUT name applies
            # (alias may differ from the expr's column name, e.g. a
            # bare-name alias restored by the qualifier for `t.c`)
            item_map = {it.expr: (it.alias or render(it.expr))
                        for it in q.items
                        if not isinstance(it.expr, ast.Star)
                        and (it.alias or render(it.expr)) in ns.column_names}
            alias_map = {**item_map, **alias_map}
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
            # per-key NULL placement (Postgres/DataFusion default:
            # NULLS LAST for ASC, NULLS FIRST for DESC; explicit
            # NULLS FIRST/LAST overrides per key)
            placements = []
            for o in q.order_by:
                nf = o.desc if o.nulls_first is None else o.nulls_first
                placements.append(nf)
            from liquid_tpu.sql.device_sort import try_sort_indices
            lim = (q.limit + (q.offset or 0)) if q.limit is not None else None
            idx = try_sort_indices(
                sort_arrays,
                [(o.desc, nf) for o, nf in zip(q.order_by, placements)],
                limit=lim)
            if idx is not None:
                result = result.take(pa.array(idx, pa.int64()))
            else:  # unsupported key type: pyarrow sort
                st = pa.table({f"__s{i}": a
                               for i, a in enumerate(sort_arrays)})
                keys = [(f"__s{i}", d,
                         "at_start" if nf else "at_end")
                        for i, (d, nf) in enumerate(
                            zip(directions, placements))]
                result = result.take(pc.sort_indices(st, sort_keys=keys))
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
            # device top-k row selection (filter -> order -> LIMIT k on
            # chip, only the k rows' cells fetched)
            from liquid_tpu.sql.fused_agg import try_fused_select
            rew_where = (self._rewrite_subqueries(
                where, self._scope_cols(q)) if where is not None
                else None)
            fsel = try_fused_select(self, table, q, rew_where)
            if fsel is not None:
                return fsel
            hints = column_hints(q)
            plan = plan_scan_filters(rew_where)
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
            # TopK dynamic filter (ref DynamicFilterPhysicalExpr /
            # dynamic-filter pruning): ORDER BY col LIMIT k publishes a
            # running k-th-best threshold that prunes later blocks
            track = None
            if q.limit is not None and q.order_by and not q.distinct:
                o0 = q.order_by[0]
                if isinstance(o0.expr, ast.Column) \
                        and o0.expr.name in table.column_names:
                    t0 = table.field(o0.expr.name).type
                    if (pa.types.is_integer(t0) or pa.types.is_floating(t0)
                            or pa.types.is_date32(t0)):
                        from liquid_tpu.sql.physical import TopKTracker
                        track = TopKTracker(
                            o0.expr.name, bool(o0.desc),
                            q.limit + (q.offset or 0), t0)
            for block in scan_blocks(table, plan, hints, need,
                                     dynamic=track.current if track
                                     else None):
                cols = {c: block.col(c, hints.get(c)) for c in need}
                batch = Batch(cols, block.num_selected)
                parts.append(self._project(q, batch, table, star))
                if extras:
                    iparts.append(self._project_extras(extras, batch))
                if track is not None:
                    track.update(cols[track.col])
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
        if isinstance(rel, ast.TableRef) and rel.prefix:
            return None  # aliased/prefixed: go through _join_source renames
        if isinstance(rel, ast.TableRef) and rel.name in self.catalog:
            if q.where is None or not _has_subquery(q.where):
                return rel, q.where
            return rel, q.where  # subqueries rewritten before planning
        return None

    def _scalar_subquery(self, sub: ast.Select):
        # key by identity but PIN the Select in the value: a bare id()
        # key can be reused by a new object once the old one is GC'd
        cached = self._scalar_cache.get(id(sub))
        if cached is not None and cached[0] is sub:
            return cached[1]
        t = self.execute(sub)
        assert t.num_columns == 1 and t.num_rows <= 1, "scalar subquery shape"
        out = pa.scalar(None) if t.num_rows == 0 else t.column(0)[0]
        self._scalar_cache[id(sub)] = (sub, out)
        return out

    # -- subquery rewriting / decorrelation ---------------------------------
    # Ref: DataFusion's decorrelate_predicate_subquery +
    # scalar_subquery_to_join rules, which the reference gets for free;
    # TPC-H q2/q4/q17/q20/q21/q22 need them.

    def _scope_cols(self, q: ast.Select) -> frozenset:
        leaves: List = []
        self._leaf_relations(q.from_, leaves)
        out: set = set()
        for l in leaves:
            if l is not None:
                out.update(self._relation_columns(l))
        return frozenset(out)

    def _rewrite_subqueries(self, e: ast.Expr,
                            scope: frozenset = frozenset()) -> ast.Expr:
        """Uncorrelated IN-subqueries -> literal InList; correlated
        EXISTS / IN / scalar-agg subqueries -> CorrLookup; uncorrelated
        scalar subqueries stay (evaluator calls _scalar_subquery)."""
        if isinstance(e, ast.InSubquery):
            sub = e.query
            inner = self._scope_cols(sub)
            corr = self._split_correlation(sub, inner, scope)
            if corr["eq"] or corr["extra"]:
                # correlated IN: EXISTS with one extra equality on operand
                op_col = sub.items[0].alias or render(sub.items[0].expr)
                keys = [p[1] for p in corr["eq"]] + [
                    self._rewrite_subqueries(e.operand, scope)]
                inner_keys = [p[0] for p in corr["eq"]] + [op_col]
                return self._build_exists(sub, corr, keys, inner_keys,
                                          e.negated, extra_item=sub.items[0])
            t = self.execute(sub)
            pylist = t.column(0).to_pylist()
            # NULLs stay in the list: the evaluator implements the
            # three-valued IN / NOT IN semantics
            vals = tuple(ast.Literal(v) for v in dict.fromkeys(pylist))
            return ast.InList(self._rewrite_subqueries(e.operand, scope),
                              vals, e.negated)
        if isinstance(e, ast.Exists):
            sub = e.query
            inner = self._scope_cols(sub)
            corr = self._split_correlation(sub, inner, scope)
            if not corr["eq"] and not corr["extra"]:
                t = self.execute(sub)  # uncorrelated EXISTS
                found = t.num_rows > 0
                return ast.Literal(found != e.negated)
            keys = [p[1] for p in corr["eq"]]
            inner_keys = [p[0] for p in corr["eq"]]
            return self._build_exists(sub, corr, keys, inner_keys, e.negated)
        if isinstance(e, ast.Subquery):
            sub = e.query
            inner = self._scope_cols(sub)
            corr = self._split_correlation(sub, inner, scope)
            if not corr["eq"] and not corr["extra"]:
                # uncorrelated scalar: execute once, inline as a literal
                v = self._scalar_subquery(sub)
                return ast.Literal(v.as_py())
            if corr["extra"]:
                raise NotImplementedError(
                    "non-equality correlated scalar subquery")
            return self._build_scalar_lookup(sub, corr)

        def walk(x):
            if isinstance(x, (ast.InSubquery, ast.Exists, ast.Subquery)):
                return self._rewrite_subqueries(x, scope)
            return None
        return map_expr(e, walk)

    def _split_correlation(self, sub: ast.Select, inner_cols: frozenset,
                           scope: frozenset) -> dict:
        """Classify the subquery's WHERE conjuncts:
        eq:    [(inner_col_name, outer_expr)] equality correlations
        extra: conjuncts mixing inner + outer references
        local: conjuncts over inner columns only (stay in the subquery)."""
        def refs(x):
            c: set = set()
            collect_columns(x, c)
            return c
        eq, extra, local = [], [], []
        for conj in split_conjuncts(sub.where):
            cols = refs(conj)
            outer = cols - inner_cols
            if not outer:
                local.append(conj)
                continue
            pair = None
            if isinstance(conj, ast.Binary) and conj.op == "=":
                for a, b in ((conj.left, conj.right), (conj.right, conj.left)):
                    if (isinstance(a, ast.Column) and a.name in inner_cols
                            and refs(b) and refs(b) <= (scope - inner_cols)
                            and not _has_subquery(b)):
                        pair = (a.name, b)
                        break
            if pair is not None:
                eq.append(pair)
            else:
                extra.append(conj)
        return {"eq": eq, "extra": extra, "local": local}

    def _build_exists(self, sub: ast.Select, corr, keys, inner_keys,
                      negated: bool, extra_item=None) -> ast.CorrLookup:
        """Precompute the inner relation and emit a CorrLookup node."""
        outer_refs: List[ast.Expr] = []
        inner_cols = self._scope_cols(sub)

        def repl_outer(x):
            if isinstance(x, ast.Column) and x.name not in inner_cols:
                for i, r in enumerate(outer_refs):
                    if r == x:
                        return ast.Column(f"__outer{i}")
                outer_refs.append(x)
                return ast.Column(f"__outer{len(outer_refs) - 1}")
            return None

        extra = None
        extra_cols: set = set()
        if corr["extra"]:
            extra = _and_all([map_expr(c, repl_outer) for c in corr["extra"]])
            collect_columns(extra, extra_cols)
            extra_cols = {c for c in extra_cols if not c.startswith("__outer")}

        items = [ast.SelectItem(ast.Column(k), k) for k in inner_keys
                 if extra_item is None or k != (extra_item.alias
                                                or render(extra_item.expr))]
        if extra_item is not None:
            items.append(ast.SelectItem(
                extra_item.expr,
                extra_item.alias or render(extra_item.expr)))
        for c in sorted(extra_cols - set(inner_keys)):
            items.append(ast.SelectItem(ast.Column(c), c))
        inner_q = ast.Select()
        inner_q.items = items
        inner_q.from_ = sub.from_
        inner_q.where = _and_all(corr["local"])
        inner_q.distinct = extra is None
        t = self.execute(inner_q)
        return ast.CorrLookup(keys=tuple(keys), key_cols=tuple(inner_keys),
                              kind="exists", table=t, negated=negated,
                              outer_refs=tuple(outer_refs), extra=extra)

    def _build_scalar_lookup(self, sub: ast.Select, corr) -> ast.CorrLookup:
        assert len(sub.items) == 1, "scalar subquery must have one item"
        inner_keys = [p[0] for p in corr["eq"]]
        keys = [p[1] for p in corr["eq"]]
        inner_q = ast.Select()
        inner_q.items = [ast.SelectItem(ast.Column(k), k) for k in inner_keys]
        inner_q.items.append(ast.SelectItem(sub.items[0].expr, "__v"))
        inner_q.from_ = sub.from_
        inner_q.where = _and_all(corr["local"])
        inner_q.group_by = [ast.Column(k) for k in inner_keys]
        t = self.execute(inner_q)
        return ast.CorrLookup(keys=tuple(keys), key_cols=tuple(inner_keys),
                              kind="scalar", table=t)


def _inline_derived(q: ast.Select) -> ast.Select:
    """Inline a pure-projection derived table: ``SELECT ... FROM
    (SELECT <exprs> FROM <rels> WHERE <w>) AS s ...`` rewrites to the
    flat join query, substituting the derived output names with their
    defining expressions and AND-merging the WHERE clauses.

    TPC-H q7/q8/q9/q22 all wrap their joins this way; without inlining
    they can never reach the fused star planner (the reference gets the
    same effect from DataFusion's optimizer pushing projections into
    subqueries).  Only the provably-safe shape inlines: the inner query
    must be a plain projection (no aggregates, grouping, windows,
    DISTINCT, LIMIT/OFFSET, HAVING, set-ops or CTEs) and the derived
    relation must not need a disambiguating prefix."""
    rel = q.from_
    if not isinstance(rel, ast.SubqueryRel) or rel.prefix:
        return q
    inner = rel.query
    if not isinstance(inner, ast.Select) or inner.from_ is None:
        return q
    if (inner.group_by or inner.having is not None or inner.distinct
            or inner.limit is not None or inner.offset is not None
            or inner.ctes or inner.order_by):
        return q
    from liquid_tpu.sql.window import find_windows
    inner_aggs: List[ast.Func] = []
    wfs: List = []
    for it in inner.items:
        find_aggs(it.expr, inner_aggs)
        find_windows(it.expr, wfs)
        if it.expr is None or isinstance(it.expr, ast.Star):
            return q
    if inner_aggs or wfs:
        return q
    mapping = {(it.alias or render(it.expr)): it.expr
               for it in inner.items}

    from liquid_tpu.sql.qualify import map_expr

    def subst(e):
        if e is None:
            return None
        return map_expr(e, lambda x: mapping.get(x.name)
                        if isinstance(x, ast.Column) else None)

    q2 = ast.Select()
    q2.items = [ast.SelectItem(subst(it.expr),
                               it.alias or render(it.expr))
                for it in q.items]
    q2.from_ = inner.from_
    outer_w = subst(q.where)
    inner_w = inner.where
    if outer_w is not None and inner_w is not None:
        q2.where = ast.Binary("and", inner_w, outer_w)
    else:
        q2.where = outer_w if outer_w is not None else inner_w
    q2.group_by = [subst(g) for g in q.group_by]
    q2.having = subst(q.having)
    q2.order_by = [ast.OrderItem(subst(o.expr), o.desc, o.nulls_first)
                   for o in q.order_by]
    q2.limit = q.limit
    q2.offset = q.offset
    q2.distinct = q.distinct
    q2.ctes = q.ctes
    return _inline_derived(q2)


def _retype_empty(final: pa.Table, group, slots, rew_inputs,
                  table) -> pa.Table:
    """Cast null-typed columns of an EMPTY aggregate result to their
    schema-derived types (plain-column keys and aggregate inputs)."""
    cols = {}
    slot_by_name = {s.name: s for s in slots}
    for i, name in enumerate(final.column_names):
        col = final.column(i)
        if not pa.types.is_null(col.type):
            cols[name] = col
            continue
        t = None
        for ge, nm in group:
            if nm == name and isinstance(ge, ast.Column)                     and ge.name in table.column_names:
                t = table.field(ge.name).type
        s = slot_by_name.get(name)
        if s is not None:
            e = rew_inputs.get(s.name)
            it = (table.field(e.name).type
                  if isinstance(e, ast.Column)
                  and e.name in table.column_names else None)
            if s.kind in ("count_star", "count", "count_distinct"):
                t = pa.int64()
            elif s.kind in ("avg", "stddev", "var"):
                t = pa.float64()
            elif s.kind in ("min", "max", "median") and it is not None:
                t = it
            elif s.kind == "sum" and it is not None:
                from liquid_tpu.sql.physical import _sum_type
                t = _sum_type(it)
        if pa.types.is_dictionary(t) if t is not None else False:
            t = t.value_type
        cols[name] = pa.array([], t) if t is not None else col
    return pa.table(cols)


def _setop_apply(left: pa.Table, right: pa.Table, op: str, all_: bool,
                 names: List[str]) -> pa.Table:
    """One set operation.  NULLs compare equal (SQL set-op semantics,
    matching pandas groupby(dropna=False)/merge NaN-key matching)."""
    import pandas as pd
    right = right.rename_columns(names)
    if op == "union":
        out = pa.concat_tables([left, right], promote_options="permissive")
        if not all_:
            out = out.group_by(names, use_threads=False).aggregate([])
        return out
    ldf = left.to_pandas()
    rdf = right.to_pandas()
    if op == "intersect":
        if all_:
            lc = ldf.groupby(names, dropna=False).size() \
                .rename("__lc").reset_index()
            rc = rdf.groupby(names, dropna=False).size() \
                .rename("__rc").reset_index()
            m = lc.merge(rc, on=names)
            reps = m[["__lc", "__rc"]].min(axis=1)
            res = m.loc[m.index.repeat(reps), names]
        else:
            res = ldf.drop_duplicates().merge(
                rdf.drop_duplicates(), on=names, how="inner")[names]
    elif op == "except":
        if all_:
            lc = ldf.groupby(names, dropna=False).size() \
                .rename("__lc").reset_index()
            rc = rdf.groupby(names, dropna=False).size() \
                .rename("__rc").reset_index()
            m = lc.merge(rc, on=names, how="left")
            reps = (m.__lc - m.__rc.fillna(0)).clip(lower=0).astype(int)
            res = m.loc[m.index.repeat(reps), names]
        else:
            m = ldf.drop_duplicates().merge(
                rdf.drop_duplicates(), on=names, how="left", indicator=True)
            res = m[m._merge == "left_only"][names]
    else:
        raise NotImplementedError(op)
    out = pa.Table.from_pandas(res.reset_index(drop=True),
                               preserve_index=False)
    try:
        return out.cast(left.schema)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, ValueError):
        return out


def _fix_null_keys(t: pa.Table, keys: List[str],
                   other: pa.Table, other_keys: List[str]) -> pa.Table:
    """An empty relation can carry null-typed key columns (schema unknown
    at zero rows); arrow joins reject null keys, so cast them to the
    other side's type."""
    for k, ok in zip(keys, other_keys):
        # index-based lookups: duplicate column names (self-joins of
        # derived tables, e.g. TPC-DS q44) break name lookups
        for idx, n in enumerate(t.column_names):
            if n != k or not pa.types.is_null(t.column(idx).type):
                continue
            oidx = (other.column_names.index(ok)
                    if ok in other.column_names else -1)
            target = other.column(oidx).type if oidx >= 0 else pa.int64()
            if pa.types.is_null(target):
                target = pa.int64()
            t = t.set_column(idx, k, t.column(idx).cast(target))
    return t


def _key_bounds(t: pa.Table, src_col: str, dst_col: str) -> List[ast.Expr]:
    """Range conjuncts `dst_col between min(src) and max(src)` derived
    from a materialized join side; an EMPTY side yields an impossible
    range (the inner join can produce nothing, so the pending scan is
    pruned away entirely by row-group stats)."""
    if src_col not in t.column_names:
        return []
    col = t.column(src_col)
    typ = col.type
    if not (pa.types.is_integer(typ) or pa.types.is_floating(typ)
            or pa.types.is_date32(typ)):
        return []
    if t.num_rows == 0:
        return [ast.Binary(">=", ast.Column(dst_col), ast.Literal(1)),
                ast.Binary("<=", ast.Column(dst_col), ast.Literal(0))]
    mm = pc.min_max(col)
    lo, hi = mm["min"].as_py(), mm["max"].as_py()
    if lo is None or hi is None:
        return []
    return [ast.Binary(">=", ast.Column(dst_col), ast.Literal(lo)),
            ast.Binary("<=", ast.Column(dst_col), ast.Literal(hi))]


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
