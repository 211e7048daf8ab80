"""Fused device scan->filter->aggregate: the whole-query compiled path.

Round-3 headline work (VERDICT r2 "Next round" #1): the round-2 engine
evaluated predicates on encoded blocks (device) but then DECODED every
surviving block to host Arrow and RE-ENCODED the values back onto the
device for aggregation -- inverting the project thesis ("never
materialize") and losing to arrow mode on GROUP BY.  This module feeds
the aggregation directly from the cache's RESIDENT device encodings:

    bit-planes / ALP integer lanes / dictionary codes
        -> packed predicate intervals (no decode)
        -> on-device value decode (unpack + reference add, ALP scale)
        -> expression evaluation in i64/f64 lanes
        -> hash scatter-reduce (ops.hashagg)

all inside ONE jitted XLA program per query shape, with ONE bounded
host fetch for the result.  Literals ride as traced arrays, so repeated
queries with different constants reuse the compile.

Reference behavior being matched: the `LiquidCacheReader` hot loop
feeding DataFusion's aggregate without materializing the cache's
encoded form (liquid-cache
`src/datafusion/src/reader/runtime/liquid_cache_reader.rs:118-161`)
-- here taken further: the aggregate itself consumes the encoded form.

Supported query shape (anything else transparently falls back to the
classic scan path in `sql/physical.py` / `sql/device_agg.py`):

- single parquet source, WHERE fully pushdown-classified (AND of
  column-vs-literal comparisons / LIKE, with OR groups),
- GROUP BY plain columns of int/date/timestamp/bool/float/string type,
- aggregates count(*)/count/sum/avg/min/max/stddev/var over +,-,*
  arithmetic of numeric columns and literals,
- every touched block resident as MEMORY_LIQUID primitive/float/
  byteview (memory pressure or arrow mode -> classic path).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pyarrow as pa

from liquid_tpu.arrays.base import BLOCK_ROWS, Predicate
from liquid_tpu.arrays.byteview import LiquidByteViewArray
from liquid_tpu.arrays.float_alp import LiquidFloatArray
from liquid_tpu.arrays.primitive import LiquidPrimitiveArray
from liquid_tpu.ops import bitpack as bp
from liquid_tpu.ops import floatbits
from liquid_tpu.ops import hashagg as hops
from liquid_tpu.ops import mask as mops
from liquid_tpu.sql import ast

_U64MAX = (1 << 64) - 1
_W = BLOCK_ROWS // 32

#: host-driven retry ladder for the grouped hash table (same shape as
#: the distributed session's _HASH_STAGES); every stage is exact
_STAGES = ((1 << 13, 0x9E3779B97F4A7C15),
           (1 << 17, 0xC2B2AE3D27D4EB4F),
           (1 << 20, 0x165667B19E3779F9),
           # million-group queries (TPC-H q3 at SF10 groups by
           # l_orderkey: ~1.2M distinct): 4M slots keep the birthday
           # load factor low enough for 3 rounds to converge
           (1 << 22, 0x27D4EB2F165667C5))

#: extended ladder for the device-chained count(DISTINCT) path only:
#: its level-1 cardinality approaches the scanned ROW count (unique
#: (keys, d) pairs), so it needs a table ~2x the scan size; the
#: regular grouped path keeps the smaller ladder (group counts are
#: bounded by key cardinality, and its fetch paths cap earlier)
_STAGES_XL = _STAGES + ((1 << 23, 0x94D049BB133111EB),)

#: module counters (tests assert routing; bench reports them)
STATS = {"fused_queries": 0, "fused_grouped": 0, "fused_scalar": 0,
         "fused_bailouts": 0, "fused_retries": 0}

_AGG_KINDS = frozenset({"count_star", "count", "sum", "avg", "min", "max",
                        "stddev", "var"})


class _Bail(Exception):
    """Unsupported shape: fall back to the classic scan path."""


class KindsWithTypes(dict):
    """col->kind mapping that also resolves arrow types.

    `_compile_expr` consults ``arrow_type(col)`` (when the mapping
    provides it) to validate value-preserving casts -- e.g. ``::date``
    is only a passthrough over date32/integer images, never timestamps
    (whose i64 image is epoch seconds/us, not day counts)."""

    def __init__(self, kinds, typeres):
        super().__init__(kinds)
        self._typeres = typeres

    def arrow_type(self, c):
        return self._typeres(c)


# -- expression IR -----------------------------------------------------------
#
# Nodes carry their dtype ("i64" | "f64"); casts are explicit so the
# traced evaluator is a dumb interpreter.
#   ("col", name, dtype)      decoded column values
#   ("lit", value, dtype)     python number (static in the compile key)
#   ("bin", op, dtype, l, r)  op in + - * /
#   ("neg", dtype, x)
#   ("cast", dtype, x)

def _compile_expr(e: ast.Expr, col_kinds: Dict[str, str], dictres=None):
    """-> (ir, cols_used:set).  Raises _Bail on unsupported shapes.

    `dictres(col, op, literal) -> tuple[int] | None` resolves a string
    comparison on a dictionary column to its matching CODE ids (the
    distributed session supplies the table's global vocabulary); with a
    resolver present, CASE expressions compile to ("where", ...) nodes
    whose conditions are the boolean IR below."""
    if isinstance(e, ast.Column):
        k = col_kinds.get(e.name)
        if k in ("planes", "linear"):
            return ("col", e.name, "i64"), {e.name}
        if k == "float":
            return ("col", e.name, "f64"), {e.name}
        raise _Bail(f"column kind {k} in expression")
    if isinstance(e, ast.Literal):
        v = e.value
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise _Bail(f"literal {v!r}")
        dt = "f64" if isinstance(v, float) else "i64"
        return ("lit", v, dt), set()
    if isinstance(e, ast.Unary) and e.op == "neg":
        x, cols = _compile_expr(e.operand, col_kinds, dictres)
        return ("neg", _ir_dtype(x), x), cols
    if isinstance(e, ast.Cast) and e.type_name in (
            "double", "float", "real", "decimal", "numeric"):
        x, cols = _compile_expr(e.operand, col_kinds, dictres)
        return _as_f64(x), cols
    if isinstance(e, ast.Cast) and e.type_name in (
            "int", "integer", "bigint", "smallint"):
        # ::INT over an integer image is a value passthrough;
        # float->int truncation bails
        x, cols = _compile_expr(e.operand, col_kinds, dictres)
        if _ir_dtype(x) == "i64":
            return x, cols
        raise _Bail("float->int cast")
    if isinstance(e, ast.Cast) and e.type_name == "date":
        # ::DATE is a passthrough ONLY when the operand's i64 image is
        # already day counts (date32/date64-as-days columns) or a plain
        # integer.  A timestamp column's image is epoch seconds/us --
        # passing it through would emit garbage date32 values, so it
        # bails to the classic path (which converts correctly).
        root = e.operand  # peel value-preserving int casts (::INT::DATE)
        while isinstance(root, ast.Cast) and root.type_name in (
                "int", "integer", "bigint", "smallint"):
            root = root.operand
        if not isinstance(root, ast.Column):
            raise _Bail("::date over non-column")
        x, cols = _compile_expr(e.operand, col_kinds, dictres)
        atype = getattr(col_kinds, "arrow_type", None)
        t = atype(root.name) if atype is not None else None
        if _ir_dtype(x) == "i64" and t is not None and (
                pa.types.is_date32(t) or pa.types.is_integer(t)
                or pa.types.is_boolean(t)):
            return x, cols
        raise _Bail(f"::date over {t}")
    if isinstance(e, ast.Case) and dictres is not None:
        if e.operand is not None:
            raise _Bail("CASE <operand> form")
        if e.else_ is None:
            raise _Bail("CASE without ELSE (NULL branch)")
        out, cols = _compile_expr(e.else_, col_kinds, dictres)
        for cond, val in reversed(e.whens):
            c_ir, cc = _compile_bool(cond, col_kinds, dictres)
            v_ir, vc = _compile_expr(val, col_kinds, dictres)
            if _ir_dtype(v_ir) != _ir_dtype(out):
                v_ir, out = _as_f64(v_ir), _as_f64(out)
            out = ("where", _ir_dtype(v_ir), c_ir, v_ir, out)
            cols |= cc | vc
        return out, cols
    if isinstance(e, ast.Binary) and e.op in ("+", "-", "*", "/"):
        l, lc = _compile_expr(e.left, col_kinds, dictres)
        r, rc = _compile_expr(e.right, col_kinds, dictres)
        ldt, rdt = _ir_dtype(l), _ir_dtype(r)
        if e.op == "/":
            if ldt == "i64" and rdt == "i64":
                # SQL int/int is integer division (trunc toward zero);
                # fusing it as f64 true division would change both the
                # value and the output type vs the classic path
                raise _Bail("integer division")
            l, r, dt = _as_f64(l), _as_f64(r), "f64"
        elif ldt == "f64" or rdt == "f64":
            l, r, dt = _as_f64(l), _as_f64(r), "f64"
        else:
            dt = "i64"
        return ("bin", e.op, dt, l, r), lc | rc
    if isinstance(e, ast.Extract):
        img, unit, cols = _time_image_ir(e.operand, col_kinds, dictres)
        return _extract_ir(e.field.lower(), img, unit), cols
    if isinstance(e, ast.Func) and e.name == "to_timestamp_seconds":
        img, unit, cols = _time_image_ir(e, col_kinds, dictres)
        return img, cols
    if isinstance(e, ast.Func) and e.name == "date_trunc" \
            and len(e.args) == 2 and isinstance(e.args[0], ast.Literal):
        img, unit, cols = _time_image_ir(e.args[1], col_kinds, dictres)
        u = str(e.args[0].value).lower()
        widths = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
        if unit != "s" or u not in widths:
            raise _Bail(f"date_trunc {u} over {unit}")
        w = widths[u]
        if w == 1:
            return img, cols
        return ("bin", "*", "i64",
                _fdiv(img, w), ("lit", w, "i64")), cols
    lutres = getattr(col_kinds, "lutres", None)
    if lutres is not None:
        from liquid_tpu.sql.physical import collect_columns as _cc
        cols = set()
        _cc(e, cols)
        if len(cols) == 1:
            c = next(iter(cols))
            if col_kinds.get(c) == "dict":
                got = lutres(e, c)
                if got is not None:
                    aix, vdt = got
                    return ("lut", c, aix, vdt), {c}
    raise _Bail(f"expression {type(e).__name__}")


# -- temporal expression lowering ---------------------------------------------
#
# extract()/date_trunc()/to_timestamp_seconds() lower to pure integer
# IR over the column's stored i64 image (date32 days / epoch seconds),
# so temporal group keys fuse instead of bailing to the host
# (ClickBench q18/q42, TPC-H q7-q9's l_year/o_year).  Civil-date
# decomposition uses Howard Hinnant's integer algorithm.

def _fdiv(x, k: int):
    return ("bin", "fdiv", "i64", x, ("lit", k, "i64"))


def _mod(x, k: int):
    return ("bin", "mod", "i64", x, ("lit", k, "i64"))


def _time_image_ir(e: ast.Expr, col_kinds, dictres):
    """-> (ir_i64, unit, cols) with unit "days" | "s"."""
    atype = getattr(col_kinds, "arrow_type", None)
    if isinstance(e, ast.Func) and e.name == "to_timestamp_seconds" \
            and len(e.args) == 1:
        x, cols = _compile_expr(e.args[0], col_kinds, dictres)
        if _ir_dtype(x) != "i64":
            raise _Bail("to_timestamp_seconds over non-int")
        return x, "s", cols
    if isinstance(e, ast.Column) and atype is not None:
        t = atype(e.name)
        x, cols = _compile_expr(e, col_kinds, dictres)
        if t is not None and pa.types.is_date32(t):
            return x, "days", cols
        if t is not None and pa.types.is_timestamp(t):
            div = {"s": 1, "ms": 1000, "us": 1000000,
                   "ns": 1000000000}.get(t.unit)
            if div is None:
                raise _Bail(f"timestamp unit {t.unit}")
            return (x if div == 1 else _fdiv(x, div)), "s", cols
    if isinstance(e, ast.Cast) and e.type_name == "date":
        x, cols = _compile_expr(e, col_kinds, dictres)
        return x, "days", cols
    raise _Bail(f"temporal operand {type(e).__name__}")


def _civil_ir(days):
    """days-since-epoch i64 IR -> (year, month, day) IRs (Hinnant's
    civil_from_days, integer-exact for the whole date32 domain)."""
    z = ("bin", "+", "i64", days, ("lit", 719468, "i64"))
    era = _fdiv(z, 146097)
    doe = ("bin", "-", "i64", z,
           ("bin", "*", "i64", era, ("lit", 146097, "i64")))
    yoe = _fdiv(("bin", "-", "i64",
                 ("bin", "+", "i64",
                  ("bin", "-", "i64", doe, _fdiv(doe, 1460)),
                  _fdiv(doe, 36524)),
                 _fdiv(doe, 146096)), 365)
    y0 = ("bin", "+", "i64", yoe,
          ("bin", "*", "i64", era, ("lit", 400, "i64")))
    doy = ("bin", "-", "i64", doe,
           ("bin", "-", "i64",
            ("bin", "+", "i64",
             ("bin", "*", "i64", ("lit", 365, "i64"), yoe),
             _fdiv(yoe, 4)),
            _fdiv(yoe, 100)))
    mp = _fdiv(("bin", "+", "i64",
                ("bin", "*", "i64", ("lit", 5, "i64"), doy),
                ("lit", 2, "i64")), 153)
    d = ("bin", "+", "i64",
         ("bin", "-", "i64", doy,
          _fdiv(("bin", "+", "i64",
                 ("bin", "*", "i64", ("lit", 153, "i64"), mp),
                 ("lit", 2, "i64")), 5)),
         ("lit", 1, "i64"))
    mp_lt10 = ("cmp", "<", mp, ("lit", 10, "i64"))
    m = ("where", "i64", mp_lt10,
         ("bin", "+", "i64", mp, ("lit", 3, "i64")),
         ("bin", "-", "i64", mp, ("lit", 9, "i64")))
    m_le2 = ("cmp", "<=", m, ("lit", 2, "i64"))
    y = ("where", "i64", m_le2,
         ("bin", "+", "i64", y0, ("lit", 1, "i64")), y0)
    return y, m, d


def _extract_ir(field: str, img, unit: str):
    if field in ("minute", "hour", "second"):
        if unit != "s":
            raise _Bail(f"extract {field} from {unit}")
        if field == "second":
            return _mod(img, 60)
        if field == "minute":
            return _mod(_fdiv(img, 60), 60)
        return _mod(_fdiv(img, 3600), 24)
    days = img if unit == "days" else _fdiv(img, 86400)
    if field in ("year", "month", "day", "quarter"):
        y, m, d = _civil_ir(days)
        if field == "year":
            return y
        if field == "month":
            return m
        if field == "day":
            return d
        return _fdiv(("bin", "+", "i64", m, ("lit", 2, "i64")), 3)
    if field == "dow":
        # DataFusion date_part('dow'): Sunday=0; epoch day 0 = Thursday
        return _mod(("bin", "+", "i64", days, ("lit", 4, "i64")), 7)
    raise _Bail(f"extract {field}")


_BOOL_CMP = {"=": "==", "<>": "!=", "!=": "!=", "<": "<", "<=": "<=",
             ">": ">", ">=": ">="}


def _compile_bool(e: ast.Expr, col_kinds: Dict[str, str], dictres):
    """Boolean-valued IR (CASE conditions, post-join residual filters):
        ("cmp", op, l, r)           numeric comparison
        ("incodes", col, codes)     dict-column code membership (static)
        ("band"/"bor", l, r), ("bnot", x)
    NULL inputs make a condition FALSE (the only consumers are CASE
    arms and INNER-join residuals, where SQL's NULL and FALSE act the
    same); `eval_ir_nulls` implements that."""
    if isinstance(e, ast.Binary) and e.op in ("and", "or"):
        l, lc = _compile_bool(e.left, col_kinds, dictres)
        r, rc = _compile_bool(e.right, col_kinds, dictres)
        return ("band" if e.op == "and" else "bor", l, r), lc | rc
    if isinstance(e, ast.Unary) and e.op == "not":
        x, cols = _compile_bool(e.operand, col_kinds, dictres)
        return ("bnot", x), cols
    if isinstance(e, ast.Between):
        lo = ast.Binary(">=", e.operand, e.low)
        hi = ast.Binary("<=", e.operand, e.high)
        ir, cols = _compile_bool(ast.Binary("and", lo, hi),
                                 col_kinds, dictres)
        return (("bnot", ir) if e.negated else ir), cols
    if isinstance(e, ast.InList):
        if not isinstance(e.operand, ast.Column):
            # substring(c,1,2) IN ('13','31',...): evaluate the operand
            # over the dict column's VOCAB host-side -> gid membership
            vocab_eval = getattr(col_kinds, "vocab_eval", None)
            from liquid_tpu.sql.physical import collect_columns as _cc
            cols0: set = set()
            _cc(e.operand, cols0)
            if (vocab_eval is None or len(cols0) != 1
                    or any(not isinstance(it, ast.Literal)
                           for it in e.items)):
                raise _Bail("IN over non-column")
            cn = next(iter(cols0))
            if col_kinds.get(cn) != "dict":
                raise _Bail("IN over non-column")
            vals = vocab_eval(e.operand, cn)
            if vals is None:
                raise _Bail("IN over non-column")
            want = {it.value for it in e.items}
            codes0 = tuple(i for i, v in enumerate(vals)
                           if v is not None and v in want)
            ir0 = ("incodes", cn, codes0)
            return (("bnot", ir0) if e.negated else ir0), {cn}
        name = e.operand.name
        if col_kinds.get(name) == "dict":
            codes: set = set()
            for it in e.items:
                if not isinstance(it, ast.Literal):
                    raise _Bail("IN list item")
                got = dictres(name, "=", it.value)
                if got is None:
                    raise _Bail(f"IN over {name}")
                codes.update(got)
            ir = ("incodes", name, tuple(sorted(codes)))
        else:
            # flat membership over numeric literals: a right-deep OR
            # chain recurses per item (a rewritten IN-subquery can
            # carry thousands) and costs one compare pass each;
            # jnp.isin is one fused pass
            vals = []
            has_null = False
            any_float = False
            for it in e.items:
                if isinstance(it, ast.Unary) and it.op == "neg" \
                        and isinstance(it.operand, ast.Literal) \
                        and isinstance(it.operand.value, (int, float)) \
                        and not isinstance(it.operand.value, bool):
                    it = ast.Literal(-it.operand.value)
                if not isinstance(it, ast.Literal):
                    raise _Bail("IN list item")
                v = it.value
                if v is None:
                    has_null = True
                    continue
                if isinstance(v, bool) or not isinstance(v, (int, float)):
                    raise _Bail(f"IN item {v!r}")
                any_float = any_float or isinstance(v, float)
                vals.append(v)
            if has_null and e.negated:
                # x NOT IN (..., NULL) is never TRUE
                raise _Bail("NOT IN with NULL item")
            if not vals:
                raise _Bail("empty IN list")
            dt = "f64" if (any_float
                           or col_kinds.get(name) == "float") else "i64"
            ir = ("inints", name, tuple(vals), dt)
        return (("bnot", ir) if e.negated else ir), {name}
    if isinstance(e, ast.Binary) and e.op == "like":
        if not (isinstance(e.left, ast.Column)
                and isinstance(e.right, ast.Literal)):
            raise _Bail("LIKE shape")
        codes = dictres(e.left.name, "like", e.right.value)
        if codes is None:
            raise _Bail(f"LIKE over {e.left.name}")
        return ("incodes", e.left.name, tuple(codes)), {e.left.name}
    if isinstance(e, ast.Binary) and e.op in _BOOL_CMP:
        l, r = e.left, e.right
        op = e.op
        if isinstance(r, ast.Column) and not isinstance(l, ast.Column):
            l, r = r, l
            op = {"=": "=", "<>": "<>", "!=": "!=", "<": ">", "<=": ">=",
                  ">": "<", ">=": "<="}[op]
        e = ast.Binary(op, l, r)
        if (isinstance(l, ast.Column) and isinstance(r, ast.Literal)
                and col_kinds.get(l.name) == "dict"):
            if e.op in ("=", "<>", "!="):
                codes = dictres(l.name, "=", r.value)
                if codes is None:
                    raise _Bail(f"string cmp over {l.name}")
                ir = ("incodes", l.name, tuple(codes))
                return (("bnot", ir) if e.op != "=" else ir), {l.name}
            raise _Bail("string ordering comparison")
        li, lc = _compile_expr(l, col_kinds, dictres)
        ri, rc = _compile_expr(r, col_kinds, dictres)
        if _ir_dtype(li) != _ir_dtype(ri):
            li, ri = _as_f64(li), _as_f64(ri)
        return ("cmp", _BOOL_CMP[e.op], li, ri), lc | rc
    raise _Bail(f"condition {type(e).__name__}")


def bool_ir_columns(ir) -> set:
    """Column names referenced by a boolean/value IR tree."""
    tag = ir[0]
    if tag == "col":
        return {ir[1]}
    if tag in ("incodes", "inints"):
        return {ir[1]}
    if tag == "lit":
        return set()
    out: set = set()
    for part in ir[1:]:
        if isinstance(part, tuple) and part and isinstance(part[0], str):
            out |= bool_ir_columns(part)
    return out


def eval_ir(ir, col):
    """Interpret an expression IR inside a traced program.  `col(name,
    dtype)` supplies decoded column values ("i64" | "f64"; dict columns
    supply their CODE image).  Shared by the local fused path and the
    distributed session."""
    tag = ir[0]
    if tag == "col":
        return col(ir[1], ir[2])
    if tag == "lut":
        # vocab-computed value: arrays[aix][gid] (string function
        # evaluated host-side over the column's global vocabulary)
        return col(ir[1], ("lut", ir[2], ir[3]))
    if tag == "lit":
        return (jnp.float64(ir[1]) if ir[2] == "f64"
                else jnp.int64(ir[1]))
    if tag == "cast":
        return eval_ir(ir[2], col).astype(jnp.float64)
    if tag == "neg":
        return -eval_ir(ir[2], col)
    if tag == "where":
        _, _, c, t, f = ir
        return jnp.where(eval_ir(c, col), eval_ir(t, col),
                         eval_ir(f, col))
    if tag == "cmp":
        _, op, l, r = ir
        lv, rv = eval_ir(l, col), eval_ir(r, col)
        return {"==": lv == rv, "!=": lv != rv, "<": lv < rv,
                "<=": lv <= rv, ">": lv > rv, ">=": lv >= rv}[op]
    if tag == "incodes":
        codes = col(ir[1], "i64")
        want = jnp.asarray(np.array(ir[2], np.int64))
        if want.size == 0:
            return jnp.zeros(codes.shape, jnp.bool_)
        return jnp.isin(codes, want)
    if tag == "inints":
        v = col(ir[1], ir[3])
        want = jnp.asarray(np.array(
            ir[2], np.float64 if ir[3] == "f64" else np.int64))
        return jnp.isin(v, want)
    if tag == "band":
        return eval_ir(ir[1], col) & eval_ir(ir[2], col)
    if tag == "bor":
        return eval_ir(ir[1], col) | eval_ir(ir[2], col)
    if tag == "bnot":
        return ~eval_ir(ir[1], col)
    _, op, _, l, r = ir
    lv, rv = eval_ir(l, col), eval_ir(r, col)
    if op == "+":
        return lv + rv
    if op == "-":
        return lv - rv
    if op == "*":
        return lv * rv
    if op == "fdiv":
        return lv // rv
    if op == "mod":
        return lv % rv
    return lv / rv


def eval_ir_nulls(ir, col, nul):
    """Null-aware IR interpreter -> (value, isnull).  `nul(name)` gives
    a column's null mask.  Boolean nodes fold NULL to FALSE (their only
    consumers are CASE arms and INNER-join residual filters, where SQL
    NULL and FALSE behave identically); value nodes propagate nulls,
    and ("where", ...) selects the null flag of the CHOSEN branch --
    `sum(case when k = 'A' then x else 0 end)` must count a NULL-k row
    as 0, not skip it."""
    tag = ir[0]
    if tag == "col":
        return col(ir[1], ir[2]), nul(ir[1])
    if tag == "lut":
        return col(ir[1], ("lut", ir[2], ir[3])), nul(ir[1])
    if tag == "lit":
        v = jnp.float64(ir[1]) if ir[2] == "f64" else jnp.int64(ir[1])
        return v, jnp.bool_(False)
    if tag == "cast":
        v, n = eval_ir_nulls(ir[2], col, nul)
        return v.astype(jnp.float64), n
    if tag == "neg":
        v, n = eval_ir_nulls(ir[2], col, nul)
        return -v, n
    if tag == "where":
        _, _, c, t, f = ir
        cv = _bool_nonnull(c, col, nul)
        tv, tn = eval_ir_nulls(t, col, nul)
        fv, fn = eval_ir_nulls(f, col, nul)
        return jnp.where(cv, tv, fv), jnp.where(cv, tn, fn)
    if tag in ("cmp", "incodes", "inints", "band", "bor", "bnot"):
        return _bool_nonnull(ir, col, nul), jnp.bool_(False)
    _, op, _, l, r = ir
    lv, ln = eval_ir_nulls(l, col, nul)
    rv, rn = eval_ir_nulls(r, col, nul)
    n = ln | rn
    if op == "+":
        return lv + rv, n
    if op == "-":
        return lv - rv, n
    if op == "*":
        return lv * rv, n
    if op == "fdiv":
        return lv // rv, n
    if op == "mod":
        return lv % rv, n
    return lv / rv, n


def _bool_nonnull(ir, col, nul):
    """Boolean IR with NULL folded to False (non-null result)."""
    tag = ir[0]
    if tag == "cmp":
        _, op, l, r = ir
        lv, ln = eval_ir_nulls(l, col, nul)
        rv, rn = eval_ir_nulls(r, col, nul)
        v = {"==": lv == rv, "!=": lv != rv, "<": lv < rv,
             "<=": lv <= rv, ">": lv > rv, ">=": lv >= rv}[op]
        return v & ~(ln | rn)
    if tag == "incodes":
        codes = col(ir[1], "i64")
        want = jnp.asarray(np.array(ir[2], np.int64))
        v = (jnp.zeros(codes.shape, jnp.bool_) if want.size == 0
             else jnp.isin(codes, want))
        return v & ~nul(ir[1])
    if tag == "inints":
        vv = col(ir[1], ir[3])
        want = jnp.asarray(np.array(
            ir[2], np.float64 if ir[3] == "f64" else np.int64))
        return jnp.isin(vv, want) & ~nul(ir[1])
    if tag == "band":
        return _bool_nonnull(ir[1], col, nul) & _bool_nonnull(ir[2], col, nul)
    if tag == "bor":
        return _bool_nonnull(ir[1], col, nul) | _bool_nonnull(ir[2], col, nul)
    if tag == "bnot":
        # NOT over null-folded False over-matches NULL rows; fold the
        # operand's nulls OUT of the complement too (NULL -> False)
        inner = ir[1]
        v = ~_bool_nonnull(inner, col, nul)
        for c in sorted(bool_ir_columns(inner)):
            v = v & ~nul(c)
        return v
    raise AssertionError(f"not a bool IR: {ir[0]}")


def _ir_dtype(ir) -> str:
    if ir[0] == "col" or ir[0] == "lit":
        return ir[2]
    if ir[0] == "lut":
        return ir[3]
    if ir[0] == "bin":
        return ir[2]
    return ir[1]  # neg / cast


def _as_f64(ir):
    return ir if _ir_dtype(ir) == "f64" else ("cast", "f64", ir)


# -- scaled-integer rewrite of f64 sum inputs ---------------------------------
#
# ALP float columns store enc = round(v * 10^e): the f64 value IS a
# 10^-e-scaled integer.  A sum/avg input built from such columns,
# exact decimal literals and +,-,* therefore rewrites to an EXACT
# integer expression with a known output scale -- accumulated in i64
# (one scatter batch with the counts instead of a second f64 pass, or
# the one-pass Pallas histogram), divided by 10^scale only at host
# decode.  TPC-H's sum(l_extendedprice * (1 - l_discount)) becomes a
# 10^-4-scaled i64 sum (the round-4 VERDICT's named round-5 lever).
# Matches the reference's Arrow decimal128 sum semantics
# (datafusion aggregates sum decimals in i128 at fixed scale).

_SCALE_MAX = 14


def _lit_scaled(v):
    """Exact decimal (int, scale) of a SQL numeric literal, or None.
    Uses the shortest decimal repr -- the literal's source text -- so
    0.05 means decimal 5e-2 (what the query author wrote), not the f64
    approximation."""
    from decimal import Decimal
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return (v, 0)
    if v != v or v in (float("inf"), float("-inf")):
        return None
    d = Decimal(repr(float(v)))
    exp = d.as_tuple().exponent
    if exp >= 0:
        return (int(d), 0)
    s = -exp
    if s > 6:
        return None
    return (int(d.scaleb(s)), s)


def _scale_up_ir(x, digits: int):
    return ("bin", "*", "i64", x, ("lit", 10 ** digits, "i64"))


def _scaled_int_ir(ir, scaledres, bounds_of):
    """f64-valued IR -> (int_ir, scale, maxabs) with
    value * 10^scale == int_ir exactly, or None when the expression is
    not provably a bounded scaled integer.  `scaledres(col)` returns
    (scale, maxabs) for a rewritable ALP float column (registering its
    per-block multiplier for the "i64s" decode); `bounds_of(col)` gives
    integer column bounds."""
    tag = ir[0]
    if tag == "col":
        if ir[2] == "i64":
            b = bounds_of(ir[1]) if bounds_of else None
            if b is None:
                return None
            return (ir, 0, max(abs(b[0]), abs(b[1]), 1))
        info = scaledres(ir[1]) if scaledres else None
        if info is None:
            return None
        sc, ma = info
        return (("col", ir[1], "i64s"), sc, ma)
    if tag == "lit":
        got = _lit_scaled(ir[1])
        if got is None:
            return None
        iv, sc = got
        return (("lit", iv, "i64"), sc, max(abs(iv), 1))
    if tag == "cast":  # ("cast", "f64", x): numeric identity
        return _scaled_int_ir(ir[2], scaledres, bounds_of)
    if tag == "neg":
        r = _scaled_int_ir(ir[2], scaledres, bounds_of)
        if r is None:
            return None
        x, sc, ma = r
        return (("neg", "i64", x), sc, ma)
    if tag == "bin" and ir[1] in ("+", "-", "*"):
        li = _scaled_int_ir(ir[3], scaledres, bounds_of)
        ri = _scaled_int_ir(ir[4], scaledres, bounds_of)
        if li is None or ri is None:
            return None
        lx, ls, lm = li
        rx, rs, rm = ri
        if ir[1] == "*":
            sc, ma = ls + rs, lm * rm
            x = ("bin", "*", "i64", lx, rx)
        else:
            sc = max(ls, rs)
            if ls < sc:
                lx, lm = _scale_up_ir(lx, sc - ls), lm * 10 ** (sc - ls)
            if rs < sc:
                rx, rm = _scale_up_ir(rx, sc - rs), rm * 10 ** (sc - rs)
            ma = lm + rm
            x = ("bin", ir[1], "i64", lx, rx)
        if sc > _SCALE_MAX or ma >= (1 << 62):
            return None
        return (x, sc, ma)
    if tag == "where":
        _, _, c, t, f = ir
        ti = _scaled_int_ir(t, scaledres, bounds_of)
        fi = _scaled_int_ir(f, scaledres, bounds_of)
        if ti is None or fi is None:
            return None
        tx, ts, tm = ti
        fx, fs, fm = fi
        sc = max(ts, fs)
        if ts < sc:
            tx, tm = _scale_up_ir(tx, sc - ts), tm * 10 ** (sc - ts)
        if fs < sc:
            fx, fm = _scale_up_ir(fx, sc - fs), fm * 10 ** (sc - fs)
        if sc > _SCALE_MAX:
            return None
        return (("where", "i64", c, tx, fx), sc, max(tm, fm))
    return None


def _scaled_dt(scale: int) -> str:
    # scale 0 keeps the tag too: the slot's OUTPUT type is f64 (the SQL
    # expression was float-typed), so decode must not emit raw int64
    return f"i64s{scale}"


def _unscale_np(acc: np.ndarray, scale: int) -> np.ndarray:
    """f64 of acc / 10^scale.  Below 2^53 the i64->f64 conversion is
    exact and the division correctly rounded (bit-identical to the
    classic decode of the same decimal) -- the integer-part split would
    DOUBLE-round (157/100 -> 1 + 0.57 = 1.5699999999999998 != 1.57).
    Beyond 2^53 split off the integer part to stay within ~1 ulp."""
    s10 = 10 ** scale
    acc = np.asarray(acc, np.int64)
    small = np.abs(acc) < (1 << 53)
    direct = acc.astype(np.float64) / float(s10)
    if small.all():
        return direct
    q, r = np.divmod(acc, s10)
    wide = q.astype(np.float64) + r.astype(np.float64) / float(s10)
    return np.where(small, direct, wide)


def _freeze(x):
    """Nested lists/dicts -> hashable tuples for the jit static spec."""
    if isinstance(x, (list, tuple)):
        return tuple(_freeze(v) for v in x)
    if isinstance(x, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in x.items()))
    return x


# -- per-column device prep ---------------------------------------------------

class _ColPrep:
    """Stacked device representation of ONE column over ALL blocks of
    the table, built once and cached (query-shape independent)."""

    __slots__ = ("kind", "arrow_type", "payloads", "planes_stack", "refs",
                 "inv", "valid_stack", "codes_stack", "dmax",
                 "patch_rows", "patch_vals", "has_pred_patches",
                 "vocab_list", "remap_stack", "gid_stack", "lin_stack")

    def __init__(self):
        self.vocab_list = None
        self.remap_stack = None
        self.gid_stack = None


def _stack_planes(payloads) -> Tuple[jax.Array, np.ndarray]:
    """Stack per-block planes, zero-padding to the max bucket (zero
    planes are semantically transparent: those bits are absent), in ONE
    host assembly + ONE device upload (payload planes are host-resident
    after transcode; see LiquidPrimitiveArray.planes_np)."""
    wb = max(max(p.planes_np.shape[0] for p in payloads), 1)
    out = np.zeros((len(payloads), wb, _W), np.uint32)
    for i, p in enumerate(payloads):
        pl = p.planes_np
        if pl.shape[0]:
            out[i, : pl.shape[0]] = pl
    refs = np.array([_wrap_i64(p.reference_value) for p in payloads],
                    np.int64)
    return jnp.asarray(out), refs


def _wrap_i64(v: int) -> int:
    v = v % (1 << 64)
    return v - (1 << 64) if v >= (1 << 63) else v


_FULL_WORDS = np.full(_W, 0xFFFFFFFF, np.uint32)


def _stack_validity(payloads) -> Optional[jax.Array]:
    if all(p.validity_np is None for p in payloads):
        return None
    out = np.empty((len(payloads), _W), np.uint32)
    for i, p in enumerate(payloads):
        v = p.validity_np
        out[i] = v if v is not None else _FULL_WORDS
    return jnp.asarray(out)


def _prep_column(payloads, arrow_type) -> _ColPrep:
    from liquid_tpu.arrays.decimal import LiquidDecimalArray
    from liquid_tpu.arrays.linear import LiquidLinearArray
    prep = _ColPrep()
    prep.arrow_type = arrow_type
    prep.payloads = list(payloads)
    p0 = payloads[0]
    if any(isinstance(p, LiquidDecimalArray) for p in payloads):
        # subclasses LiquidPrimitiveArray but holds UNSCALED values:
        # raw-literal intervals / i64 sums would be silently wrong
        raise _Bail("decimal column")
    if isinstance(p0, (LiquidLinearArray, LiquidPrimitiveArray)) and any(
            isinstance(p, LiquidLinearArray) for p in payloads):
        # value[i] = round(slope*i) + residual[i]: decode adds the
        # per-block linear term on device.  The transcoder picks
        # linear vs plain bit-planes PER BLOCK by fit quality, so a
        # column routinely mixes both classes -- a plain primitive
        # block is exactly a linear block with slope 0.
        if any(not isinstance(p, (LiquidLinearArray,
                                  LiquidPrimitiveArray))
               for p in payloads):
            raise _Bail("mixed payload classes")
        prep.kind = "linear"
        res = [p.residuals if isinstance(p, LiquidLinearArray) else p
               for p in payloads]
        prep.planes_stack, prep.refs = _stack_planes(res)
        prep.valid_stack = _stack_validity(res)
        prep.inv = np.array(
            [p.slope if isinstance(p, LiquidLinearArray) else 0.0
             for p in payloads], np.float64)
        # the linear term round(slope*i) is computed HOST-side with the
        # SAME numpy rounding the encoder used: the device's emulated
        # f64 multiply+round can flip by 1 at some i, silently
        # corrupting decoded keys (TPC-H q4/q5/q7 counts off at SF1)
        iota = np.arange(BLOCK_ROWS, dtype=np.float64)
        lin = np.stack([np.round(p.slope * iota).astype(np.int64)
                        if isinstance(p, LiquidLinearArray)
                        else np.zeros(BLOCK_ROWS, np.int64)
                        for p in payloads])
        prep.lin_stack = jnp.asarray(
            lin.astype(np.int32) if np.abs(lin).max(initial=0) < (1 << 31)
            else lin)
        return prep
    if isinstance(p0, LiquidPrimitiveArray):
        if any(not isinstance(p, LiquidPrimitiveArray)
               for p in payloads):
            raise _Bail("mixed payload classes")
        prep.kind = "planes"
        prep.planes_stack, prep.refs = _stack_planes(payloads)
        prep.valid_stack = _stack_validity(payloads)
    elif isinstance(p0, LiquidFloatArray):
        if any(not isinstance(p, LiquidFloatArray) for p in payloads):
            raise _Bail("mixed payload classes")
        prep.kind = "float"
        prep.planes_stack, prep.refs = _stack_planes(payloads)
        prep.valid_stack = _stack_validity(payloads)
        prep.inv = np.array([p._inv for p in payloads], np.float64)
        rows, vals = [], []
        for b, p in enumerate(payloads):
            if p.num_patches:
                rows.append(p.patch_idx.astype(np.int64) + b * BLOCK_ROWS)
                vals.append(p.patch_vals)
        n_total = len(payloads) * BLOCK_ROWS
        if rows:
            r = np.concatenate(rows)
            v = np.concatenate(vals)
            cap = 1 << max(int(np.ceil(np.log2(max(len(r), 1)))), 4)
            prep.patch_rows = np.full(cap, n_total, np.int64)
            prep.patch_rows[: len(r)] = r
            prep.patch_vals = np.zeros(cap, np.float64)
            prep.patch_vals[: len(v)] = v
        else:
            prep.patch_rows = None
            prep.patch_vals = None
        prep.has_pred_patches = bool(rows)
    elif isinstance(p0, LiquidByteViewArray):
        if any(not isinstance(p, LiquidByteViewArray) for p in payloads):
            raise _Bail("mixed payload classes")
        prep.kind = "dict"
        prep.codes_stack = jnp.asarray(
            np.stack([p.codes_np for p in payloads]))
        prep.valid_stack = _stack_validity(payloads)
        prep.dmax = max(max(p.dict_size for p in payloads), 1)
    else:
        raise _Bail(f"payload {type(p0).__name__}")
    return prep


def _build_vocab(prep: _ColPrep) -> None:
    """Global dictionary vocabulary + per-block remap (lazy: only when
    the column participates as a key / in expression IR).  The vocab is
    SORTED, so gid order == value order: MIN/MAX over gids decode to
    the lexicographic min/max string (UTF-8 byte order preserves code
    point order), and range comparisons on gids become possible."""
    if prep.vocab_list is not None:
        return
    per_block = []
    values: set = set()
    for p in prep.payloads:
        vals = p.dictionary.to_pylist()
        per_block.append(vals)
        values.update(vals)
    has_none = None in values
    vocab_list = sorted(v for v in values if v is not None)
    if has_none:
        vocab_list.append(None)
    vocab = {v: i for i, v in enumerate(vocab_list)}
    remaps = np.zeros((len(prep.payloads), prep.dmax), np.int64)
    for b, vals in enumerate(per_block):
        for i, v in enumerate(vals):
            remaps[b, i] = vocab[v]
    prep.vocab_list = vocab_list
    prep.remap_stack = jnp.asarray(remaps)


def _gid_stack(prep: _ColPrep):
    """Pre-remapped global-gid code stack, computed ON DEVICE once per
    column and cached.  The per-row remap gather costs ~21ns/row in
    XLA (measured: 258ms of TPC-H q1's key stage for two dict keys at
    6M rows) yet its result is a pure function of stored data -- so it
    belongs in the prep, not in every query program."""
    if prep.gid_stack is None:
        remap = prep.remap_stack
        codes = jnp.clip(prep.codes_stack, 0,
                         remap.shape[1] - 1).astype(jnp.int32)
        prep.gid_stack = jnp.take_along_axis(
            remap, codes.astype(jnp.int64), axis=1).astype(jnp.int32)
    return prep.gid_stack


# -- predicate lowering -------------------------------------------------------

def _primitive_interval(payloads, pred: Predicate):
    """-> (lo u64[nb], hi u64[nb] inclusive, negate) or None."""
    if isinstance(pred.literal, bool) and pa.types.is_boolean(
            payloads[0].arrow_type):
        # bool blocks store 0/1 in the packed domain; packed_plan
        # rejects bool literals (ambiguous for int columns), but here
        # the column is genuinely boolean
        pred = Predicate(pred.op, int(pred.literal))
    negate = pred.op == "ne"  # the only complemented interval form;
    #                           packed_plan's float normalization never
    #                           rewrites ne into another op
    lo = np.zeros(len(payloads), np.uint64)
    hi = np.zeros(len(payloads), np.uint64)
    FULL = (np.uint64(0), np.uint64(_U64MAX))
    EMPTY = (np.uint64(1), np.uint64(0))
    for b, p in enumerate(payloads):
        if p.planes_np.shape[0] >= 64:
            return None  # interval form needs hi < 2^64-1
        plan = p.packed_plan(pred)
        if plan is None:
            return None
        if plan[0] == "const":
            # folded all/none, expressed under the shared negate flag:
            # mask = negate XOR (off in [lo, hi])
            want_all = bool(plan[1])
            lo[b], hi[b] = FULL if want_all != negate else EMPTY
            continue
        _, u, op = plan
        if (op == "ne") != negate:  # cannot happen (literal-determined)
            return None
        u = int(u)
        if op in ("eq", "ne"):
            lo[b], hi[b] = u, u
        elif op == "lt":
            lo[b], hi[b] = 0, u - 1  # u >= 1 (in-domain)
        elif op == "lt_eq":
            lo[b], hi[b] = 0, u
        elif op == "gt":
            lo[b], hi[b] = u + 1, _U64MAX
        else:  # gt_eq
            lo[b], hi[b] = u, _U64MAX
    return lo, hi, bool(negate) if negate is not None else False


def _float_interval(payloads, pred: Predicate):
    """ALP column predicate as per-block offset intervals (the decode
    map is monotone; thresholds found host-side as in
    float_alp.try_eval_predicate).  Exception-patch rows are settled
    host-side into (clear, set) packed word overlays applied after the
    interval mask (the fused analogue of _apply_patch_verdict).

    -> (lo, hi, negate, clear_words|None, set_words|None) or None."""
    import math
    if pred.op not in ("eq", "ne", "lt", "lt_eq", "gt", "gt_eq"):
        return None
    lit = pred.literal
    if isinstance(lit, bool) or not isinstance(
            lit, (int, float, np.integer, np.floating)):
        return None
    lit = float(lit)
    negate = pred.op == "ne"
    lo = np.zeros(len(payloads), np.uint64)
    hi = np.zeros(len(payloads), np.uint64)
    clear = None
    setw = None
    fns = {"eq": np.equal, "ne": np.not_equal, "lt": np.less,
           "lt_eq": np.less_equal, "gt": np.greater,
           "gt_eq": np.greater_equal}
    for b, p in enumerate(payloads):
        if p.num_patches:
            if clear is None:
                clear = np.full((len(payloads), _W), 0xFFFFFFFF, np.uint32)
                setw = np.zeros((len(payloads), _W), np.uint32)
            pv = p.patch_vals
            if pa.types.is_float32(p.arrow_type):
                pv = pv.astype(np.float32).astype(np.float64)
            verdict = fns[pred.op](pv, np.float64(lit))
            words = p.patch_idx // 32
            bits = np.uint32(1) << (p.patch_idx % 32).astype(np.uint32)
            np.bitwise_and.at(clear[b], words, ~bits)
            on = np.where(verdict, bits, np.uint32(0))
            np.bitwise_or.at(setw[b], words, on)
        if p.planes_np.shape[0] >= 64:
            return None  # interval form needs hi < 2^64-1
        if math.isnan(lit):
            # x <op> NaN is False for all ops except ne (pyarrow/DataFusion
            # treat NaN as largest; classic path matches float_alp): empty
            # interval; ne negates to all
            lo[b], hi[b] = np.uint64(1), np.uint64(0)
            continue
        t_ge = p._lower_bound(lit, strict=False)
        t_gt = p._lower_bound(lit, strict=True)
        if pred.op == "lt":
            l, h = (0, t_ge - 1) if t_ge > 0 else (1, 0)
        elif pred.op == "lt_eq":
            l, h = (0, t_gt - 1) if t_gt > 0 else (1, 0)
        elif pred.op == "gt":
            l, h = t_gt, _U64MAX
        elif pred.op == "gt_eq":
            l, h = t_ge, _U64MAX
        else:  # eq / ne
            l, h = (t_ge, t_gt - 1) if t_gt > t_ge else (1, 0)
        lo[b], hi[b] = l, h
    return lo, hi, negate, clear, setw


def _dict_lut(payloads, pred: Predicate, dmax: int):
    """Per-block boolean verdict LUT over dictionary entries (prefix
    keys / fingerprints / pyarrow kernels, cached per payload)."""
    luts = np.zeros((len(payloads), dmax), bool)
    for b, p in enumerate(payloads):
        vkey = (pred.op, pred.literal)
        vd = p._verdict_cache.get(vkey)
        if vd is None:
            vd = p._dict_verdict(pred)
            if vd is not None:
                p._verdict_cache[vkey] = vd
        if vd is None:
            return None
        luts[b, : len(vd)] = vd
    return luts


# -- traced program -----------------------------------------------------------

def _in_interval_many(planes_stack, lo, hi):
    """Packed membership masks off in [lo, hi] (inclusive) per block.
    On real TPUs the per-block-constant Pallas kernel runs the compare
    at memory speed (787 GB/s measured, PERF_NOTES.md); elsewhere the
    vmapped XLA chain."""
    bsz, bucket, w_words = planes_stack.shape
    # the per-block constants table lives in SMEM (1 MB): beyond ~2k
    # blocks (SF10-scale tables) it overflows and Mosaic refuses to
    # compile -- the vmapped XLA chain takes over there
    if (jax.default_backend() == "tpu" and bucket > 0 and bsz > 1
            and bsz <= 2048 and w_words == _W):
        from liquid_tpu.ops import bitpack_pallas as bpp
        lt_lo, _ = bpp.cmp_const_many_pallas(planes_stack, lo,
                                             interpret=False)
        lt_hi, eq_hi = bpp.cmp_const_many_pallas(planes_stack, hi,
                                                 interpret=False)
        return (~lt_lo) & (lt_hi | eq_hi)

    def one(planes, l, h):
        lt_lo, _ = bp.cmp_const(planes, l)
        lt_hi, eq_hi = bp.cmp_const(planes, h)
        return (~lt_lo) & (lt_hi | eq_hi)
    return jax.vmap(one)(planes_stack, lo, hi)


def _pack_bools_2d(bools):
    nb = bools.shape[0]
    return mops.pack_bools(bools.reshape(-1)).reshape(nb, _W)


def _selection_packed(colmap, pred_groups, arrays, sel):
    """AND the packed per-block masks of every pushdown group into
    `sel` (u32 [nb, W]); shared by the single-table fused program, the
    star-join fact program, and the star dim-build programs."""
    for grp in pred_groups:
        gm = None
        for alt in grp:
            cix = colmap[alt[1]]
            if alt[0] in ("iv", "ivp"):
                m = _in_interval_many(arrays[cix["planes"]],
                                      arrays[alt[2]], arrays[alt[3]])
                if alt[4]:
                    m = ~m
                if alt[0] == "ivp":  # ALP exception-patch overlay
                    m = (m & arrays[alt[5]]) | arrays[alt[6]]
            else:  # lut
                lut = arrays[alt[2]]
                codes = jnp.clip(arrays[cix["codes"]], 0, lut.shape[1] - 1)
                hits = jnp.take_along_axis(lut, codes, axis=1)
                m = _pack_bools_2d(hits)
            if "valid" in cix:
                m = m & arrays[cix["valid"]]
            gm = m if gm is None else (gm | m)
        sel = sel & gm
    return sel


def _make_decoders(colmap, arrays, n, probe_j):
    """(decode, col_nulls) closures over the traced arrays.  `probe_j`
    maps probe id -> per-row join index (i32, -1 = no match) for "pay"
    columns (star-join dim payloads gathered through a probe)."""
    dec_cache: Dict[Tuple[str, str], jax.Array] = {}
    null_cache: Dict[str, jax.Array] = {}

    def col_nulls(name):
        out = null_cache.get(name)
        if out is None:
            cix = colmap[name]
            if cix["kind"] == "pay":
                j = probe_j[cix["probe"]]
                miss = j < 0
                if "nulls" in cix:
                    jc = jnp.clip(j, 0, arrays[cix["nulls"]].shape[0] - 1)
                    out = arrays[cix["nulls"]][jc] | miss
                else:
                    out = miss
            elif "valid" in cix:
                out = ~mops.unpack_bits(arrays[cix["valid"]].reshape(-1))
            else:
                out = jnp.zeros(n, jnp.bool_)
            null_cache[name] = out
        return out

    def decode(name, dt):
        out = dec_cache.get((name, dt))
        if out is not None:
            return out
        if isinstance(dt, tuple) and dt[0] == "lut":
            _tag, aix, vdt = dt
            gids = decode(name, "i64")
            tblv = arrays[aix]
            v = tblv[jnp.clip(gids, 0, tblv.shape[0] - 1)]
            if vdt == "f64" and v.dtype != jnp.float64:
                v = v.astype(jnp.float64)
            dec_cache[(name, dt)] = v
            return v
        cix = colmap[name]
        kind = cix["kind"]
        if kind == "planes":
            off = bp.unpack_bitplanes_many(
                arrays[cix["planes"]],
                jnp.uint64 if arrays[cix["planes"]].shape[1] > 32
                else jnp.uint32)
            v = off.astype(jnp.int64) + arrays[cix["refs"]][:, None]
            v = v.reshape(-1)
            if dt == "f64":
                v = v.astype(jnp.float64)
        elif kind == "float":
            off = bp.unpack_bitplanes_many(
                arrays[cix["planes"]],
                jnp.uint64 if arrays[cix["planes"]].shape[1] > 32
                else jnp.uint32)
            enc = off.astype(jnp.int64) + arrays[cix["refs"]][:, None]
            if dt == "i64s":
                # scaled-int image: enc * 10^(E - e_block), exact; the
                # planner registered the per-block multiplier and the
                # validated scaled images of any exception patches
                v = (enc * arrays[cix["smult"]][:, None]).reshape(-1)
                if "spatch" in cix:
                    v = v.at[arrays[cix["patch_rows"]]].set(
                        arrays[cix["spatch"]], mode="drop")
            else:
                v = (enc.astype(jnp.float64)
                     * arrays[cix["inv"]][:, None]).reshape(-1)
                if "patch_rows" in cix:
                    v = v.at[arrays[cix["patch_rows"]]].set(
                        arrays[cix["patch_vals"]], mode="drop")
        elif kind == "linear":
            off = bp.unpack_bitplanes_many(
                arrays[cix["planes"]],
                jnp.uint64 if arrays[cix["planes"]].shape[1] > 32
                else jnp.uint32)
            resid = off.astype(jnp.int64) + arrays[cix["refs"]][:, None]
            # host-precomputed round(slope*i) table (encoder-exact)
            lin = arrays[cix["lin"]].astype(jnp.int64)
            v = (resid + lin).reshape(-1)
            if dt == "f64":
                v = v.astype(jnp.float64)
        elif kind == "pay":
            j = probe_j[cix["probe"]]
            vals = arrays[cix["vals"]]
            jc = jnp.clip(j, 0, vals.shape[0] - 1)
            v = vals[jc]
            if dt == "f64" and v.dtype != jnp.float64:
                v = v.astype(jnp.float64)
        else:  # dict codes: global gids when a remap is registered,
            #    raw per-block codes otherwise (COUNT nullness only)
            if "gids" in cix:
                # pre-remapped on device once per column (_gid_stack);
                # the in-program per-row gather cost ~21ns/row
                v = arrays[cix["gids"]].reshape(-1).astype(jnp.int64)
            elif "remap" in cix:
                remap = arrays[cix["remap"]]
                v = jnp.take_along_axis(
                    remap,
                    jnp.clip(arrays[cix["codes"]], 0,
                             remap.shape[1] - 1).astype(jnp.int64),
                    axis=1).reshape(-1)
            else:
                v = arrays[cix["codes"]].reshape(-1).astype(jnp.int64)
        dec_cache[(name, dt)] = v
        return v

    return decode, col_nulls


def _apply_fd_packed(mat, fd_spec, arrays):
    """Rebuild the packed output matrix with FUNCTIONALLY-DERIVED group
    keys: the reduction ran on the single representative key; each
    derived key gathers through its dim's index table at PACK time
    (w rows), costing nothing per input row.

    fd_spec: (rep_pos, nk_full, entries) with entries
    (out_pos, idx_ix, lo_ix, vals_ix, nulls_ix|-1, ptype)."""
    rep_pos, nk_full, entries = fd_spec
    hdr, kv, knl = mat[0], mat[1], mat[2]
    keys_rows: List[Optional[jax.Array]] = [None] * nk_full
    null_rows: List[Optional[jax.Array]] = [None] * nk_full
    keys_rows[rep_pos] = kv
    null_rows[rep_pos] = knl
    for (pos, idx_ix, lo_ix, vals_ix, nulls_ix, ptype) in entries:
        if idx_ix < 0:
            # probe-index mode: kv IS the dim row id
            j = kv.astype(jnp.int32)
        else:
            idxt = arrays[idx_ix]
            rel = jnp.clip(kv - arrays[lo_ix], 0, idxt.shape[0] - 1)
            j = idxt[rel]
        vals = arrays[vals_ix]
        jc = jnp.clip(j, 0, vals.shape[0] - 1)
        v = vals[jc]
        if ptype == "f64":
            v = floatbits.f64_bits(v + 0.0)
        else:
            v = v.astype(jnp.int64)
        nl = j < 0
        if nulls_ix >= 0:
            nl = nl | arrays[nulls_ix][jc]
        keys_rows[pos] = v
        null_rows[pos] = nl.astype(jnp.int64)
    return jnp.stack([hdr] + keys_rows + null_rows
                     + [mat[i] for i in range(3, mat.shape[0])])


def probe_dims(probes, arrays, decode, col_nulls, probe_j, selb):
    """Star-join dim probes shared by the fact program and snowflake
    dim builds: map each scanned row to its dim row id j (or -1).

    Two probe forms:
      (pid, kname, idx_ix, lo_ix) -- unique single-column key:
        j = idx[key - lo] direct-address lookup.
      (pid, kname, idx_ix, lo_ix, k2name, ord_ix, cnt_ix, vals2_ix,
       max_dup) -- composite two-column key (e.g. partsupp on
        (ps_partkey, ps_suppkey), reference TPC-H q9): the dim rows are
        sorted by (key1, key2); idx[key1 - lo] points at the FIRST
        sorted position for key1 and cnt at the run length; the probe
        unrolls max_dup candidate positions comparing key2, then maps
        the hit position to the dim row id through ord.
    """
    for pr in probes:
        if len(pr) == 4:
            (pid, kname, idx_ix, lo_ix) = pr
            kv = decode(kname, "i64")
            knl = col_nulls(kname)
            tbl = arrays[idx_ix]
            rel = kv - arrays[lo_ix]
            inb = (rel >= 0) & (rel < tbl.shape[0])
            j = jnp.where(
                inb & ~knl,
                tbl[jnp.clip(rel, 0, tbl.shape[0] - 1)],
                jnp.int32(-1))
        else:
            (pid, kname, idx_ix, lo_ix, k2name, ord_ix, cnt_ix,
             vals2_ix, max_dup) = pr
            kv = decode(kname, "i64")
            knl = col_nulls(kname) | col_nulls(k2name)
            k2 = decode(k2name, "i64")
            tbl = arrays[idx_ix]
            ordv = arrays[ord_ix]
            cnt = arrays[cnt_ix]
            vals2 = arrays[vals2_ix]
            rel = kv - arrays[lo_ix]
            inb = (rel >= 0) & (rel < tbl.shape[0]) & ~knl
            relc = jnp.clip(rel, 0, tbl.shape[0] - 1)
            j0 = tbl[relc]
            c = cnt[relc]
            pos = jnp.full(kv.shape, jnp.int32(-1))
            for d in range(max_dup):
                cand = j0 + jnp.int32(d)
                candc = jnp.clip(cand, 0, vals2.shape[0] - 1)
                m = inb & (j0 >= 0) & (jnp.int32(d) < c) \
                    & (vals2[candc] == k2)
                pos = jnp.where(m, candc, pos)
            j = jnp.where(pos >= 0,
                          ordv[jnp.clip(pos, 0, ordv.shape[0] - 1)],
                          jnp.int32(-1))
        probe_j[pid] = j
        selb = selb & (j >= 0)  # INNER join: unmatched rows drop
    return selb


@partial(jax.jit, static_argnums=(0,))
def _fused_run(spec, *arrays):
    return _fused_core(spec, arrays)


def _fused_core(spec, arrays):
    (mode, cols, pred_groups, probes, eprobes, resids, keys, fd_spec,
     rslots, rv_ix, n_slots, salt, extra, topk_spec) = spec
    colmap = {c[0]: dict(c[1]) for c in cols}

    # -- selection ----------------------------------------------------------
    sel = _selection_packed(colmap, pred_groups, arrays, arrays[rv_ix])
    selb = mops.unpack_bits(sel.reshape(-1))  # bool [N]

    probe_j: Dict[int, jax.Array] = {}
    decode, col_nulls = _make_decoders(colmap, arrays, selb.shape,
                                       probe_j)

    # -- star-join probes: gather the dim row index per fact row ------------
    selb = probe_dims(probes, arrays, decode, col_nulls, probe_j, selb)

    # -- existence probes (EXISTS / NOT EXISTS / IN-subquery semijoins) ----
    for (kname, cnt_ix, plo_ix, emode, mmv_ix, mmx_ix, mmname) in eprobes:
        kv = decode(kname, "i64")
        knl = col_nulls(kname)
        cnt = arrays[cnt_ix]
        rel = kv - arrays[plo_ix]
        inb = (rel >= 0) & (rel < cnt.shape[0] - 1) & ~knl
        relc = jnp.clip(rel, 0, cnt.shape[0] - 1)
        hit = inb & (cnt[relc] > 0)
        if mmv_ix >= 0:
            # q21 shape: EXISTS(... AND inner.c <> outer.c) -- present
            # iff some inner row's c differs from ours (min != v or
            # max != v); NULL outer c makes the condition NULL -> no hit
            mv = decode(mmname, "i64")
            hit = hit & ((arrays[mmv_ix][relc] != mv)
                         | (arrays[mmx_ix][relc] != mv)) \
                & ~col_nulls(mmname)
        if emode == "semi":
            selb = selb & hit
        elif emode == "anti":
            selb = selb & ~hit
        else:  # anti_nn: NOT IN -- a NULL operand is NULL, not TRUE
            selb = selb & ~hit & ~knl

    # -- residual predicates (cross-table / unclassifiable conjuncts) -------
    for ir in resids:
        selb = selb & _bool_nonnull(ir, decode, col_nulls)

    # -- aggregate inputs ---------------------------------------------------
    # Values evaluate NULL-exactly (eval_ir_nulls): CASE selects the
    # chosen branch's null flag, so `sum(case when k='A' then x else 0)`
    # counts a NULL-k row as 0 instead of skipping it.  count(plain col)
    # keeps the cheap ("ones",)+nullcols form; count(expr) rides
    # ("nncount", ir) and counts rows where the expr is non-NULL.
    vals, vnulls, kinds = [], [], []
    for (kind, _dt, ir, nullcols) in rslots:
        if ir == ("ones",):
            v = jnp.ones(selb.shape, jnp.int64)
            vn = None
            for cn in nullcols:
                n = col_nulls(cn)
                vn = n if vn is None else (vn | n)
            if vn is None:
                vn = jnp.zeros(selb.shape, jnp.bool_)
        elif ir[0] == "nncount":
            _v, vn = eval_ir_nulls(ir[1], decode, col_nulls)
            v = jnp.ones(selb.shape, jnp.int64)
            if jnp.ndim(vn) == 0:
                vn = jnp.broadcast_to(vn, selb.shape)
        else:
            v, vn = eval_ir_nulls(ir, decode, col_nulls)
            v = jnp.asarray(v)
            if v.ndim == 0:
                v = jnp.broadcast_to(v, selb.shape)
            if jnp.ndim(vn) == 0:
                vn = jnp.broadcast_to(vn, selb.shape)
        vals.append(v)
        vnulls.append(vn)
        kinds.append(kind)

    if mode == "scalar":
        from liquid_tpu.ops.groupby import scalar_reduce
        outs, counts = scalar_reduce(selb, tuple(vals), tuple(vnulls),
                                     tuple(kinds))
        packed = []
        for o in outs:
            if o.dtype == jnp.float64:
                packed.append(floatbits.f64_bits(o[None]))
            else:
                packed.append(o.astype(jnp.int64)[None])
        for c in counts:
            packed.append(c[None])
        return jnp.concatenate(packed)

    # -- grouped: key codes + hash scatter-reduce ---------------------------
    codes_l, knulls_l = [], []
    for name in keys:
        if isinstance(name, tuple) and name and name[0] == "probe":
            # probe-index grouping: the key is the dense dim-row id j
            # (computed above for the star probe); value recovery is a
            # vals[j] gather at pack time (_apply_fd_packed)
            codes_l.append(probe_j[name[1]].astype(jnp.int64))
            knulls_l.append(jnp.zeros(selb.shape, jnp.bool_))
            continue
        if isinstance(name, tuple) and name and name[0] == "expr":
            # expression group key (GROUP BY 1 / arithmetic / CASE):
            # evaluated in-program, keyed by value image
            _, ir, dt = name
            v, nl = eval_ir_nulls(ir, decode, col_nulls)
            v = jnp.asarray(v)
            if v.ndim == 0:
                v = jnp.broadcast_to(v, selb.shape)
            if jnp.ndim(nl) == 0:
                nl = jnp.broadcast_to(nl, selb.shape)
            code = (floatbits.f64_bits(v + 0.0) if dt == "f64"
                    else v.astype(jnp.int64))
            codes_l.append(jnp.where(nl, jnp.int64(0), code))
            knulls_l.append(nl)
            continue
        cix = colmap[name]
        kind = cix["kind"]
        if kind == "float" or (kind == "pay"
                               and cix.get("ptype") == "f64"):
            # canonical IEEE bit image (-0.0 -> +0.0 via +0.0)
            code = floatbits.f64_bits(decode(name, "f64") + 0.0)
        else:
            # planes / linear values, dict global gids (remap registered
            # for every key column), pay values/gids
            code = decode(name, "i64")
        nl = col_nulls(name)
        codes_l.append(jnp.where(nl, jnp.int64(0), code))
        knulls_l.append(nl)

    if mode == "sortpairs":
        # count(DISTINCT d) without a pair-wide collision table: SORT
        # the (outer keys, d) columns -- bandwidth-friendly on TPU,
        # unlike the ~1 KB/row random RMW a pair-cardinality hash
        # table pays (PERF_NOTES.md tile-padding finding) -- and take
        # first-occurrence flags from sorted adjacency.  nunique is
        # then the per-key SUM of flags, and every other aggregate
        # reduces over raw rows (sum of per-pair sums == sum of rows,
        # same for min/max/count), so ONE small-table reduction keyed
        # by the outer keys finishes the query.
        recipes, kinds2, rounds2 = extra
        n = selb.shape[0]
        inv = ~selb
        ops = [inv.astype(jnp.int32)]
        for c, nl in zip(codes_l, knulls_l):
            ops.append(nl.astype(jnp.int32))
            ops.append(c)
        ops.append(jnp.arange(n, dtype=jnp.int32))
        srt = jax.lax.sort(tuple(ops), num_keys=len(ops) - 1)
        inv_s = srt[0].astype(jnp.bool_)
        dnull_s = srt[-3].astype(jnp.bool_)
        perm = srt[-1]
        anyneq = jnp.zeros((n - 1,), jnp.bool_)
        for k in srt[1:-1]:
            anyneq = anyneq | (k[1:] != k[:-1])
        pairnew_s = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), anyneq])
        flag_s = pairnew_s & ~inv_s & ~dnull_s
        flag = jnp.zeros((n,), jnp.bool_).at[perm].set(
            flag_s, mode="drop")
        vals2, vnulls2 = [], []
        for r in recipes:
            if r[0] == "nunique":
                vals2.append(flag.astype(jnp.int64))
                vnulls2.append(~flag)
            else:
                vals2.append(vals[r[1]])
                vnulls2.append(vnulls[r[1]])
        return hops.hash_rounds_reduce_packed(
            tuple(codes_l[:-1]), tuple(knulls_l[:-1]), selb,
            tuple(vals2), tuple(vnulls2), tuple(kinds2), n_slots,
            salt, rounds=rounds2)

    if mode == "direct":
        # bijective dense-domain slots: no collision machinery at all
        spans, pseg, having = extra
        res = hops.direct_reduce_packed(
            tuple(codes_l), tuple(knulls_l), selb, tuple(vals),
            tuple(vnulls), tuple(kinds), arrays[-1], spans=spans,
            pallas_seg=pseg, having=having)
    else:
        res = hops.hash_rounds_reduce_packed(
            tuple(codes_l), tuple(knulls_l), selb, tuple(vals),
            tuple(vnulls), tuple(kinds), n_slots, salt, rounds=extra)
    if fd_spec:
        mat, clean, ng, colarrs = res
        res = (_apply_fd_packed(mat, fd_spec, arrays), clean, ng,
               colarrs)
    if topk_spec:
        # top-k INSIDE the program: the m-sized slot-ordered outputs
        # never materialize (XLA keeps only the gathered k2 rows) --
        # for a 67M-slot FD-direct table this saves gigabytes of
        # writes per query
        mat, clean, ng, colarrs = res
        nk_red = len(keys)
        nv = len(rslots)
        mini = _topk_gather_core(colarrs, topk_spec, nk_red, nv)
        return (mat, clean, ng, mini)
    return res


# -- planning + host driver ---------------------------------------------------

class _Plan:
    """Everything needed to run + decode one fused aggregation."""

    def __init__(self):
        self.arrays: List[object] = []
        self.spec_cols: List[tuple] = []
        self.pred_groups: List[tuple] = []
        self.probes: List[tuple] = []    # star: (pid, key col, idx, lo)
        self.eprobes: List[tuple] = []   # existence probes (semi/anti)
        self.resids: List[tuple] = []    # star: residual boolean IR
        self.fd = None                   # (rep_pos, nk_full, entries)
        self.having = None               # (rslot, op, literal) device
        self.phys_keys: List[str] = []   # reduction keys under FD
        self.keys: List[str] = []        # source column names
        self.key_out: List[str] = []     # output column names (aliases)
        self.rslots: List[tuple] = []
        self.rv_ix = -1
        self.key_decoders: List[object] = []
        self.key_payloads: Dict[str, list] = {}  # planes keys: span bound
        self.key_bounds: Dict[str, tuple] = {}   # star keys: (lo, hi)
        self.slot_map: List[tuple] = []   # per AggSlot: (kind, rslot indices)
        self.slot_types: Dict[str, pa.DataType] = {}
        self.slot_vocabs: Dict[str, list] = {}  # min/max(string) gids
        self.rslot_maxabs: List[Optional[int]] = []  # i32-window bounds


def _add(plan: _Plan, arr) -> int:
    plan.arrays.append(arr)
    return len(plan.arrays) - 1


def _select_blocks(table, plan_scan):
    """Row-group stats/bloom pruning + batch zone-map pruning BEFORE any
    data IO (mirrors scan_blocks; the parquet page index seeds zones on
    first read, ref opener.rs:314-327).  -> tuple of (rg, batch)."""
    rgs = table.prune_row_groups(plan_scan.stats_preds)
    may = getattr(table, "batch_may_match", None)
    blocks = []
    for rg in rgs:
        for b in range(table.num_batches(rg)):
            dead = False
            if may is not None:
                for g in plan_scan.pushdown:
                    if all(not may(rg, c, b, pred)
                           for c, pred in g.alternatives):
                        dead = True
                        break
            if dead:
                table.zone_prunes += 1
            else:
                blocks.append((rg, b))
    return tuple(blocks)


def _collect_payloads(table, col, hint, blocks):
    """The given (rg, batch) blocks of `col` as MEMORY_LIQUID payloads;
    raises _Bail if any block is not resident-encoded.  Only the row
    groups that survived pruning are read/cached."""
    from liquid_tpu.cache import core as cache_core
    ids_by_rg: Dict[int, list] = {}
    eids = []
    for rg, b in blocks:
        ids = ids_by_rg.get(rg)
        if ids is None:
            ids = ids_by_rg[rg] = table.ensure_cached(rg, col, hint)
        eids.append(ids[b])
    payloads = []
    cache = table.cache
    with cache._lock:
        for eid in eids:
            e = cache._entries.get(eid)
            if e is None or e.state != cache_core.MEMORY_LIQUID:
                raise _Bail(f"block {eid} not MEMORY_LIQUID")
            payloads.append(e.payload)
    return payloads


#: cached (blocks-set, payload-id) prep variants kept per column
_PREP_VARIANTS = 4


def _prep_nbytes(prep: _ColPrep) -> int:
    """Device bytes held by a cached prep (stacked planes/codes/validity
    + patch overlays).  Charged against the cache's memory budget so
    prep copies can't silently double device residency; the lazily
    built group-key vocab (`_build_vocab`) is small (dict-sized) and
    not charged."""
    n = 0
    for slot in ("planes_stack", "valid_stack", "codes_stack",
                 "patch_rows", "patch_vals"):
        a = getattr(prep, slot, None)
        if a is not None:
            n += int(a.size) * a.dtype.itemsize
    return n


def release_prep_cache(table) -> None:
    """Release every budget reservation held by a table's fused preps
    (call when the table is dropped/replaced: the prep arrays are
    garbage-collected with the table, the accounting is not)."""
    budget = table.cache.budget
    cache = getattr(table, "_fused_prep", None)
    if cache:
        for variants in cache.values():
            for ent in variants.values():
                budget.release_memory(ent[2])
            variants.clear()
        cache.clear()
    star = getattr(table, "_star_probe_cache", None)
    if star:
        for probe in star.values():
            budget.release_memory(probe.nbytes)
        star.clear()


def _table_prep(table, col, hint, blocks) -> _ColPrep:
    """Column prep cached on the table per (col, blocks-set),
    invalidated when any payload object changes (squeeze/evict/
    re-insert).  Cached preps reserve their device bytes from
    `table.cache.budget`; when the budget is exhausted the prep is
    served UNCACHED (rebuilt next query) rather than overcommitting."""
    cache = getattr(table, "_fused_prep", None)
    if cache is None:
        cache = table._fused_prep = {}
    payloads = _collect_payloads(table, col, hint, blocks)
    key = tuple(id(p) for p in payloads)
    variants = cache.setdefault(col, {})
    hit = variants.get(blocks)
    if hit is not None and hit[0] == key:
        return hit[1]
    prep = _prep_column(payloads, table.field(col).type)
    budget = table.cache.budget
    if hit is not None:  # stale (payloads changed): drop + release
        variants.pop(blocks)
        budget.release_memory(hit[2])
    nbytes = _prep_nbytes(prep)
    if budget.try_reserve_memory(nbytes):
        # evict only once the new reservation is secured -- under budget
        # pressure a still-useful cached variant must not be dropped for
        # a prep that then fails to cache
        if len(variants) >= _PREP_VARIANTS:
            old = variants.pop(next(iter(variants)))
            budget.release_memory(old[2])
        variants[blocks] = (key, prep, nbytes)
    return prep


def _rowvalid(table, blocks) -> jax.Array:
    cache = getattr(table, "_fused_rowvalid", None)
    if cache is None:
        cache = table._fused_rowvalid = {}
    rv = cache.get(blocks)
    if rv is not None:
        return rv
    lengths = [table.batch_length(rg, b) for rg, b in blocks]
    words = np.zeros((len(lengths), _W), np.uint32)
    for i, ln in enumerate(lengths):
        full, rem = divmod(ln, 32)
        words[i, :full] = 0xFFFFFFFF
        if rem:
            words[i, full] = (1 << rem) - 1
    rv = jnp.asarray(words)
    if len(cache) >= _PREP_VARIANTS:
        cache.pop(next(iter(cache)))
    cache[blocks] = rv
    return rv


# -- fused bare SELECT (filter -> order -> LIMIT k row fetch) -----------------
#
# ClickBench q19/q23-q26 are not aggregations: `SELECT cols FROM hits
# WHERE ... ORDER BY expr LIMIT k`.  The classic path decodes every
# surviving block to host arrow; here the device computes the TOP-K ROW
# IDS (selection -> order-key decode -> lax.top_k) and the host fetches
# only those k rows' cells from the cached blocks.  Exactness is
# host-certified like the aggregate top-k: the k-th rank must strictly
# beat the fetched boundary, else fall back.  Ref: the reference's
# DataFusion SortExec(TopK) over the liquid scan.

SELECT_K_CAP = 4096


@partial(jax.jit, static_argnums=(0,))
def _fused_select_run(spec, *arrays):
    (cols, pred_groups, resids, rv_ix, oir, desc, k2) = spec
    colmap = {c[0]: dict(c[1]) for c in cols}
    sel = _selection_packed(colmap, pred_groups, arrays, arrays[rv_ix])
    selb = mops.unpack_bits(sel.reshape(-1))
    probe_j: Dict[int, jax.Array] = {}
    decode, col_nulls = _make_decoders(colmap, arrays, selb.shape,
                                       probe_j)
    for ir in resids:
        selb = selb & _bool_nonnull(ir, decode, col_nulls)
    count = selb.sum(dtype=jnp.int64)
    if oir is None:
        pos = jnp.cumsum(selb.astype(jnp.int32))
        src = jnp.clip(jnp.searchsorted(
            pos, jnp.arange(1, k2 + 1, dtype=jnp.int32)),
            0, selb.shape[0] - 1)
        return count, src.astype(jnp.int32), jnp.zeros((k2,),
                                                       jnp.float64)
    v, nl = eval_ir_nulls(oir, decode, col_nulls)
    v = jnp.asarray(v)
    if v.ndim == 0:
        v = jnp.broadcast_to(v, selb.shape)
    val = v.astype(jnp.float64)
    # NaN sorts GREATEST under the host engine; rather than replicate
    # that ordering (and conflate with +inf), poison the count so the
    # host falls back to the classic sort
    anynan = (jnp.isnan(val) & selb).any()
    count = jnp.where(anynan, jnp.int64(-1), count)
    rank = jnp.where(selb & ~nl, -val if desc else val, jnp.inf)
    top, idx = jax.lax.top_k(-rank, k2)
    return count, idx.astype(jnp.int32), -top  # ranks ascending


def try_fused_select(executor, table, q, where) -> Optional[pa.Table]:
    """Device top-k row selection for a bare single-table SELECT, or
    None (classic scan takes over).  Covers LIMIT queries ordered by
    one leading numeric/dict expression (further keys re-sorted host-
    side over the fetched superset) and tiny unordered filters."""
    import os
    if os.environ.get("LIQUID_FUSED", "1") == "0":
        return None
    if q.distinct or any(isinstance(it.expr, ast.Star)
                         for it in q.items):
        return None
    if any(o.nulls_first is not None for o in q.order_by):
        return None
    k = (q.limit + (q.offset or 0)) if q.limit is not None else None
    if k is not None and k * 4 + 64 > SELECT_K_CAP:
        return None
    try:
        from liquid_tpu.sql.planner import plan_scan_filters
        plan_scan = plan_scan_filters(where)
        blocks = _select_blocks(table, plan_scan)
        p = _Plan()
        if not blocks:
            k2 = 0
        # reuse the single-table planning pieces via a mini planner
        from liquid_tpu.sql.fused_star import (_MiniPlanner,
                                               _prep_has_nulls)
        from liquid_tpu.sql.physical import collect_columns, render
        mp = _MiniPlanner(table, blocks)
        kinds_view = _MiniPlanner._KV(mp)
        registered: set = set()
        resids: List[tuple] = []
        if blocks:
            for g in plan_scan.pushdown:
                if any(mp.prep_of(None, c).kind == "linear"
                       for c, _pr in g.alternatives):
                    # no packed interval over linear codes: residual IR
                    ir0, rc0 = _compile_bool(g.source, kinds_view,
                                             mp.dictres)
                    resids.append(ir0)
                    from liquid_tpu.sql.fused_star import _register_col
                    for c in sorted(rc0):
                        if c not in registered:
                            pr0 = mp.prep_of(None, c)
                            _register_col(p, pr0, c,
                                          want_remap=(pr0.kind
                                                      == "dict"))
                            registered.add(c)
                    continue
                alts = []
                for c, pred in g.alternatives:
                    pr = mp.prep_of(None, c)
                    if c not in registered:
                        from liquid_tpu.sql.fused_star import \
                            _register_col
                        _register_col(p, pr, c, want_remap=False)
                        registered.add(c)
                    if pr.kind == "planes":
                        iv = _primitive_interval(pr.payloads, pred)
                        if iv is None:
                            raise _Bail("select predicate")
                        lo2, hi2, neg = iv
                        alts.append(("iv", c, _add(p, jnp.asarray(lo2)),
                                     _add(p, jnp.asarray(hi2)), neg))
                    elif pr.kind == "float":
                        iv = _float_interval(pr.payloads, pred)
                        if iv is None or iv[3] is not None:
                            raise _Bail("select float predicate")
                        lo2, hi2, neg, _c2, _s2 = iv
                        alts.append(("iv", c, _add(p, jnp.asarray(lo2)),
                                     _add(p, jnp.asarray(hi2)), neg))
                    else:
                        lut = _dict_lut(pr.payloads, pred, pr.dmax)
                        if lut is None:
                            raise _Bail("select string predicate")
                        alts.append(("lut", c, _add(p, jnp.asarray(lut))))
                p.pred_groups.append(tuple(alts))
            for e0 in plan_scan.residual:
                ir0, rc0 = _compile_bool(e0, kinds_view, mp.dictres)
                resids.append(ir0)
                from liquid_tpu.sql.fused_star import _register_col
                for c in sorted(rc0):
                    if c not in registered:
                        pr0 = mp.prep_of(None, c)
                        _register_col(p, pr0, c,
                                      want_remap=(pr0.kind == "dict"))
                        registered.add(c)
        oir = None
        desc = False
        ocols: set = set()
        if q.order_by:
            if k is None:
                raise _Bail("ORDER BY without LIMIT")
            o0 = q.order_by[0]
            desc = bool(o0.desc)
            if not blocks:
                oir, ocols = ("lit", 0, "i64"), set()
            elif isinstance(o0.expr, ast.Column) \
                    and mp.kind_of(o0.expr.name) == "dict":
                # dict order key: the SORTED global vocabulary makes
                # gid order == lexicographic order
                oir, ocols = ("col", o0.expr.name, "i64"), \
                    {o0.expr.name}
            else:
                oir, ocols = _compile_expr(o0.expr, kinds_view,
                                           mp.dictres)
            if blocks:
                for c in sorted(ocols):
                    pr = mp.prep_of(None, c)
                    if _prep_has_nulls(table, pr, blocks):
                        raise _Bail("nullable order key")
                    if c not in registered:
                        from liquid_tpu.sql.fused_star import \
                            _register_col
                        _register_col(p, pr, c,
                                      want_remap=(pr.kind == "dict"))
                        registered.add(c)
        elif k is None:
            # unordered, no LIMIT: only tiny results pay off; cap and
            # certify via the count
            k = SELECT_K_CAP // 4
        k2 = min(k * 4 + 64, SELECT_K_CAP)
        if not blocks:
            fetched = {}
            ev_rows = 0
        else:
            p.rv_ix = _add(p, _rowvalid(table, blocks))
            spec = (_freeze(p.spec_cols), _freeze(p.pred_groups),
                    _freeze(resids), p.rv_ix,
                    _freeze(oir) if oir is not None else None,
                    desc, k2)
            count_a, idx_a, ranks_a = _fused_select_run(spec, *p.arrays)
            packed = np.asarray(jnp.concatenate([
                jnp.asarray([count_a], jnp.float64),
                idx_a.astype(jnp.float64), ranks_a]))
            count = int(packed[0])
            if count < 0:
                return None  # NaN order keys: host ordering semantics
            idx = packed[1:1 + k2].astype(np.int64)
            ranks = packed[1 + k2:]
            if q.order_by:
                kneed = q.limit + (q.offset or 0)
                if count > k2:
                    if not np.isfinite(ranks[k2 - 1]) \
                            or not ranks[kneed - 1] < ranks[k2 - 1]:
                        return None  # boundary tie: classic path
            elif q.limit is None and count > k2:
                return None  # unordered full scan too large to fetch
            take = min(count, k2)
            idx = idx[:take]
        # host fetch of the selected rows' cells
        needed: set = set()
        for it in q.items:
            collect_columns(it.expr, needed)
        for o in q.order_by:
            collect_columns(o.expr, needed)
        need = sorted(c for c in needed if c in table.column_names)
        from liquid_tpu.sql.eval import Batch, Evaluator
        if not blocks:
            out_cols = {c: pa.array([], table.field(c).type)
                        for c in need}
            n_rows = 0
        else:
            cellcache: Dict[tuple, pa.Array] = {}

            def cell(rowid, c):
                bi, off = divmod(int(rowid), BLOCK_ROWS)
                rg, b = blocks[bi]
                key = (rg, b, c)
                arr = cellcache.get(key)
                if arr is None:
                    ids = table.ensure_cached(rg, c)
                    arr = table.cache.get(ids[b])
                    if arr is None:
                        raise _Bail("block unavailable")
                    cellcache[key] = arr
                return arr[off]
            out_cols = {c: pa.array(
                [cell(r, c).as_py() for r in idx],
                table.field(c).type) for c in need}
            n_rows = len(idx)
        batch = Batch(dict(out_cols), n_rows)
        ev = Evaluator(batch, executor._scalar_subquery)
        cols_out: Dict[str, pa.Array] = {}
        names = []
        sort_keys = []
        for it in q.items:
            nm = it.alias or render(it.expr)
            v = ev.eval(it.expr)
            if isinstance(v, pa.Scalar):
                v = pa.repeat(v, n_rows)
            cols_out[nm] = v
            names.append(nm)
        for i, o in enumerate(q.order_by):
            nm = f"__fsel{i}"
            v = ev.eval(o.expr)
            if isinstance(v, pa.Scalar):
                v = pa.repeat(v, n_rows)
            cols_out[nm] = v
            sort_keys.append((nm, "descending" if o.desc
                              else "ascending"))
        t = pa.table(cols_out)
        if sort_keys:
            import pyarrow.compute as pc
            t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        if q.offset:
            t = t.slice(q.offset)
        if q.limit is not None:
            t = t.slice(0, q.limit)
        STATS["fused_queries"] += 1
        STATS["fused_selects"] = STATS.get("fused_selects", 0) + 1
        return t.select(names)
    except _Bail as e:
        STATS["fsel_bail"] = str(e)
        return None
    except Exception:
        if os.environ.get("LIQUID_FUSED_STRICT"):
            raise
        return None


def _string_key_lut(ge: ast.Expr, kinds_view, p: _Plan):
    """String-valued expression group key over one dict column -> IR
    ("lut", col, aix, "i64") of MAPPED-vocabulary ids + the mapped
    vocabulary for the key decoder.  None when not applicable."""
    from liquid_tpu.sql.physical import collect_columns as _cc
    vocab_eval = getattr(kinds_view, "vocab_eval", None)
    if vocab_eval is None:
        return None
    cols0: set = set()
    _cc(ge, cols0)
    if len(cols0) != 1:
        return None
    c = next(iter(cols0))
    if kinds_view.get(c) != "dict":
        return None
    vals = vocab_eval(ge, c)
    if vals is None or not all(v is None or isinstance(v, str)
                               for v in vals):
        return None
    uniq = sorted({v for v in vals if v is not None})
    idx = {v: i for i, v in enumerate(uniq)}
    has_none = any(v is None for v in vals)
    if has_none:
        uniq.append(None)  # keyed by the trailing null id
    lut = np.array([idx.get(v, len(idx)) for v in vals], np.int64)
    aix = _add(p, jnp.asarray(lut))
    return ("lut", c, aix, "i64"), {c}, uniq


def vocab_eval_expr(e: ast.Expr, col: str, vocab):
    """Evaluate a single-column string expression over the column's
    global VOCABULARY with the host evaluator (distinct values only:
    regexp_replace / substring / length over a 755k-row column costs a
    vocab-sized pyarrow kernel, once per plan).  -> list of python
    values per gid, or None on unsupported expressions."""
    try:
        from liquid_tpu.sql.eval import Batch, Evaluator
        arr = pa.array(vocab, pa.string())
        batch = Batch({col: arr}, len(vocab))

        def no_sub(_q):
            raise _Bail("subquery in vocab expression")
        out = Evaluator(batch, no_sub).arr(e)
        if isinstance(out, pa.ChunkedArray):
            out = out.combine_chunks()
        return out.to_pylist()
    except Exception:
        return None


def _expr_key_type(ge: ast.Expr, dt: str) -> pa.DataType:
    """Arrow output type of an expression group key (must match the
    classic evaluator's typing exactly for dual-path equality)."""
    if isinstance(ge, ast.Cast) and ge.type_name == "date":
        return pa.date32()  # ::DATE expression keys stay dates
    if isinstance(ge, ast.Extract):
        return pa.int32()  # eval.py _extract casts to int32
    if isinstance(ge, ast.Func) and ge.name in ("to_timestamp_seconds",
                                                "date_trunc"):
        return pa.timestamp("s")
    return pa.float64() if dt == "f64" else pa.int64()


def _schema_kind(t: pa.DataType) -> str:
    """Column kind from the arrow type alone (used for the zero-IO
    empty-scan path, where no payloads exist to inspect)."""
    if pa.types.is_dictionary(t):
        t = t.value_type
    if (pa.types.is_boolean(t) or pa.types.is_integer(t)
            or pa.types.is_date(t) or pa.types.is_timestamp(t)):
        return "planes"
    if pa.types.is_floating(t):
        return "float"
    if (pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_binary(t) or pa.types.is_large_binary(t)
            or pa.types.is_string_view(t) or pa.types.is_binary_view(t)):
        return "dict"
    raise _Bail(f"column type {t}")


def _plan_query(table, plan_scan, hints, group, key_names, slots,
                rew_keys, rew_inputs, eprobes=()):
    return _plan_query_inner(table, plan_scan, hints, group, key_names,
                             slots, rew_keys, rew_inputs, eprobes)


def _plan_query_inner(table, plan_scan, hints, group, key_names, slots,
                      rew_keys, rew_inputs,
                      eprobes=()) -> Tuple[_Plan, str, bool]:
    from liquid_tpu.cache.expressions import VariantGet
    p = _Plan()
    for s in slots:
        if s.kind not in _AGG_KINDS:
            raise _Bail(f"aggregate kind {s.kind}")

    # block universe: rg stats/bloom + zone maps, metadata-only IO
    blocks = _select_blocks(table, plan_scan)
    empty = not blocks

    # column universe
    pred_cols = {c for g in plan_scan.pushdown for c, _ in g.alternatives}
    expr_cols: set = set()
    needed = set(pred_cols)
    for c in needed:
        if c not in table.column_names:
            raise _Bail(f"unknown column {c}")
        if isinstance(hints.get(c), VariantGet):
            raise _Bail("variant column")

    preps: Dict[str, _ColPrep] = {}

    def prep_of(c):
        pr = preps.get(c)
        if pr is None:
            pr = _table_prep(table, c, hints.get(c), blocks)
            preps[c] = pr
        return pr

    # compile agg exprs first (needs col kinds; collect columns lazily)
    col_kinds: Dict[str, str] = {}

    def kind_of(c):
        if c not in col_kinds:
            if c not in table.column_names:
                raise _Bail(f"unknown column {c}")
            if isinstance(hints.get(c), VariantGet):
                raise _Bail("variant column")
            # empty scan: no payloads exist -- type-derived kind (no IO)
            k = (_schema_kind(table.field(c).type) if empty
                 else prep_of(c).kind)
            col_kinds[c] = "planes" if k == "linear" else k
        return col_kinds[c]

    class _Kinds(dict):
        def get(self, c, default=None):
            try:
                return kind_of(c)
            except _Bail:
                return default

        def arrow_type(self, c):
            if c in table.column_names:
                return table.field(c).type
            return None

        def vocab_eval(self, e, c):
            try:
                if kind_of(c) != "dict" or empty:
                    return None
                pr = prep_of(c)
                _build_vocab(pr)
                remap_cols.add(c)
                return vocab_eval_expr(e, c, pr.vocab_list)
            except Exception:
                return None

        def lutres(self, e, c):
            vals = self.vocab_eval(e, c)
            if vals is None:
                return None
            import numbers
            if all(v is None or (isinstance(v, numbers.Integral)
                                 and not isinstance(v, bool))
                   for v in vals):
                arr = np.array([0 if v is None else int(v)
                                for v in vals], np.int64)
                return _add(p, jnp.asarray(arr)), "i64"
            if all(v is None or isinstance(v, numbers.Real)
                   for v in vals):
                arr = np.array([0.0 if v is None else float(v)
                                for v in vals], np.float64)
                return _add(p, jnp.asarray(arr)), "f64"
            return None

    remap_cols: set = set()

    def dictres(cname, op, lit):
        """String comparisons over the SORTED global vocabulary -> gid
        sets for the expression IR (CASE conditions, IN lists, LIKE
        inside residuals -- the single-table twin of the star path's
        resolver)."""
        try:
            if kind_of(cname) != "dict":
                return None
        except _Bail:
            return None
        if empty:
            return ()
        pr = prep_of(cname)
        _build_vocab(pr)
        remap_cols.add(cname)
        vocab = pr.vocab_list
        if op == "=":
            return tuple(i for i, v in enumerate(vocab) if v == lit)
        if op == "like":
            import re as _re
            pat = _re.compile(
                "^" + _re.escape(str(lit)).replace("%", ".*")
                .replace("_", ".") + "$", _re.DOTALL)
            return tuple(i for i, v in enumerate(vocab)
                         if v is not None and pat.match(str(v)))
        return None

    kinds_view = _Kinds()
    slot_irs: Dict[str, Tuple[tuple, set]] = {}
    for s in slots:
        if s.input is None:
            continue
        e = rew_inputs[s.name]
        if s.kind == "count" and isinstance(e, ast.Column) \
                and kind_of(e.name) == "dict":
            # count(string_col): only nullness matters
            slot_irs[s.name] = (("col", e.name, "i64"), {e.name})
        elif s.kind in ("min", "max") and isinstance(e, ast.Column) \
                and kind_of(e.name) == "dict":
            # min/max(string): sorted-vocab gids ARE value-ordered
            if not empty:
                pr = prep_of(e.name)
                _build_vocab(pr)
                if pr.vocab_list and pr.vocab_list[-1] is None:
                    raise _Bail("min/max over null dictionary entry")
                p.slot_vocabs[s.name] = pr.vocab_list
            else:
                p.slot_vocabs[s.name] = []
            remap_cols.add(e.name)
            slot_irs[s.name] = (("col", e.name, "i64"), {e.name})
            p.slot_types[s.name] = _value_type(table.field(e.name).type)
        else:
            slot_irs[s.name] = _compile_expr(e, kinds_view, dictres)
        expr_cols |= slot_irs[s.name][1]
        if s.kind in ("min", "max") and isinstance(e, ast.Column):
            t = table.field(e.name).type
            if pa.types.is_uint64(t):
                raise _Bail("min/max over uint64")  # i64 order differs

    # avg(int) accumulates exactly in i64 ONLY when the value bounds
    # prove the sum cannot overflow (bounds x row count < 2^62); wide
    # domains (hash-like ids) keep the f64 accumulator
    n_upper = len(blocks) * BLOCK_ROWS
    for s in slots:
        if s.kind != "avg" or s.name not in slot_irs:
            continue
        ir, cols_ = slot_irs[s.name]
        if _ir_dtype(ir) != "i64":
            continue
        safe = False
        if ir[0] == "col" and not empty:
            b = payload_bounds(prep_of(ir[1]))
            if b is not None:
                safe = max(abs(b[0]), abs(b[1])) * max(n_upper, 1) \
                    < (1 << 62)
        if not safe:
            slot_irs[s.name] = (_as_f64(ir), cols_)

    # residual predicates (arithmetic / IN / OR shapes classify_pushdown
    # can't lower): boolean IR evaluated inside the program
    for e in plan_scan.residual:
        ir, cols = _compile_bool(e, kinds_view, dictres)
        p.resids.append(ir)
        expr_cols |= cols

    # pushdown groups touching a linear-coded column have no packed
    # interval form (values are not monotone in the residual offsets):
    # lower the group's SOURCE expression to residual IR instead
    skip_groups: set = set()
    if not empty:
        for gi, g in enumerate(plan_scan.pushdown):
            if any(prep_of(c).kind == "linear"
                   for c, _pred in g.alternatives):
                ir, cols = _compile_bool(g.source, kinds_view, dictres)
                p.resids.append(ir)
                expr_cols |= cols
                skip_groups.add(gi)

    # group keys: plain columns key directly; other expressions compile
    # to IR keys evaluated in-program (GROUP BY 1, arithmetic, CASE)
    key_cols: List[object] = []
    from liquid_tpu.sql.device_agg import KeyCodec
    for ge in rew_keys:
        if isinstance(ge, ast.Column):
            c = ge.name
            kind_of(c)
            key_cols.append(c)
            if kind_of(c) == "dict":
                vt = _value_type(table.field(c).type)
                remap_cols.add(c)
                if empty:
                    p.key_decoders.append(("vocab", [], vt))
                else:
                    pr = prep_of(c)
                    _build_vocab(pr)
                    p.key_decoders.append(("vocab", pr.vocab_list, vt))
            else:
                p.key_decoders.append(
                    ("codec", KeyCodec(table.field(c).type)))
                if not empty and prep_of(c).kind == "planes":
                    p.key_payloads[c] = prep_of(c).payloads
            needed.add(c)
        else:
            skey = None
            try:
                ir, cols = _compile_expr(ge, kinds_view, dictres)
            except _Bail:
                # string-function group key over ONE dict column
                # (regexp_replace/substring/lower...): evaluate over
                # the VOCAB, key by the mapped-vocabulary id
                skey = _string_key_lut(ge, kinds_view, p)
                if skey is None:
                    raise
                ir, cols, mapped = skey
            dt = _ir_dtype(ir)
            key_cols.append(("expr", _freeze(ir), dt))
            expr_cols |= cols
            if skey is not None:
                p.key_decoders.append(("vocab", mapped, pa.string()))
            else:
                p.key_decoders.append(("codec",
                                       KeyCodec(_expr_key_type(ge, dt))))

    needed |= expr_cols
    for sp in eprobes:
        if kind_of(sp["col"]) not in ("planes", "linear"):
            raise _Bail("existence-probe key kind")
        needed.add(sp["col"])
        if sp["mmcol"] is not None:
            if kind_of(sp["mmcol"]) not in ("planes", "linear"):
                raise _Bail("existence-probe mm kind")
            needed.add(sp["mmcol"])

    p.keys = key_cols
    p.key_out = list(key_names)
    if empty:
        _plan_slots(p, slots, slot_irs, rew_inputs, table)
        return p, ("grouped" if key_names else "scalar"), True

    # register columns + arrays
    for c in sorted(needed):
        pr = prep_of(c)
        ix: Dict[str, int] = {"kind": pr.kind}
        if pr.kind in ("planes", "float", "linear"):
            ix["planes"] = _add(p, pr.planes_stack)
            ix["refs"] = _add(p, jnp.asarray(pr.refs))
            if pr.kind == "float":
                ix["inv"] = _add(p, jnp.asarray(pr.inv))
            if pr.kind == "linear":
                ix["lin"] = _add(p, pr.lin_stack)
            if pr.kind == "float" and pr.patch_rows is not None:
                ix["patch_rows"] = _add(p, jnp.asarray(pr.patch_rows))
                ix["patch_vals"] = _add(p, jnp.asarray(pr.patch_vals))
        else:
            ix["codes"] = _add(p, pr.codes_stack)
            if c in remap_cols:
                _build_vocab(pr)
                ix["remap"] = _add(p, pr.remap_stack)
                ix["gids"] = _add(p, _gid_stack(pr))
        if pr.valid_stack is not None:
            ix["valid"] = _add(p, pr.valid_stack)
        p.spec_cols.append((c, tuple(sorted(ix.items()))))

    # predicates
    for gi, g in enumerate(plan_scan.pushdown):
        if gi in skip_groups:
            continue
        alts = []
        for c, pred in g.alternatives:
            pr = preps[c]
            if pr.kind == "planes":
                iv = _primitive_interval(pr.payloads, pred)
                if iv is None:
                    raise _Bail(f"predicate {pred.op} on {c}")
                lo, hi, neg = iv
                alts.append(("iv", c, _add(p, jnp.asarray(lo)),
                             _add(p, jnp.asarray(hi)), neg))
            elif pr.kind == "float":
                iv = _float_interval(pr.payloads, pred)
                if iv is None:
                    raise _Bail(f"float predicate {pred.op} on {c}")
                lo, hi, neg, clear, setw = iv
                if clear is not None:
                    alts.append(("ivp", c, _add(p, jnp.asarray(lo)),
                                 _add(p, jnp.asarray(hi)), neg,
                                 _add(p, jnp.asarray(clear)),
                                 _add(p, jnp.asarray(setw))))
                else:
                    alts.append(("iv", c, _add(p, jnp.asarray(lo)),
                                 _add(p, jnp.asarray(hi)), neg))
            else:
                lut = _dict_lut(pr.payloads, pred, pr.dmax)
                if lut is None:
                    raise _Bail(f"string predicate {pred.op} on {c}")
                alts.append(("lut", c, _add(p, jnp.asarray(lut))))
        p.pred_groups.append(tuple(alts))

    p.rv_ix = _add(p, _rowvalid(table, blocks))

    for sp in eprobes:
        pr_ = sp["probe"]
        cnt_ix = _add(p, pr_["cnt"])
        plo_ix = _add(p, jnp.asarray(np.int64(pr_["lo"])))
        if sp["mmcol"] is not None:
            if pr_["minv"] is None:
                raise _Bail("existence probe missing min/max")
            mmv = _add(p, pr_["minv"])
            mmx = _add(p, pr_["maxv"])
        else:
            mmv = mmx = -1
        p.eprobes.append((sp["col"], cnt_ix, plo_ix, sp["mode"],
                          mmv, mmx, sp["mmcol"] or ""))

    def bounds_of(c):
        try:
            if kind_of(c) in ("planes", "float"):
                return payload_bounds(prep_of(c))
        except _Bail:
            pass
        return None

    scaled_cache: Dict[str, object] = {}

    def scaledres(c):
        if c in scaled_cache:
            return scaled_cache[c]
        out = None
        try:
            if kind_of(c) == "float":
                out = _scaled_col_info(p, c, prep_of(c))
        except _Bail:
            out = None
        scaled_cache[c] = out
        return out

    _plan_slots(p, slots, slot_irs, rew_inputs, table, bounds_of,
                scaledres, len(blocks) * BLOCK_ROWS)
    return p, ("grouped" if key_names else "scalar"), False


def _scaled_col_info(p: _Plan, name: str, pr: _ColPrep):
    """(scale, maxabs) for an ALP float column whose values are ALL
    exact scale-E decimals, registering its per-block scaled-int
    multiplier array ("smult") -- and, when the column has exception
    patches, their validated scaled-int images ("spatch") -- in the
    plan's colmap; None when the column can't be an exact scaled int.

    Patches are common on decimal columns (enc * inv re-rounds
    differently from value/10^E for ~10% of cents values) but the
    patch VALUES are usually exact decimals too: validate
    f64(round(v*10^E) / 10^E) == v per patch and keep the column on
    the integer path."""
    if pr.kind != "float":
        return None
    exps = [pp.exponent for pp in pr.payloads]
    e_max = max(exps)
    if e_max > 6 or min(exps) < 0:
        return None
    spatch = None
    if pr.patch_rows is not None:
        s10 = float(10 ** e_max)
        pv = pr.patch_vals
        pint = np.rint(pv * s10)
        # pad slots carry value 0.0 -> pint 0, trivially exact
        if np.abs(pint).max(initial=0.0) >= float(1 << 52) \
                or not np.all(pint / s10 == pv):
            return None
        spatch = pint.astype(np.int64)
    mult = np.array([10 ** (e_max - e) for e in exps], np.int64)
    ma = 1
    for pp, mlt in zip(pr.payloads, mult):
        w = pp.planes_np.shape[0]
        lo = int(pp.reference_value)
        hi = lo + (1 << w) - 1
        ma = max(ma, abs(lo * int(mlt)), abs(hi * int(mlt)))
    if spatch is not None:
        ma = max(ma, int(np.abs(spatch).max(initial=0)))
    if ma >= (1 << 62):
        return None
    for i, (nm, items) in enumerate(p.spec_cols):
        if nm == name:
            d = dict(items)
            if "smult" not in d:
                d["smult"] = _add(p, jnp.asarray(mult))
                if spatch is not None:
                    d["spatch"] = _add(p, jnp.asarray(spatch))
                p.spec_cols[i] = (nm, tuple(sorted(d.items())))
            return (e_max, ma)
    return None  # column not registered in this plan


def _plan_slots(p, slots, slot_irs, rew_inputs, table,
                bounds_of=None, scaledres=None, n_upper=0) -> None:
    def maxabs_of(ir, dt):
        """|value| bound for the pallas i32 accumulation window; None =
        unbounded (expression / float / no prep info)."""
        if dt != "i64" or bounds_of is None:
            return None
        if ir[0] == "col":
            b = bounds_of(ir[1])
            if b is not None:
                return max(abs(b[0]), abs(b[1]), 1)
        return None

    for s in slots:
        base = len(p.rslots)
        if s.kind == "count_star":
            p.rslots.append(("sum", "i64", ("ones",), ()))
            p.rslot_maxabs.append(1)
            p.slot_map.append((s.kind, (base,)))
        elif s.kind == "count":
            ir, cols = slot_irs[s.name]
            if ir[0] == "col":
                p.rslots.append(("sum", "i64", ("ones",),
                                 tuple(sorted(cols))))
            else:
                # count(expr): count rows where the expr is non-NULL
                p.rslots.append(("sum", "i64", ("nncount", ir), ()))
            p.rslot_maxabs.append(1)
            p.slot_map.append((s.kind, (base,)))
        elif s.kind in ("sum", "avg", "min", "max"):
            ir, cols = slot_irs[s.name]
            # avg over an INT input accumulates exactly in i64 and
            # divides at decode: forcing f64 here would cost a second
            # scatter pass (payload dtypes batch per pass, ~90 ns/row
            # each) for zero precision gain
            dt = _ir_dtype(ir)
            scaled = None
            if dt == "f64" and scaledres is not None:
                # ALP scaled-int rewrite: sums/avgs accumulate the f64
                # input as an exact i64 at a known decimal scale (one
                # i64 scatter batch / Pallas histogram; /10^scale only
                # at host decode).  min/max reduce over the integer
                # image too -- crucially the exact host division then
                # reproduces the CLASSIC decode bit-for-bit, where the
                # device's emulated-f64 multiply can differ by 1 ulp
                # (breaking cross-path equality joins, TPC-H q2)
                scaled = _scaled_int_ir(ir, scaledres, bounds_of)
                if scaled is not None and s.kind in ("sum", "avg") \
                        and scaled[2] * max(n_upper, 1) >= (1 << 62):
                    scaled = None
            if scaled is not None:
                ir2, sc, ma = scaled
                p.rslots.append((s.kind if s.kind in ("min", "max")
                                 else "sum", _scaled_dt(sc), ir2,
                                 tuple(sorted(cols))))
                p.rslot_maxabs.append(
                    ma if s.kind in ("sum", "avg") else None)
            else:
                p.rslots.append(
                    (s.kind if s.kind in ("min", "max") else "sum",
                     dt, ir, tuple(sorted(cols))))
                p.rslot_maxabs.append(
                    maxabs_of(ir, dt) if s.kind in ("sum", "avg")
                    else None)
            p.slot_map.append((s.kind, (base,)))
            p.slot_types.setdefault(s.name, _slot_out_type(
                s, ir, rew_inputs.get(s.name), table))
        elif s.kind in ("stddev", "var"):
            ir, cols = slot_irs[s.name]
            ir = _as_f64(ir)
            p.rslots.append(("sum", "f64", ir, tuple(sorted(cols))))
            p.rslots.append(("sum", "f64",
                             ("bin", "*", "f64", ir, ir),
                             tuple(sorted(cols))))
            p.rslot_maxabs.extend([None, None])
            p.slot_map.append((s.kind, (base, base + 1)))
        else:  # pragma: no cover (guarded above)
            raise _Bail(s.kind)


def _slot_out_type(s, ir, input_expr, table) -> pa.DataType:
    dt = _ir_dtype(ir)
    if s.kind == "sum":
        if dt == "f64":
            return pa.float64()
        if isinstance(input_expr, ast.Column):
            t = table.field(input_expr.name).type
            if pa.types.is_unsigned_integer(t):
                return pa.uint64()
        return pa.int64()
    if s.kind in ("min", "max"):
        if isinstance(input_expr, ast.Column):
            return table.field(input_expr.name).type
        if isinstance(input_expr, ast.Cast) \
                and input_expr.type_name == "date":
            return pa.date32()
        return pa.float64() if dt == "f64" else pa.int64()
    return pa.float64()


def _decode_slot_value(kind, t: pa.DataType, acc: np.ndarray,
                       cnt: np.ndarray, dt: str) -> pa.Array:
    """Per-slot decode shared by the grouped and scalar paths."""
    import pyarrow.compute as pc  # noqa: F401
    if kind in ("count_star", "count"):
        return pa.array(acc, pa.int64())
    mask = cnt == 0
    m = mask if mask.any() else None
    if dt.startswith("i64s") and kind in ("sum", "avg", "min", "max"):
        # exact scaled-int accumulation: value = acc / 10^scale
        v = _unscale_np(np.asarray(acc, np.int64), int(dt[4:]))
        if kind == "avg":
            with np.errstate(invalid="ignore", divide="ignore"):
                v = v / cnt.astype(np.float64)
        out = pa.array(v, pa.float64(), mask=m)
        if kind in ("min", "max") and pa.types.is_floating(t) \
                and t != pa.float64():
            out = out.cast(t)
        return out
    if kind == "sum":
        if dt == "f64":
            v = acc.view(np.float64) if acc.dtype == np.int64 else acc
            return pa.array(v, pa.float64(), mask=m)
        if pa.types.is_unsigned_integer(t):
            return pa.array(acc.view(np.uint64), pa.uint64(), mask=m)
        return pa.array(acc, pa.int64(), mask=m)
    if kind == "avg":
        if dt == "i64":
            v = acc.astype(np.float64)  # exact i64 accumulation
        else:
            v = acc.view(np.float64) if acc.dtype == np.int64 else acc
        with np.errstate(invalid="ignore", divide="ignore"):
            out = v / cnt.astype(np.float64)
        return pa.array(out, pa.float64(), mask=m)
    if kind in ("min", "max"):
        if dt == "f64":
            v = acc.view(np.float64) if acc.dtype == np.int64 else acc
            return pa.array(v, pa.float64(), mask=m).cast(
                t if pa.types.is_floating(t) else pa.float64())
        if pa.types.is_date32(t):
            return pa.array(acc.astype(np.int32), pa.int32(),
                            mask=m).view(pa.date32())
        if pa.types.is_date64(t) or pa.types.is_timestamp(t):
            return pa.array(acc, pa.int64(), mask=m).view(t)
        if pa.types.is_boolean(t):
            return pa.array(acc != 0, pa.bool_(), mask=m)
        return pa.array(acc, pa.int64(), mask=m).cast(t, safe=False)
    raise AssertionError(kind)


#: cached fused plans kept per table (plans pin their prep stacks)
_PLAN_CACHE_CAP = 8


def _plan_cache_key(plan_scan, hints, group, key_names, slots,
                    rew_keys, rew_inputs, q):
    """Textual identity of everything _plan_query consumes (renders
    carry the literals).  Paired with the cache epoch this keys a
    fully-built plan: planning costs ~10ms of host work PLUS ~20 tiny
    device uploads of interval/literal arrays -- each paying the
    tunnel's dispatch floor, ~300ms/query measured on v5e via axon."""
    from liquid_tpu.sql.physical import render
    parts = [tuple(key_names), bool(group),
             tuple(render(e) for e in rew_keys),
             tuple((s.name, s.kind, render(s.func)) for s in slots),
             tuple((s.name, render(rew_inputs[s.name])) for s in slots
                   if s.name in rew_inputs),
             tuple(render(g.source) for g in plan_scan.pushdown),
             tuple(render(e) for e in plan_scan.residual),
             tuple(sorted((c, repr(h))
                          for c, h in (hints or {}).items()))]
    if q is not None:
        parts.append((
            q.limit, q.offset,
            tuple((render(o.expr), bool(o.desc), o.nulls_first)
                  for o in (q.order_by or ())),
            render(q.having) if q.having is not None else None))
    return tuple(parts)


def try_fused_aggregate(table, plan_scan, hints, group, key_names, slots,
                        rew_keys, rew_inputs, q=None,
                        eprobes=()) -> Optional[pa.Table]:
    """Attempt the fused device aggregation.  Returns the merged partial
    table in GroupedAggregator.finalize's schema (key columns + slot
    columns), or None to fall back to the classic scan path."""
    import os
    if os.environ.get("LIQUID_FUSED", "1") == "0":
        return None
    cache = getattr(table, "_fused_plan_cache", None)
    if cache is None:
        cache = table._fused_plan_cache = {}
    try:
        ck = (getattr(table.cache, "epoch", 0),
              _plan_cache_key(plan_scan, hints, group, key_names, slots,
                              rew_keys, rew_inputs, q),
              tuple(sp["key"] for sp in eprobes))
    except Exception:
        ck = None
    hit = cache.get(ck) if ck is not None else None
    if hit is not None:
        p, mode, empty = hit
        if p is None:  # cached bailout: skip re-planning
            STATS["fused_bailouts"] += 1
            return None
    else:
        try:
            p, mode, empty = _plan_query(table, plan_scan, hints, group,
                                         key_names, slots, rew_keys,
                                         rew_inputs, eprobes)
        except _Bail as e:
            STATS["fused_bailouts"] += 1
            STATS["last_bail"] = str(e)
            if ck is not None:
                if len(cache) >= _PLAN_CACHE_CAP:
                    cache.pop(next(iter(cache)))
                cache[ck] = (None, None, None)
            return None
        except Exception:
            if os.environ.get("LIQUID_FUSED_STRICT"):
                raise
            STATS["fused_bailouts"] += 1
            return None
        if ck is not None:
            if len(cache) >= _PLAN_CACHE_CAP:
                cache.pop(next(iter(cache)))
            cache[ck] = (p, mode, empty)
    STATS["fused_queries"] += 1
    topk = None
    if q is not None and mode == "grouped" and not empty:
        topk = plan_topk(q, slots, p)
        p.having = plan_having(q, slots, p)
    result = execute_plan(p, mode, empty, slots, table, topk)
    if result is None:
        # cardinality defeated the ladder: classic path (exact, slower)
        STATS["fused_bailouts"] += 1
    return result


def execute_plan(p: _Plan, mode: str, empty: bool, slots,
                 table, topk=None) -> Optional[pa.Table]:
    """Run a planned fused aggregation (single-table or star-join fact
    program): empty-scan shortcut, then scalar / direct-address /
    staged-hash grouped execution.  Returns the partial result table
    (key columns + slot columns), or None when the hash ladder failed
    to converge (caller falls back to the classic path)."""
    if empty:
        # every block pruned by stats/zones: typed result with ZERO data
        # IO (ref first-read page-index pruning, opener.rs:314-327)
        nv = len(p.rslots)
        if mode == "scalar":
            STATS["fused_scalar"] += 1
            return _finalize_scalar(p, slots, np.zeros(nv, np.int64),
                                    np.zeros(nv, np.int64))
        STATS["fused_grouped"] += 1
        nk = len(p.keys)
        return _build_result(
            p, slots, 0,
            [np.zeros(0, np.int64)] * nk, [np.zeros(0, bool)] * nk,
            [np.zeros(0, np.int64)] * nv, [np.zeros(0, np.int64)] * nv,
            packed_i64=True)

    spec_cols = _freeze(p.spec_cols)
    pred_groups = _freeze(p.pred_groups)
    probes = _freeze(p.probes)
    eprobes = _freeze(p.eprobes)
    resids = _freeze(p.resids)
    rslots = _freeze(p.rslots)
    # under FD reduction the physical grouping runs on the single
    # representative key; derived keys re-attach at pack time
    keys = tuple(p.phys_keys) if p.fd else tuple(p.keys)
    fd_spec = _freeze(p.fd) if p.fd else ()

    if mode == "scalar":
        STATS["fused_scalar"] += 1
        spec = ("scalar", spec_cols, pred_groups, probes, eprobes,
                resids, keys, (), rslots, p.rv_ix, 0, 0, 0, ())
        packed = np.asarray(_fused_run(spec, *p.arrays))
        ns = len(p.rslots)
        outs = packed[:ns]
        counts = packed[ns:]
        return _finalize_scalar(p, slots, outs, counts)

    STATS["fused_grouped"] += 1
    domains = _phys_domains(p)
    if domains is not None:
        m = 1
        for _, span in domains:
            m *= span + 2
        # cap by table bytes, not a fixed slot count: a single-key FD
        # reduction (q3's GROUP BY l_orderkey) tolerates tens of
        # millions of slots when the payload column set is narrow
        ncols = 1 + 2 * len(p.rslots) + 2 * len(keys)
        cap = min(1 << 27, (3 << 30) // (8 * ncols))
        if 0 < m <= cap:
            pseg = ()
            if p.rv_ix >= 0 and p.rslot_maxabs \
                    and all(b is not None for b in p.rslot_maxabs) \
                    and all(r[0] == "sum" and (r[1] == "i64"
                            or r[1].startswith("i64s"))
                            for r in p.rslots):
                import jax as _jax
                from liquid_tpu.ops import grouphist_pallas as gh
                n_tblcols = 1 + 2 * len(p.rslots)
                ntab = gh.plan_tables(m)
                if (_jax.default_backend() == "tpu" and gh.HAVE_PALLAS
                        and ntab and m + 1 <= gh.MAX_SLOTS
                        and m * n_tblcols > 6144):  # streaming wins below
                    n_rows = int(p.arrays[p.rv_ix].shape[0]) * BLOCK_ROWS
                    plans = [gh.plan_hilo(n_rows, b)
                             for b in p.rslot_maxabs]
                    if all(pl2 is not None for pl2 in plans) \
                            and n_rows % gh.TILE == 0:
                        seg = min(pl2[0] for pl2 in plans)
                        wide = tuple(pl2[1] > 0 for pl2 in plans)
                        ncols = 1 + len(p.rslots) \
                            + sum(2 if w else 1 for w in wide)
                        n_tiles = n_rows // gh.TILE
                        nseg = -(-n_tiles // seg)
                        # HBM partials are lane-padded: nseg * mp * 512B
                        if ncols <= gh.MAX_COLS \
                                and nseg <= gh.MAX_SEGS \
                                and nseg * (m + 8) * 512 <= (2 << 30):
                            pseg = (seg, ntab, wide)
                            STATS["fused_pallas"] = STATS.get(
                                "fused_pallas", 0) + 1
            tkspec = _mk_topk_spec(topk, m)  # slot arrays are m-long
            spec = ("direct", spec_cols, pred_groups, probes, eprobes,
                    resids, keys, fd_spec, rslots, p.rv_ix, 0, 0,
                    (tuple(span for _, span in domains), pseg,
                     p.having or ()), tkspec)
            los = jnp.asarray(
                np.array([lo for lo, _ in domains], np.int64))
            out = _fused_run(spec, *p.arrays, los)
            if tkspec:
                r = _finish_topk(p, slots, topk, np.asarray(out[3]))
                if r is not None:
                    return r
                # boundary tie: rerun without the in-program top-k
                spec = spec[:-1] + ((),)
                out = _fused_run(spec, *p.arrays, los)
            mat = np.asarray(out[0])
            g = int(mat[0, 1])
            if g <= mat.shape[1]:
                return _parse_packed(p, slots, mat, g)
            return _fetch_full(p, slots, g, out[3])
    hint_key = ("stage", keys)
    hint = getattr(table, "_fused_stage_hint", {}).get(hint_key)
    # static cardinality bound (dict vocab size / int domain span) picks
    # a table the multi-round scatter converges in without a retry;
    # capped by the scanned row count -- distinct tuples can't exceed
    # rows, and a multi-key DOMAIN product is wildly pessimistic (it
    # would force the largest stage for a 100k-row scan)
    bound = _cardinality_bound(p)
    if p.rv_ix >= 0:
        n_upper = int(p.arrays[p.rv_ix].shape[0]) * BLOCK_ROWS
        bound = n_upper if bound is None else min(bound, n_upper)
    start = 0
    if hint is not None:
        # a stage PROVEN clean for this key set beats the static bound
        # (the bound is an upper bound on cardinality; the ladder still
        # verifies exactness and grows on failure)
        start = hint
    elif bound is not None:
        for si, (ns, _s) in enumerate(_STAGES):
            if ns >= 2 * bound:
                start = si
                break
        else:
            start = len(_STAGES) - 1
    result = None
    for si in range(start, len(_STAGES)):
        n_slots, salt = _STAGES[si]
        # a birthday-safe table needs only ONE scatter round; dead
        # rounds would still pay full-row scatter passes
        rounds = 1 if (bound is not None and bound * bound <= n_slots) \
            else 3
        tkspec = _mk_topk_spec(topk, rounds * n_slots)
        spec = ("grouped", spec_cols, pred_groups, probes, eprobes,
                resids, keys, fd_spec, rslots, p.rv_ix, n_slots, salt,
                rounds, tkspec)
        out = _fused_run(spec, *p.arrays)
        if tkspec:
            clean_now = bool(np.asarray(out[1]))  # tiny scalar fetch
            if clean_now:
                if not hasattr(table, "_fused_stage_hint"):
                    table._fused_stage_hint = {}
                table._fused_stage_hint[hint_key] = si
                result = _finish_topk(p, slots, topk,
                                      np.asarray(out[3]))
                if result is None:
                    spec = spec[:-1] + ((),)
                    out = _fused_run(spec, *p.arrays)
                    mat = np.asarray(out[0])
                    g = int(mat[0, 1])
                    result = (_parse_packed(p, slots, mat, g)
                              if g <= mat.shape[1]
                              else _fetch_full(p, slots, g, out[3]))
                break
            STATS["fused_retries"] += 1
            continue
        mat = np.asarray(out[0])
        if mat[0, 0]:
            g = int(mat[0, 1])
            if not hasattr(table, "_fused_stage_hint"):
                table._fused_stage_hint = {}
            table._fused_stage_hint[hint_key] = si
            if g <= mat.shape[1]:
                result = _parse_packed(p, slots, mat, g)
            else:
                result = _fetch_full(p, slots, g, out[3])
            break
        STATS["fused_retries"] += 1
    return result


def payload_bounds(prep: _ColPrep):
    """Global (lo, hi) value bounds of a planes/linear column prep from
    per-block reference values + bit widths (linear adds the slope*i
    term's range); None for float/dict."""
    if prep.kind == "planes":
        lo = min(pp.reference_value for pp in prep.payloads)
        hi = max(pp.reference_value + (1 << min(pp.width, 62)) - 1
                 for pp in prep.payloads)
        return int(lo), int(hi)
    if prep.kind == "linear":
        from liquid_tpu.arrays.linear import LiquidLinearArray
        lo = hi = None
        for pp in prep.payloads:
            if isinstance(pp, LiquidLinearArray):
                r = pp.residuals
                lin = round(pp.slope * (BLOCK_ROWS - 1))
            else:  # primitive block in a mixed linear prep (slope 0)
                r = pp
                lin = 0
            lb = r.reference_value + min(0, lin)
            hb = (r.reference_value + (1 << min(r.width, 62)) - 1
                  + max(0, lin))
            lo = lb if lo is None else min(lo, lb)
            hi = hb if hi is None else max(hi, hb)
        return int(lo), int(hi)
    return None


def _phys_domains(p: _Plan):
    """Domains of the PHYSICAL reduction keys: the FD representative
    alone when FD reduction applies, else every group key."""
    if not p.fd:
        return _key_domains(p)
    kb = p.key_bounds.get(p.phys_keys[0])
    if kb is None or kb[1] - kb[0] >= (1 << 44):
        return None
    return [(kb[0], kb[1] - kb[0])]


def _key_domains(p: _Plan):
    """Per-key (lo, span) when the value domain is densely boundable
    (int refs+widths, dictionary size); None when any key is unbounded.
    Enables DIRECT ADDRESSING: bijective slots, zero collision passes."""
    out = []
    for name, dec in zip(p.keys, p.key_decoders):
        if dec[0] == "vocab":
            out.append((0, max(len(dec[1]), 1) - 1))
            continue
        kb = p.key_bounds.get(name)
        if kb is not None:
            lo, hi = kb
            if hi - lo >= (1 << 44):
                return None
            out.append((lo, hi - lo))
            continue
        payloads = p.key_payloads.get(name)
        if not payloads:
            return None
        if any(pp.width > 44 for pp in payloads):
            return None  # spans beyond ~17T: never direct-addressable
        lo = min(pp.reference_value for pp in payloads)
        hi = max(pp.reference_value + (1 << pp.width) - 1
                 for pp in payloads)
        out.append((lo, hi - lo))
    return out


def _cardinality_bound(p: _Plan) -> Optional[int]:
    """Upper bound on distinct key tuples, from dictionary sizes and
    integer domain spans; None when any key is unbounded (floats)."""
    if p.fd:
        kb = p.key_bounds.get(p.phys_keys[0])
        if kb is None:
            return None
        return max(min(kb[1] - kb[0] + 1, 1 << 62), 1)
    total = 1
    for name, dec in zip(p.keys, p.key_decoders):
        if dec[0] == "vocab":
            b = max(len(dec[1]), 1)
        elif name in p.key_bounds:
            lo, hi = p.key_bounds[name]
            b = max(min(hi - lo + 1, 1 << 62), 1)
        else:
            pr = None
            for c, ix in p.spec_cols:
                if c == name:
                    pr = dict(ix)
                    break
            if pr is None or pr.get("kind") not in ("planes", "pay"):
                return None
            b = None
        if b is None:
            # int domain span from per-block refs + widths
            payloads = p.key_payloads.get(name)
            if not payloads:
                return None
            lo = min(pp.reference_value for pp in payloads)
            hi = max(pp.reference_value + (1 << min(pp.width, 62)) - 1
                     for pp in payloads)
            b = max(min(hi - lo + 1, 1 << 62), 1)
        total = min(total * b, 1 << 62)
    return total


def _parse_packed(p: _Plan, slots, mat: np.ndarray, g: int) -> pa.Table:
    nk = len(p.keys)
    nv = len(p.rslots)
    r = 1
    ukeys = [mat[r + i][:g] for i in range(nk)]
    r += nk
    uknulls = [mat[r + i][:g].astype(bool) for i in range(nk)]
    r += nk
    outs = [mat[r + j][:g] for j in range(nv)]
    r += nv
    vcounts = [mat[r + j][:g] for j in range(nv)]
    return _build_result(p, slots, g, ukeys, uknulls, outs, vcounts,
                         packed_i64=True)


def _fetch_full(p: _Plan, slots, g: int, cols) -> pa.Table:
    """n_groups exceeded the packed-fetch cap: re-pack the reduction's
    slot-ordered outputs at the next power-of-two width and fetch."""
    nv = len(p.rslots)
    nk_red = len(p.phys_keys) if p.fd else len(p.keys)
    w2 = 1
    while w2 < g:
        w2 <<= 1
    ukeys, uknulls, outs, vcounts = hops.repack_groups(
        cols, nk_red, nv, w2)
    if p.fd:
        rep_pos, nk_full, entries = p.fd
        kv = ukeys[0]
        keys_full = [None] * nk_full
        nulls_full = [None] * nk_full
        keys_full[rep_pos] = kv
        nulls_full[rep_pos] = uknulls[0]
        for (pos, idx_ix, lo_ix, vals_ix, nulls_ix, ptype) in entries:
            if idx_ix < 0:  # probe-index mode: kv IS the dim row id
                j = jnp.asarray(kv).astype(jnp.int32)
            else:
                idxt = p.arrays[idx_ix]
                rel = jnp.clip(kv - p.arrays[lo_ix], 0,
                               idxt.shape[0] - 1)
                j = idxt[rel]
            valsa = p.arrays[vals_ix]
            jc = jnp.clip(j, 0, valsa.shape[0] - 1)
            v = valsa[jc]
            if ptype == "f64":
                v = floatbits.f64_bits(v + 0.0)
            else:
                v = v.astype(jnp.int64)
            nl = j < 0
            if nulls_ix >= 0:
                nl = nl | p.arrays[nulls_ix][jc]
            keys_full[pos] = v
            nulls_full[pos] = nl
        ukeys, uknulls = tuple(keys_full), tuple(nulls_full)
    return _parse_full(p, slots, g, ukeys, uknulls, outs, vcounts)


def _parse_full(p: _Plan, slots, g, ukeys, uknulls, outs, vcounts):
    # bit-packed fetch: million-group matrices cross the ~8 MB/s tunnel
    # at their minimal bit-width, not 8 B/value (ops/packfetch.py)
    from liquid_tpu.ops import packfetch
    nk, nv = len(ukeys), len(outs)
    cols = packfetch.fetch_columns(
        list(ukeys) + list(uknulls) + list(outs) + list(vcounts), g)
    return _build_result(
        p, slots, g,
        [c[:g] for c in cols[:nk]],
        [c[:g] for c in cols[nk:2 * nk]],
        [c[:g] for c in cols[2 * nk:2 * nk + nv]],
        [c[:g] for c in cols[2 * nk + nv:]], packed_i64=False)


def _build_result(p: _Plan, slots, g, ukeys, uknulls, outs, vcounts,
                  packed_i64: bool) -> pa.Table:
    cols: Dict[str, pa.Array] = {}
    for name, dec, codes, nulls in zip(p.key_out, p.key_decoders, ukeys,
                                       uknulls):
        if dec[0] == "vocab":
            vocab = pa.array(dec[1], type=dec[2])
            safe = np.where(nulls, 0, codes).astype(np.int64)
            vals = vocab.take(pa.array(safe, pa.int64()))
            if nulls.any():
                import pyarrow.compute as pc
                vals = pc.if_else(pa.array(~nulls), vals,
                                  pa.scalar(None, vals.type))
            cols[name] = vals
        else:
            codec = dec[1]
            cn = np.ascontiguousarray(codes, np.int64)
            cols[name] = codec.decode(cn, np.ascontiguousarray(nulls))
    for s, (kind, idxs) in zip(slots, p.slot_map):
        j = idxs[0]
        acc = np.ascontiguousarray(outs[j])
        cnt = np.ascontiguousarray(vcounts[j], np.int64)
        dt = p.rslots[j][1]
        if kind == "avg2":
            # chained-distinct avg: merged sum / merged count
            sv = (acc.view(np.float64) if dt == "f64"
                  and acc.dtype == np.int64 else acc.astype(np.float64))
            cv = np.ascontiguousarray(outs[idxs[1]]).astype(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                v = sv / cv
            mask = cv == 0
            cols[s.name] = pa.array(v, pa.float64(),
                                    mask=mask if mask.any() else None)
            continue
        if kind in ("stddev", "var"):
            ss = acc.view(np.float64) if acc.dtype == np.int64 else acc
            q = np.ascontiguousarray(outs[idxs[1]])
            qq = q.view(np.float64) if q.dtype == np.int64 else q
            cc = cnt.astype(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                var = (qq - ss * ss / cc) / (cc - 1.0)
            var = np.maximum(var, 0.0)
            v = np.sqrt(var) if kind == "stddev" else var
            mask = cnt <= 1
            cols[s.name] = pa.array(v, pa.float64(),
                                    mask=mask if mask.any() else None)
            continue
        t = p.slot_types.get(s.name, pa.int64())
        vocab = p.slot_vocabs.get(s.name)
        if vocab is not None and kind in ("min", "max"):
            cols[s.name] = _decode_gid_minmax(vocab, t, acc, cnt)
            continue
        cols[s.name] = _decode_slot_value(kind, t, acc, cnt, dt)
    if g == 0:
        return pa.table({k: v.slice(0, 0) for k, v in cols.items()}) \
            if cols else pa.table({})
    return pa.table(cols)


def _finalize_scalar(p: _Plan, slots, outs: np.ndarray,
                     counts: np.ndarray) -> pa.Table:
    cols: Dict[str, pa.Array] = {}
    for s, (kind, idxs) in zip(slots, p.slot_map):
        j = idxs[0]
        acc = outs[j: j + 1]
        cnt = counts[j: j + 1]
        dt = p.rslots[j][1]
        if kind == "count_star":
            cols[s.name] = pa.array(cnt, pa.int64())
            continue
        if kind == "count":
            cols[s.name] = pa.array(cnt, pa.int64())
            continue
        if kind in ("stddev", "var"):
            ss = acc.view(np.float64)
            qq = outs[idxs[1]: idxs[1] + 1].view(np.float64)
            n = int(cnt[0])
            if n <= 1:
                v = None
            else:
                var = max((qq[0] - ss[0] * ss[0] / n) / (n - 1), 0.0)
                v = var ** 0.5 if kind == "stddev" else var
            cols[s.name] = pa.array([v], pa.float64())
            continue
        t = p.slot_types.get(s.name, pa.int64())
        vocab = p.slot_vocabs.get(s.name)
        if vocab is not None and kind in ("min", "max"):
            cols[s.name] = _decode_gid_minmax(vocab, t, acc, cnt)
            continue
        cols[s.name] = _decode_slot_value(kind, t, acc, cnt, dt)
    return pa.table(cols)


def _decode_gid_minmax(vocab: list, t: pa.DataType, acc: np.ndarray,
                       cnt: np.ndarray) -> pa.Array:
    """min/max over a dict column: the accumulator holds SORTED-vocab
    gids, so the extreme gid decodes to the extreme value."""
    import pyarrow.compute as pc
    mask = cnt == 0
    if not len(vocab):
        return pa.nulls(len(acc), t)
    safe = np.clip(np.where(mask, 0, acc), 0, len(vocab) - 1)
    va = pa.array(vocab, type=t)
    vals = va.take(pa.array(safe.astype(np.int64), pa.int64()))
    if mask.any():
        vals = pc.if_else(pa.array(~mask), vals, pa.scalar(None, t))
    return vals


def _value_type(t: pa.DataType) -> pa.DataType:
    return t.value_type if pa.types.is_dictionary(t) else t


# -- count(DISTINCT) two-level execution --------------------------------------

def distinct_two_level(slots, group, key_names, rew_keys, rew_inputs,
                       run_inner) -> Optional[pa.Table]:
    """agg(DISTINCT col) via ONE fused inner aggregation grouped by
    keys + [distinct cols] (non-distinct aggregates ride as exact
    partials: sums of sums, min of mins, avg as sum+count) and a small
    host fold over the unique (keys, d...) rows.

    `run_inner(group2, key_names2, slots2, rew_keys2, rew_inputs2)`
    executes the inner aggregation on whichever fused engine the
    caller owns (single-table or star) and returns its table or None.

    Reference behavior: DataFusion's distinct-aggregate rewrite
    (single_distinct_to_groupby), reshaped for the device pipeline.
    """
    import pandas as pd
    from liquid_tpu.sql.physical import AggSlot
    dslots = [s for s in slots if s.kind == "count_distinct"]
    if not dslots:
        return None
    dcols: List[str] = []
    for s in dslots:
        e = rew_inputs.get(s.name)
        if not isinstance(e, ast.Column):
            return None
        if e.name not in dcols:
            dcols.append(e.name)

    inner_slots: List = []
    recipes: List[tuple] = []

    def add_partial(kind, inp):
        nm = f"__cd{len(inner_slots)}"
        inner_slots.append(AggSlot(
            ast.Func(kind if kind != "count_star" else "count",
                     (inp,) if inp is not None else (),
                     star=inp is None), nm,
            kind, inp))
        return nm

    for s in slots:
        if s.kind == "count_distinct":
            recipes.append(("nunique", rew_inputs[s.name].name))
        elif s.kind == "count_star":
            recipes.append(("fold", "sum", add_partial("count_star",
                                                       None), "i"))
        elif s.kind == "count":
            recipes.append(("fold", "sum", add_partial(
                "count", rew_inputs[s.name]), "i"))
        elif s.kind in ("sum", "min", "max"):
            recipes.append(("fold", "sum" if s.kind == "sum" else s.kind,
                            add_partial(s.kind, rew_inputs[s.name]),
                            "v"))
        elif s.kind == "avg":
            n1 = add_partial("sum", rew_inputs[s.name])
            n2 = add_partial("count", rew_inputs[s.name])
            recipes.append(("ratio", n1, n2))
        else:
            return None

    group2 = list(group) + [(ast.Column(d), f"__dk_{d}") for d in dcols]
    key_names2 = [nm for _, nm in group2]
    rew_keys2 = list(rew_keys) + [ast.Column(d) for d in dcols]
    rew_inputs2 = {s.name: s.input for s in inner_slots
                   if s.input is not None}
    inner = run_inner(group2, key_names2, inner_slots, rew_keys2,
                      rew_inputs2)
    if inner is None:
        return None

    keyn = [nm for _, nm in group]
    df = inner.to_pandas()

    def fold(gr):
        out = {}
        for s, r in zip(slots, recipes):
            if r[0] == "nunique":
                out[s.name] = gr[f"__dk_{r[1]}"].nunique()
            elif r[0] == "fold":
                c = gr[r[2]]
                if r[1] == "sum":
                    nn = c.dropna()
                    out[s.name] = nn.sum() if len(nn) else None
                elif r[1] == "min":
                    out[s.name] = c.min()
                else:
                    out[s.name] = c.max()
            else:
                cs, cc = gr[r[1]].sum(), gr[r[2]].sum()
                out[s.name] = (cs / cc) if cc else None
        return pd.Series(out)

    if keyn:
        if len(df) == 0:
            cols = {nm: inner.column(nm).slice(0, 0) for nm in keyn}
            for s in slots:
                cols[s.name] = pa.array([], _fold_out_type(
                    s, recipes[slots.index(s)], inner))
            return pa.table(cols)
        folded = df.groupby(keyn, dropna=False, sort=False) \
            .apply(fold, include_groups=False).reset_index()
    else:
        if len(df) == 0:
            folded = pd.DataFrame([{
                s.name: (0 if s.kind in ("count_distinct", "count_star",
                                         "count") else None)
                for s in slots}])
        else:
            folded = fold(df).to_frame().T

    cols = {}
    for nm in keyn:
        arr = pa.Array.from_pandas(folded[nm])
        want = inner.schema.field(nm).type
        try:
            arr = arr.cast(want)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            pass
        cols[nm] = arr
    for s, r in zip(slots, recipes):
        t = _fold_out_type(s, r, inner)
        arr = pa.Array.from_pandas(folded[s.name])
        try:
            arr = arr.cast(t)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            pass
        cols[s.name] = arr
    return pa.table(cols)


def _fold_out_type(s, recipe, inner: pa.Table) -> pa.DataType:
    if s.kind in ("count_distinct", "count_star", "count"):
        return pa.int64()
    if recipe[0] == "ratio" or s.kind == "avg":
        return pa.float64()
    return inner.schema.field(recipe[2]).type


# -- device top-k fetch -------------------------------------------------------
#
# The axon tunnel fetches device->host at ~8 MB/s with a ~35 ms floor
# (measured round 4): a 65k-row packed matrix costs 100s of ms, yet
# ORDER BY <agg> LIMIT k queries need ~k rows.  When the first ORDER BY
# target is an aggregate output, the top-k superset (k2 = 4k+64 rows,
# chosen by the first key's value with NULL placement folded in) is
# selected ON DEVICE and only those rows are fetched.  Exactness is
# host-verified: every unfetched group's value is <= the last fetched
# value, so the result is exact unless the k-th row TIES the boundary
# -- in which case the full fetch runs (rare, never wrong).

TOPK_MARGIN = 64
TOPK_MAX = 4096


class TopKSpec:
    __slots__ = ("slot_index", "desc", "nulls_first", "k")

    def __init__(self, slot_index, desc, nulls_first, k):
        self.slot_index = slot_index
        self.desc = desc
        self.nulls_first = nulls_first
        self.k = k


_HAVING_OPS = {">": "gt", ">=": "ge", "<": "lt", "<=": "le",
               "=": "eq", "<>": "ne", "!=": "ne"}
_HAVING_FLIP = {"gt": "lt", "ge": "le", "lt": "gt", "le": "ge",
                "eq": "eq", "ne": "ne"}


def plan_having(q, slots, p: _Plan):
    """-> (rslot_index, op, literal) when HAVING is a single comparison
    of one sum/count aggregate against a numeric literal (f64-exact by
    proven bounds); the host still re-applies the predicate, so this is
    purely a fetch reducer."""
    if q is None or getattr(q, "having", None) is None:
        return None
    e = q.having
    if not (isinstance(e, ast.Binary) and e.op in _HAVING_OPS):
        return None
    l, r = e.left, e.right
    op = _HAVING_OPS[e.op]
    if isinstance(l, ast.Literal):
        l, r = r, l
        op = _HAVING_FLIP[op]
    if not (isinstance(r, ast.Literal)
            and isinstance(r.value, (int, float))
            and not isinstance(r.value, bool)):
        return None
    for si, s in enumerate(slots):
        if s.func == l:
            kind, idxs = p.slot_map[si]
            if kind not in ("sum", "count_star", "count"):
                return None
            j = idxs[0]
            dtj = p.rslots[j][1]
            lit = float(r.value)
            if (dtj == "i64" or dtj.startswith("i64s")) and kind == "sum":
                b = (p.rslot_maxabs[j]
                     if j < len(p.rslot_maxabs) else None)
                if b is None or p.rv_ix < 0:
                    return None
                n_upper = int(p.arrays[p.rv_ix].shape[0]) * BLOCK_ROWS
                if b * n_upper >= (1 << 53):
                    return None  # f64 compare could misorder
                if dtj.startswith("i64s"):
                    # scaled-int acc: compare in the scaled space
                    lit = lit * (10 ** int(dtj[4:]))
                    if abs(lit) >= (1 << 53):
                        return None
            return (j, op, lit)
    return None


def plan_topk(q, slots, p: _Plan):
    """-> TopKSpec or None (ORDER BY <agg output> ... LIMIT k with no
    HAVING; the first order key decides the device selection, the host
    finishes the full multi-key sort over the superset)."""
    if q.limit is None or not q.order_by or q.having is not None:
        return None
    k = q.limit + (q.offset or 0)
    if k * 4 + TOPK_MARGIN > TOPK_MAX:
        return None
    o = q.order_by[0]
    e = o.expr
    alias_map = {it.alias: it.expr for it in q.items if it.alias}
    if isinstance(e, ast.Column) and e.name in alias_map:
        e = alias_map[e.name]
    for si, s in enumerate(slots):
        if s.func == e:
            kind, idxs = p.slot_map[si]
            if kind in ("stddev", "var", "count_distinct", "avg2"):
                return None
            j = idxs[0]
            r = p.rslots[j]
            if (r[1] == "i64" or r[1].startswith("i64s")) \
                    and kind in ("sum", "avg", "min", "max"):
                # i64 order values ride f64 for top_k: exact only
                # within 2^53 -- require proven bounds (scaled-int accs
                # rank by their scaled image, same order; the boundary
                # certification in _finish_topk full-fetches on ties)
                b = (p.rslot_maxabs[j] if j < len(p.rslot_maxabs)
                     else None)
                if b is None:
                    return None
            nf = o.desc if o.nulls_first is None else o.nulls_first
            return TopKSpec((kind, idxs), bool(o.desc), bool(nf), k)
    return None


@partial(jax.jit, static_argnames=("spec", "nk", "nv", "k2"))
def _topk_gather(cols, spec, nk, nv, k2):
    return _topk_gather_core(cols, spec + (k2,), nk, nv)


def _topk_gather_core(cols, spec, nk, nv):
    """Select the top-k2 occupied slot rows by the order value and pack
    them into one small i64 matrix: row 0 = [occ, nanflag] flags per
    column... layout: [occ_row, val_row, keys(nk), knulls(nk),
    outs(nv), counts(nv)] x k2."""
    kind, j_acc, j_cnt, desc, nulls_first, k2 = spec
    occ = cols[0]
    acc = cols[1 + 2 * nk + j_acc]
    cnt = cols[1 + 2 * nk + nv + j_acc]
    if acc.dtype == jnp.float64:
        val = acc
    else:
        val = acc.astype(jnp.float64)
    if kind == "avg":
        val = val / jnp.maximum(cnt, 1).astype(jnp.float64)
    isnull = cnt == 0
    # SQL placement folded into the ranking value (huge FINITE
    # sentinels: -inf must remain exclusive to unoccupied slots so the
    # occupied rows stay a prefix of the top-k2)
    null_rank = jnp.float64(
        1.7e308 if nulls_first == desc else -1.7e308)
    val = jnp.where(isnull, null_rank, val)
    nanflag = jnp.isnan(val).any() | jnp.isinf(
        jnp.where(occ, val, 0.0)).any()
    rank = jnp.where(occ, val if desc else -val, -jnp.inf)
    _, idx = jax.lax.top_k(rank, k2)

    def as_i64(x):
        if x.dtype == jnp.float64:
            x = floatbits.f64_bits(x)
        elif x.dtype != jnp.int64:
            x = x.astype(jnp.int64)
        return x[idx]

    rows = [occ[idx].astype(jnp.int64).at[0].add(
        nanflag.astype(jnp.int64) << 32),
        as_i64(val)]
    for c in cols[1:]:
        rows.append(as_i64(c))
    return jnp.stack(rows)


def _mk_topk_spec(topk, m: int):
    """Static in-program top-k spec (empty when top-k doesn't apply)."""
    if topk is None:
        return ()
    kind, idxs = topk.slot_index
    k2 = min(topk.k * 4 + TOPK_MARGIN, int(m))
    return (kind, idxs[0], idxs[0], topk.desc, topk.nulls_first, k2)


def _try_topk_fetch(p: _Plan, slots, out, topk: TopKSpec):
    """Device top-k superset fetch (post-hoc gather form, used by the
    chained-distinct path); returns the partial table or None when
    exactness can't be certified (caller full-fetches)."""
    mat, clean, ng, cols = out
    nk_red = len(p.phys_keys) if p.fd else len(p.keys)
    nv = len(p.rslots)
    kind, idxs = topk.slot_index
    k2 = min(topk.k * 4 + TOPK_MARGIN, int(cols[0].shape[0]))
    spec = (kind, idxs[0], idxs[0], topk.desc, topk.nulls_first)
    mini = np.asarray(_topk_gather(tuple(cols), spec, nk_red, nv, k2))
    return _finish_topk(p, slots, topk, mini)


def _finish_topk(p: _Plan, slots, topk: TopKSpec, mini: np.ndarray):
    nk_red = len(p.phys_keys) if p.fd else len(p.keys)
    nv = len(p.rslots)
    occ = (mini[0] & 0xFFFFFFFF).astype(bool)
    if (mini[0, 0] >> 32) & 1:
        return None  # NaN order values: ordering unreliable
    k2 = mini.shape[1]
    g2 = int(occ.sum())
    vals = mini[1].view(np.float64)
    if g2 == k2 and k2 > topk.k:
        # more groups exist beyond the fetch: exact iff the k-th row's
        # value beats the boundary strictly
        vk, vlast = vals[topk.k - 1], vals[g2 - 1]
        if not (vk > vlast if topk.desc else vk < vlast):
            return None
    rows = mini[2:, :g2]
    ukeys = [rows[i] for i in range(nk_red)]
    uknulls = [rows[nk_red + i].astype(bool) for i in range(nk_red)]
    outs = [rows[2 * nk_red + j] for j in range(nv)]
    vcounts = [rows[2 * nk_red + nv + j] for j in range(nv)]
    if p.fd:
        rep_pos, nk_full, entries = p.fd
        kv = jnp.asarray(ukeys[0])
        keys_full = [None] * nk_full
        nulls_full = [None] * nk_full
        keys_full[rep_pos] = ukeys[0]
        nulls_full[rep_pos] = uknulls[0]
        for (pos, idx_ix, lo_ix, vals_ix, nulls_ix, ptype) in entries:
            if idx_ix < 0:  # probe-index mode: kv IS the dim row id
                jj = jnp.asarray(ukeys[0]).astype(jnp.int32)
            else:
                idxt = p.arrays[idx_ix]
                rel = jnp.clip(kv - p.arrays[lo_ix], 0,
                               idxt.shape[0] - 1)
                jj = idxt[rel]
            va = p.arrays[vals_ix]
            jc = jnp.clip(jj, 0, va.shape[0] - 1)
            v = va[jc]
            if ptype == "f64":
                v = floatbits.f64_bits(v + 0.0)
            else:
                v = v.astype(jnp.int64)
            nl = jj < 0
            if nulls_ix >= 0:
                nl = nl | p.arrays[nulls_ix][jc]
            keys_full[pos] = np.asarray(v)
            nulls_full[pos] = np.asarray(nl)
        ukeys, uknulls = keys_full, nulls_full
    return _build_result(p, slots, g2, ukeys, uknulls, outs, vcounts,
                         packed_i64=True)


# -- device-chained count(DISTINCT) -------------------------------------------
#
# The host-fold form of distinct_two_level fetches every unique
# (keys, d) row -- millions of rows x ~8 MB/s of tunnel for ClickBench's
# COUNT(DISTINCT UserID) family.  This chained form runs BOTH
# reductions in ONE device program: level 1 groups by keys + [d]
# (partial aggregates ride along), level 2 re-reduces the level-1 SLOT
# ARRAYS by the original keys -- nunique(d) is the sum of d-non-null
# flags over unique (keys, d) slots -- and only the final per-key rows
# transfer (with the device top-k fetch applying on top).

@partial(jax.jit, static_argnums=(0,))
def _fused_distinct_run2(spec1, *arrays):
    """Sort-based distinct: the whole query is ONE _fused_core call in
    "sortpairs" mode (sorted pair dedup + small outer-key table)."""
    return _fused_core(spec1, arrays)


@partial(jax.jit, static_argnums=(0, 1, 2))
def _fused_distinct_run(spec1, l2, stage2, *arrays):
    """l2: (recipes, kinds2) where recipes[j] picks the level-2 input:
    ("nunique",) | ("out", j1) using level-1 rslot j1's acc/cnt."""
    res1 = _fused_core(spec1, arrays)
    mat1, clean1, ng1, cols1 = res1
    keys1 = spec1[6]
    nk1 = len(keys1)
    nv1 = len(spec1[8])
    occ = cols1[0]
    kreps = cols1[1:1 + nk1]
    nreps = cols1[1 + nk1:1 + 2 * nk1]
    ocat = cols1[1 + 2 * nk1:1 + 2 * nk1 + nv1]
    ccat = cols1[1 + 2 * nk1 + nv1:]
    # d is the LAST level-1 key by construction
    codes2 = tuple(k.astype(jnp.int64) if k.dtype != jnp.int64 else k
                   for k in kreps[:-1])
    knulls2 = tuple(n.astype(jnp.bool_) for n in nreps[:-1])
    d_nonnull = ~nreps[-1].astype(jnp.bool_)
    recipes, kinds2 = l2
    vals2, vnulls2 = [], []
    for r in recipes:
        if r[0] == "nunique":
            vals2.append((d_nonnull & occ).astype(jnp.int64))
            vnulls2.append(~(d_nonnull & occ))
        else:
            j1 = r[1]
            vals2.append(ocat[j1])
            vnulls2.append(ccat[j1] == 0)
    n_slots2, salt2, rounds2 = stage2
    res2 = hops.hash_rounds_reduce_packed(
        codes2, knulls2, occ, tuple(vals2), tuple(vnulls2), kinds2,
        n_slots2, salt2, rounds=rounds2)
    mat2, clean2, ng2, cols2 = res2
    return (mat2, clean1 & clean2, ng2, cols2)


def distinct_fused_device(table, plan_scan, hints, group, key_names,
                          slots, rew_keys, rew_inputs,
                          q=None) -> Optional[pa.Table]:
    """count(DISTINCT d) fully on device (single parquet source).
    Returns the partial result table or None (caller falls back to the
    host-fold two-level, then the classic path)."""
    from liquid_tpu.sql.physical import AggSlot
    dslots = [s for s in slots if s.kind == "count_distinct"]
    if not dslots:
        return None
    dcols = []
    for s in dslots:
        e = rew_inputs.get(s.name)
        if not isinstance(e, ast.Column):
            return None
        if e.name not in dcols:
            dcols.append(e.name)
    if len(dcols) != 1:
        return None  # one distinct column (covers the ClickBench set)
    d = dcols[0]

    # level-1 partial slots + level-2 recipes
    inner_slots: List = []
    recipes: List[tuple] = []
    kinds2: List[str] = []
    slot_map2: List[tuple] = []
    slot_types2: Dict[str, pa.DataType] = {}

    pending_types: List[tuple] = []

    def partial_slot(kind, inp):
        nm = f"__dp{len(inner_slots)}"
        inner_slots.append(AggSlot(
            ast.Func(kind if kind != "count_star" else "count",
                     (inp,) if inp is not None else (),
                     star=inp is None), nm, kind, inp))
        return len(inner_slots) - 1

    for s in slots:
        base = len(recipes)
        if s.kind == "count_distinct":
            recipes.append(("nunique",))
            kinds2.append("sum")
            slot_map2.append(("count_star", (base,)))
        elif s.kind == "count_star":
            recipes.append(("out", partial_slot("count_star", None)))
            kinds2.append("sum")
            slot_map2.append(("count_star", (base,)))
        elif s.kind == "count":
            recipes.append(("out", partial_slot(
                "count", rew_inputs[s.name])))
            kinds2.append("sum")
            slot_map2.append(("count_star", (base,)))
        elif s.kind in ("sum", "min", "max"):
            j1 = partial_slot(s.kind, rew_inputs[s.name])
            recipes.append(("out", j1))
            kinds2.append("sum" if s.kind == "sum" else s.kind)
            slot_map2.append((s.kind, (base,)))
            pending_types.append((s.name, inner_slots[j1].name))
        elif s.kind == "avg":
            recipes.append(("out", partial_slot(
                "sum", rew_inputs[s.name])))
            kinds2.append("sum")
            recipes.append(("out", partial_slot(
                "count", rew_inputs[s.name])))
            kinds2.append("sum")
            slot_map2.append(("avg2", (base, base + 1)))
        else:
            return None

    group2 = list(group) + [(ast.Column(d), f"__dk_{d}")]
    key_names2 = [nm for _, nm in group2]
    rew_keys2 = list(rew_keys) + [ast.Column(d)]
    rew_inputs2 = {s.name: s.input for s in inner_slots
                   if s.input is not None}
    try:
        p1, mode, empty = _plan_query(table, plan_scan, hints, group2,
                                      key_names2, inner_slots,
                                      rew_keys2, rew_inputs2)
    except _Bail:
        return None
    except Exception:
        import os
        if os.environ.get("LIQUID_FUSED_STRICT"):
            raise
        return None
    if mode != "grouped" or empty or p1.fd:
        return None

    # level-2 pseudo-plan for the shared result decode / top-k machinery
    p2 = _Plan()
    p2.keys = p1.keys[:-1]
    p2.key_out = list(key_names)
    p2.key_decoders = p1.key_decoders[:-1]
    p2.key_bounds = dict(p1.key_bounds)
    # outer-key cardinality bounds resolve through the same spec/payload
    # lookups as the level-1 plan (int keys: block refs + widths)
    p2.spec_cols = list(p1.spec_cols)
    p2.key_payloads = dict(p1.key_payloads)
    p2.slot_map = slot_map2
    p2.arrays = p1.arrays
    for s in slots:
        if s.kind == "count_distinct":
            p2.slot_types[s.name] = pa.int64()
    for outer, inner_nm in pending_types:
        p2.slot_types[outer] = p1.slot_types.get(inner_nm, pa.int64())
        if inner_nm in p1.slot_vocabs:
            # gid-coded string min/max: the level-2 extreme gid decodes
            # through the same sorted vocabulary
            p2.slot_vocabs[outer] = p1.slot_vocabs[inner_nm]
    # rslots for _build_result's dtype decode (dt strings per level-2
    # output; avg decodes from two sum outputs)
    for r, k2 in zip(recipes, kinds2):
        if r[0] == "nunique":
            p2.rslots.append(("sum", "i64", ("ones",), ()))
            p2.rslot_maxabs.append(1)
        else:
            r1 = p1.rslots[r[1]]
            p2.rslots.append((k2, r1[1], r1[2], r1[3]))
            p2.rslot_maxabs.append(None)

    bound = _cardinality_bound(p1)
    if p1.rv_ix >= 0:
        n_upper = int(p1.arrays[p1.rv_ix].shape[0]) * BLOCK_ROWS
        bound = n_upper if bound is None else min(bound, n_upper)
    start = 0
    if bound is not None:
        for si, (ns, _s) in enumerate(_STAGES_XL):
            if ns >= 2 * bound:
                start = si
                break
        else:
            # even the XL table cannot promise convergence: the ladder
            # would exhaust and pay its full cost before falling back --
            # the host-fold form wins at that cardinality
            return None
    # the bound is row-count-capped and wildly pessimistic for the
    # ClickBench COUNT(DISTINCT UserID) family (4M scanned rows but
    # ~100k-3M unique (key, user) pairs); big tables pay ~1 KB of
    # random RMW per scattered row (tile padding, PERF_NOTES.md), so
    # start at 1M slots and let the dirty-check grow the table -- the
    # proven-stage hint pins warm executions to the converged stage
    start = min(start, 2)
    hint_key = ("stage2", tuple(p1.keys))
    hint = getattr(table, "_fused_stage_hint", {}).get(hint_key)
    if hint is not None:
        start = hint

    # level-2 table sized by the KEY-ONLY cardinality (the d column is
    # folded away): ClickBench's COUNT(DISTINCT UserID) family groups
    # ~4M unique (key, user) pairs down to <=100k keys, so the final
    # reduction always fits a small table
    kb = _cardinality_bound(p2)

    spec1_base = (_freeze(p1.spec_cols), _freeze(p1.pred_groups),
                  _freeze(p1.probes), _freeze(p1.eprobes),
                  _freeze(p1.resids),
                  tuple(p1.keys), (), _freeze(p1.rslots), p1.rv_ix)
    l2 = (_freeze(recipes), tuple(kinds2))
    topk = plan_topk(q, slots, p2) if q is not None else None

    def finish(out, hk, si):
        clean_now = bool(np.asarray(out[1]))
        if not clean_now:
            STATS["fused_retries"] += 1
            return None
        if not hasattr(table, "_fused_stage_hint"):
            table._fused_stage_hint = {}
        table._fused_stage_hint[hk] = si
        STATS["fused_queries"] += 1
        STATS["fused_grouped"] += 1
        if topk is not None:
            r = _try_topk_fetch(p2, slots, out, topk)
            if r is not None:
                return r
        mat = np.asarray(out[0])
        g = int(mat[0, 1])
        if g <= mat.shape[1]:
            return _parse_packed(p2, slots, mat, g)
        return _fetch_full(p2, slots, g, out[3])

    # preferred: sort-based pair dedup (ops-level rationale in
    # _fused_core "sortpairs").  The table only ever needs 2x the
    # OUTER-key cardinality, so a known small bound skips the
    # pair-cardinality ladder entirely.
    if kb is not None:
        hk = ("stage2sort", tuple(p1.keys))
        s0 = 0
        for si, (ns, _s) in enumerate(_STAGES_XL):
            if ns >= 2 * kb:
                s0 = si
                break
        else:
            s0 = None
        hint2 = getattr(table, "_fused_stage_hint", {}).get(hk)
        if hint2 is not None:
            s0 = hint2
        if s0 is not None:
            for si in range(s0, len(_STAGES_XL)):
                n2, s2 = _STAGES_XL[si]
                spec1 = ("sortpairs",) + spec1_base + (
                    n2, s2, (l2[0], l2[1], 3), ())
                r = finish(_fused_distinct_run2(spec1, *p1.arrays),
                           hk, si)
                if r is not None:
                    STATS["distinct_sort"] = STATS.get(
                        "distinct_sort", 0) + 1
                    return r
            return None

    for si in range(start, len(_STAGES_XL)):
        n_slots, salt = _STAGES_XL[si]
        rounds = 3
        n_slots2 = n_slots
        if kb is not None:
            for ns2, _s2 in _STAGES_XL:
                if ns2 >= 2 * kb:
                    n_slots2 = ns2
                    break
        spec1 = ("grouped",) + spec1_base + (n_slots, salt, rounds, ())
        stage2 = (n_slots2, salt ^ 0x5851F42D4C957F2D, rounds)
        r = finish(_fused_distinct_run(spec1, l2, stage2, *p1.arrays),
                   hint_key, si)
        if r is not None:
            return r
    return None
