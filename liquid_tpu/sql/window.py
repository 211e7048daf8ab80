"""Window-function evaluation.

Reference behavior: the reference delegates window functions to
DataFusion's `BoundedWindowAggExec`/`WindowAggExec` (it ships no window
code of its own; its TPC-DS suite exercises them through DataFusion).
This module implements the standard set over a materialized base table:

- ranking: row_number, rank, dense_rank, ntile
- navigation: lag, lead, first_value, last_value
- framed aggregates: sum, count, avg, min, max

Frames: the SQL defaults (RANGE UNBOUNDED PRECEDING..CURRENT ROW with
ORDER BY, whole partition without), ROWS/RANGE with unbounded/current
bounds, and bounded ROWS offsets.

Algorithm: one lexsort over (partition keys, order keys) -- exact
per-key ordering via pandas Categorical codes so huge int64s and mixed
types never collapse into false ties -- then vectorized prefix-scan /
boundary math in the sorted domain, scattered back to input order.
Sorting is O(n log n) on the host; window queries run over aggregated
or filtered results (the engine's hot path stays the encoded scan).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from liquid_tpu.sql import ast

WINDOW_FUNCS = {
    "row_number", "rank", "dense_rank", "ntile", "lag", "lead",
    "first_value", "last_value", "sum", "count", "avg", "min", "max",
}


def find_windows(e, out: List[ast.WindowFunc]) -> None:
    """Collect distinct WindowFunc nodes (structural dedup)."""
    if isinstance(e, ast.WindowFunc):
        if e not in out:
            out.append(e)
        return
    for f_ in getattr(e, "__dataclass_fields__", {}):
        v = getattr(e, f_)
        if isinstance(v, ast.Expr):
            find_windows(v, out)
        elif isinstance(v, (list, tuple)):
            for x in v:
                if isinstance(x, ast.Expr):
                    find_windows(x, out)
                elif isinstance(x, tuple):
                    for y in x:
                        if isinstance(y, ast.Expr):
                            find_windows(y, out)


def _const(e: ast.Expr):
    """Literal (possibly negated) argument value, else None."""
    if isinstance(e, ast.Literal):
        return e.value
    if isinstance(e, ast.Unary) and e.op == "neg" \
            and isinstance(e.operand, ast.Literal):
        return -e.operand.value
    return None


def _series(t: pa.Table, name: str) -> pd.Series:
    return t.column(name).to_pandas()


def _part_codes(s: pd.Series) -> np.ndarray:
    """Exact grouping codes; nulls form their own group."""
    codes, _ = pd.factorize(s, use_na_sentinel=False)
    return codes.astype(np.int64)


def _order_codes(s: pd.Series, desc: bool,
                 nulls_first: Optional[bool]) -> np.ndarray:
    """Exact ordering codes: Categorical categories are the sorted
    uniques, so code order == value order for every dtype."""
    cat = pd.Categorical(s)
    c = cat.codes.astype(np.int64)
    ncat = len(cat.categories)
    isnull = c == -1
    if desc:
        c = -c
    # SQL default: NULLS LAST for ASC, NULLS FIRST for DESC
    nf = nulls_first if nulls_first is not None else desc
    c[isnull] = -(ncat + 1) if nf else (ncat + 1)
    return c


def _boundaries(keys: List[np.ndarray], n: int) -> np.ndarray:
    new = np.zeros(n, dtype=bool)
    if n:
        new[0] = True
    for c in keys:
        new[1:] |= c[1:] != c[:-1]
    return new


def _starts(new: np.ndarray) -> np.ndarray:
    pos = np.arange(len(new))
    return np.maximum.accumulate(np.where(new, pos, 0))


def _ends(new: np.ndarray) -> np.ndarray:
    n = len(new)
    pos = np.arange(n)
    is_last = np.empty(n, dtype=bool)
    if n:
        is_last[:-1] = new[1:]
        is_last[-1] = True
    endpos = np.where(is_last, pos, n)
    return np.minimum.accumulate(endpos[::-1])[::-1]


def _frame_kind(wf: ast.WindowFunc) -> Tuple[str, object, object]:
    """-> (unit, lo, hi) with lo/hi in {'unbounded', int offset} where
    negative = preceding; defaults applied."""
    if wf.frame is None:
        if wf.order_exprs:
            return ("range", "unbounded", 0)
        return ("rows", "unbounded", "unbounded")

    def bound(b: str, sign_note: str):
        if b == "unbounded_preceding" or b == "unbounded_following":
            return "unbounded"
        if b == "current_row":
            return 0
        k, which = b.rsplit("_", 1)
        return -int(k) if which == "preceding" else int(k)

    unit, s, e = wf.frame
    lo = bound(s, "lo")
    hi = bound(e, "hi")
    if s == "unbounded_following" or e == "unbounded_preceding":
        raise ValueError(f"invalid frame {wf.frame}")
    return (unit, lo, hi)


def _scatter(res: np.ndarray, sidx: np.ndarray):
    out = np.empty(len(res), dtype=res.dtype)
    out[sidx] = res
    return out


def _cast_like(values: np.ndarray, nulls: Optional[np.ndarray],
               like_type: Optional[pa.DataType]) -> pa.Array:
    arr = pa.array(values, from_pandas=True)
    if nulls is not None and nulls.any():
        arr = pa.array(
            [None if m else v for v, m in zip(values.tolist(), nulls.tolist())])
    if like_type is not None:
        try:
            return arr.cast(like_type)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            return arr
    return arr


def _minmax_window(vals: pd.Series, nn: pd.Series, lo_i: np.ndarray,
                   hi_i: np.ndarray, new_part: np.ndarray, name: str):
    """min/max over per-row [lo_i, hi_i] index windows (monotone ends
    within each partition): monotonic-deque sliding window; NULL inputs
    never enter the deque; an empty/invalid window yields NULL."""
    from collections import deque
    v = vals.to_numpy(dtype=object)
    nnv = nn.to_numpy()
    n = len(v)
    res = np.empty(n, dtype=object)
    res[:] = None
    cn = np.concatenate([[0], np.cumsum(nnv.astype(np.int64))])
    cnt = np.zeros(n, dtype=np.int64)
    if name == "min":
        def keeps(a, b):
            return a <= b
    else:
        def keeps(a, b):
            return a >= b
    pstarts = np.flatnonzero(new_part)
    pends = np.append(pstarts[1:], n)
    for s, e in zip(pstarts, pends):
        dq = deque()  # indices with monotone values
        nxt = s
        for i in range(s, e):
            hi = min(int(hi_i[i]), e - 1)
            lo = max(int(lo_i[i]), s)
            while nxt <= hi:
                if nnv[nxt]:
                    while dq and keeps(v[nxt], v[dq[-1]]):
                        dq.pop()
                    dq.append(nxt)
                nxt += 1
            while dq and dq[0] < lo:
                dq.popleft()
            if lo <= hi:
                cnt[i] = cn[hi + 1] - cn[lo]
                if dq and dq[0] <= hi:
                    res[i] = v[dq[0]]
    return res, cnt


def compute_window(t: pa.Table, wf: ast.WindowFunc,
                   arg_names: List[str], part_names: List[str],
                   order_names: List[str]) -> pa.Array:
    name = wf.func.name
    n = t.num_rows
    if n == 0:
        if name in ("row_number", "rank", "dense_rank", "ntile", "count"):
            return pa.array([], pa.int64())
        if name == "avg":
            return pa.array([], pa.float64())
        if arg_names:
            return pa.array([], t.column(arg_names[0]).type)
        return pa.array([], pa.int64())

    pcodes = [_part_codes(_series(t, p)) for p in part_names]
    ocodes = [_order_codes(_series(t, o), d, nf) for o, d, nf in
              zip(order_names, wf.order_desc, wf.order_nulls_first)]
    keys = pcodes + ocodes
    if keys:
        sidx = np.lexsort(tuple(reversed(keys)))
    else:
        sidx = np.arange(n)

    new_part = _boundaries([c[sidx] for c in pcodes], n)
    new_peer = _boundaries([c[sidx] for c in keys], n)
    starts = _starts(new_part)
    ends = _ends(new_part)
    pos = np.arange(n)

    def arg_sorted(i: int = 0) -> pd.Series:
        s = _series(t, arg_names[i])
        return s.iloc[sidx].reset_index(drop=True)

    def arg_type(i: int = 0):
        return t.column(arg_names[i]).type

    # -- ranking -------------------------------------------------------
    if name == "row_number":
        res = pos - starts + 1
        return pa.array(_scatter(res.astype(np.int64), sidx), pa.int64())
    if name == "rank":
        peer_starts = _starts(new_peer)
        res = peer_starts - starts + 1
        return pa.array(_scatter(res.astype(np.int64), sidx), pa.int64())
    if name == "dense_rank":
        dr = np.cumsum(new_peer)
        res = dr - dr[starts] + 1
        return pa.array(_scatter(res.astype(np.int64), sidx), pa.int64())
    if name == "ntile":
        k = int(_const(wf.func.args[0]))
        size = ends - starts + 1
        r = pos - starts
        q, rm = size // k, size % k
        big = rm * (q + 1)
        res = np.where(
            r < big, r // np.maximum(q + 1, 1),
            rm + (r - big) // np.maximum(q, 1)).astype(np.int64) + 1
        return pa.array(_scatter(res, sidx), pa.int64())

    # -- navigation ----------------------------------------------------
    if name in ("lag", "lead"):
        off = int(_const(wf.func.args[1])) if len(wf.func.args) > 1 else 1
        default = _const(wf.func.args[2]) if len(wf.func.args) > 2 else None
        v = arg_sorted().to_numpy(dtype=object)
        src = pos - off if name == "lag" else pos + off
        valid = (src >= starts) & (src <= ends)
        res = np.where(valid, v[np.clip(src, 0, n - 1)], default)
        nulls = pd.isna(res.astype(object))
        return _cast_like(_scatter(res, sidx),
                          _scatter(nulls, sidx), arg_type())
    if name == "first_value":
        v = arg_sorted().to_numpy(dtype=object)
        res = v[starts]
        nulls = pd.isna(res.astype(object))
        return _cast_like(_scatter(res, sidx),
                          _scatter(nulls, sidx), arg_type())
    if name == "last_value":
        v = arg_sorted().to_numpy(dtype=object)
        unit, lo, hi = _frame_kind(wf)
        if hi == "unbounded":
            res = v[ends]
        elif unit == "rows":
            idx = pos if hi == 0 else np.minimum(pos + hi, ends)
            res = v[idx]
        else:  # range: end of current peer group
            res = v[_ends(new_peer)]
        nulls = pd.isna(res.astype(object))
        return _cast_like(_scatter(res, sidx),
                          _scatter(nulls, sidx), arg_type())

    # -- framed aggregates ----------------------------------------------
    if name not in ("sum", "count", "avg", "min", "max"):
        raise NotImplementedError(f"window function {name}")

    unit, lo, hi = _frame_kind(wf)
    star = name == "count" and (wf.func.star or not wf.func.args)
    if star:
        vals = pd.Series(np.ones(n))
        like = pa.int64()
    else:
        vals = arg_sorted()
        like = arg_type()
    vnum = pd.to_numeric(vals, errors="coerce") \
        if name in ("sum", "avg", "count") and not star else vals
    part = pd.Series(np.cumsum(new_part))

    def finish(res: pd.Series, cnt: Optional[pd.Series]) -> pa.Array:
        arr = res.to_numpy(dtype=object)
        if cnt is not None:
            empty = cnt.to_numpy() == 0
            arr = np.where(empty, None, arr)
        nulls = pd.isna(arr.astype(object))
        out_t = (pa.int64() if (name == "count")
                 else pa.float64() if name == "avg" else like)
        if name == "sum" and pa.types.is_integer(like):
            out_t = pa.int64()
        elif name == "sum" and pa.types.is_decimal(like):
            out_t = None  # let arrow infer; cast below may fail on scale
        return _cast_like(_scatter(arr, sidx), _scatter(nulls, sidx), out_t)

    g = vnum.groupby(part) if name in ("sum", "avg", "count") \
        else vals.groupby(part)
    nn = vals.notna()
    gnn = nn.groupby(part)

    if lo == "unbounded" and hi == "unbounded":
        cnt = gnn.transform("sum")
        if name == "count":
            return finish(cnt.astype(np.int64), None)
        if name == "sum":
            return finish(vnum.fillna(0).groupby(part).transform("sum"), cnt)
        if name == "avg":
            return finish(g.transform("mean"), cnt)
        return finish(g.transform(name), cnt)

    if lo == "unbounded":
        # cumulative; RANGE carries the value at the peer-group end
        cum_cnt = gnn.cumsum()
        if name == "count":
            res = cum_cnt.astype(np.int64)
            cnt = None
        elif name == "sum":
            res = vnum.fillna(0).groupby(part).cumsum()
            cnt = cum_cnt
        elif name == "avg":
            res = vnum.fillna(0).groupby(part).cumsum() / cum_cnt
            cnt = cum_cnt
        else:
            res = g.cummin() if name == "min" else g.cummax()
            cnt = cum_cnt
        if hi != 0:
            if hi == "unbounded":
                raise AssertionError
            # unbounded..k_following: take the cumulative at i+k (clamped)
            idx = np.minimum(pos + hi, ends)
            res = pd.Series(res.to_numpy()[idx])
            cnt = pd.Series(cnt.to_numpy()[idx]) if cnt is not None else None
        elif unit == "range":
            peer = pd.Series(np.cumsum(new_peer))
            res = res.groupby(peer).transform("last")
            cnt = cnt.groupby(peer).transform("last") if cnt is not None \
                else None
        if name == "count" and cnt is None:
            return finish(res, None)
        return finish(res, cnt)

    if hi == "unbounded":
        # k_preceding..unbounded: reverse cumulative at max(i+lo, start)
        rev_cnt = nn[::-1].groupby(part[::-1]).cumsum()[::-1]
        if name == "sum" or name == "avg" or name == "count":
            rev = vnum.fillna(0)[::-1].groupby(part[::-1]).cumsum()[::-1]
        else:
            rev = (vals[::-1].groupby(part[::-1]).cummin()[::-1]
                   if name == "min"
                   else vals[::-1].groupby(part[::-1]).cummax()[::-1])
        idx = np.maximum(pos + lo, starts)
        res = pd.Series(rev.to_numpy()[idx])
        cnt = pd.Series(rev_cnt.to_numpy()[idx])
        if name == "count":
            return finish(cnt.astype(np.int64), None)
        if name == "avg":
            return finish(res / cnt, cnt)
        return finish(res, cnt)

    if unit == "rows":
        # bounded ROWS frame: clamped index offsets
        lo_i = np.maximum(pos + int(lo), starts)
        hi_i = np.minimum(pos + int(hi), ends)
    else:
        # bounded RANGE frame: every peer row whose ORDER value lies in
        # [v_i + lo, v_i + hi]; SQL requires exactly one numeric/date
        # order key for offset RANGE frames.  DESC negates the value
        # axis so 'preceding' (larger values) maps to the same interval
        # arithmetic.
        if len(order_names) != 1:
            raise ValueError("RANGE offset frame requires ONE order key")
        oseries = _series(t, order_names[0]).iloc[sidx] \
            .reset_index(drop=True)
        if oseries.isna().any():
            raise NotImplementedError(
                "RANGE offset frame over NULL order key")
        ov = pd.to_numeric(oseries).to_numpy(dtype=np.float64)
        if wf.order_desc[0]:
            ov = -ov
        lo_i = np.empty(n, dtype=np.int64)
        hi_i = np.empty(n, dtype=np.int64)
        pstarts = np.flatnonzero(new_part)
        pends = np.append(pstarts[1:], n)
        for s, e in zip(pstarts, pends):
            seg = ov[s:e]
            lo_i[s:e] = s + np.searchsorted(seg, seg + float(lo),
                                            side="left")
            hi_i[s:e] = s + np.searchsorted(seg, seg + float(hi),
                                            side="right") - 1
    valid = lo_i <= hi_i
    if name in ("sum", "avg", "count"):
        csum = vnum.fillna(0).groupby(part).cumsum().to_numpy()
        ccnt = gnn.cumsum().to_numpy().astype(np.float64)
        lo_prev = lo_i - 1
        base_s = np.where(lo_i > starts, csum[np.maximum(lo_prev, 0)], 0.0)
        base_c = np.where(lo_i > starts, ccnt[np.maximum(lo_prev, 0)], 0.0)
        s = np.where(valid, csum[np.clip(hi_i, 0, n - 1)] - base_s, 0.0)
        c = np.where(valid, ccnt[np.clip(hi_i, 0, n - 1)] - base_c, 0.0)
        if name == "count":
            return finish(pd.Series(c.astype(np.int64)), None)
        if name == "avg":
            return finish(pd.Series(np.where(c > 0, s / np.maximum(c, 1),
                                             np.nan)), pd.Series(c))
        return finish(pd.Series(s), pd.Series(c))
    # bounded min/max over arbitrary [lo_i, hi_i] windows: both frame
    # ends are monotone non-decreasing within a partition (ROWS by
    # construction; RANGE because searchsorted over a sorted segment
    # with a constant offset is monotone), so a monotonic deque gives
    # each partition in O(rows)
    res, cnt = _minmax_window(vals, nn, lo_i, hi_i, new_part, name)
    return finish(pd.Series(res), pd.Series(cnt))
