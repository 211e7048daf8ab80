"""Independent pandas implementations of the 22 TPC-H queries.

These are the DIFFERENTIAL oracle for the engine (the reference verifies
client results against stored parquet answers,
liquid-cache `benchmark/tpch/tpch_client.rs` + `benchmark/tpch/answers/`;
we verify against an independent implementation on the same data).

Every function takes `t: Dict[str, pd.DataFrame]` (dates as
datetime64[ns]) and returns a DataFrame with the query's output columns
in order, rows ordered per the query's ORDER BY (+ LIMIT applied).
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd

D = pd.Timestamp


def _rev(df):
    return df.l_extendedprice * (1 - df.l_discount)


def _sql_sum(s):
    """SQL SUM over zero rows is NULL (pandas says 0)."""
    return s.sum() if len(s) else np.nan


def q1(t):
    li = t["lineitem"]
    d = li[li.l_shipdate <= D("1998-12-01") - pd.Timedelta(days=90)].copy()
    d["sum_disc_price"] = _rev(d)
    d["sum_charge"] = _rev(d) * (1 + d.l_tax)
    g = d.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
        sum_qty=("l_quantity", "sum"),
        sum_base_price=("l_extendedprice", "sum"),
        sum_disc_price=("sum_disc_price", "sum"),
        sum_charge=("sum_charge", "sum"),
        avg_qty=("l_quantity", "mean"),
        avg_price=("l_extendedprice", "mean"),
        avg_disc=("l_discount", "mean"),
        count_order=("l_quantity", "size"))
    return g.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def _europe_min_cost(t):
    ps, s, n, r = t["partsupp"], t["supplier"], t["nation"], t["region"]
    j = (ps.merge(s, left_on="ps_suppkey", right_on="s_suppkey")
           .merge(n, left_on="s_nationkey", right_on="n_nationkey")
           .merge(r, left_on="n_regionkey", right_on="r_regionkey"))
    j = j[j.r_name == "EUROPE"]
    return j.groupby("ps_partkey", as_index=False).ps_supplycost.min() \
            .rename(columns={"ps_supplycost": "min_cost"})


def q2(t):
    p, ps, s, n, r = (t["part"], t["partsupp"], t["supplier"], t["nation"],
                      t["region"])
    j = (p.merge(ps, left_on="p_partkey", right_on="ps_partkey")
          .merge(s, left_on="ps_suppkey", right_on="s_suppkey")
          .merge(n, left_on="s_nationkey", right_on="n_nationkey")
          .merge(r, left_on="n_regionkey", right_on="r_regionkey"))
    j = j[(j.p_size == 15) & j.p_type.str.endswith("BRASS")
          & (j.r_name == "EUROPE")]
    mc = _europe_min_cost(t)
    j = j.merge(mc, left_on="p_partkey", right_on="ps_partkey",
                suffixes=("", "_mc"))
    j = j[j.ps_supplycost == j.min_cost]
    out = j[["s_acctbal", "s_name", "n_name", "p_partkey", "p_mfgr",
             "s_address", "s_phone", "s_comment"]]
    out = out.sort_values(["s_acctbal", "n_name", "s_name", "p_partkey"],
                          ascending=[False, True, True, True])
    return out.head(100).reset_index(drop=True)


def q3(t):
    c, o, li = t["customer"], t["orders"], t["lineitem"]
    j = (c[c.c_mktsegment == "BUILDING"]
         .merge(o[o.o_orderdate < D("1995-03-15")],
                left_on="c_custkey", right_on="o_custkey")
         .merge(li[li.l_shipdate > D("1995-03-15")],
                left_on="o_orderkey", right_on="l_orderkey"))
    j["revenue"] = _rev(j)
    g = j.groupby(["l_orderkey", "o_orderdate", "o_shippriority"],
                  as_index=False).revenue.sum()
    g = g[["l_orderkey", "revenue", "o_orderdate", "o_shippriority"]]
    g = g.sort_values(["revenue", "o_orderdate"], ascending=[False, True])
    return g.head(10).reset_index(drop=True)


def q4(t):
    o, li = t["orders"], t["lineitem"]
    od = o[(o.o_orderdate >= D("1993-07-01"))
           & (o.o_orderdate < D("1993-10-01"))]
    ok = li[li.l_commitdate < li.l_receiptdate].l_orderkey.unique()
    g = od[od.o_orderkey.isin(ok)].groupby("o_orderpriority",
                                           as_index=False).size()
    g = g.rename(columns={"size": "order_count"})
    return g.sort_values("o_orderpriority").reset_index(drop=True)


def q5(t):
    c, o, li, s, n, r = (t["customer"], t["orders"], t["lineitem"],
                         t["supplier"], t["nation"], t["region"])
    j = (c.merge(o, left_on="c_custkey", right_on="o_custkey")
          .merge(li, left_on="o_orderkey", right_on="l_orderkey")
          .merge(s, left_on="l_suppkey", right_on="s_suppkey"))
    j = j[j.c_nationkey == j.s_nationkey]
    j = (j.merge(n, left_on="s_nationkey", right_on="n_nationkey")
          .merge(r, left_on="n_regionkey", right_on="r_regionkey"))
    j = j[(j.r_name == "ASIA") & (j.o_orderdate >= D("1994-01-01"))
          & (j.o_orderdate < D("1995-01-01"))]
    j["revenue"] = _rev(j)
    g = j.groupby("n_name", as_index=False).revenue.sum()
    return g.sort_values("revenue", ascending=False).reset_index(drop=True)


def q6(t):
    li = t["lineitem"]
    d = li[(li.l_shipdate >= D("1994-01-01")) & (li.l_shipdate < D("1995-01-01"))
           & (li.l_discount >= 0.06 - 0.01) & (li.l_discount <= 0.06 + 0.01)
           & (li.l_quantity < 24)]
    return pd.DataFrame({"revenue": [_sql_sum(d.l_extendedprice * d.l_discount)]})


def q7(t):
    s, li, o, c, n = (t["supplier"], t["lineitem"], t["orders"],
                      t["customer"], t["nation"])
    j = (s.merge(li, left_on="s_suppkey", right_on="l_suppkey")
          .merge(o, left_on="l_orderkey", right_on="o_orderkey")
          .merge(c, left_on="o_custkey", right_on="c_custkey")
          .merge(n.add_prefix("supp_"), left_on="s_nationkey",
                 right_on="supp_n_nationkey")
          .merge(n.add_prefix("cust_"), left_on="c_nationkey",
                 right_on="cust_n_nationkey"))
    m = (((j.supp_n_name == "FRANCE") & (j.cust_n_name == "GERMANY"))
         | ((j.supp_n_name == "GERMANY") & (j.cust_n_name == "FRANCE")))
    j = j[m & (j.l_shipdate >= D("1995-01-01"))
          & (j.l_shipdate <= D("1996-12-31"))].copy()
    j["supp_nation"] = j.supp_n_name
    j["cust_nation"] = j.cust_n_name
    j["l_year"] = j.l_shipdate.dt.year
    j["volume"] = _rev(j)
    g = j.groupby(["supp_nation", "cust_nation", "l_year"],
                  as_index=False).volume.sum().rename(
                      columns={"volume": "revenue"})
    return g.sort_values(["supp_nation", "cust_nation", "l_year"]
                         ).reset_index(drop=True)


def q8(t):
    p, s, li, o, c, n, r = (t["part"], t["supplier"], t["lineitem"],
                            t["orders"], t["customer"], t["nation"],
                            t["region"])
    j = (p.merge(li, left_on="p_partkey", right_on="l_partkey")
          .merge(s, left_on="l_suppkey", right_on="s_suppkey")
          .merge(o, left_on="l_orderkey", right_on="o_orderkey")
          .merge(c, left_on="o_custkey", right_on="c_custkey")
          .merge(n.add_prefix("c_n_"), left_on="c_nationkey",
                 right_on="c_n_n_nationkey")
          .merge(r, left_on="c_n_n_regionkey", right_on="r_regionkey")
          .merge(n.add_prefix("s_n_"), left_on="s_nationkey",
                 right_on="s_n_n_nationkey"))
    j = j[(j.r_name == "AMERICA") & (j.o_orderdate >= D("1995-01-01"))
          & (j.o_orderdate <= D("1996-12-31"))
          & (j.p_type == "ECONOMY ANODIZED STEEL")].copy()
    j["o_year"] = j.o_orderdate.dt.year
    j["volume"] = _rev(j)
    j["brazil"] = np.where(j.s_n_n_name == "BRAZIL", j.volume, 0.0)
    g = j.groupby("o_year", as_index=False).agg(
        b=("brazil", "sum"), v=("volume", "sum"))
    g["mkt_share"] = g.b / g.v
    return g[["o_year", "mkt_share"]].sort_values("o_year"
                                                  ).reset_index(drop=True)


def q9(t):
    p, s, li, ps, o, n = (t["part"], t["supplier"], t["lineitem"],
                          t["partsupp"], t["orders"], t["nation"])
    j = (li.merge(s, left_on="l_suppkey", right_on="s_suppkey")
           .merge(ps, left_on=["l_suppkey", "l_partkey"],
                  right_on=["ps_suppkey", "ps_partkey"])
           .merge(p, left_on="l_partkey", right_on="p_partkey")
           .merge(o, left_on="l_orderkey", right_on="o_orderkey")
           .merge(n, left_on="s_nationkey", right_on="n_nationkey"))
    j = j[j.p_name.str.contains("green")].copy()
    j["nation"] = j.n_name
    j["o_year"] = j.o_orderdate.dt.year
    j["amount"] = _rev(j) - j.ps_supplycost * j.l_quantity
    g = j.groupby(["nation", "o_year"], as_index=False).amount.sum().rename(
        columns={"amount": "sum_profit"})
    return g.sort_values(["nation", "o_year"], ascending=[True, False]
                         ).reset_index(drop=True)


def q10(t):
    c, o, li, n = t["customer"], t["orders"], t["lineitem"], t["nation"]
    j = (c.merge(o, left_on="c_custkey", right_on="o_custkey")
          .merge(li, left_on="o_orderkey", right_on="l_orderkey")
          .merge(n, left_on="c_nationkey", right_on="n_nationkey"))
    j = j[(j.o_orderdate >= D("1993-10-01")) & (j.o_orderdate < D("1994-01-01"))
          & (j.l_returnflag == "R")].copy()
    j["revenue"] = _rev(j)
    g = j.groupby(["c_custkey", "c_name", "c_acctbal", "c_phone", "n_name",
                   "c_address", "c_comment"], as_index=False).revenue.sum()
    g = g[["c_custkey", "c_name", "revenue", "c_acctbal", "n_name",
           "c_address", "c_phone", "c_comment"]]
    return g.sort_values("revenue", ascending=False).head(20
                                                          ).reset_index(drop=True)


def q11(t):
    ps, s, n = t["partsupp"], t["supplier"], t["nation"]
    j = (ps.merge(s, left_on="ps_suppkey", right_on="s_suppkey")
           .merge(n, left_on="s_nationkey", right_on="n_nationkey"))
    j = j[j.n_name == "GERMANY"].copy()
    j["value"] = j.ps_supplycost * j.ps_availqty
    g = j.groupby("ps_partkey", as_index=False).value.sum()
    thresh = j.value.sum() * 0.0001
    g = g[g.value > thresh]
    return g.sort_values("value", ascending=False).reset_index(drop=True)


def q12(t):
    o, li = t["orders"], t["lineitem"]
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    j = j[j.l_shipmode.isin(["MAIL", "SHIP"])
          & (j.l_commitdate < j.l_receiptdate)
          & (j.l_shipdate < j.l_commitdate)
          & (j.l_receiptdate >= D("1994-01-01"))
          & (j.l_receiptdate < D("1995-01-01"))].copy()
    high = j.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    j["high_line_count"] = high.astype(np.int64)
    j["low_line_count"] = (~high).astype(np.int64)
    g = j.groupby("l_shipmode", as_index=False).agg(
        high_line_count=("high_line_count", "sum"),
        low_line_count=("low_line_count", "sum"))
    return g.sort_values("l_shipmode").reset_index(drop=True)


def q13(t):
    c, o = t["customer"], t["orders"]
    of = o[~o.o_comment.str.match(r".*special.*requests.*", na=False)]
    j = c.merge(of[["o_custkey", "o_orderkey"]], left_on="c_custkey",
                right_on="o_custkey", how="left")
    g = j.groupby("c_custkey", as_index=False).o_orderkey.count().rename(
        columns={"o_orderkey": "c_count"})
    g2 = g.groupby("c_count", as_index=False).size().rename(
        columns={"size": "custdist"})
    return g2[["c_count", "custdist"]].sort_values(
        ["custdist", "c_count"], ascending=[False, False]
    ).reset_index(drop=True)


def q14(t):
    li, p = t["lineitem"], t["part"]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    j = j[(j.l_shipdate >= D("1995-09-01"))
          & (j.l_shipdate < D("1995-10-01"))].copy()
    j["rev"] = _rev(j)
    promo = j[j.p_type.str.startswith("PROMO")].rev.sum()
    return pd.DataFrame({"promo_revenue": [100.0 * promo / j.rev.sum()]})


def q15(t):
    li, s = t["lineitem"], t["supplier"]
    d = li[(li.l_shipdate >= D("1996-01-01"))
           & (li.l_shipdate < D("1996-04-01"))].copy()
    d["rev"] = _rev(d)
    rev = d.groupby("l_suppkey", as_index=False).rev.sum().rename(
        columns={"l_suppkey": "supplier_no", "rev": "total_revenue"})
    best = rev[rev.total_revenue == rev.total_revenue.max()]
    j = s.merge(best, left_on="s_suppkey", right_on="supplier_no")
    out = j[["s_suppkey", "s_name", "s_address", "s_phone", "total_revenue"]]
    return out.sort_values("s_suppkey").reset_index(drop=True)


def q16(t):
    ps, p, s = t["partsupp"], t["part"], t["supplier"]
    bad = s[s.s_comment.str.match(r".*Customer.*Complaints.*", na=False)
            ].s_suppkey
    j = ps.merge(p, left_on="ps_partkey", right_on="p_partkey")
    j = j[(j.p_brand != "Brand#45")
          & ~j.p_type.str.startswith("MEDIUM POLISHED")
          & j.p_size.isin([49, 14, 23, 45, 19, 3, 36, 9])
          & ~j.ps_suppkey.isin(bad)]
    g = j.groupby(["p_brand", "p_type", "p_size"], as_index=False
                  ).ps_suppkey.nunique().rename(
        columns={"ps_suppkey": "supplier_cnt"})
    return g[["p_brand", "p_type", "p_size", "supplier_cnt"]].sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True]).reset_index(drop=True)


def q17(t):
    li, p = t["lineitem"], t["part"]
    pk = p[(p.p_brand == "Brand#23") & (p.p_container == "MED BOX")].p_partkey
    d = li[li.l_partkey.isin(pk)]
    avg_q = li.groupby("l_partkey").l_quantity.mean()
    lim = d.l_partkey.map(avg_q) * 0.2
    v = _sql_sum(d[d.l_quantity < lim].l_extendedprice)
    v = v / 7.0 if v == v else v  # NaN-propagating
    return pd.DataFrame({"avg_yearly": [v]})


def q18(t):
    c, o, li = t["customer"], t["orders"], t["lineitem"]
    big = li.groupby("l_orderkey").l_quantity.sum()
    big = big[big > 250].index
    j = (c.merge(o[o.o_orderkey.isin(big)], left_on="c_custkey",
                 right_on="o_custkey")
          .merge(li, left_on="o_orderkey", right_on="l_orderkey"))
    g = j.groupby(["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                   "o_totalprice"], as_index=False).l_quantity.sum().rename(
        columns={"l_quantity": "sum_qty"})
    g = g.sort_values(["o_totalprice", "o_orderdate"],
                      ascending=[False, True])
    return g.head(100).reset_index(drop=True)


def q19(t):
    li, p = t["lineitem"], t["part"]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    base = (j.l_shipmode.isin(["AIR", "AIR REG"])
            & (j.l_shipinstruct == "DELIVER IN PERSON"))
    m1 = ((j.p_brand == "Brand#12")
          & j.p_container.isin(["SM CASE", "SM BOX", "SM PACK", "SM PKG"])
          & (j.l_quantity >= 1) & (j.l_quantity <= 11)
          & (j.p_size >= 1) & (j.p_size <= 5))
    m2 = ((j.p_brand == "Brand#23")
          & j.p_container.isin(["MED BAG", "MED BOX", "MED PKG", "MED PACK"])
          & (j.l_quantity >= 10) & (j.l_quantity <= 20)
          & (j.p_size >= 1) & (j.p_size <= 10))
    m3 = ((j.p_brand == "Brand#34")
          & j.p_container.isin(["LG CASE", "LG BOX", "LG PACK", "LG PKG"])
          & (j.l_quantity >= 20) & (j.l_quantity <= 30)
          & (j.p_size >= 1) & (j.p_size <= 15))
    d = j[base & (m1 | m2 | m3)]
    return pd.DataFrame({"revenue": [_sql_sum(_rev(d))]})


def q20(t):
    s, n, ps, p, li = (t["supplier"], t["nation"], t["partsupp"], t["part"],
                       t["lineitem"])
    forest = p[p.p_name.str.startswith("forest")].p_partkey
    d = li[(li.l_shipdate >= D("1994-01-01"))
           & (li.l_shipdate < D("1995-01-01"))]
    qty = d.groupby(["l_partkey", "l_suppkey"], as_index=False
                    ).l_quantity.sum()
    j = ps[ps.ps_partkey.isin(forest)].merge(
        qty, left_on=["ps_partkey", "ps_suppkey"],
        right_on=["l_partkey", "l_suppkey"], how="inner")
    ok = j[j.ps_availqty > 0.5 * j.l_quantity].ps_suppkey.unique()
    out = s[s.s_suppkey.isin(ok)].merge(
        n[n.n_name == "CANADA"], left_on="s_nationkey",
        right_on="n_nationkey")
    return out[["s_name", "s_address"]].sort_values("s_name"
                                                    ).reset_index(drop=True)


def q21(t):
    s, li, o, n = t["supplier"], t["lineitem"], t["orders"], t["nation"]
    l1 = li[li.l_receiptdate > li.l_commitdate]
    # orders with >1 distinct supplier (exists l2)
    nsupp = li.groupby("l_orderkey").l_suppkey.nunique()
    multi = set(nsupp[nsupp > 1].index)
    # orders where some OTHER supplier was also late (not exists l3 test
    # needs per-(order, supplier) logic): late suppliers per order
    late = l1.groupby("l_orderkey").l_suppkey.agg(set)
    j = (l1.merge(o[o.o_orderstatus == "F"], left_on="l_orderkey",
                  right_on="o_orderkey")
           .merge(s, left_on="l_suppkey", right_on="s_suppkey")
           .merge(n[n.n_name == "SAUDI ARABIA"], left_on="s_nationkey",
                  right_on="n_nationkey"))
    keep = []
    for ok_, sk in zip(j.l_orderkey.values, j.l_suppkey.values):
        if ok_ not in multi:
            keep.append(False)
            continue
        ls = late.get(ok_, set())
        keep.append(not bool(ls - {sk}))
    j = j[np.asarray(keep, bool)]
    g = j.groupby("s_name", as_index=False).size().rename(
        columns={"size": "numwait"})
    g = g.sort_values(["numwait", "s_name"], ascending=[False, True])
    return g.head(100).reset_index(drop=True)


def q22(t):
    c, o = t["customer"], t["orders"]
    codes = ["13", "31", "23", "29", "30", "18", "17"]
    cc = c.c_phone.str[:2]
    sel = c[cc.isin(codes)].copy()
    sel["cntrycode"] = sel.c_phone.str[:2]
    avg_bal = sel[sel.c_acctbal > 0.0].c_acctbal.mean()
    has_orders = set(o.o_custkey.unique())
    d = sel[(sel.c_acctbal > avg_bal)
            & ~sel.c_custkey.isin(has_orders)]
    g = d.groupby("cntrycode", as_index=False).agg(
        numcust=("c_acctbal", "size"), totacctbal=("c_acctbal", "sum"))
    return g.sort_values("cntrycode").reset_index(drop=True)


REFS = {i: globals()[f"q{i}"] for i in range(1, 23)}


def to_pandas_tables(tables) -> Dict[str, pd.DataFrame]:
    """pyarrow tables -> pandas with date columns as datetime64[ns]."""
    out = {}
    for name, tt in tables.items():
        df = tt.to_pandas()
        for col in df.columns:
            if tt.schema.field(col).type == "date32[day]":
                df[col] = pd.to_datetime(df[col])
        out[name] = df
    return out
