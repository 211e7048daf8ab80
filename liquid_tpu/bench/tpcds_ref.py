"""Independent pandas implementations of the TPC-DS query subset
(differential oracle, same role as tpch_ref.py; the reference verifies
TPC-DS against DataFusion answers, liquid-cache `tpcds_client.rs`)."""
from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd


def q3(t):
    j = (t["date_dim"].merge(t["store_sales"], left_on="d_date_sk",
                             right_on="ss_sold_date_sk")
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk"))
    j = j[(j.i_manufact_id == 128) & (j.d_moy == 11)]
    g = j.groupby(["d_year", "i_brand_id", "i_brand"], as_index=False
                  ).ss_ext_sales_price.sum()
    g.columns = ["d_year", "brand_id", "brand", "sum_agg"]
    g = g.sort_values(["d_year", "sum_agg", "brand_id"],
                      ascending=[True, False, True])
    return g.head(100).reset_index(drop=True)


def _q7_like(t, fact, pfx):
    j = (t[fact]
         .merge(t["date_dim"], left_on=f"{pfx}_sold_date_sk",
                right_on="d_date_sk")
         .merge(t["item"], left_on=f"{pfx}_item_sk", right_on="i_item_sk")
         .merge(t["customer_demographics"], left_on=f"{pfx}_cdemo_sk",
                right_on="cd_demo_sk")
         .merge(t["promotion"], left_on=f"{pfx}_promo_sk",
                right_on="p_promo_sk"))
    j = j[(j.cd_gender == "M") & (j.cd_marital_status == "S")
          & (j.cd_education_status == "College")
          & ((j.p_channel_email == "N") | (j.p_channel_event == "N"))
          & (j.d_year == 2000)]
    g = j.groupby("i_item_id", as_index=False).agg(
        agg1=(f"{pfx}_quantity", "mean"), agg2=(f"{pfx}_list_price", "mean"),
        agg3=(f"{pfx}_coupon_amt", "mean"), agg4=(f"{pfx}_sales_price", "mean"))
    return g.sort_values("i_item_id").head(100).reset_index(drop=True)


def q7(t):
    return _q7_like(t, "store_sales", "ss")


def q26(t):
    return _q7_like(t, "catalog_sales", "cs")


def q13(t):
    j = (t["store_sales"]
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk")
         .merge(t["date_dim"], left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(t["customer_demographics"], left_on="ss_cdemo_sk",
                right_on="cd_demo_sk")
         .merge(t["household_demographics"], left_on="ss_hdemo_sk",
                right_on="hd_demo_sk")
         .merge(t["customer_address"], left_on="ss_addr_sk",
                right_on="ca_address_sk"))
    j = j[j.d_year == 2001]
    m1 = (((j.cd_marital_status == "M")
           & (j.cd_education_status == "Advanced Degree")
           & j.ss_sales_price.between(100.0, 150.0) & (j.hd_dep_count == 3))
          | ((j.cd_marital_status == "S")
             & (j.cd_education_status == "College")
             & j.ss_sales_price.between(50.0, 100.0) & (j.hd_dep_count == 1))
          | ((j.cd_marital_status == "W")
             & (j.cd_education_status == "2 yr Degree")
             & j.ss_sales_price.between(150.0, 200.0) & (j.hd_dep_count == 1)))
    m2 = ((j.ca_country == "United States")
          & ((j.ca_state.isin(["TX", "OH"]) & j.ss_net_profit.between(100, 200))
             | (j.ca_state.isin(["OR", "NM", "KY"])
                & j.ss_net_profit.between(150, 300))
             | (j.ca_state.isin(["VA", "TX", "MS"])
                & j.ss_net_profit.between(50, 250))))
    d = j[m1 & m2]
    if not len(d):
        return pd.DataFrame({"a1": [np.nan], "a2": [np.nan],
                             "a3": [np.nan], "a4": [np.nan]})
    return pd.DataFrame({
        "a1": [d.ss_quantity.mean()], "a2": [d.ss_ext_sales_price.mean()],
        "a3": [d.ss_ext_wholesale_cost.mean()],
        "a4": [d.ss_ext_wholesale_cost.sum()]})


def q19(t):
    j = (t["date_dim"].merge(t["store_sales"], left_on="d_date_sk",
                             right_on="ss_sold_date_sk")
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk")
         .merge(t["customer"], left_on="ss_customer_sk",
                right_on="c_customer_sk")
         .merge(t["customer_address"], left_on="c_current_addr_sk",
                right_on="ca_address_sk")
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk"))
    j = j[(j.i_manager_id == 8) & (j.d_moy == 11) & (j.d_year == 1998)
          & (j.ca_zip.str[:5] != j.s_city.str[:5])]
    g = j.groupby(["i_brand_id", "i_brand", "i_manufact_id"],
                  as_index=False).ss_ext_sales_price.sum()
    g.columns = ["brand_id", "brand", "i_manufact_id", "ext_price"]
    g = g.sort_values(["ext_price", "brand_id", "i_manufact_id"],
                      ascending=[False, True, True])
    return g.head(100).reset_index(drop=True)


def _brand_agg(t, manager, year, moy, with_year=True, order_in_year=True):
    j = (t["date_dim"].merge(t["store_sales"], left_on="d_date_sk",
                             right_on="ss_sold_date_sk")
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk"))
    j = j[(j.i_manager_id == manager) & (j.d_moy == moy)]
    if year is not None:
        j = j[j.d_year == year]
    keys = (["d_year", "i_brand_id", "i_brand"] if with_year
            else ["i_brand_id", "i_brand"])
    g = j.groupby(keys, as_index=False).ss_ext_sales_price.sum()
    return g


def q42(t):
    j = (t["date_dim"].merge(t["store_sales"], left_on="d_date_sk",
                             right_on="ss_sold_date_sk")
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk"))
    j = j[(j.i_manager_id == 1) & (j.d_moy == 11) & (j.d_year == 2000)]
    g = j.groupby(["d_year", "i_category"], as_index=False
                  ).ss_ext_sales_price.sum()
    g.columns = ["d_year", "i_category", "total_sales"]
    g = g.sort_values(["total_sales", "d_year", "i_category"],
                      ascending=[False, True, True])
    return g.head(100).reset_index(drop=True)


def q43(t):
    j = (t["date_dim"].merge(t["store_sales"], left_on="d_date_sk",
                             right_on="ss_sold_date_sk")
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk"))
    j = j[(j.s_gmt_offset == -5) & (j.d_year == 2000)].copy()
    for day, col in [("Sunday", "sun_sales"), ("Monday", "mon_sales"),
                     ("Friday", "fri_sales"), ("Saturday", "sat_sales")]:
        j[col] = np.where(j.d_day_name == day, j.ss_sales_price, np.nan)
    g = j.groupby(["s_store_name", "s_store_id"], as_index=False).agg(
        sun_sales=("sun_sales", "sum"), mon_sales=("mon_sales", "sum"),
        fri_sales=("fri_sales", "sum"), sat_sales=("sat_sales", "sum"))
    return g.sort_values(["s_store_name", "s_store_id"]).head(100
                                                              ).reset_index(drop=True)


def q52(t):
    g = _brand_agg(t, manager=1, year=2000, moy=11)
    g.columns = ["d_year", "brand_id", "brand", "ext_price"]
    g = g[["d_year", "brand_id", "brand", "ext_price"]]
    g = g.sort_values(["d_year", "ext_price", "brand_id"],
                      ascending=[True, False, True])
    return g.head(100).reset_index(drop=True)


def q55(t):
    g = _brand_agg(t, manager=28, year=1999, moy=11, with_year=False)
    g.columns = ["brand_id", "brand", "ext_price"]
    g = g.sort_values(["ext_price", "brand_id"], ascending=[False, True])
    return g.head(100).reset_index(drop=True)


def q73(t):
    j = (t["store_sales"]
         .merge(t["date_dim"], left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk")
         .merge(t["household_demographics"], left_on="ss_hdemo_sk",
                right_on="hd_demo_sk"))
    j = j[j.d_dom.between(1, 2)
          & j.hd_buy_potential.isin([">10000", "Unknown"])
          & (j.hd_vehicle_count > 0)
          & j.d_year.isin([1999, 2000, 2001])
          & j.s_county.isin(["Williamson County", "Franklin County",
                             "Bronx County", "Orange County"])]
    g = j.groupby(["ss_ticket_number", "ss_customer_sk"],
                  as_index=False).size().rename(columns={"size": "cnt"})
    g = g[g.cnt.between(1, 5)]
    out = g.merge(t["customer"], left_on="ss_customer_sk",
                  right_on="c_customer_sk")
    out = out[["c_last_name", "c_first_name", "c_customer_sk",
               "ss_ticket_number", "cnt"]]
    out.columns = ["c_last_name", "c_first_name", "c_salutation",
                   "ss_ticket_number", "cnt"]
    out = out.sort_values(["cnt", "c_last_name", "ss_ticket_number"],
                          ascending=[False, True, True])
    return out.head(1000).reset_index(drop=True)


def q90(t):
    def cnt(h0, h1):
        j = (t["web_sales"]
             .merge(t["time_dim"], left_on="ws_sold_time_sk",
                    right_on="t_time_sk")
             .merge(t["household_demographics"], left_on="ws_hdemo_sk",
                    right_on="hd_demo_sk"))
        return len(j[(j.t_hour.between(h0, h1)) & (j.hd_dep_count == 6)])
    amc, pmc = cnt(8, 9), cnt(19, 20)
    ratio = float(amc) / float(pmc) if pmc else np.nan
    return pd.DataFrame({"am_pm_ratio": [ratio]})


def q93(t):
    ss, sr = t["store_sales"], t["store_returns"]
    j = ss.merge(sr, how="left",
                 left_on=["ss_item_sk", "ss_ticket_number"],
                 right_on=["sr_item_sk", "sr_ticket_number"])
    act = np.where(j.sr_return_quantity.notna(),
                   (j.ss_quantity - j.sr_return_quantity) * j.ss_sales_price,
                   j.ss_quantity * j.ss_sales_price)
    g = pd.DataFrame({"ss_customer_sk": j.ss_customer_sk, "act_sales": act})
    g = g.groupby("ss_customer_sk", as_index=False).act_sales.sum().rename(
        columns={"act_sales": "sumsales"})
    g = g.sort_values(["sumsales", "ss_customer_sk"], ascending=[False, True])
    return g.head(100).reset_index(drop=True)


def q96(t):
    j = (t["store_sales"]
         .merge(t["time_dim"], left_on="ss_sold_time_sk", right_on="t_time_sk")
         .merge(t["household_demographics"], left_on="ss_hdemo_sk",
                right_on="hd_demo_sk")
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk"))
    n = len(j[(j.t_hour == 20) & (j.t_minute >= 30) & (j.hd_dep_count == 7)
              & (j.s_store_name == "store a")])
    return pd.DataFrame({"cnt": [n]})


def q97(t):
    def side(fact, pfx):
        j = t[fact].merge(t["date_dim"], left_on=f"{pfx}_sold_date_sk",
                          right_on="d_date_sk")
        j = j[j.d_month_seq.between(24, 35)]
        return j[[f"{pfx}_customer_sk", f"{pfx}_item_sk"]].drop_duplicates()
    ss = side("store_sales", "ss").rename(columns={
        "ss_customer_sk": "customer_sk", "ss_item_sk": "item_sk"})
    cs = side("catalog_sales", "cs").rename(columns={
        "cs_customer_sk": "customer_sk", "cs_item_sk": "item_sk"})
    m = ss.merge(cs, on=["customer_sk", "item_sk"], how="outer",
                 indicator=True)
    return pd.DataFrame({
        "store_only": [int((m._merge == "left_only").sum())],
        "catalog_only": [int((m._merge == "right_only").sum())],
        "store_and_catalog": [int((m._merge == "both").sum())]})


def _q12_like(t, fact, pfx, limit):
    j = t[fact].merge(t["item"], left_on=f"{pfx}_item_sk",
                      right_on="i_item_sk")
    j = j.merge(t["date_dim"], left_on=f"{pfx}_sold_date_sk",
                right_on="d_date_sk")
    lo = pd.Timestamp("1999-02-22")
    hi = lo + pd.Timedelta(days=30)
    j = j[j.i_category.isin(["Sports", "Books", "Home"])
          & j.d_date.between(lo, hi)]
    keys = ["i_item_id", "i_item_desc", "i_category", "i_class",
            "i_current_price"]
    g = (j.groupby(keys, as_index=False)[f"{pfx}_ext_sales_price"].sum()
         .rename(columns={f"{pfx}_ext_sales_price": "itemrevenue"}))
    cls = g.groupby("i_class").itemrevenue.transform("sum")
    g["revenueratio"] = g.itemrevenue * 100 / cls
    g = g.sort_values(["i_category", "i_class", "i_item_id", "i_item_desc",
                       "revenueratio"]).reset_index(drop=True)
    return g.head(limit) if limit else g


def q12(t):
    return _q12_like(t, "web_sales", "ws", 100)


def q20(t):
    return _q12_like(t, "catalog_sales", "cs", 100)


def q98(t):
    return _q12_like(t, "store_sales", "ss", None)


def q47(t):
    j = (t["store_sales"]
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk")
         .merge(t["date_dim"], left_on="ss_sold_date_sk",
                right_on="d_date_sk")
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk"))
    j = j[(j.d_year == 1999)
          | ((j.d_year == 1998) & (j.d_moy == 12))
          | ((j.d_year == 2000) & (j.d_moy == 1))]
    keys = ["i_category", "i_brand", "s_store_name", "s_company_name"]
    g = (j.groupby(keys + ["d_year", "d_moy"], as_index=False)
         .ss_sales_price.sum()
         .rename(columns={"ss_sales_price": "sum_sales"}))
    g["avg_monthly_sales"] = g.groupby(
        keys + ["d_year"]).sum_sales.transform("mean")
    g = g.sort_values(keys + ["d_year", "d_moy"]).reset_index(drop=True)
    g["rn"] = g.groupby(keys).cumcount() + 1
    lag = g[keys + ["rn", "sum_sales"]].copy()
    lag["rn"] = lag.rn + 1
    lead = g[keys + ["rn", "sum_sales"]].copy()
    lead["rn"] = lead.rn - 1
    v2 = (g.merge(lag.rename(columns={"sum_sales": "psum"}),
                  on=keys + ["rn"])
          .merge(lead.rename(columns={"sum_sales": "nsum"}),
                 on=keys + ["rn"]))
    v2 = v2[(v2.d_year == 1999) & (v2.avg_monthly_sales > 0)
            & ((v2.sum_sales - v2.avg_monthly_sales).abs()
               / v2.avg_monthly_sales > 0.1)]
    v2 = v2.assign(_d=v2.sum_sales - v2.avg_monthly_sales) \
        .sort_values(["_d", "s_store_name", "d_moy"]).head(100)
    return v2[["i_category", "s_store_name", "s_company_name", "d_year",
               "d_moy", "avg_monthly_sales", "sum_sales", "psum", "nsum"]]


def q51(t):
    def v1(fact, pfx):
        j = t[fact].merge(t["date_dim"], left_on=f"{pfx}_sold_date_sk",
                          right_on="d_date_sk")
        j = j[j.d_month_seq.between(24, 27)]
        g = j.groupby([f"{pfx}_item_sk", "d_date"],
                      as_index=False)[f"{pfx}_sales_price"].sum()
        g = g.sort_values([f"{pfx}_item_sk", "d_date"])
        g["cume_sales"] = g.groupby(
            f"{pfx}_item_sk")[f"{pfx}_sales_price"].cumsum()
        return g.rename(columns={f"{pfx}_item_sk": "item_sk"})[
            ["item_sk", "d_date", "cume_sales"]]
    web = v1("web_sales", "ws")
    store = v1("store_sales", "ss")
    m = web.merge(store, on=["item_sk", "d_date"], how="outer",
                  suffixes=("_w", "_s"))
    m = m.rename(columns={"cume_sales_w": "web_sales",
                          "cume_sales_s": "store_sales"})
    m = m.sort_values(["item_sk", "d_date"]).reset_index(drop=True)
    m["web_cumulative"] = m.groupby("item_sk").web_sales.cummax()
    m["store_cumulative"] = m.groupby("item_sk").store_sales.cummax()
    m = m[m.web_cumulative > m.store_cumulative]
    m = m.sort_values(["item_sk", "d_date"]).head(100)
    return m[["item_sk", "d_date", "web_sales", "store_sales",
              "web_cumulative", "store_cumulative"]]


def _sort_nf(df, keys):
    """Sort with per-key (ascending, nulls_first) control."""
    tmp = df.copy()
    by, asc = [], []
    for i, (c, a, nf) in enumerate(keys):
        tmp[f"__n{i}"] = tmp[c].isna()
        by.append(f"__n{i}")
        asc.append(not nf)
        by.append(c)
        asc.append(a)
    return tmp.sort_values(by, ascending=asc,
                           kind="mergesort")[df.columns]


def _rollup_agg(j, keys, named_aggs):
    """Pandas ROLLUP: one aggregation per key prefix, NULL-padded."""
    parts = []
    for i in range(len(keys), -1, -1):
        ks = keys[:i]
        if ks:
            g = j.groupby(ks, as_index=False, dropna=False).agg(**named_aggs)
        else:
            g = pd.DataFrame([{n: getattr(j[c], f)()
                               for n, (c, f) in named_aggs.items()}])
        for k in keys[i:]:
            g[k] = None
        g["__level"] = len(keys) - i
        parts.append(g)
    return pd.concat(parts, ignore_index=True)


def q18(t):
    j = (t["catalog_sales"]
         .merge(t["customer_demographics"].add_prefix("cd1_"),
                left_on="cs_cdemo_sk", right_on="cd1_cd_demo_sk")
         .merge(t["customer"], left_on="cs_customer_sk",
                right_on="c_customer_sk")
         .merge(t["customer_demographics"].add_prefix("cd2_"),
                left_on="c_current_cdemo_sk", right_on="cd2_cd_demo_sk")
         .merge(t["customer_address"], left_on="c_current_addr_sk",
                right_on="ca_address_sk")
         .merge(t["date_dim"], left_on="cs_sold_date_sk",
                right_on="d_date_sk")
         .merge(t["item"], left_on="cs_item_sk", right_on="i_item_sk"))
    j = j[(j.cd1_cd_gender == "F")
          & (j.cd1_cd_education_status == "Unknown")
          & j.c_birth_month.isin([1, 6, 8, 9, 12, 2])
          & (j.d_year == 1998)
          & j.ca_state.isin(["MS", "IN", "ND", "OK", "NM", "VA", "MI"])]
    keys = ["i_item_id", "ca_country", "ca_state", "ca_county"]
    g = _rollup_agg(j, keys, dict(
        agg1=("cs_quantity", "mean"), agg2=("cs_list_price", "mean"),
        agg3=("cs_coupon_amt", "mean"), agg4=("cs_sales_price", "mean"),
        agg5=("cs_net_profit", "mean"), agg6=("c_birth_year", "mean"),
        agg7=("cd1_cd_dep_count", "mean")))
    g = _sort_nf(g, [("ca_country", True, True), ("ca_state", True, True),
                     ("ca_county", True, True), ("i_item_id", True, True)])
    return g[keys + [f"agg{i}" for i in range(1, 8)]].head(100)


def q22(t):
    j = (t["inventory"]
         .merge(t["date_dim"], left_on="inv_date_sk", right_on="d_date_sk")
         .merge(t["item"], left_on="inv_item_sk", right_on="i_item_sk"))
    j = j[j.d_month_seq.between(24, 35)]
    keys = ["i_product_name", "i_brand", "i_class", "i_category"]
    g = _rollup_agg(j, keys, dict(qoh=("inv_quantity_on_hand", "mean")))
    g = _sort_nf(g, [("qoh", True, False),
                     ("i_product_name", True, True),
                     ("i_brand", True, True), ("i_class", True, True),
                     ("i_category", True, True)])
    return g[keys + ["qoh"]].head(100)


def q27(t):
    j = (t["store_sales"]
         .merge(t["customer_demographics"], left_on="ss_cdemo_sk",
                right_on="cd_demo_sk")
         .merge(t["date_dim"], left_on="ss_sold_date_sk",
                right_on="d_date_sk")
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk")
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk"))
    j = j[(j.cd_gender == "M") & (j.cd_marital_status == "S")
          & (j.cd_education_status == "College") & (j.d_year == 2002)
          & j.s_state.isin(["AL", "CA", "GA", "IL", "IN", "KS"])]
    keys = ["i_item_id", "s_state"]
    g = _rollup_agg(j, keys, dict(
        agg1=("ss_quantity", "mean"), agg2=("ss_list_price", "mean"),
        agg3=("ss_coupon_amt", "mean"), agg4=("ss_sales_price", "mean")))
    g["g_state"] = (g.__level >= 1).astype(int)
    g = _sort_nf(g, [("i_item_id", True, True), ("s_state", True, True)])
    return g[["i_item_id", "s_state", "g_state",
              "agg1", "agg2", "agg3", "agg4"]].head(100)


def q36(t):
    j = (t["store_sales"]
         .merge(t["date_dim"], left_on="ss_sold_date_sk",
                right_on="d_date_sk")
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk")
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk"))
    j = j[(j.d_year == 2001)
          & j.s_state.isin(["AL", "CA", "GA", "IL", "IN", "KS"])]
    parts = []
    for i in (2, 1, 0):
        ks = ["i_category", "i_class"][:i]
        if ks:
            g = j.groupby(ks, as_index=False, dropna=False).agg(
                np_=("ss_net_profit", "sum"),
                sp_=("ss_ext_sales_price", "sum"))
        else:
            g = pd.DataFrame([{"np_": j.ss_net_profit.sum(),
                               "sp_": j.ss_ext_sales_price.sum()}])
        g["gross_margin"] = g.np_ / g.sp_
        g["lochierarchy"] = 2 - i
        for k in ["i_category", "i_class"][i:]:
            g[k] = None
        parts.append(g[["gross_margin", "i_category", "i_class",
                        "lochierarchy"]])
    v = pd.concat(parts, ignore_index=True)
    v["_p"] = v.i_category.where(v.lochierarchy == 0)
    v["rank_within_parent"] = (
        v.groupby(["lochierarchy", "_p"], dropna=False)
        .gross_margin.rank(method="min", ascending=True).astype(int))
    v["_c"] = v.i_category.where(v.lochierarchy == 0)
    v = _sort_nf(v, [("lochierarchy", False, True), ("_c", True, True),
                     ("rank_within_parent", True, False)])
    return v[["gross_margin", "i_category", "i_class", "lochierarchy",
              "rank_within_parent"]].head(100)


def q86(t):
    j = (t["web_sales"]
         .merge(t["date_dim"], left_on="ws_sold_date_sk",
                right_on="d_date_sk")
         .merge(t["item"], left_on="ws_item_sk", right_on="i_item_sk"))
    j = j[j.d_month_seq.between(24, 35)]
    parts = []
    for i in (2, 1, 0):
        ks = ["i_category", "i_class"][:i]
        if ks:
            g = j.groupby(ks, as_index=False, dropna=False).agg(
                total_sum=("ws_net_paid", "sum"))
        else:
            g = pd.DataFrame([{"total_sum": j.ws_net_paid.sum()}])
        g["lochierarchy"] = 2 - i
        for k in ["i_category", "i_class"][i:]:
            g[k] = None
        parts.append(g[["total_sum", "i_category", "i_class",
                        "lochierarchy"]])
    v = pd.concat(parts, ignore_index=True)
    v["_p"] = v.i_category.where(v.lochierarchy == 0)
    v["rank_within_parent"] = (
        v.groupby(["lochierarchy", "_p"], dropna=False)
        .total_sum.rank(method="min", ascending=False).astype(int))
    v["_c"] = v.i_category.where(v.lochierarchy == 0)
    v = _sort_nf(v, [("lochierarchy", False, True), ("_c", True, True),
                     ("rank_within_parent", True, False)])
    return v[["total_sum", "i_category", "i_class", "lochierarchy",
              "rank_within_parent"]].head(100)


REFS = {i: globals()[f"q{i}"] for i in
        (3, 7, 12, 13, 18, 19, 20, 22, 26, 27, 36, 42, 43, 47, 51, 52,
         55, 73, 86, 90, 93, 96, 97, 98)}


def to_pandas_tables(tables) -> Dict[str, pd.DataFrame]:
    out = {}
    for name, tt in tables.items():
        df = tt.to_pandas()
        for col in df.columns:
            if tt.schema.field(col).type == "date32[day]":
                df[col] = pd.to_datetime(df[col])
        out[name] = df
    return out
