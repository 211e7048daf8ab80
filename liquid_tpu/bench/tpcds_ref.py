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





def to_pandas_tables(tables) -> Dict[str, pd.DataFrame]:
    out = {}
    for name, tt in tables.items():
        df = tt.to_pandas()
        for col in df.columns:
            if tt.schema.field(col).type == "date32[day]":
                df[col] = pd.to_datetime(df[col])
        out[name] = df
    return out


def q15(t):
    j = (t["catalog_sales"]
         .merge(t["customer"], left_on="cs_customer_sk",
                right_on="c_customer_sk")
         .merge(t["customer_address"], left_on="c_current_addr_sk",
                right_on="ca_address_sk")
         .merge(t["date_dim"], left_on="cs_sold_date_sk",
                right_on="d_date_sk"))
    j = j[(j.d_qoy == 2) & (j.d_year == 2001)]
    m = (j.ca_zip.str[:2].isin(["85", "86", "88", "83", "80", "81"])
         | j.ca_state.isin(["CA", "WA", "GA"]) | (j.cs_sales_price > 500))
    g = j[m].groupby("ca_zip", as_index=False).cs_sales_price.sum()
    g.columns = ["ca_zip", "sum_sales"]
    return g.sort_values("ca_zip").head(100).reset_index(drop=True)


def _q25_like(t, aggs):
    d = t["date_dim"]
    ss = (t["store_sales"]
          .merge(d[(d.d_moy == aggs["moy"]) & (d.d_year == aggs["year"])],
                 left_on="ss_sold_date_sk", right_on="d_date_sk"))
    d2 = d[(d.d_moy.between(*aggs["ret_moy"])) & (d.d_year == aggs["ret_year"])] \
        if aggs.get("ret_year") else d
    sr = t["store_returns"].merge(
        d2, left_on="sr_returned_date_sk", right_on="d_date_sk")
    d3f = aggs["cs_filter"]
    cs = t["catalog_sales"].merge(
        d[d3f(d)], left_on="cs_sold_date_sk", right_on="d_date_sk")
    j = (ss.merge(sr[["sr_customer_sk", "sr_item_sk", "sr_ticket_number",
                      "sr_net_loss", "sr_return_quantity"]],
                  left_on=["ss_customer_sk", "ss_item_sk",
                           "ss_ticket_number"],
                  right_on=["sr_customer_sk", "sr_item_sk",
                            "sr_ticket_number"])
         .merge(cs[["cs_customer_sk", "cs_item_sk", "cs_net_profit",
                    "cs_quantity"]],
                left_on=["sr_customer_sk", "sr_item_sk"],
                right_on=["cs_customer_sk", "cs_item_sk"])
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk")
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk"))
    g = j.groupby(["i_item_id", "i_item_desc", "s_store_id",
                   "s_store_name"], as_index=False).agg(**aggs["cols"])
    g = g.sort_values(["i_item_id", "i_item_desc", "s_store_id",
                       "s_store_name"])
    return g.head(100).reset_index(drop=True)


def q25(t):
    return _q25_like(t, {
        "moy": 4, "year": 2001, "ret_moy": (4, 10), "ret_year": 2001,
        "cs_filter": lambda d: d.d_moy.between(4, 10) & (d.d_year == 2001),
        "cols": {
            "store_sales_profit": ("ss_net_profit", "sum"),
            "store_returns_loss": ("sr_net_loss", "sum"),
            "catalog_sales_profit": ("cs_net_profit", "sum")}})


def q29(t):
    return _q25_like(t, {
        "moy": 9, "year": 1999, "ret_moy": (9, 12), "ret_year": 1999,
        "cs_filter": lambda d: d.d_year.isin([1999, 2000, 2001]),
        "cols": {
            "store_sales_quantity": ("ss_quantity", "sum"),
            "store_returns_quantity": ("sr_return_quantity", "sum"),
            "catalog_sales_quantity": ("cs_quantity", "sum")}})


def _q37_like(t, fact, pfx, lo, hi, start, manufs):
    it = t["item"]
    it = it[it.i_current_price.between(lo, hi)
            & it.i_manufact_id.isin(manufs)]
    d = t["date_dim"]
    start = pd.Timestamp(start)
    dd = d[(pd.to_datetime(d.d_date) >= start)
           & (pd.to_datetime(d.d_date) <= start + pd.Timedelta(days=60))]
    inv = t["inventory"]
    inv = inv[inv.inv_quantity_on_hand.between(100, 500)]
    j = (it.merge(inv, left_on="i_item_sk", right_on="inv_item_sk")
         .merge(dd, left_on="inv_date_sk", right_on="d_date_sk")
         .merge(t[fact][[f"{pfx}_item_sk"]], left_on="i_item_sk",
                right_on=f"{pfx}_item_sk"))
    g = j.groupby(["i_item_id", "i_item_desc", "i_current_price"],
                  as_index=False).size()[
        ["i_item_id", "i_item_desc", "i_current_price"]]
    return g.sort_values("i_item_id").head(100).reset_index(drop=True)


def q37(t):
    return _q37_like(t, "catalog_sales", "cs", 68, 98, "2000-02-01",
                     [677, 940, 694, 808])


def q82(t):
    return _q37_like(t, "store_sales", "ss", 62, 92, "2000-05-25",
                     [129, 270, 821, 423])


def q48(t):
    j = (t["store_sales"]
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk")
         .merge(t["date_dim"], left_on="ss_sold_date_sk",
                right_on="d_date_sk")
         .merge(t["customer_demographics"], left_on="ss_cdemo_sk",
                right_on="cd_demo_sk")
         .merge(t["customer_address"], left_on="ss_addr_sk",
                right_on="ca_address_sk"))
    j = j[j.d_year == 2000]
    m1 = (((j.cd_marital_status == "M")
           & (j.cd_education_status == "4 yr Degree")
           & j.ss_sales_price.between(100.0, 150.0))
          | ((j.cd_marital_status == "D")
             & (j.cd_education_status == "2 yr Degree")
             & j.ss_sales_price.between(50.0, 100.0))
          | ((j.cd_marital_status == "S")
             & (j.cd_education_status == "College")
             & j.ss_sales_price.between(150.0, 200.0)))
    m2 = ((j.ca_country == "United States")
          & ((j.ca_state.isin(["CO", "OH", "TX"])
              & j.ss_net_profit.between(0, 2000))
             | (j.ca_state.isin(["OR", "MN", "KY"])
                & j.ss_net_profit.between(150, 3000))
             | (j.ca_state.isin(["VA", "CA", "MS"])
                & j.ss_net_profit.between(50, 25000))))
    total = j[m1 & m2].ss_quantity.sum()
    return pd.DataFrame({"total": [float(total) if len(j[m1 & m2])
                                   else np.nan]})


def q50(t):
    d = t["date_dim"]
    d2 = d[(d.d_year == 2001) & (d.d_moy == 8)]
    j = (t["store_sales"]
         .merge(t["store_returns"],
                left_on=["ss_ticket_number", "ss_item_sk",
                         "ss_customer_sk"],
                right_on=["sr_ticket_number", "sr_item_sk",
                          "sr_customer_sk"])
         .merge(d[["d_date_sk"]], left_on="ss_sold_date_sk",
                right_on="d_date_sk")
         .merge(d2[["d_date_sk"]].rename(columns={"d_date_sk": "d2_sk"}),
                left_on="sr_returned_date_sk", right_on="d2_sk")
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk"))
    lag = j.sr_returned_date_sk - j.ss_sold_date_sk
    j = j.assign(
        b30=(lag <= 30).astype(int),
        b60=((lag > 30) & (lag <= 60)).astype(int),
        b90=((lag > 60) & (lag <= 90)).astype(int),
        b120=((lag > 90) & (lag <= 120)).astype(int),
        bmore=(lag > 120).astype(int))
    g = j.groupby(["s_store_name", "s_company_name", "s_county"],
                  as_index=False).agg(
        **{"30 days": ("b30", "sum"), "31-60 days": ("b60", "sum"),
           "61-90 days": ("b90", "sum"), "91-120 days": ("b120", "sum"),
           ">120 days": ("bmore", "sum")})
    g = g.sort_values(["s_store_name", "s_company_name", "s_county"])
    return g.head(100).reset_index(drop=True)


def q65(t):
    d = t["date_dim"]
    ss = t["store_sales"].merge(
        d[d.d_month_seq.between(24, 35)][["d_date_sk"]],
        left_on="ss_sold_date_sk", right_on="d_date_sk")
    sc = ss.groupby(["ss_store_sk", "ss_item_sk"],
                    as_index=False).ss_sales_price.sum()
    sc.columns = ["ss_store_sk", "ss_item_sk", "revenue"]
    sb = sc.groupby("ss_store_sk", as_index=False).revenue.mean()
    sb.columns = ["ss_store_sk", "ave"]
    j = sc.merge(sb, on="ss_store_sk")
    j = j[j.revenue <= 0.1 * j.ave]
    j = (j.merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk")
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk"))
    out = j[["s_store_name", "i_item_desc", "revenue", "i_current_price",
             "i_wholesale_cost", "i_brand"]]
    out = out.sort_values(["s_store_name", "i_item_desc"])
    return out.head(100).reset_index(drop=True)


def q79(t):
    hd = t["household_demographics"]
    st = t["store"]
    d = t["date_dim"]
    j = (t["store_sales"]
         .merge(d[(d.d_dow == 1) & d.d_year.isin([1999, 2000, 2001])],
                left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(st[st.s_number_employees.between(200, 295)],
                left_on="ss_store_sk", right_on="s_store_sk")
         .merge(hd[(hd.hd_dep_count == 6) | (hd.hd_vehicle_count > 2)],
                left_on="ss_hdemo_sk", right_on="hd_demo_sk"))
    ms = j.groupby(["ss_ticket_number", "ss_customer_sk", "ss_addr_sk",
                    "s_city"], as_index=False).agg(
        amt=("ss_coupon_amt", "sum"), profit=("ss_net_profit", "sum"))
    out = ms.merge(t["customer"], left_on="ss_customer_sk",
                   right_on="c_customer_sk")
    out = out.assign(city30=out.s_city.str[:30])
    out = out[["c_last_name", "c_first_name", "city30",
               "ss_ticket_number", "amt", "profit"]]
    out = out.sort_values(["c_last_name", "c_first_name", "city30",
                           "profit", "ss_ticket_number"])
    return out.head(100).reset_index(drop=True)




def q28(t):
    ss = t["store_sales"]

    def bucket(qlo, qhi, lp, cp, wc):
        d = ss[ss.ss_quantity.between(qlo, qhi)
               & (ss.ss_list_price.between(*lp)
                  | ss.ss_coupon_amt.between(*cp)
                  | ss.ss_wholesale_cost.between(*wc))]
        n = d.ss_list_price.count()
        return (d.ss_list_price.mean() if n else np.nan, int(n),
                int(d.ss_list_price.nunique()))

    b1 = bucket(0, 5, (8, 18), (459, 1459), (57, 77))
    b2 = bucket(6, 10, (90, 100), (2323, 3323), (31, 51))
    b3 = bucket(11, 15, (142, 152), (12214, 13214), (79, 99))
    b4 = bucket(16, 20, (135, 145), (6071, 7071), (38, 58))
    row = b1 + b2 + b3 + b4
    cols = []
    for i in range(1, 5):
        cols += [f"b{i}_lp", f"b{i}_cnt", f"b{i}_cntd"]
    return pd.DataFrame([row], columns=cols)


def _q33_like(t, keycol, category, year, moy):
    keep = set(t["item"][t["item"].i_category == category][keycol])
    parts = []
    for fact, pfx in (("store_sales", "ss"), ("catalog_sales", "cs"),
                      ("web_sales", "ws")):
        j = (t[fact]
             .merge(t["date_dim"], left_on=f"{pfx}_sold_date_sk",
                    right_on="d_date_sk")
             .merge(t["customer_address"], left_on=f"{pfx}_addr_sk",
                    right_on="ca_address_sk")
             .merge(t["item"], left_on=f"{pfx}_item_sk",
                    right_on="i_item_sk"))
        j = j[(j.d_year == year) & (j.d_moy == moy)
              & (j.ca_gmt_offset == -5) & j[keycol].isin(keep)]
        g = j.groupby(keycol, as_index=False)[
            f"{pfx}_ext_sales_price"].sum()
        g.columns = [keycol, "total_sales"]
        parts.append(g)
    u = pd.concat(parts, ignore_index=True)
    g = u.groupby(keycol, as_index=False).total_sales.sum()
    g = g.sort_values(["total_sales", keycol])
    return g.head(100).reset_index(drop=True)


def q33(t):
    return _q33_like(t, "i_manufact_id", "Electronics", 1998, 5)


def q56(t):
    g = _q33_like(t, "i_item_id", "Music", 2001, 2)
    return g


def q34(t):
    hd = t["household_demographics"]
    d = t["date_dim"]
    st = t["store"]
    j = (t["store_sales"]
         .merge(d[(d.d_dom.between(1, 3) | d.d_dom.between(25, 28))
                  & d.d_year.isin([1999, 2000, 2001])],
                left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(st[st.s_county.isin(
             ["Williamson County", "Walker County", "Ziebach County"])],
             left_on="ss_store_sk", right_on="s_store_sk")
         .merge(hd[hd.hd_buy_potential.isin([">10000", "Unknown"])
                   & (hd.hd_vehicle_count > 0)
                   & (hd.hd_dep_count / hd.hd_vehicle_count > 1.2)],
                left_on="ss_hdemo_sk", right_on="hd_demo_sk"))
    dn = j.groupby(["ss_ticket_number", "ss_customer_sk"],
                   as_index=False).size().rename(columns={"size": "cnt"})
    dn = dn[dn.cnt.between(15, 20)]
    out = dn.merge(t["customer"], left_on="ss_customer_sk",
                   right_on="c_customer_sk")
    out = out[["c_last_name", "c_first_name", "c_salutation",
               "c_preferred_cust_flag", "ss_ticket_number", "cnt"]]
    out = out.sort_values(
        ["c_last_name", "c_first_name", "c_salutation",
         "c_preferred_cust_flag", "ss_ticket_number"],
        ascending=[True, True, True, False, True])
    return out.reset_index(drop=True)


def q38(t):
    sets = []
    for fact, pfx in (("store_sales", "ss"), ("catalog_sales", "cs"),
                      ("web_sales", "ws")):
        j = (t[fact]
             .merge(t["date_dim"], left_on=f"{pfx}_sold_date_sk",
                    right_on="d_date_sk")
             .merge(t["customer"], left_on=f"{pfx}_customer_sk",
                    right_on="c_customer_sk"))
        j = j[j.d_month_seq.between(24, 35)]
        sets.append(set(map(tuple, j[["c_last_name", "c_first_name",
                                      "d_date"]].itertuples(index=False))))
    return pd.DataFrame(
        {"count(*)": [len(sets[0] & sets[1] & sets[2])]})


def q41(t):
    it = t["item"]
    counts = it[it.i_category == "Women"].groupby("i_manufact_id").size()
    keep = set(counts[counts > 0].index)
    d = it[it.i_manufact_id.between(738, 778)
           & it.i_manufact_id.isin(keep)]
    out = pd.DataFrame({"i_product_name":
                        sorted(d.i_product_name.unique())})
    return out.head(100).reset_index(drop=True)



def q45(t):
    keep_ids = set(t["item"][t["item"].i_item_sk.isin(
        [2, 3, 5, 7, 11, 13, 17, 19, 23, 29])].i_item_id)
    j = (t["web_sales"]
         .merge(t["customer"], left_on="ws_customer_sk",
                right_on="c_customer_sk")
         .merge(t["customer_address"], left_on="c_current_addr_sk",
                right_on="ca_address_sk")
         .merge(t["date_dim"], left_on="ws_sold_date_sk",
                right_on="d_date_sk")
         .merge(t["item"], left_on="ws_item_sk", right_on="i_item_sk"))
    j = j[(j.d_qoy == 2) & (j.d_year == 2001)]
    m = (j.ca_zip.str[:5].isin(
        ["85669", "86197", "88274", "83405", "86475", "85392", "85460",
         "80348", "81792"]) | j.i_item_id.isin(keep_ids))
    g = j[m].groupby(["ca_zip", "ca_city"], as_index=False
                     ).ws_sales_price.sum()
    g.columns = ["ca_zip", "ca_city", "sum_sales"]
    g = g.sort_values(["ca_zip", "ca_city"])
    return g.head(100).reset_index(drop=True)


def q46(t):
    hd = t["household_demographics"]
    d = t["date_dim"]
    st = t["store"]
    j = (t["store_sales"]
         .merge(d[d.d_dow.isin([6, 0]) & d.d_year.isin([1999, 2000, 2001])],
                left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(st[st.s_city.isin(
             ["city1", "city2", "city3", "city4", "city5"])],
             left_on="ss_store_sk", right_on="s_store_sk")
         .merge(hd[(hd.hd_dep_count == 4) | (hd.hd_vehicle_count == 3)],
                left_on="ss_hdemo_sk", right_on="hd_demo_sk")
         .merge(t["customer_address"], left_on="ss_addr_sk",
                right_on="ca_address_sk"))
    dn = j.groupby(["ss_ticket_number", "ss_customer_sk", "ss_addr_sk",
                    "ca_city"], as_index=False).agg(
        amt=("ss_coupon_amt", "sum"), profit=("ss_net_profit", "sum"))
    dn = dn.rename(columns={"ca_city": "bought_city"})
    out = (dn.merge(t["customer"], left_on="ss_customer_sk",
                    right_on="c_customer_sk")
           .merge(t["customer_address"], left_on="c_current_addr_sk",
                  right_on="ca_address_sk"))
    out = out[out.ca_city != out.bought_city]
    out = out[["c_last_name", "c_first_name", "ca_city", "bought_city",
               "ss_ticket_number", "amt", "profit"]]
    out = out.sort_values(["c_last_name", "c_first_name", "ca_city",
                           "bought_city", "ss_ticket_number"])
    return out.head(100).reset_index(drop=True)


def q53(t):
    d = t["date_dim"]
    j = (t["store_sales"]
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk")
         .merge(d[d.d_month_seq.between(24, 35)],
                left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk"))
    j = j[j.i_category.isin(["Books", "Children", "Electronics"])]
    g = j.groupby(["i_manufact_id", "d_qoy"], as_index=False
                  ).ss_sales_price.sum()
    g.columns = ["manufact_id", "d_qoy", "sum_sales"]
    g["avg_quarterly_sales"] = g.groupby("manufact_id"
                                         )["sum_sales"].transform("mean")
    m = np.where(g.avg_quarterly_sales > 0,
                 np.abs(g.sum_sales - g.avg_quarterly_sales)
                 / g.avg_quarterly_sales, np.nan) > 0.1
    out = g[m][["manufact_id", "sum_sales", "avg_quarterly_sales"]]
    out = out.sort_values(["avg_quarterly_sales", "sum_sales",
                           "manufact_id"])
    return out.head(100).reset_index(drop=True)


def q6(t):
    d = t["date_dim"]
    seq = d[(d.d_year == 2001) & (d.d_moy == 1)].d_month_seq.unique()
    it = t["item"].copy()
    cat_avg = it.groupby("i_category").i_current_price.transform("mean")
    hot = set(it[it.i_current_price > 1.2 * cat_avg].i_item_sk)
    j = (t["store_sales"]
         .merge(d[d.d_month_seq.isin(seq)][["d_date_sk"]],
                left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(t["customer"], left_on="ss_customer_sk",
                right_on="c_customer_sk")
         .merge(t["customer_address"], left_on="c_current_addr_sk",
                right_on="ca_address_sk"))
    j = j[j.ss_item_sk.isin(hot)]
    g = j.groupby("ca_state", as_index=False).size()
    g.columns = ["state", "cnt"]
    g = g[g.cnt >= 10].sort_values(["cnt", "state"])
    return g.head(100).reset_index(drop=True)


def q9(t):
    ss = t["store_sales"]
    thresholds = [25437, 22746, 9387, 10098, 18213]
    row = {}
    for i, (lo, hi) in enumerate(
            [(1, 20), (21, 40), (41, 60), (61, 80), (81, 100)]):
        d = ss[ss.ss_quantity.between(lo, hi)]
        v = (d.ss_ext_discount_amt.mean() if len(d) > thresholds[i]
             else d.ss_net_paid.mean())
        row[f"bucket{i + 1}"] = v if len(d) else np.nan
    return pd.DataFrame([row])


def _q32_like(t, fact, pfx, manuf):
    d = t["date_dim"]
    start = pd.Timestamp("2000-01-27")
    dd = d[(pd.to_datetime(d.d_date) >= start)
           & (pd.to_datetime(d.d_date) <= start + pd.Timedelta(days=90))]
    f = t[fact].merge(dd[["d_date_sk"]],
                      left_on=f"{pfx}_sold_date_sk", right_on="d_date_sk")
    avg_by_item = f.groupby(f"{pfx}_item_sk")[
        f"{pfx}_ext_discount_amt"].transform("mean")
    keep_items = set(t["item"][t["item"].i_manufact_id == manuf].i_item_sk)
    m = f[f"{pfx}_item_sk"].isin(keep_items) \
        & (f[f"{pfx}_ext_discount_amt"] > 1.3 * avg_by_item)
    s = f[m][f"{pfx}_ext_discount_amt"].sum()
    return pd.DataFrame({"excess discount amount":
                         [s if m.any() else np.nan]})


def q32(t):
    return _q32_like(t, "catalog_sales", "cs", 77)


def q92(t):
    return _q32_like(t, "web_sales", "ws", 350)


def q60(t):
    g = _q33_like(t, "i_item_id", "Children", 2000, 9)
    return g.sort_values(["i_item_id", "total_sales"]).head(100
        ).reset_index(drop=True)


def q61(t):
    base = (t["store_sales"]
            .merge(t["store"], left_on="ss_store_sk",
                   right_on="s_store_sk")
            .merge(t["date_dim"], left_on="ss_sold_date_sk",
                   right_on="d_date_sk")
            .merge(t["customer"], left_on="ss_customer_sk",
                   right_on="c_customer_sk")
            .merge(t["customer_address"], left_on="c_current_addr_sk",
                   right_on="ca_address_sk")
            .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk"))
    base = base[(base.ca_gmt_offset == -5) & (base.s_gmt_offset == -5)
                & (base.i_category == "Jewelry") & (base.d_year == 1998)
                & (base.d_moy == 11)]
    promo = base.merge(t["promotion"], left_on="ss_promo_sk",
                       right_on="p_promo_sk")
    promo = promo[(promo.p_channel_email == "Y")
                  | (promo.p_channel_event == "Y")]
    # SQL SUM over an empty set is NULL (not pandas' 0.0)
    p = promo.ss_ext_sales_price.sum() if len(promo) else np.nan
    tot = base.ss_ext_sales_price.sum() if len(base) else np.nan
    ratio = p / tot * 100 if tot else np.nan
    return pd.DataFrame({"promotions": [p], "total": [tot],
                         "ratio": [ratio]})


def q63(t):
    d = t["date_dim"]
    j = (t["store_sales"]
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk")
         .merge(d[d.d_month_seq.between(24, 35)],
                left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk"))
    j = j[j.i_category.isin(["Books", "Children", "Electronics"])]
    g = j.groupby(["i_manager_id", "d_moy"], as_index=False
                  ).ss_sales_price.sum()
    g.columns = ["manager_id", "d_moy", "sum_sales"]
    g["avg_monthly_sales"] = g.groupby("manager_id"
                                       )["sum_sales"].transform("mean")
    m = np.where(g.avg_monthly_sales > 0,
                 np.abs(g.sum_sales - g.avg_monthly_sales)
                 / g.avg_monthly_sales, np.nan) > 0.1
    out = g[m][["manager_id", "sum_sales", "avg_monthly_sales"]]
    out = out.sort_values(["manager_id", "avg_monthly_sales",
                           "sum_sales"])
    return out.head(100).reset_index(drop=True)


def q68(t):
    hd = t["household_demographics"]
    d = t["date_dim"]
    st = t["store"]
    j = (t["store_sales"]
         .merge(d[d.d_dom.between(1, 2) & d.d_year.isin([1999, 2000, 2001])],
                left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(st[st.s_city.isin(["city1", "city2"])],
                left_on="ss_store_sk", right_on="s_store_sk")
         .merge(hd[(hd.hd_dep_count == 4) | (hd.hd_vehicle_count == 3)],
                left_on="ss_hdemo_sk", right_on="hd_demo_sk")
         .merge(t["customer_address"], left_on="ss_addr_sk",
                right_on="ca_address_sk"))
    dn = j.groupby(["ss_ticket_number", "ss_customer_sk", "ss_addr_sk",
                    "ca_city"], as_index=False).agg(
        extended_price=("ss_ext_sales_price", "sum"),
        list_price=("ss_ext_list_price", "sum"),
        extended_tax=("ss_coupon_amt", "sum"))
    dn = dn.rename(columns={"ca_city": "bought_city"})
    out = (dn.merge(t["customer"], left_on="ss_customer_sk",
                    right_on="c_customer_sk")
           .merge(t["customer_address"], left_on="c_current_addr_sk",
                  right_on="ca_address_sk"))
    out = out[out.ca_city != out.bought_city]
    out = out[["c_last_name", "c_first_name", "ca_city", "bought_city",
               "ss_ticket_number", "extended_price", "extended_tax",
               "list_price"]]
    out = out.sort_values(["c_last_name", "ss_ticket_number"])
    return out.head(100).reset_index(drop=True)


def q88(t):
    hd = t["household_demographics"]
    hsel = hd[((hd.hd_dep_count == 4) & (hd.hd_vehicle_count <= 6))
              | ((hd.hd_dep_count == 2) & (hd.hd_vehicle_count <= 4))
              | ((hd.hd_dep_count == 0) & (hd.hd_vehicle_count <= 2))]
    st = t["store"][t["store"].s_store_name == "store a"]
    td = t["time_dim"]
    ss88 = t["store_sales"].dropna(subset=["ss_sold_time_sk"]).astype(
        {"ss_sold_time_sk": "int64"})
    base = (ss88
            .merge(td, left_on="ss_sold_time_sk", right_on="t_time_sk")
            .merge(hsel[["hd_demo_sk"]], left_on="ss_hdemo_sk",
                   right_on="hd_demo_sk")
            .merge(st[["s_store_sk"]], left_on="ss_store_sk",
                   right_on="s_store_sk"))
    row = {
        "h8_30_to_9": int(((base.t_hour == 8)
                           & (base.t_minute >= 30)).sum()),
        "h9_to_9_30": int(((base.t_hour == 9)
                           & (base.t_minute < 30)).sum()),
        "h9_30_to_10": int(((base.t_hour == 9)
                            & (base.t_minute >= 30)).sum()),
        "h10_to_10_30": int(((base.t_hour == 10)
                             & (base.t_minute < 30)).sum()),
    }
    return pd.DataFrame([row])


def q89(t):
    d = t["date_dim"]
    it = t["item"]
    m = ((it.i_category.isin(["Books", "Electronics", "Sports"])
          & it.i_class.isin(["bookclass1", "elecclass2", "sporclass3"]))
         | (it.i_category.isin(["Men", "Jewelry", "Women"])
            & it.i_class.isin(["menclass1", "jeweclass2", "womeclass3"])))
    j = (t["store_sales"]
         .merge(it[m], left_on="ss_item_sk", right_on="i_item_sk")
         .merge(d[d.d_year == 1999], left_on="ss_sold_date_sk",
                right_on="d_date_sk")
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk"))
    g = j.groupby(["i_category", "i_class", "i_brand", "s_store_name",
                   "s_company_name", "d_moy"], as_index=False
                  ).ss_sales_price.sum()
    g = g.rename(columns={"ss_sales_price": "sum_sales"})
    g["avg_monthly_sales"] = g.groupby(
        ["i_category", "i_brand", "s_store_name", "s_company_name"]
    )["sum_sales"].transform("mean")
    sel = np.where(g.avg_monthly_sales != 0,
                   np.abs(g.sum_sales - g.avg_monthly_sales)
                   / g.avg_monthly_sales, np.nan) > 0.1
    out = g[sel]
    out = out.assign(diff=out.sum_sales - out.avg_monthly_sales)
    out = out.sort_values(["diff", "s_store_name"]).drop(columns="diff")
    return out.head(100).reset_index(drop=True)


def q17(t):
    d = t["date_dim"]
    ss = t["store_sales"].merge(
        d[(d.d_qoy == 1) & (d.d_year == 2001)][["d_date_sk"]],
        left_on="ss_sold_date_sk", right_on="d_date_sk")
    sr = t["store_returns"].merge(
        d[d.d_qoy.between(1, 3) & (d.d_year == 2001)][["d_date_sk"]],
        left_on="sr_returned_date_sk", right_on="d_date_sk")
    cs = t["catalog_sales"].merge(
        d[d.d_qoy.between(1, 3) & (d.d_year == 2001)][["d_date_sk"]],
        left_on="cs_sold_date_sk", right_on="d_date_sk")
    j = (ss.merge(sr[["sr_customer_sk", "sr_item_sk", "sr_ticket_number",
                      "sr_return_quantity"]],
                  left_on=["ss_customer_sk", "ss_item_sk",
                           "ss_ticket_number"],
                  right_on=["sr_customer_sk", "sr_item_sk",
                            "sr_ticket_number"])
         .merge(cs[["cs_customer_sk", "cs_item_sk", "cs_quantity"]],
                left_on=["sr_customer_sk", "sr_item_sk"],
                right_on=["cs_customer_sk", "cs_item_sk"])
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk")
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk"))
    g = j.groupby(["i_item_id", "i_item_desc", "s_state"],
                  as_index=False).agg(
        store_sales_quantitycount=("ss_quantity", "count"),
        store_sales_quantityave=("ss_quantity", "mean"),
        store_sales_quantitystdev=("ss_quantity", "std"),
        store_returns_quantitycount=("sr_return_quantity", "count"),
        store_returns_quantityave=("sr_return_quantity", "mean"),
        store_returns_quantitystdev=("sr_return_quantity", "std"),
        catalog_sales_quantitycount=("cs_quantity", "count"),
        catalog_sales_quantityave=("cs_quantity", "mean"),
        catalog_sales_quantitystdev=("cs_quantity", "std"))
    g["store_sales_quantitycov"] = (g.store_sales_quantitystdev
                                    / g.store_sales_quantityave)
    g["store_returns_quantitycov"] = (g.store_returns_quantitystdev
                                      / g.store_returns_quantityave)
    g["catalog_sales_quantitycov"] = (g.catalog_sales_quantitystdev
                                      / g.catalog_sales_quantityave)
    g = g[["i_item_id", "i_item_desc", "s_state",
           "store_sales_quantitycount", "store_sales_quantityave",
           "store_sales_quantitystdev", "store_sales_quantitycov",
           "store_returns_quantitycount", "store_returns_quantityave",
           "store_returns_quantitystdev", "store_returns_quantitycov",
           "catalog_sales_quantitycount", "catalog_sales_quantityave",
           "catalog_sales_quantitycov"]]
    g = g.sort_values(["i_item_id", "i_item_desc", "s_state"])
    return g.head(100).reset_index(drop=True)


def q58(t):
    d = t["date_dim"]
    start = pd.Timestamp("2001-06-01")
    dd = d[(pd.to_datetime(d.d_date) >= start)
           & (pd.to_datetime(d.d_date) <= start + pd.Timedelta(days=14))]
    revs = {}
    for fact, pfx in (("store_sales", "ss"), ("catalog_sales", "cs"),
                      ("web_sales", "ws")):
        j = (t[fact]
             .merge(dd[["d_date_sk"]], left_on=f"{pfx}_sold_date_sk",
                    right_on="d_date_sk")
             .merge(t["item"], left_on=f"{pfx}_item_sk",
                    right_on="i_item_sk"))
        g = j.groupby("i_item_id", as_index=False)[
            f"{pfx}_ext_sales_price"].sum()
        g.columns = ["item_id", f"{pfx}_item_rev"]
        revs[pfx] = g
    j = revs["ss"].merge(revs["cs"], on="item_id").merge(
        revs["ws"], on="item_id")
    m = (j.ss_item_rev.between(0.9 * j.cs_item_rev, 1.1 * j.cs_item_rev)
         & j.ss_item_rev.between(0.9 * j.ws_item_rev, 1.1 * j.ws_item_rev)
         & j.cs_item_rev.between(0.9 * j.ss_item_rev, 1.1 * j.ss_item_rev)
         & j.cs_item_rev.between(0.9 * j.ws_item_rev, 1.1 * j.ws_item_rev)
         & j.ws_item_rev.between(0.9 * j.ss_item_rev, 1.1 * j.ss_item_rev)
         & j.ws_item_rev.between(0.9 * j.cs_item_rev, 1.1 * j.cs_item_rev))
    j = j[m]
    avg3 = (j.ss_item_rev + j.cs_item_rev + j.ws_item_rev) / 3
    out = pd.DataFrame({
        "item_id": j.item_id, "ss_item_rev": j.ss_item_rev,
        "ss_dev": j.ss_item_rev / avg3 * 100,
        "cs_item_rev": j.cs_item_rev,
        "cs_dev": j.cs_item_rev / avg3 * 100,
        "ws_item_rev": j.ws_item_rev,
        "ws_dev": j.ws_item_rev / avg3 * 100,
        "average": avg3})
    out = out.sort_values(["item_id", "ss_item_rev"])
    return out.head(100).reset_index(drop=True)


def q69(t):
    d = t["date_dim"]
    win = d[(d.d_year == 2001) & d.d_moy.between(4, 6)][["d_date_sk"]]
    ss_c = set(t["store_sales"].merge(
        win, left_on="ss_sold_date_sk",
        right_on="d_date_sk").ss_customer_sk)
    ws_c = set(t["web_sales"].merge(
        win, left_on="ws_sold_date_sk",
        right_on="d_date_sk").ws_customer_sk)
    c = t["customer"].merge(t["customer_address"],
                            left_on="c_current_addr_sk",
                            right_on="ca_address_sk")
    c = c[c.ca_state.isin(["KY", "GA", "NM"])]
    c = c[c.c_customer_sk.isin(ss_c) & ~c.c_customer_sk.isin(ws_c)]
    j = c.merge(t["customer_demographics"], left_on="c_current_cdemo_sk",
                right_on="cd_demo_sk")
    g = j.groupby(["cd_gender", "cd_marital_status",
                   "cd_education_status", "cd_credit_rating"],
                  as_index=False).size()
    g["cnt1"] = g["size"]
    g["cnt2"] = g["size"]
    g = g[["cd_gender", "cd_marital_status", "cd_education_status",
           "cnt1", "cd_credit_rating", "cnt2"]]
    g = g.sort_values(["cd_gender", "cd_marital_status",
                       "cd_education_status", "cd_credit_rating"])
    return g.head(100).reset_index(drop=True)


def q70(t):
    d = t["date_dim"]
    j = (t["store_sales"]
         .merge(d[d.d_month_seq.between(24, 35)][["d_date_sk"]],
                left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk"))
    pieces = []
    g2 = j.groupby(["s_state", "s_county"], as_index=False
                   ).ss_net_profit.sum()
    g2["lochierarchy"] = 0
    pieces.append(g2)
    g1 = j.groupby(["s_state"], as_index=False).ss_net_profit.sum()
    g1["s_county"] = None
    g1["lochierarchy"] = 1
    pieces.append(g1)
    g0 = pd.DataFrame({"s_state": [None], "s_county": [None],
                       "ss_net_profit": [j.ss_net_profit.sum()],
                       "lochierarchy": [2]})
    pieces.append(g0)
    u = pd.concat(pieces, ignore_index=True)
    u = u.rename(columns={"ss_net_profit": "total_sum"})
    u["_pk"] = np.where(u.lochierarchy == 0, u.s_state, None)

    def rnk(grp):
        return grp.total_sum.rank(method="min", ascending=False)
    u["rank_within_parent"] = u.groupby(
        ["lochierarchy", "_pk"], dropna=False).total_sum.rank(
        method="min", ascending=False).astype(int)
    u = u[["total_sum", "s_state", "s_county", "lochierarchy",
           "rank_within_parent", "_pk"]]
    u = u.sort_values(
        ["lochierarchy", "_pk", "rank_within_parent"],
        ascending=[False, True, True], na_position="first")
    u = u.drop(columns=["_pk"], errors="ignore")
    return u.head(100).reset_index(drop=True)


def q76(t):
    parts = []
    for fact, pfx, ncol in (("store_sales", "ss", "ss_sold_time_sk"),
                            ("web_sales", "ws", "ws_ship_customer_sk"),
                            ("catalog_sales", "cs", "cs_ship_addr_sk")):
        f = t[fact]
        f = f[f[ncol].isna()]
        j = (f.merge(t["date_dim"], left_on=f"{pfx}_sold_date_sk",
                     right_on="d_date_sk")
             .merge(t["item"], left_on=f"{pfx}_item_sk",
                    right_on="i_item_sk"))
        chan = {"ss": "store", "ws": "web", "cs": "catalog"}[pfx]
        g = j.groupby(["d_year", "d_qoy", "i_category"],
                      as_index=False).agg(
            sales_cnt=(f"{pfx}_ext_sales_price", "size"),
            sales_amt=(f"{pfx}_ext_sales_price", "sum"))
        g.insert(0, "channel", chan)
        g.insert(1, "col_name", ncol)
        parts.append(g)
    u = pd.concat(parts, ignore_index=True)
    u = u[["channel", "col_name", "d_year", "d_qoy", "i_category",
           "sales_cnt", "sales_amt"]]
    u = u.sort_values(["channel", "col_name", "d_year", "d_qoy",
                       "i_category"])
    return u.head(100).reset_index(drop=True)


def q87(t):
    sets = []
    for fact, pfx in (("store_sales", "ss"), ("catalog_sales", "cs"),
                      ("web_sales", "ws")):
        j = (t[fact]
             .merge(t["date_dim"], left_on=f"{pfx}_sold_date_sk",
                    right_on="d_date_sk")
             .merge(t["customer"], left_on=f"{pfx}_customer_sk",
                    right_on="c_customer_sk"))
        j = j[j.d_month_seq.between(24, 35)]
        sets.append(set(map(tuple, j[["c_last_name", "c_first_name",
                                      "d_date"]].itertuples(index=False))))
    return pd.DataFrame(
        {"count(*)": [len(sets[0] - sets[1] - sets[2])]})


def _date_win(t, start, days):
    d = t["date_dim"]
    s = pd.Timestamp(start)
    return d[(pd.to_datetime(d.d_date) >= s)
             & (pd.to_datetime(d.d_date) <= s + pd.Timedelta(days=days))]


def q16(t):
    cs = t["catalog_sales"]
    multi_wh = cs.groupby("cs_order_number")["cs_warehouse_sk"].nunique()
    multi = set(multi_wh[multi_wh > 1].index)
    returned = set(t["catalog_returns"].cr_order_number)
    cc = t["call_center"]
    cc = cc[cc.cc_county.isin(["Ziebach County", "Walker County",
                               "Williamson County"])]
    j = (cs.merge(_date_win(t, "2000-02-01", 60)[["d_date_sk"]],
                  left_on="cs_ship_date_sk", right_on="d_date_sk")
         .merge(t["customer_address"], left_on="cs_ship_addr_sk",
                right_on="ca_address_sk"))
    j = j[(j.ca_state == "GA")
          & j.cs_call_center_sk.isin(set(cc.cc_call_center_sk))
          & j.cs_order_number.isin(multi)
          & ~j.cs_order_number.isin(returned)]
    return pd.DataFrame({
        "order count": [j.cs_order_number.nunique()],
        "total shipping cost": [j.cs_ext_sales_price.sum()
                                if len(j) else np.nan],
        "total net profit": [j.cs_net_profit.sum()
                             if len(j) else np.nan]})


def q21(t):
    d = t["date_dim"]
    s = pd.Timestamp("2000-03-11")
    dd = d[(pd.to_datetime(d.d_date) >= s - pd.Timedelta(days=30))
           & (pd.to_datetime(d.d_date) <= s + pd.Timedelta(days=30))]
    it = t["item"]
    it = it[it.i_current_price.between(0.99, 1.49)]
    j = (t["inventory"]
         .merge(dd[["d_date_sk", "d_date"]], left_on="inv_date_sk",
                right_on="d_date_sk")
         .merge(it[["i_item_sk", "i_item_id"]], left_on="inv_item_sk",
                right_on="i_item_sk")
         .merge(t["warehouse"], left_on="inv_warehouse_sk",
                right_on="w_warehouse_sk"))
    before = pd.to_datetime(j.d_date) < s
    j = j.assign(inv_before=np.where(before, j.inv_quantity_on_hand, 0),
                 inv_after=np.where(~before, j.inv_quantity_on_hand, 0))
    g = j.groupby(["w_warehouse_name", "i_item_id"], as_index=False).agg(
        inv_before=("inv_before", "sum"), inv_after=("inv_after", "sum"))
    with np.errstate(invalid="ignore", divide="ignore"):
        ratio = np.where(g.inv_before > 0,
                         g.inv_after / g.inv_before, np.nan)
    g = g[(ratio >= 2.0 / 3.0) & (ratio <= 3.0 / 2.0)]
    g = g.sort_values(["w_warehouse_name", "i_item_id"])
    return g.head(100).reset_index(drop=True)


def q30(t):
    d = t["date_dim"]
    ctr = (t["web_returns"]
           .merge(d[d.d_year == 2000][["d_date_sk"]],
                  left_on="wr_returned_date_sk", right_on="d_date_sk")
           .merge(t["customer_address"][["ca_address_sk", "ca_state"]],
                  left_on="wr_returning_addr_sk",
                  right_on="ca_address_sk"))
    ctr = ctr.groupby(["wr_returning_customer_sk", "ca_state"],
                      as_index=False).wr_return_amt.sum()
    ctr.columns = ["ctr_customer_sk", "ctr_state", "ctr_total_return"]
    avg_state = ctr.groupby("ctr_state")["ctr_total_return"].transform(
        "mean")
    hot = ctr[ctr.ctr_total_return > 1.2 * avg_state]
    j = (hot.merge(t["customer"], left_on="ctr_customer_sk",
                   right_on="c_customer_sk")
         .merge(t["customer_address"], left_on="c_current_addr_sk",
                right_on="ca_address_sk"))
    j = j[j.ca_state == "GA"]
    out = j[["c_customer_id", "c_salutation", "c_first_name",
             "c_last_name", "c_preferred_cust_flag", "c_birth_month",
             "c_birth_year", "c_birth_country", "ctr_total_return"]]
    out = out.sort_values(list(out.columns))
    return out.head(100).reset_index(drop=True)


def q39(t):
    d = t["date_dim"]
    j = (t["inventory"]
         .merge(d[d.d_year == 2000][["d_date_sk", "d_moy"]],
                left_on="inv_date_sk", right_on="d_date_sk")
         .merge(t["item"][["i_item_sk"]], left_on="inv_item_sk",
                right_on="i_item_sk")
         .merge(t["warehouse"][["w_warehouse_sk", "w_warehouse_name"]],
                left_on="inv_warehouse_sk", right_on="w_warehouse_sk"))
    g = j.groupby(["w_warehouse_name", "w_warehouse_sk", "i_item_sk",
                   "d_moy"], as_index=False).agg(
        stdev=("inv_quantity_on_hand", "std"),
        mean=("inv_quantity_on_hand", "mean"))
    cov_sel = np.where(g["mean"] == 0, 0, g.stdev / g["mean"]) > 1
    inv = g[cov_sel].copy()
    inv["cov"] = np.where(inv["mean"] == 0, np.nan,
                          inv.stdev / inv["mean"])
    a = inv[inv.d_moy == 1]
    b = inv[inv.d_moy == 2]
    j2 = a.merge(b, on=["i_item_sk", "w_warehouse_sk"],
                 suffixes=("_1", "_2"))
    out = pd.DataFrame({
        "wsk1": j2.w_warehouse_sk, "isk1": j2.i_item_sk,
        "moy1": j2.d_moy_1, "mean1": j2.mean_1, "cov1": j2.cov_1,
        "wsk2": j2.w_warehouse_sk, "isk2": j2.i_item_sk,
        "moy2": j2.d_moy_2, "mean2": j2.mean_2, "cov2": j2.cov_2})
    out = out.sort_values(["wsk1", "isk1", "moy1", "mean1", "cov1"])
    return out.head(100).reset_index(drop=True)


def q40(t):
    s = pd.Timestamp("2000-03-11")
    d = t["date_dim"]
    dd = d[(pd.to_datetime(d.d_date) >= s - pd.Timedelta(days=30))
           & (pd.to_datetime(d.d_date) <= s + pd.Timedelta(days=30))]
    it = t["item"]
    it = it[it.i_current_price.between(0.99, 1.49)]
    cs = t["catalog_sales"].merge(
        t["catalog_returns"][["cr_order_number", "cr_item_sk",
                              "cr_return_amount"]],
        left_on=["cs_order_number", "cs_item_sk"],
        right_on=["cr_order_number", "cr_item_sk"], how="left")
    j = (cs.merge(dd[["d_date_sk", "d_date"]],
                  left_on="cs_sold_date_sk", right_on="d_date_sk")
         .merge(it[["i_item_sk", "i_item_id"]], left_on="cs_item_sk",
                right_on="i_item_sk")
         .merge(t["warehouse"], left_on="cs_warehouse_sk",
                right_on="w_warehouse_sk"))
    before = pd.to_datetime(j.d_date) < s
    net = j.cs_sales_price - j.cr_return_amount.fillna(0)
    j = j.assign(sales_before=np.where(before, net, 0.0),
                 sales_after=np.where(~before, net, 0.0))
    g = j.groupby(["w_state", "i_item_id"], as_index=False).agg(
        sales_before=("sales_before", "sum"),
        sales_after=("sales_after", "sum"))
    g = g.sort_values(["w_state", "i_item_id"])
    return g.head(100).reset_index(drop=True)


def _ship_buckets(t, fact, pfx, dims):
    d = t["date_dim"]
    j = t[fact].merge(
        d[d.d_month_seq.between(24, 35)][["d_date_sk"]],
        left_on=f"{pfx}_ship_date_sk", right_on="d_date_sk")
    for tbl, lk, rk in dims:
        j = j.merge(t[tbl], left_on=lk, right_on=rk)
    lag = j[f"{pfx}_ship_date_sk"] - j[f"{pfx}_sold_date_sk"]
    j = j.assign(
        b30=(lag <= 30).astype(int),
        b60=((lag > 30) & (lag <= 60)).astype(int),
        b90=((lag > 60) & (lag <= 90)).astype(int),
        b120=((lag > 90) & (lag <= 120)).astype(int),
        bmore=(lag > 120).astype(int))
    return j


def q62(t):
    j = _ship_buckets(t, "web_sales", "ws", [
        ("warehouse", "ws_warehouse_sk", "w_warehouse_sk"),
        ("ship_mode", "ws_ship_mode_sk", "sm_ship_mode_sk"),
        ("web_site", "ws_web_site_sk", "web_site_sk")])
    j = j.assign(wname=j.w_warehouse_name.str[:20])
    g = j.groupby(["wname", "sm_type", "web_name"], as_index=False).agg(
        **{"30 days": ("b30", "sum"), "31-60 days": ("b60", "sum"),
           "61-90 days": ("b90", "sum"), "91-120 days": ("b120", "sum"),
           ">120 days": ("bmore", "sum")})
    g = g.sort_values(["wname", "sm_type", "web_name"])
    return g.head(100).reset_index(drop=True)


def q99(t):
    j = _ship_buckets(t, "catalog_sales", "cs", [
        ("warehouse", "cs_warehouse_sk", "w_warehouse_sk"),
        ("ship_mode", "cs_ship_mode_sk", "sm_ship_mode_sk"),
        ("call_center", "cs_call_center_sk", "cc_call_center_sk")])
    j = j.assign(wname=j.w_warehouse_name.str[:20])
    g = j.groupby(["wname", "sm_type", "cc_name"], as_index=False).agg(
        **{"30 days": ("b30", "sum"), "31-60 days": ("b60", "sum"),
           "61-90 days": ("b90", "sum"), "91-120 days": ("b120", "sum"),
           ">120 days": ("bmore", "sum")})
    g = g.sort_values(["wname", "sm_type", "cc_name"])
    return g.head(100).reset_index(drop=True)


def q85(t):
    d = t["date_dim"]
    j = (t["web_sales"]
         .merge(t["web_returns"],
                left_on=["ws_item_sk", "ws_order_number"],
                right_on=["wr_item_sk", "wr_order_number"])
         .merge(t["web_page"], left_on="ws_web_page_sk",
                right_on="wp_web_page_sk")
         .merge(d[d.d_year == 2000][["d_date_sk"]],
                left_on="ws_sold_date_sk", right_on="d_date_sk")
         .merge(t["customer_demographics"],
                left_on="wr_refunded_cdemo_sk", right_on="cd_demo_sk")
         .merge(t["customer_address"], left_on="wr_refunded_addr_sk",
                right_on="ca_address_sk")
         .merge(t["reason"], left_on="wr_reason_sk",
                right_on="r_reason_sk"))
    m1 = (((j.cd_marital_status == "M")
           & (j.cd_education_status == "Advanced Degree")
           & j.ws_sales_price.between(100.0, 150.0))
          | ((j.cd_marital_status == "S")
             & (j.cd_education_status == "College")
             & j.ws_sales_price.between(50.0, 100.0))
          | ((j.cd_marital_status == "W")
             & (j.cd_education_status == "2 yr Degree")
             & j.ws_sales_price.between(150.0, 200.0)))
    m2 = ((j.ca_country == "United States")
          & ((j.ca_state.isin(["IN", "OH", "NJ"])
              & j.ws_net_profit.between(100, 200))
             | (j.ca_state.isin(["WI", "CT", "KY"])
                & j.ws_net_profit.between(150, 300))
             | (j.ca_state.isin(["LA", "IA", "AR"])
                & j.ws_net_profit.between(50, 250))))
    sel = j[m1 & m2]
    g = sel.groupby("r_reason_desc", as_index=False).agg(
        aq=("ws_quantity", "mean"), arc=("wr_refunded_cash", "mean"),
        af=("wr_fee", "mean"))
    g.insert(0, "rdesc", g.pop("r_reason_desc").str[:20])
    g = g.sort_values(["rdesc", "aq", "arc", "af"])
    return g.head(100).reset_index(drop=True)


def q91(t):
    d = t["date_dim"]
    hd = t["household_demographics"]
    j = (t["catalog_returns"]
         .merge(t["call_center"], left_on="cr_call_center_sk",
                right_on="cc_call_center_sk")
         .merge(d[(d.d_year == 1998) & (d.d_moy == 11)][["d_date_sk"]],
                left_on="cr_returned_date_sk", right_on="d_date_sk")
         .merge(t["customer"], left_on="cr_returning_customer_sk",
                right_on="c_customer_sk")
         .merge(t["customer_demographics"],
                left_on="c_current_cdemo_sk", right_on="cd_demo_sk")
         .merge(hd, left_on="c_current_hdemo_sk", right_on="hd_demo_sk")
         .merge(t["customer_address"], left_on="c_current_addr_sk",
                right_on="ca_address_sk"))
    j = j[(((j.cd_marital_status == "M")
            & (j.cd_education_status == "Unknown"))
           | ((j.cd_marital_status == "W")
              & (j.cd_education_status == "Advanced Degree")))
          & j.hd_buy_potential.str.startswith("0-500")
          & (j.ca_gmt_offset == -7)]
    g = j.groupby(["cc_call_center_id", "cc_name", "cc_manager",
                   "cd_marital_status", "cd_education_status"],
                  as_index=False).cr_net_loss.sum()
    out = g[["cc_call_center_id", "cc_name", "cc_manager",
             "cr_net_loss"]]
    out.columns = ["call_center", "call_center_name", "manager",
                   "returns_loss"]
    out = out.sort_values("returns_loss", ascending=False)
    return out.reset_index(drop=True)


def q94(t):
    ws = t["web_sales"]
    multi_wh = ws.groupby("ws_order_number")["ws_warehouse_sk"].nunique()
    multi = set(multi_wh[multi_wh > 1].index)
    returned = set(t["web_returns"].wr_order_number)
    sites = set(t["web_site"][
        t["web_site"].web_company_name == "pri"].web_site_sk)
    j = (ws.merge(_date_win(t, "2001-02-01", 60)[["d_date_sk"]],
                  left_on="ws_ship_date_sk", right_on="d_date_sk")
         .merge(t["customer_address"], left_on="ws_ship_addr_sk",
                right_on="ca_address_sk"))
    j = j[(j.ca_state == "IL") & j.ws_web_site_sk.isin(sites)
          & j.ws_order_number.isin(multi)
          & ~j.ws_order_number.isin(returned)]
    return pd.DataFrame({
        "order count": [j.ws_order_number.nunique()],
        "total shipping cost": [j.ws_ext_sales_price.sum()
                                if len(j) else np.nan],
        "total net profit": [j.ws_net_profit.sum()
                             if len(j) else np.nan]})


def q1(t):
    d = t["date_dim"]
    ctr = (t["store_returns"]
           .merge(d[d.d_year == 2000][["d_date_sk"]],
                  left_on="sr_returned_date_sk", right_on="d_date_sk"))
    ctr = ctr.groupby(["sr_customer_sk", "sr_store_sk"],
                      as_index=False).sr_return_amt.sum()
    ctr.columns = ["ctr_customer_sk", "ctr_store_sk", "ctr_total_return"]
    avg_store = ctr.groupby("ctr_store_sk")[
        "ctr_total_return"].transform("mean")
    hot = ctr[ctr.ctr_total_return > 1.2 * avg_store]
    st = t["store"]
    hot = hot[hot.ctr_store_sk.isin(
        set(st[st.s_state == "AL"].s_store_sk))]
    j = hot.merge(t["customer"], left_on="ctr_customer_sk",
                  right_on="c_customer_sk")
    out = j[["c_customer_id"]].sort_values("c_customer_id")
    return out.head(100).reset_index(drop=True)


def _year_totals(t):
    parts = []
    for fact, pfx, tag in (("store_sales", "ss", "s"),
                           ("web_sales", "ws", "w")):
        j = (t[fact]
             .merge(t["customer"], left_on=f"{pfx}_customer_sk",
                    right_on="c_customer_sk")
             .merge(t["date_dim"], left_on=f"{pfx}_sold_date_sk",
                    right_on="d_date_sk"))
        j = j.assign(net=j[f"{pfx}_ext_list_price"]
                     - j[f"{pfx}_ext_discount_amt"])
        g = j.groupby(["c_customer_id", "c_first_name", "c_last_name",
                       "d_year"], as_index=False).net.sum()
        g["sale_type"] = tag
        parts.append(g)
    return pd.concat(parts, ignore_index=True)


def q11(t):
    yt = _year_totals(t)

    def pick(tag, year):
        d = yt[(yt.sale_type == tag) & (yt.d_year == year)]
        return d.set_index("c_customer_id")

    s1, s2 = pick("s", 2001), pick("s", 2002)
    w1, w2 = pick("w", 2001), pick("w", 2002)
    ids = (set(s1.index) & set(s2.index) & set(w1.index)
           & set(w2.index))
    rows = []
    for cid in ids:
        if s1.loc[cid, "net"] <= 0 or w1.loc[cid, "net"] <= 0:
            continue
        wr = w2.loc[cid, "net"] / w1.loc[cid, "net"]
        sr = s2.loc[cid, "net"] / s1.loc[cid, "net"]
        if wr > sr:
            rows.append((cid, s2.loc[cid, "c_first_name"],
                         s2.loc[cid, "c_last_name"]))
    out = pd.DataFrame(rows, columns=[
        "customer_id", "customer_first_name", "customer_last_name"])
    out = out.sort_values(list(out.columns))
    return out.head(100).reset_index(drop=True)


def q31(t):
    def chan(fact, pfx, out):
        j = (t[fact]
             .merge(t["date_dim"], left_on=f"{pfx}_sold_date_sk",
                    right_on="d_date_sk")
             .merge(t["customer_address"], left_on=f"{pfx}_addr_sk",
                    right_on="ca_address_sk"))
        g = j.groupby(["ca_county", "d_qoy", "d_year"],
                      as_index=False)[f"{pfx}_ext_sales_price"].sum()
        g.columns = ["ca_county", "d_qoy", "d_year", out]
        return g

    ss = chan("store_sales", "ss", "store_sales")
    ws = chan("web_sales", "ws", "web_sales")

    def q(df, col, qoy):
        d = df[(df.d_qoy == qoy) & (df.d_year == 2000)]
        return d.set_index("ca_county")[col]

    s1, s2, s3 = (q(ss, "store_sales", i) for i in (1, 2, 3))
    w1, w2, w3 = (q(ws, "web_sales", i) for i in (1, 2, 3))
    counties = (set(s1.index) & set(s2.index) & set(s3.index)
                & set(w1.index) & set(w2.index) & set(w3.index))
    rows = []
    for c in counties:
        wg1 = w2[c] / w1[c] if w1[c] > 0 else np.nan
        sg1 = s2[c] / s1[c] if s1[c] > 0 else np.nan
        wg2 = w3[c] / w2[c] if w2[c] > 0 else np.nan
        sg2 = s3[c] / s2[c] if s2[c] > 0 else np.nan
        if (not np.isnan(wg1) and not np.isnan(sg1) and wg1 > sg1
                and not np.isnan(wg2) and not np.isnan(sg2)
                and wg2 > sg2):
            rows.append((c, 2000, wg1, sg1, wg2, sg2))
    out = pd.DataFrame(rows, columns=[
        "ca_county", "d_year", "web_q1_q2_increase",
        "store_q1_q2_increase", "web_q2_q3_increase",
        "store_q2_q3_increase"])
    return out.sort_values("ca_county").reset_index(drop=True)


def q35(t):
    d = t["date_dim"]
    win = d[(d.d_year == 2002) & (d.d_qoy < 4)][["d_date_sk"]]
    ss_c = set(t["store_sales"].merge(
        win, left_on="ss_sold_date_sk", right_on="d_date_sk"
    ).ss_customer_sk)
    ws_c = set(t["web_sales"].merge(
        win, left_on="ws_sold_date_sk", right_on="d_date_sk"
    ).ws_customer_sk)
    cs_c = set(t["catalog_sales"].merge(
        win, left_on="cs_sold_date_sk", right_on="d_date_sk"
    ).cs_customer_sk)
    c = (t["customer"]
         .merge(t["customer_address"], left_on="c_current_addr_sk",
                right_on="ca_address_sk")
         .merge(t["customer_demographics"],
                left_on="c_current_cdemo_sk", right_on="cd_demo_sk"))
    c = c[c.c_customer_sk.isin(ss_c)
          & (c.c_customer_sk.isin(ws_c) | c.c_customer_sk.isin(cs_c))]
    g = c.groupby(["ca_state", "cd_gender", "cd_marital_status",
                   "cd_dep_count"], as_index=False).agg(
        cnt1=("cd_dep_count", "size"), a1=("cd_dep_count", "mean"),
        m1=("cd_dep_count", "max"), s1=("cd_dep_count", "sum"))
    g = g.sort_values(["ca_state", "cd_gender", "cd_marital_status",
                       "cd_dep_count"])
    return g.head(100).reset_index(drop=True)


def q81(t):
    d = t["date_dim"]
    ctr = (t["catalog_returns"]
           .merge(d[d.d_year == 2000][["d_date_sk"]],
                  left_on="cr_returned_date_sk", right_on="d_date_sk")
           .merge(t["customer_address"][["ca_address_sk", "ca_state"]],
                  left_on="cr_returning_addr_sk",
                  right_on="ca_address_sk"))
    ctr = ctr.groupby(["cr_returning_customer_sk", "ca_state"],
                      as_index=False).cr_return_amount.sum()
    ctr.columns = ["ctr_customer_sk", "ctr_state", "ctr_total_return"]
    avg_state = ctr.groupby("ctr_state")["ctr_total_return"].transform(
        "mean")
    hot = ctr[ctr.ctr_total_return > 1.2 * avg_state]
    j = (hot.merge(t["customer"], left_on="ctr_customer_sk",
                   right_on="c_customer_sk")
         .merge(t["customer_address"], left_on="c_current_addr_sk",
                right_on="ca_address_sk"))
    j = j[j.ca_state == "GA"]
    out = j[["c_customer_id", "c_salutation", "c_first_name",
             "c_last_name", "ca_state", "ctr_total_return"]]
    out = out.sort_values(list(out.columns))
    return out.head(100).reset_index(drop=True)


def q83(t):
    d = t["date_dim"]
    weeks = set(d[d.d_date.astype(str).isin(
        ["2000-06-30", "2000-09-27", "2000-11-17"])].d_week_seq)
    dates = set(d[d.d_week_seq.isin(weeks)].d_date_sk)
    qty = {}
    for fact, pfx in (("store_returns", "sr"), ("catalog_returns", "cr"),
                      ("web_returns", "wr")):
        f = t[fact]
        f = f[f[f"{pfx}_returned_date_sk"].isin(dates)]
        j = f.merge(t["item"][["i_item_sk", "i_item_id"]],
                    left_on=f"{pfx}_item_sk", right_on="i_item_sk")
        g = j.groupby("i_item_id", as_index=False)[
            f"{pfx}_return_quantity"
            if pfx != "cr" else "cr_return_quantity"].sum()
        g.columns = ["item_id", f"{pfx}_item_qty"]
        qty[pfx] = g
    j = qty["sr"].merge(qty["cr"], on="item_id").merge(
        qty["wr"], on="item_id")
    tot = j.sr_item_qty + j.cr_item_qty + j.wr_item_qty
    out = pd.DataFrame({
        "item_id": j.item_id, "sr_item_qty": j.sr_item_qty,
        "sr_dev": j.sr_item_qty / tot / 3.0 * 100,
        "cr_item_qty": j.cr_item_qty,
        "cr_dev": j.cr_item_qty / tot / 3.0 * 100,
        "wr_item_qty": j.wr_item_qty,
        "wr_dev": j.wr_item_qty / tot / 3.0 * 100,
        "average": tot / 3.0})
    out = out.sort_values(["item_id", "sr_item_qty"])
    return out.head(100).reset_index(drop=True)


def q84(t):
    hd = t["household_demographics"]
    ib = t["income_band"]
    ib = ib[(ib.ib_lower_bound >= 38128) & (ib.ib_upper_bound <= 88128)]
    j = (t["customer"]
         .merge(t["customer_address"], left_on="c_current_addr_sk",
                right_on="ca_address_sk")
         .merge(t["customer_demographics"],
                left_on="c_current_cdemo_sk", right_on="cd_demo_sk")
         .merge(hd, left_on="c_current_hdemo_sk", right_on="hd_demo_sk")
         .merge(ib, left_on="hd_income_band_sk",
                right_on="ib_income_band_sk")
         .merge(t["store_returns"][["sr_cdemo_sk"]],
                left_on="cd_demo_sk", right_on="sr_cdemo_sk"))
    j = j[j.ca_city == "city42"]
    out = pd.DataFrame({
        "customer_id": j.c_customer_id,
        "customername": j.c_last_name + ", " + j.c_first_name})
    out = out.sort_values("customer_id")
    return out.head(100).reset_index(drop=True)


def _year_totals3(t):
    parts = []
    for fact, pfx, tag in (("store_sales", "ss", "s"),
                           ("catalog_sales", "cs", "c"),
                           ("web_sales", "ws", "w")):
        j = (t[fact]
             .merge(t["customer"], left_on=f"{pfx}_customer_sk",
                    right_on="c_customer_sk")
             .merge(t["date_dim"], left_on=f"{pfx}_sold_date_sk",
                    right_on="d_date_sk"))
        j = j.assign(net=((j[f"{pfx}_ext_list_price"]
                           - j[f"{pfx}_ext_wholesale_cost"]
                           - j[f"{pfx}_ext_discount_amt"])
                          + j[f"{pfx}_ext_sales_price"]) / 2)
        g = j.groupby(["c_customer_id", "c_first_name", "c_last_name",
                       "d_year"], as_index=False).net.sum()
        g["sale_type"] = tag
        parts.append(g)
    return pd.concat(parts, ignore_index=True)


def q4(t):
    yt = _year_totals3(t)

    def pick(tag, year):
        d = yt[(yt.sale_type == tag) & (yt.d_year == year)]
        return d.set_index("c_customer_id")

    s1, s2 = pick("s", 2001), pick("s", 2002)
    c1, c2 = pick("c", 2001), pick("c", 2002)
    w1, w2 = pick("w", 2001), pick("w", 2002)
    ids = (set(s1.index) & set(s2.index) & set(c1.index) & set(c2.index)
           & set(w1.index) & set(w2.index))
    rows = []
    for cid in ids:
        if (s1.loc[cid, "net"] <= 0 or c1.loc[cid, "net"] <= 0
                or w1.loc[cid, "net"] <= 0):
            continue
        cr = c2.loc[cid, "net"] / c1.loc[cid, "net"]
        sr = s2.loc[cid, "net"] / s1.loc[cid, "net"]
        wr = w2.loc[cid, "net"] / w1.loc[cid, "net"]
        if cr > sr and cr > wr:
            rows.append((cid, s2.loc[cid, "c_first_name"],
                         s2.loc[cid, "c_last_name"]))
    out = pd.DataFrame(rows, columns=[
        "customer_id", "customer_first_name", "customer_last_name"])
    out = out.sort_values(list(out.columns))
    return out.head(100).reset_index(drop=True)


def q10(t):
    d = t["date_dim"]
    win = d[(d.d_year == 2002) & d.d_moy.between(1, 4)][["d_date_sk"]]
    ss_c = set(t["store_sales"].merge(
        win, left_on="ss_sold_date_sk", right_on="d_date_sk"
    ).ss_customer_sk)
    ws_c = set(t["web_sales"].merge(
        win, left_on="ws_sold_date_sk", right_on="d_date_sk"
    ).ws_customer_sk)
    cs_c = set(t["catalog_sales"].merge(
        win, left_on="cs_sold_date_sk", right_on="d_date_sk"
    ).cs_customer_sk)
    c = (t["customer"]
         .merge(t["customer_address"], left_on="c_current_addr_sk",
                right_on="ca_address_sk")
         .merge(t["customer_demographics"],
                left_on="c_current_cdemo_sk", right_on="cd_demo_sk"))
    c = c[c.ca_county.isin(["Ziebach County", "Walker County",
                            "Williamson County", "Franklin County",
                            "Fairfield County"])]
    c = c[c.c_customer_sk.isin(ss_c)
          & (c.c_customer_sk.isin(ws_c) | c.c_customer_sk.isin(cs_c))]
    g = c.groupby(["cd_gender", "cd_marital_status",
                   "cd_education_status", "cd_credit_rating",
                   "cd_dep_count"], as_index=False).size()
    g = g.rename(columns={"size": "cnt1"})
    g["cnt2"] = g.cnt1
    g["cnt3"] = g.cnt1
    g = g[["cd_gender", "cd_marital_status", "cd_education_status",
           "cnt1", "cd_credit_rating", "cnt2", "cd_dep_count", "cnt3"]]
    g = g.sort_values(["cd_gender", "cd_marital_status",
                       "cd_education_status", "cd_credit_rating",
                       "cd_dep_count"])
    return g.head(100).reset_index(drop=True)


def q57(t):
    d = t["date_dim"]
    j = (t["catalog_sales"]
         .merge(t["item"], left_on="cs_item_sk", right_on="i_item_sk")
         .merge(d, left_on="cs_sold_date_sk", right_on="d_date_sk")
         .merge(t["call_center"], left_on="cs_call_center_sk",
                right_on="cc_call_center_sk"))
    j = j[(j.d_year == 2000)
          | ((j.d_year == 1999) & (j.d_moy == 12))
          | ((j.d_year == 2001) & (j.d_moy == 1))]
    v1 = j.groupby(["i_category", "i_brand", "cc_name", "d_year",
                    "d_moy"], as_index=False).cs_sales_price.sum()
    v1 = v1.rename(columns={"cs_sales_price": "sum_sales"})
    v1["avg_monthly_sales"] = v1.groupby(
        ["i_category", "i_brand", "cc_name", "d_year"]
    )["sum_sales"].transform("mean")
    v1 = v1.sort_values(["i_category", "i_brand", "cc_name", "d_year",
                         "d_moy"], kind="mergesort")
    v1["rn"] = v1.groupby(["i_category", "i_brand", "cc_name"]
                          ).cumcount() + 1
    lag = v1.copy()
    lag["rn"] = lag["rn"] + 1
    lead = v1.copy()
    lead["rn"] = lead["rn"] - 1
    v2 = (v1.merge(lag[["i_category", "i_brand", "cc_name", "rn",
                        "sum_sales"]],
                   on=["i_category", "i_brand", "cc_name", "rn"],
                   suffixes=("", "_lag"))
          .merge(lead[["i_category", "i_brand", "cc_name", "rn",
                       "sum_sales"]],
                 on=["i_category", "i_brand", "cc_name", "rn"],
                 suffixes=("", "_lead")))
    v2 = v2[(v2.d_year == 2000) & (v2.avg_monthly_sales > 0)]
    dev = np.abs(v2.sum_sales - v2.avg_monthly_sales) \
        / v2.avg_monthly_sales
    v2 = v2[dev > 0.1]
    out = v2[["i_category", "i_brand", "cc_name", "d_year",
              "avg_monthly_sales", "sum_sales", "sum_sales_lag",
              "sum_sales_lead"]]
    out.columns = ["i_category", "i_brand", "cc_name", "d_year",
                   "avg_monthly_sales", "sum_sales", "psum", "nsum"]
    out = out.assign(diff=out.sum_sales - out.avg_monthly_sales)
    out = out.sort_values(["diff", "cc_name"]).drop(columns="diff")
    return out.head(100).reset_index(drop=True)


def q74(t):
    parts = []
    for fact, pfx, tag in (("store_sales", "ss", "s"),
                           ("web_sales", "ws", "w")):
        j = (t[fact]
             .merge(t["customer"], left_on=f"{pfx}_customer_sk",
                    right_on="c_customer_sk")
             .merge(t["date_dim"], left_on=f"{pfx}_sold_date_sk",
                    right_on="d_date_sk"))
        j = j[j.d_year.isin([2001, 2002])]
        g = j.groupby(["c_customer_id", "c_first_name", "c_last_name",
                       "d_year"], as_index=False)[
            f"{pfx}_net_paid"].sum()
        g.columns = ["c_customer_id", "c_first_name", "c_last_name",
                     "d_year", "net"]
        g["sale_type"] = tag
        parts.append(g)
    yt = pd.concat(parts, ignore_index=True)

    def pick(tag, year):
        d = yt[(yt.sale_type == tag) & (yt.d_year == year)]
        return d.set_index("c_customer_id")

    s1, s2 = pick("s", 2001), pick("s", 2002)
    w1, w2 = pick("w", 2001), pick("w", 2002)
    ids = (set(s1.index) & set(s2.index) & set(w1.index)
           & set(w2.index))
    rows = []
    for cid in ids:
        if s1.loc[cid, "net"] <= 0 or w1.loc[cid, "net"] <= 0:
            continue
        wr = w2.loc[cid, "net"] / w1.loc[cid, "net"]
        sr = s2.loc[cid, "net"] / s1.loc[cid, "net"]
        if wr > sr:
            rows.append((cid, s2.loc[cid, "c_first_name"],
                         s2.loc[cid, "c_last_name"]))
    out = pd.DataFrame(rows, columns=[
        "customer_id", "customer_first_name", "customer_last_name"])
    out = out.sort_values(list(out.columns))
    return out.head(100).reset_index(drop=True)


_DAYS = ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday",
         "Friday", "Saturday"]


def _week_pivot(j, price_col, extra_keys=()):
    keys = ["d_week_seq"] + list(extra_keys)
    cols = {}
    for day in _DAYS:
        cols[day[:3].lower() + "_sales"] = pd.Series(
            np.where(j.d_day_name == day, j[price_col], np.nan),
            index=j.index)
    jj = j.assign(**cols)
    agg = {c: (c, "sum") for c in cols}
    cntagg = {c + "_n": (c, "count") for c in cols}
    g = jj.groupby(keys, as_index=False).agg(**agg, **cntagg)
    for c in cols:  # SQL SUM of all-NULL is NULL, pandas gives 0.0
        g[c] = np.where(g[c + "_n"] > 0, g[c], np.nan)
        g = g.drop(columns=[c + "_n"])
    return g


def q2(t):
    ws = t["web_sales"][["ws_sold_date_sk", "ws_ext_sales_price"]]
    cs = t["catalog_sales"][["cs_sold_date_sk", "cs_ext_sales_price"]]
    sc = pd.concat([
        ws.rename(columns={"ws_sold_date_sk": "sold_date_sk",
                           "ws_ext_sales_price": "sales_price"}),
        cs.rename(columns={"cs_sold_date_sk": "sold_date_sk",
                           "cs_ext_sales_price": "sales_price"})],
        ignore_index=True)
    d = t["date_dim"]
    j = sc.merge(d, left_on="sold_date_sk", right_on="d_date_sk")
    w = _week_pivot(j, "sales_price")
    y_weeks = set(d[(d.d_year == 2001) & (d.d_moy == 1)
                    & (d.d_dom == 1)].d_week_seq)
    z_weeks = set(d[(d.d_year == 2002) & (d.d_moy == 1)
                    & (d.d_dom == 1)].d_week_seq)
    y = w[w.d_week_seq.isin(y_weeks)]
    z = w[w.d_week_seq.isin(z_weeks)].copy()
    z["d_week_seq"] = z["d_week_seq"] - 52
    j2 = y.merge(z, on="d_week_seq", suffixes=("1", "2"))
    out = pd.DataFrame({"d_week_seq1": j2.d_week_seq})
    for k, day in enumerate(_DAYS):
        c = day[:3].lower() + "_sales"
        out[f"r{k + 1}"] = np.round(j2[c + "1"] / j2[c + "2"], 2)
    return out.sort_values("d_week_seq1").reset_index(drop=True)


def q59(t):
    d = t["date_dim"]
    j = t["store_sales"].merge(d, left_on="ss_sold_date_sk",
                               right_on="d_date_sk")
    w = _week_pivot(j, "ss_sales_price", extra_keys=["ss_store_sk"])
    # SQL joins the FULL date_dim on week_seq: every day of the week
    # matches, so each (store, week) appears once per qualifying day
    wk_month = d[["d_week_seq", "d_month_seq"]]
    st = t["store"][["s_store_sk", "s_store_name", "s_store_id"]]
    y = (w.merge(wk_month, on="d_week_seq")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk"))
    y1 = y[y.d_month_seq.between(24, 35)]
    y2 = y[y.d_month_seq.between(36, 47)].copy()
    y2["d_week_seq"] = y2["d_week_seq"] - 52
    j2 = y1.merge(y2, on=["s_store_id", "d_week_seq"],
                  suffixes=("1", "2"))
    out = pd.DataFrame({
        "s_store_name1": j2.s_store_name1,
        "s_store_id1": j2.s_store_id,
        "d_week_seq1": j2.d_week_seq})
    for k, day in enumerate(_DAYS):
        c = day[:3].lower() + "_sales"
        out[f"q{k + 1}"] = j2[c + "1"] / j2[c + "2"]
    out = out.sort_values(["s_store_name1", "s_store_id1",
                           "d_week_seq1"])
    return out.head(100).reset_index(drop=True)


def q77(t):
    d = t["date_dim"]
    s = pd.Timestamp("2000-08-03")
    dd = d[(pd.to_datetime(d.d_date) >= s)
           & (pd.to_datetime(d.d_date) <= s + pd.Timedelta(days=30))]
    dsk = dd[["d_date_sk"]]

    ss = (t["store_sales"].merge(dsk, left_on="ss_sold_date_sk",
                                 right_on="d_date_sk")
          .groupby("ss_store_sk", as_index=False).agg(
        sales=("ss_ext_sales_price", "sum"),
        profit=("ss_net_profit", "sum")))
    sr = (t["store_returns"].merge(dsk, left_on="sr_returned_date_sk",
                                   right_on="d_date_sk")
          .groupby("sr_store_sk", as_index=False).agg(
        returns_amt=("sr_return_amt", "sum"),
        profit_loss=("sr_net_loss", "sum")))
    cs = (t["catalog_sales"].merge(dsk, left_on="cs_sold_date_sk",
                                   right_on="d_date_sk")
          .groupby("cs_call_center_sk", as_index=False).agg(
        sales=("cs_ext_sales_price", "sum"),
        profit=("cs_net_profit", "sum")))
    cr = (t["catalog_returns"].merge(dsk, left_on="cr_returned_date_sk",
                                     right_on="d_date_sk")
          .groupby("cr_call_center_sk", as_index=False).agg(
        returns_amt=("cr_return_amount", "sum"),
        profit_loss=("cr_net_loss", "sum")))
    ws = (t["web_sales"].merge(dsk, left_on="ws_sold_date_sk",
                               right_on="d_date_sk")
          .groupby("ws_web_page_sk", as_index=False).agg(
        sales=("ws_ext_sales_price", "sum"),
        profit=("ws_net_profit", "sum")))
    wr = (t["web_returns"].merge(dsk, left_on="wr_returned_date_sk",
                                 right_on="d_date_sk")
          .groupby("wr_web_page_sk", as_index=False).agg(
        returns_amt=("wr_return_amt", "sum"),
        profit_loss=("wr_net_loss", "sum")))

    rows = []
    a = ss.merge(sr, left_on="ss_store_sk", right_on="sr_store_sk",
                 how="left")
    for _, r in a.iterrows():
        rows.append(("store channel", r.ss_store_sk, r.sales,
                     np.nan_to_num(r.returns_amt),
                     r.profit - np.nan_to_num(r.profit_loss)))
    b = cs.merge(cr, left_on="cs_call_center_sk",
                 right_on="cr_call_center_sk", how="left")
    for _, r in b.iterrows():
        rows.append(("catalog channel", r.cs_call_center_sk, r.sales,
                     np.nan_to_num(r.returns_amt),
                     r.profit - np.nan_to_num(r.profit_loss)))
    c = ws.merge(wr, left_on="ws_web_page_sk", right_on="wr_web_page_sk",
                 how="left")
    for _, r in c.iterrows():
        rows.append(("web channel", r.ws_web_page_sk, r.sales,
                     np.nan_to_num(r.returns_amt),
                     r.profit - np.nan_to_num(r.profit_loss)))
    x = pd.DataFrame(rows, columns=["channel", "id", "sales",
                                    "returns_amt", "profit"])
    detail = x.groupby(["channel", "id"], as_index=False).agg(
        sales=("sales", "sum"), returns_amt=("returns_amt", "sum"),
        profit=("profit", "sum"))
    lvl1 = x.groupby(["channel"], as_index=False).agg(
        sales=("sales", "sum"), returns_amt=("returns_amt", "sum"),
        profit=("profit", "sum"))
    lvl1["id"] = np.nan
    total = pd.DataFrame({
        "channel": [None], "id": [np.nan],
        "sales": [x.sales.sum()], "returns_amt": [x.returns_amt.sum()],
        "profit": [x.profit.sum()]})
    u = pd.concat([detail, lvl1, total], ignore_index=True)
    u = u[["channel", "id", "sales", "returns_amt", "profit"]]
    u = u.sort_values(["channel", "id", "sales"], na_position="first")
    return u.head(100).reset_index(drop=True)


def q8(t):
    ca = t["customer_address"]
    zips5 = ca.ca_zip.str[:5]
    a = set(zips5[zips5.isin(["47602", "16704", "35863", "28577",
                              "83910", "36201"])])
    pref = (ca.merge(t["customer"], left_on="ca_address_sk",
                     right_on="c_current_addr_sk"))
    pref = pref[pref.c_preferred_cust_flag == "Y"]
    counts = pref.groupby(pref.ca_zip.str[:5]).size()
    b = set(counts[counts > 10].index)
    keep2 = {z[:2] for z in (a & b)}
    d = t["date_dim"]
    j = (t["store_sales"]
         .merge(d[(d.d_qoy == 2) & (d.d_year == 1998)][["d_date_sk"]],
                left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(t["store"], left_on="ss_store_sk",
                right_on="s_store_sk"))
    j = j[j.s_zip.str[:2].isin(keep2)]
    g = j.groupby("s_store_name", as_index=False).ss_net_profit.sum()
    g.columns = ["s_store_name", "sum(ss_net_profit)"]
    return g.sort_values("s_store_name").head(100).reset_index(drop=True)


def q66(t):
    td = t["time_dim"]
    tset = set(td[(td.t_time >= 30838)
                  & (td.t_time <= 30838 + 28800)].t_time_sk)
    sm = t["ship_mode"]
    smset = set(sm[sm.sm_carrier.isin(["CARRIER0", "CARRIER1"])
                   ].sm_ship_mode_sk)
    d = t["date_dim"]
    parts = []
    for fact, pfx in (("web_sales", "ws"), ("catalog_sales", "cs")):
        f = t[fact]
        f = f[f[f"{pfx}_sold_time_sk"].isin(tset)
              & f[f"{pfx}_ship_mode_sk"].isin(smset)]
        if pfx == "ws":
            f = f.dropna(subset=["ws_sold_time_sk"])
        j = (f.merge(d[d.d_year == 2001][["d_date_sk", "d_moy",
                                          "d_year"]],
                     left_on=f"{pfx}_sold_date_sk", right_on="d_date_sk")
             .merge(t["warehouse"], left_on=f"{pfx}_warehouse_sk",
                    right_on="w_warehouse_sk"))
        amt = j[f"{pfx}_ext_sales_price"] * j[f"{pfx}_quantity"]
        month_cols = {}
        names = ["jan", "feb", "mar", "apr", "may", "jun", "jul",
                 "aug", "sep", "oct", "nov", "dec"]
        for m_i, nm in enumerate(names, start=1):
            month_cols[nm + "_sales"] = np.where(j.d_moy == m_i, amt, 0.0)
        jj = j.assign(**month_cols)
        g = jj.groupby(["w_warehouse_name", "w_warehouse_sq_ft",
                        "w_city", "w_county", "w_state", "w_country",
                        "d_year"], as_index=False)[
            [nm + "_sales" for nm in names]].sum()
        parts.append(g)
    u = pd.concat(parts, ignore_index=True)
    names = ["jan", "feb", "mar", "apr", "may", "jun", "jul", "aug",
             "sep", "oct", "nov", "dec"]
    g = u.groupby(["w_warehouse_name", "w_warehouse_sq_ft", "w_city",
                   "w_county", "w_state", "w_country", "d_year"],
                  as_index=False)[[nm + "_sales" for nm in names]].sum()
    g.insert(6, "ship_carriers", "CARRIER0,CARRIER1")
    g = g.rename(columns={"d_year": "year1"})
    g = g[["w_warehouse_name", "w_warehouse_sq_ft", "w_city",
           "w_county", "w_state", "w_country", "ship_carriers",
           "year1"] + [nm + "_sales" for nm in names]]
    g = g.sort_values("w_warehouse_name")
    return g.head(100).reset_index(drop=True)


def q78(t):
    d = t["date_dim"][["d_date_sk", "d_year"]]
    ws = t["web_sales"].merge(
        t["web_returns"][["wr_order_number", "wr_item_sk"]],
        left_on=["ws_order_number", "ws_item_sk"],
        right_on=["wr_order_number", "wr_item_sk"], how="left")
    ws = ws[ws.wr_order_number.isna()]
    ws = ws.merge(d, left_on="ws_sold_date_sk", right_on="d_date_sk")
    wsg = ws.groupby(["d_year", "ws_item_sk", "ws_customer_sk"],
                     as_index=False).agg(
        ws_qty=("ws_quantity", "sum"),
        ws_wc=("ws_wholesale_cost", "sum"),
        ws_sp=("ws_sales_price", "sum"))
    ss = t["store_sales"].merge(
        t["store_returns"][["sr_ticket_number", "sr_item_sk"]],
        left_on=["ss_ticket_number", "ss_item_sk"],
        right_on=["sr_ticket_number", "sr_item_sk"], how="left")
    ss = ss[ss.sr_ticket_number.isna()]
    ss = ss.merge(d, left_on="ss_sold_date_sk", right_on="d_date_sk")
    ssg = ss.groupby(["d_year", "ss_item_sk", "ss_customer_sk"],
                     as_index=False).agg(
        ss_qty=("ss_quantity", "sum"),
        ss_wc=("ss_wholesale_cost", "sum"),
        ss_sp=("ss_sales_price", "sum"))
    j = ssg.merge(wsg, left_on=["d_year", "ss_item_sk",
                                "ss_customer_sk"],
                  right_on=["d_year", "ws_item_sk", "ws_customer_sk"],
                  how="left")
    j = j[(j.ws_qty.fillna(0) > 0) & (j.d_year == 2000)]
    out = pd.DataFrame({
        "ss_sold_year": j.d_year, "ss_item_sk": j.ss_item_sk,
        "ss_customer_sk": j.ss_customer_sk,
        "ratio": np.round(j.ss_qty / j.ws_qty.fillna(1), 2),
        "store_qty": j.ss_qty, "store_wholesale_cost": j.ss_wc,
        "store_sales_price": j.ss_sp,
        "other_chan_qty": j.ws_qty.fillna(0),
        "other_chan_wholesale_cost": j.ws_wc.fillna(0),
        "other_chan_sales_price": j.ws_sp.fillna(0)})
    out = out.sort_values(
        ["ss_sold_year", "ss_item_sk", "ss_customer_sk", "store_qty",
         "store_wholesale_cost", "store_sales_price", "other_chan_qty",
         "other_chan_wholesale_cost", "other_chan_sales_price",
         "ratio"],
        ascending=[True, True, True, False, False, False, True, True,
                   True, True])
    return out.head(100).reset_index(drop=True)



def q44(t):
    ss = t["store_sales"]
    s4 = ss[ss.ss_store_sk == 4]
    base = s4[s4.ss_sold_time_sk.isna()].ss_net_profit.mean()
    v = (s4.groupby("ss_item_sk", as_index=False)
         .ss_net_profit.mean()
         .rename(columns={"ss_item_sk": "item_sk",
                          "ss_net_profit": "rank_col"}))
    v = v[v.rank_col > 0.9 * base]
    v["rnk_a"] = v.rank_col.rank(method="min", ascending=True).astype(int)
    v["rnk_d"] = v.rank_col.rank(method="min", ascending=False).astype(int)
    it = t["item"]
    a = v[v.rnk_a < 11][["item_sk", "rnk_a"]].rename(columns={"rnk_a": "rnk"})
    d = v[v.rnk_d < 11][["item_sk", "rnk_d"]].rename(columns={"rnk_d": "rnk"})
    m = a.merge(d, on="rnk", suffixes=("_a", "_d"))
    m = m.merge(it, left_on="item_sk_a", right_on="i_item_sk") \
         .merge(it, left_on="item_sk_d", right_on="i_item_sk",
                suffixes=("", "_w"))
    out = m[["rnk", "i_product_name", "i_product_name_w"]] \
        .rename(columns={"i_product_name": "best_performing",
                         "i_product_name_w": "worst_performing"})
    return out.sort_values("rnk").head(100).reset_index(drop=True)


def q95(t):
    ws, dd = t["web_sales"], t["date_dim"]
    ca, web, wr = t["customer_address"], t["web_site"], t["web_returns"]
    g = ws.groupby("ws_order_number").ws_warehouse_sk.nunique()
    multi = set(g[g > 1].index)
    returned = set(wr.wr_order_number) & multi
    dsel = dd[(dd.d_date >= "1999-02-01") & (dd.d_date <= "1999-04-02")]
    m = ws.merge(dsel, left_on="ws_ship_date_sk", right_on="d_date_sk")
    m = m.merge(ca[ca.ca_state == "IL"],
                left_on="ws_ship_addr_sk", right_on="ca_address_sk")
    m = m.merge(web[web.web_company_name == "pri"],
                left_on="ws_web_site_sk", right_on="web_site_sk")
    m = m[m.ws_order_number.isin(multi) & m.ws_order_number.isin(returned)]
    import pandas as pd
    return pd.DataFrame({
        "order_count": [m.ws_order_number.nunique()],
        "total_shipping_cost": [m.ws_ext_list_price.sum() if len(m) else None],
        "total_net_profit": [m.ws_net_profit.sum() if len(m) else None]})


def q5(t):
    import pandas as pd
    dd = t["date_dim"]
    dsel = dd[(dd.d_date >= "2000-08-23") & (dd.d_date <= "2000-09-06")]
    dks = set(dsel.d_date_sk)

    def channel(sales, ret, s_key, r_key, s_date, r_date, dim, dim_sk,
                dim_id, s_amt, s_prof, r_amt, r_loss):
        a = sales[[s_key, s_date, s_amt, s_prof]].copy()
        a.columns = ["k", "d", "sales_price", "profit"]
        a["return_amt"] = 0.0
        a["net_loss"] = 0.0
        b = ret[[r_key, r_date, r_amt, r_loss]].copy()
        b.columns = ["k", "d", "return_amt", "net_loss"]
        b["sales_price"] = 0.0
        b["profit"] = 0.0
        u = pd.concat([a, b], ignore_index=True)
        u = u[u.d.isin(dks)]
        u = u.merge(dim[[dim_sk, dim_id]], left_on="k", right_on=dim_sk)
        g = u.groupby(dim_id, as_index=False).agg(
            sales=("sales_price", "sum"), profit=("profit", "sum"),
            returns_amt=("return_amt", "sum"),
            profit_loss=("net_loss", "sum"))
        return g.rename(columns={dim_id: "id_"})

    ssr = channel(t["store_sales"], t["store_returns"],
                  "ss_store_sk", "sr_store_sk",
                  "ss_sold_date_sk", "sr_returned_date_sk",
                  t["store"], "s_store_sk", "s_store_id",
                  "ss_ext_sales_price", "ss_net_profit",
                  "sr_return_amt", "sr_net_loss")
    ssr["channel"] = "store channel"
    ssr["id_"] = "store" + ssr["id_"]
    csr = channel(t["catalog_sales"], t["catalog_returns"],
                  "cs_catalog_page_sk", "cr_catalog_page_sk",
                  "cs_sold_date_sk", "cr_returned_date_sk",
                  t["catalog_page"], "cp_catalog_page_sk",
                  "cp_catalog_page_id",
                  "cs_ext_sales_price", "cs_net_profit",
                  "cr_return_amount", "cr_net_loss")
    csr["channel"] = "catalog channel"
    csr["id_"] = "catalog_page" + csr["id_"]
    # web returns take the site of the ORIGINATING sale line
    wr = t["web_returns"].merge(
        t["web_sales"][["ws_item_sk", "ws_order_number", "ws_web_site_sk"]],
        left_on=["wr_item_sk", "wr_order_number"],
        right_on=["ws_item_sk", "ws_order_number"], how="left")
    wsr = channel(t["web_sales"], wr,
                  "ws_web_site_sk", "ws_web_site_sk",
                  "ws_sold_date_sk", "wr_returned_date_sk",
                  t["web_site"], "web_site_sk", "web_site_id",
                  "ws_ext_sales_price", "ws_net_profit",
                  "wr_return_amt", "wr_net_loss")
    wsr["channel"] = "web channel"
    wsr["id_"] = "web_site" + wsr["id_"]
    x = pd.concat([ssr, csr, wsr], ignore_index=True)
    x["profit"] = x["profit"] - x["profit_loss"]
    detail = x.groupby(["channel", "id_"], as_index=False).agg(
        sales=("sales", "sum"), returns_amt=("returns_amt", "sum"),
        profit=("profit", "sum"))
    sub = x.groupby("channel", as_index=False).agg(
        sales=("sales", "sum"), returns_amt=("returns_amt", "sum"),
        profit=("profit", "sum"))
    sub["id_"] = None
    total = pd.DataFrame({"channel": [None], "id_": [None],
                          "sales": [x.sales.sum()],
                          "returns_amt": [x.returns_amt.sum()],
                          "profit": [x.profit.sum()]})
    out = pd.concat([detail, sub, total], ignore_index=True)
    out = out.sort_values(["channel", "id_"],
                          na_position="last").head(100)
    return out[["channel", "id_", "sales", "returns_amt",
                "profit"]].reset_index(drop=True)


def q80(t):
    import pandas as pd
    dd = t["date_dim"]
    dks = set(dd[(dd.d_date >= "2000-08-23")
                 & (dd.d_date <= "2000-09-22")].d_date_sk)
    it = t["item"]
    items = set(it[it.i_current_price > 50].i_item_sk)
    pr = t["promotion"]
    promos = set(pr[pr.p_channel_tv == "N"].p_promo_sk)

    def channel(sales, ret, skey, rkey, pfx, dim, dsk, did):
        m = sales.merge(ret, left_on=[f"{pfx}_item_sk", skey],
                        right_on=[rkey[0], rkey[1]], how="left")
        m = m[m[f"{pfx}_sold_date_sk"].isin(dks)
              & m[f"{pfx}_item_sk"].isin(items)
              & m[f"{pfx}_promo_sk"].isin(promos)]
        m = m.merge(dim, left_on=rkey[2], right_on=dsk)
        g = m.groupby(did, as_index=False).apply(
            lambda d: pd.Series({
                "sales": d[f"{pfx}_ext_sales_price"].sum(),
                "returns_amt": d[rkey[3]].fillna(0).sum(),
                "profit": (d[f"{pfx}_net_profit"]
                           - d[rkey[4]].fillna(0)).sum()}),
            include_groups=False)
        return g.rename(columns={did: "id_"})

    ssr = channel(t["store_sales"], t["store_returns"], "ss_ticket_number",
                  ("sr_item_sk", "sr_ticket_number", "ss_store_sk",
                   "sr_return_amt", "sr_net_loss"),
                  "ss", t["store"], "s_store_sk", "s_store_id")
    ssr["channel"] = "store channel"
    ssr["id_"] = "store" + ssr["id_"]
    csr = channel(t["catalog_sales"], t["catalog_returns"],
                  "cs_order_number",
                  ("cr_item_sk", "cr_order_number", "cs_catalog_page_sk",
                   "cr_return_amount", "cr_net_loss"),
                  "cs", t["catalog_page"], "cp_catalog_page_sk",
                  "cp_catalog_page_id")
    csr["channel"] = "catalog channel"
    csr["id_"] = "catalog_page" + csr["id_"]
    wsr = channel(t["web_sales"], t["web_returns"], "ws_order_number",
                  ("wr_item_sk", "wr_order_number", "ws_web_site_sk",
                   "wr_return_amt", "wr_net_loss"),
                  "ws", t["web_site"], "web_site_sk", "web_site_id")
    wsr["channel"] = "web channel"
    wsr["id_"] = "web_site" + wsr["id_"]
    x = pd.concat([ssr, csr, wsr], ignore_index=True)
    detail = x.groupby(["channel", "id_"], as_index=False).agg(
        sales=("sales", "sum"), returns_amt=("returns_amt", "sum"),
        profit=("profit", "sum"))
    sub = x.groupby("channel", as_index=False).agg(
        sales=("sales", "sum"), returns_amt=("returns_amt", "sum"),
        profit=("profit", "sum"))
    sub["id_"] = None
    total = pd.DataFrame({"channel": [None], "id_": [None],
                          "sales": [x.sales.sum()],
                          "returns_amt": [x.returns_amt.sum()],
                          "profit": [x.profit.sum()]})
    out = pd.concat([detail, sub, total], ignore_index=True)
    out = out.sort_values(["channel", "id_"], na_position="last").head(100)
    return out[["channel", "id_", "sales", "returns_amt",
                "profit"]].reset_index(drop=True)


def q75(t):
    import pandas as pd
    dd, it = t["date_dim"], t["item"]
    books = it[it.i_category == "Books"]
    icols = ["i_brand_id", "i_class_id", "i_category_id", "i_manufact_id"]

    def channel(sales, ret, pfx, skey, rkeys):
        m = sales.merge(books[["i_item_sk"] + icols],
                        left_on=f"{pfx}_item_sk", right_on="i_item_sk")
        m = m.merge(dd[["d_date_sk", "d_year"]],
                    left_on=f"{pfx}_sold_date_sk", right_on="d_date_sk")
        m = m.merge(ret, left_on=[skey, f"{pfx}_item_sk"],
                    right_on=[rkeys[0], rkeys[1]], how="left")
        return pd.DataFrame({
            "d_year": m.d_year,
            "i_brand_id": m.i_brand_id, "i_class_id": m.i_class_id,
            "i_category_id": m.i_category_id,
            "i_manufact_id": m.i_manufact_id,
            "sales_cnt": m[f"{pfx}_quantity"] - m[rkeys[2]].fillna(0),
            "sales_amt": (m[f"{pfx}_ext_sales_price"]
                          - m[rkeys[3]].fillna(0.0))})

    cs = channel(t["catalog_sales"], t["catalog_returns"], "cs",
                 "cs_order_number",
                 ("cr_order_number", "cr_item_sk", "cr_return_quantity",
                  "cr_return_amount"))
    ss = channel(t["store_sales"], t["store_returns"], "ss",
                 "ss_ticket_number",
                 ("sr_ticket_number", "sr_item_sk", "sr_return_quantity",
                  "sr_return_amt"))
    ws = channel(t["web_sales"], t["web_returns"], "ws",
                 "ws_order_number",
                 ("wr_order_number", "wr_item_sk", "wr_return_quantity",
                  "wr_return_amt"))
    u = pd.concat([cs, ss, ws], ignore_index=True).drop_duplicates()
    g = u.groupby(["d_year"] + icols, as_index=False).agg(
        sales_cnt=("sales_cnt", "sum"), sales_amt=("sales_amt", "sum"))
    cur = g[g.d_year == 2002]
    prev = g[g.d_year == 2001]
    m = cur.merge(prev, on=icols, suffixes=("_c", "_p"))
    m = m[m.sales_cnt_c.astype(float) / m.sales_cnt_p.astype(float) < 0.9]
    out = pd.DataFrame({
        "prev_year": m.d_year_p, "curr_year": m.d_year_c,
        "i_brand_id": m.i_brand_id, "i_class_id": m.i_class_id,
        "i_category_id": m.i_category_id,
        "i_manufact_id": m.i_manufact_id,
        "prev_yr_cnt": m.sales_cnt_p, "curr_yr_cnt": m.sales_cnt_c,
        "sales_cnt_diff": m.sales_cnt_c - m.sales_cnt_p,
        "sales_amt_diff": m.sales_amt_c - m.sales_amt_p})
    return (out.sort_values(["sales_cnt_diff", "sales_amt_diff"])
            .head(100).reset_index(drop=True))


def q71(t):
    import pandas as pd
    dd = t["date_dim"]
    dks = set(dd[(dd.d_moy == 11) & (dd.d_year == 1999)].d_date_sk)
    it = t["item"]
    items = it[it.i_manager_id == 1][["i_item_sk", "i_brand_id", "i_brand"]]
    td = t["time_dim"]
    tsel = td[td.t_meal_time.isin(["breakfast", "dinner"])][
        ["t_time_sk", "t_hour", "t_minute"]]

    def chan(s, pfx):
        f = s[s[f"{pfx}_sold_date_sk"].isin(dks)]
        return pd.DataFrame({
            "ext_price": f[f"{pfx}_ext_sales_price"],
            "sold_item_sk": f[f"{pfx}_item_sk"],
            "time_sk": f[f"{pfx}_sold_time_sk"]})

    u = pd.concat([chan(t["web_sales"], "ws"),
                   chan(t["catalog_sales"], "cs"),
                   chan(t["store_sales"], "ss")], ignore_index=True)
    m = u.merge(items, left_on="sold_item_sk", right_on="i_item_sk")
    m = m.merge(tsel, left_on="time_sk", right_on="t_time_sk")
    g = m.groupby(["i_brand", "i_brand_id", "t_hour", "t_minute"],
                  as_index=False).ext_price.sum()
    out = g[["i_brand_id", "i_brand", "t_hour", "t_minute", "ext_price"]]
    out = out.rename(columns={"i_brand_id": "brand_id", "i_brand": "brand"})
    return (out.sort_values(
        ["ext_price", "brand_id", "t_hour", "t_minute"],
        ascending=[False, True, True, True]).reset_index(drop=True))


def q24(t):
    import pandas as pd
    ss, sr = t["store_sales"], t["store_returns"]
    st = t["store"][t["store"].s_market_id <= 5]
    m = ss.merge(sr, left_on=["ss_ticket_number", "ss_item_sk"],
                 right_on=["sr_ticket_number", "sr_item_sk"])
    m = m.merge(t["customer"], left_on="ss_customer_sk",
                right_on="c_customer_sk")
    m = m.merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk")
    m = m.merge(st, left_on="ss_store_sk", right_on="s_store_sk")
    m = m.merge(t["customer_address"], left_on="c_current_addr_sk",
                right_on="ca_address_sk")
    m = m[m.c_birth_country != m.ca_country.str.upper()]
    ssales = m.groupby(
        ["c_last_name", "c_first_name", "s_store_name", "ca_state",
         "s_state", "i_color", "i_current_price", "i_manager_id",
         "i_units", "i_size"], as_index=False).ss_net_paid.sum() \
        .rename(columns={"ss_net_paid": "netpaid"})
    thr = 0.05 * ssales.netpaid.mean()
    red = ssales[ssales.i_color == "red"]
    g = red.groupby(["c_last_name", "c_first_name", "s_store_name"],
                    as_index=False).netpaid.sum() \
        .rename(columns={"netpaid": "paid"})
    g = g[g.paid > thr]
    return (g.sort_values(["c_last_name", "c_first_name", "s_store_name"])
            .reset_index(drop=True))


def q49(t):
    import pandas as pd
    dd = t["date_dim"]
    dks = set(dd[(dd.d_year == 2001) & (dd.d_moy == 12)].d_date_sk)

    def chan2(name, sales, ret, pfx, rfx, skey, rkey, ramt):
        m = sales.merge(ret, left_on=[skey, f"{pfx}_item_sk"],
                        right_on=[rkey, f"{rfx}_item_sk"], how="left")
        m = m[(m[ramt] > 100) & (m[f"{pfx}_net_profit"] > 1)
              & (m[f"{pfx}_net_paid"] > 0) & (m[f"{pfx}_quantity"] > 0)
              & m[f"{pfx}_sold_date_sk"].isin(dks)]
        g = m.groupby(f"{pfx}_item_sk").apply(
            lambda d: pd.Series({
                "return_ratio": d[f"{rfx}_return_quantity"].fillna(0).sum()
                / d[f"{pfx}_quantity"].fillna(0).sum(),
                "currency_ratio": d[ramt].fillna(0).sum()
                / d[f"{pfx}_net_paid"].fillna(0).sum()}),
            include_groups=False).reset_index() \
            .rename(columns={f"{pfx}_item_sk": "item"})
        g["return_rank"] = g.return_ratio.rank(method="min").astype(int)
        g["currency_rank"] = g.currency_ratio.rank(method="min").astype(int)
        g = g[(g.return_rank <= 10) | (g.currency_rank <= 10)]
        g["channel"] = name
        return g[["channel", "item", "return_ratio", "return_rank",
                  "currency_rank"]]

    u = pd.concat([
        chan2("web", t["web_sales"], t["web_returns"], "ws", "wr",
              "ws_order_number", "wr_order_number", "wr_return_amt"),
        chan2("catalog", t["catalog_sales"], t["catalog_returns"],
              "cs", "cr", "cs_order_number", "cr_order_number",
              "cr_return_amount"),
        chan2("store", t["store_sales"], t["store_returns"], "ss", "sr",
              "ss_ticket_number", "sr_ticket_number", "sr_return_amt"),
    ], ignore_index=True).drop_duplicates()
    return (u.sort_values(["channel", "return_rank", "currency_rank",
                           "item"]).head(100).reset_index(drop=True))


def q67(t):
    import numpy as np
    import pandas as pd
    dd = t["date_dim"]
    dsel = dd[(dd.d_month_seq >= 24) & (dd.d_month_seq <= 35)]
    m = t["store_sales"].merge(
        dsel[["d_date_sk", "d_year", "d_qoy", "d_moy"]],
        left_on="ss_sold_date_sk", right_on="d_date_sk")
    m = m.merge(t["store"][["s_store_sk", "s_store_id"]],
                left_on="ss_store_sk", right_on="s_store_sk")
    m = m.merge(t["item"][["i_item_sk", "i_category", "i_class",
                           "i_brand", "i_product_name"]],
                left_on="ss_item_sk", right_on="i_item_sk")
    m["v"] = (m.ss_sales_price * m.ss_quantity).fillna(0.0)
    gcols = ["i_category", "i_class", "i_brand", "i_product_name",
             "d_year", "d_qoy", "d_moy", "s_store_id"]
    frames = []
    for k in range(len(gcols), -1, -1):
        keep = gcols[:k]
        if keep:
            g = m.groupby(keep, as_index=False, dropna=False).v.sum()
        else:
            g = pd.DataFrame({"v": [m.v.sum()]})
        for c in gcols[k:]:
            g[c] = None
        frames.append(g[gcols + ["v"]])
    dw1 = pd.concat(frames, ignore_index=True) \
        .rename(columns={"v": "sumsales"})
    # rank() over (partition by i_category order by sumsales desc);
    # the NULL category from rollup forms its own partition
    key = dw1.i_category.fillna("\x00null")
    dw1["rk"] = dw1.groupby(key).sumsales.rank(
        method="min", ascending=False).astype(int)
    out = dw1[dw1.rk <= 100]
    out = out.sort_values(gcols + ["sumsales", "rk"],
                          na_position="last").head(100)
    return out.reset_index(drop=True)


def q14(t):
    import pandas as pd
    dd, it = t["date_dim"], t["item"]
    d3y = set(dd[(dd.d_year >= 1999) & (dd.d_year <= 2001)].d_date_sk)
    icols = ["i_brand_id", "i_class_id", "i_category_id"]

    def sold_ids(sales, pfx):
        m = sales[sales[f"{pfx}_sold_date_sk"].isin(d3y)].merge(
            it, left_on=f"{pfx}_item_sk", right_on="i_item_sk")
        return set(map(tuple, m[icols].drop_duplicates().values))

    common = (sold_ids(t["store_sales"], "ss")
              & sold_ids(t["catalog_sales"], "cs")
              & sold_ids(t["web_sales"], "ws"))
    cross = set(it[[tuple(r) in common
                    for r in it[icols].values]].i_item_sk)

    def avg_chan(sales, pfx):
        f = sales[sales[f"{pfx}_sold_date_sk"].isin(d3y)]
        return f[f"{pfx}_quantity"] * f[f"{pfx}_list_price"]

    avg_sales = pd.concat([avg_chan(t["store_sales"], "ss"),
                           avg_chan(t["catalog_sales"], "cs"),
                           avg_chan(t["web_sales"], "ws")]).mean()
    dmon = set(dd[(dd.d_year == 2001) & (dd.d_moy == 11)].d_date_sk)

    def chan(name, sales, pfx):
        f = sales[sales[f"{pfx}_item_sk"].isin(cross)
                  & sales[f"{pfx}_sold_date_sk"].isin(dmon)]
        m = f.merge(it, left_on=f"{pfx}_item_sk", right_on="i_item_sk")
        m["v"] = m[f"{pfx}_quantity"] * m[f"{pfx}_list_price"]
        g = m.groupby(icols, as_index=False).agg(
            sales=("v", "sum"), number_sales=("v", "size"))
        g = g[g.sales > avg_sales]
        g["channel"] = name
        return g

    y = pd.concat([chan("store", t["store_sales"], "ss"),
                   chan("catalog", t["catalog_sales"], "cs"),
                   chan("web", t["web_sales"], "ws")], ignore_index=True)
    gcols = ["channel"] + icols
    frames = []
    for k in range(len(gcols), -1, -1):
        keep = gcols[:k]
        if keep:
            g = y.groupby(keep, as_index=False, dropna=False).agg(
                sales=("sales", "sum"),
                number_sales=("number_sales", "sum"))
        else:
            g = pd.DataFrame({"sales": [y.sales.sum()],
                              "number_sales": [y.number_sales.sum()]})
        for c in gcols[k:]:
            g[c] = None
        frames.append(g[gcols + ["sales", "number_sales"]])
    out = pd.concat(frames, ignore_index=True)
    if not len(y):
        out = out.iloc[0:0]
    out = out.sort_values(gcols, na_position="last").head(100)
    return out.reset_index(drop=True)


def _collect_refs():
    """qN oracle registry, collected at import end so additions below
    earlier definitions are picked up automatically."""
    import re
    out = {}
    for k, v in globals().items():
        m = re.fullmatch(r"q(\d+)", k)
        if m and callable(v):
            out[int(m.group(1))] = v
    return out


REFS = _collect_refs()
