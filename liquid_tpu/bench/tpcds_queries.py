"""TPC-DS query subset over the generated tables.

Equivalent role to the reference's TPC-DS suite (liquid-cache
`benchmark/tpcds/manifest.json`, `tpcds_client.rs`; the reference mutes
several queries for upstream DataFusion bugs, `tpcds_notes.md`).  This
subset covers the star-join/filter/aggregate shapes of the official
queries q3 q7 q13 q19 q26 q42 q43 q52 q55 q73 q90 q93 q96 plus the
window-function queries q12 q20 q47 q51 q98 (ratio-over-class,
rank-over-monthly-sales with lag/lead self-joins, cumulative full-outer
comparison), all in the official parameter style.
"""

QUERIES = {
    18: """
select i_item_id, ca_country, ca_state, ca_county,
    avg(cs_quantity) as agg1, avg(cs_list_price) as agg2,
    avg(cs_coupon_amt) as agg3, avg(cs_sales_price) as agg4,
    avg(cs_net_profit) as agg5, avg(c_birth_year) as agg6,
    avg(cd1.cd_dep_count) as agg7
from catalog_sales, customer_demographics cd1,
     customer_demographics cd2, customer, customer_address,
     date_dim, item
where cs_sold_date_sk = d_date_sk
    and cs_item_sk = i_item_sk
    and cs_cdemo_sk = cd1.cd_demo_sk
    and cs_customer_sk = c_customer_sk
    and cd1.cd_gender = 'F'
    and cd1.cd_education_status = 'Unknown'
    and c_current_cdemo_sk = cd2.cd_demo_sk
    and c_current_addr_sk = ca_address_sk
    and c_birth_month in (1, 6, 8, 9, 12, 2)
    and d_year = 1998
    and ca_state in ('MS', 'IN', 'ND', 'OK', 'NM', 'VA', 'MI')
group by rollup(i_item_id, ca_country, ca_state, ca_county)
order by ca_country nulls first, ca_state nulls first,
    ca_county nulls first, i_item_id nulls first
limit 100
""",
    22: """
select i_product_name, i_brand, i_class, i_category,
    avg(inv_quantity_on_hand) as qoh
from inventory, date_dim, item
where inv_date_sk = d_date_sk
    and inv_item_sk = i_item_sk
    and d_month_seq between 24 and 35
group by rollup(i_product_name, i_brand, i_class, i_category)
order by qoh, i_product_name nulls first, i_brand nulls first,
    i_class nulls first, i_category nulls first
limit 100
""",
    27: """
select i_item_id, s_state, grouping(s_state) as g_state,
    avg(ss_quantity) as agg1, avg(ss_list_price) as agg2,
    avg(ss_coupon_amt) as agg3, avg(ss_sales_price) as agg4
from store_sales, customer_demographics, date_dim, store, item
where ss_sold_date_sk = d_date_sk
    and ss_item_sk = i_item_sk
    and ss_store_sk = s_store_sk
    and ss_cdemo_sk = cd_demo_sk
    and cd_gender = 'M'
    and cd_marital_status = 'S'
    and cd_education_status = 'College'
    and d_year = 2002
    and s_state in ('AL', 'CA', 'GA', 'IL', 'IN', 'KS')
group by rollup(i_item_id, s_state)
order by i_item_id nulls first, s_state nulls first
limit 100
""",
    36: """
select sum(ss_net_profit) / sum(ss_ext_sales_price) as gross_margin,
    i_category, i_class,
    grouping(i_category) + grouping(i_class) as lochierarchy,
    rank() over (partition by grouping(i_category) + grouping(i_class),
        case when grouping(i_class) = 0 then i_category end
        order by sum(ss_net_profit) / sum(ss_ext_sales_price) asc)
        as rank_within_parent
from store_sales, date_dim d1, item, store
where d1.d_year = 2001
    and d1.d_date_sk = ss_sold_date_sk
    and i_item_sk = ss_item_sk
    and s_store_sk = ss_store_sk
    and s_state in ('AL', 'CA', 'GA', 'IL', 'IN', 'KS')
group by rollup(i_category, i_class)
order by lochierarchy desc,
    case when lochierarchy = 0 then i_category end nulls first,
    rank_within_parent
limit 100
""",
    86: """
select sum(ws_net_paid) as total_sum, i_category, i_class,
    grouping(i_category) + grouping(i_class) as lochierarchy,
    rank() over (partition by grouping(i_category) + grouping(i_class),
        case when grouping(i_class) = 0 then i_category end
        order by sum(ws_net_paid) desc) as rank_within_parent
from web_sales, date_dim d1, item
where d1.d_month_seq between 24 and 35
    and d1.d_date_sk = ws_sold_date_sk
    and i_item_sk = ws_item_sk
group by rollup(i_category, i_class)
order by lochierarchy desc,
    case when lochierarchy = 0 then i_category end nulls first,
    rank_within_parent
limit 100
""",
    12: """
select i_item_id, i_item_desc, i_category, i_class, i_current_price,
    sum(ws_ext_sales_price) as itemrevenue,
    sum(ws_ext_sales_price) * 100 /
        sum(sum(ws_ext_sales_price)) over (partition by i_class)
        as revenueratio
from web_sales, item, date_dim
where ws_item_sk = i_item_sk
    and i_category in ('Sports', 'Books', 'Home')
    and ws_sold_date_sk = d_date_sk
    and d_date between cast('1999-02-22' as date)
        and (cast('1999-02-22' as date) + interval '30' day)
group by i_item_id, i_item_desc, i_category, i_class, i_current_price
order by i_category, i_class, i_item_id, i_item_desc, revenueratio
limit 100
""",
    20: """
select i_item_id, i_item_desc, i_category, i_class, i_current_price,
    sum(cs_ext_sales_price) as itemrevenue,
    sum(cs_ext_sales_price) * 100 /
        sum(sum(cs_ext_sales_price)) over (partition by i_class)
        as revenueratio
from catalog_sales, item, date_dim
where cs_item_sk = i_item_sk
    and i_category in ('Sports', 'Books', 'Home')
    and cs_sold_date_sk = d_date_sk
    and d_date between cast('1999-02-22' as date)
        and (cast('1999-02-22' as date) + interval '30' day)
group by i_item_id, i_item_desc, i_category, i_class, i_current_price
order by i_category, i_class, i_item_id, i_item_desc, revenueratio
limit 100
""",
    47: """
with v1 as (
    select i_category, i_brand, s_store_name, s_company_name,
        d_year, d_moy, sum(ss_sales_price) as sum_sales,
        avg(sum(ss_sales_price)) over (partition by i_category, i_brand,
            s_store_name, s_company_name, d_year) as avg_monthly_sales,
        rank() over (partition by i_category, i_brand, s_store_name,
            s_company_name order by d_year, d_moy) as rn
    from item, store_sales, date_dim, store
    where ss_item_sk = i_item_sk
        and ss_sold_date_sk = d_date_sk
        and ss_store_sk = s_store_sk
        and (d_year = 1999
             or (d_year = 1998 and d_moy = 12)
             or (d_year = 2000 and d_moy = 1))
    group by i_category, i_brand, s_store_name, s_company_name,
        d_year, d_moy),
v2 as (
    select v1.i_category as i_category, v1.s_store_name as s_store_name,
        v1.s_company_name as s_company_name, v1.d_year as d_year,
        v1.d_moy as d_moy, v1.avg_monthly_sales as avg_monthly_sales,
        v1.sum_sales as sum_sales,
        v1_lag.sum_sales as psum, v1_lead.sum_sales as nsum
    from v1, v1 v1_lag, v1 v1_lead
    where v1.i_category = v1_lag.i_category
        and v1.i_brand = v1_lag.i_brand
        and v1.s_store_name = v1_lag.s_store_name
        and v1.s_company_name = v1_lag.s_company_name
        and v1.rn = v1_lag.rn + 1
        and v1.i_category = v1_lead.i_category
        and v1.i_brand = v1_lead.i_brand
        and v1.s_store_name = v1_lead.s_store_name
        and v1.s_company_name = v1_lead.s_company_name
        and v1.rn = v1_lead.rn - 1)
select * from v2
where d_year = 1999
    and avg_monthly_sales > 0
    and abs(sum_sales - avg_monthly_sales) / avg_monthly_sales > 0.1
order by sum_sales - avg_monthly_sales, s_store_name, d_moy
limit 100
""",
    51: """
with web_v1 as (
    select ws_item_sk as item_sk, d_date,
        sum(sum(ws_sales_price)) over (partition by ws_item_sk
            order by d_date rows between unbounded preceding
            and current row) as cume_sales
    from web_sales, date_dim
    where ws_sold_date_sk = d_date_sk
        and d_month_seq between 24 and 27
        and ws_item_sk is not null
    group by ws_item_sk, d_date),
store_v1 as (
    select ss_item_sk as item_sk, d_date,
        sum(sum(ss_sales_price)) over (partition by ss_item_sk
            order by d_date rows between unbounded preceding
            and current row) as cume_sales
    from store_sales, date_dim
    where ss_sold_date_sk = d_date_sk
        and d_month_seq between 24 and 27
        and ss_item_sk is not null
    group by ss_item_sk, d_date)
select * from (
    select item_sk, d_date, web_sales, store_sales,
        max(web_sales) over (partition by item_sk order by d_date
            rows between unbounded preceding and current row)
            as web_cumulative,
        max(store_sales) over (partition by item_sk order by d_date
            rows between unbounded preceding and current row)
            as store_cumulative
    from (
        select case when web.item_sk is not null then web.item_sk
                    else store.item_sk end as item_sk,
            case when web.d_date is not null then web.d_date
                 else store.d_date end as d_date,
            web.cume_sales as web_sales,
            store.cume_sales as store_sales
        from web_v1 web full outer join store_v1 store
            on (web.item_sk = store.item_sk and web.d_date = store.d_date)
        ) x ) y
where web_cumulative > store_cumulative
order by item_sk, d_date
limit 100
""",
    98: """
select i_item_id, i_item_desc, i_category, i_class, i_current_price,
    sum(ss_ext_sales_price) as itemrevenue,
    sum(ss_ext_sales_price) * 100 /
        sum(sum(ss_ext_sales_price)) over (partition by i_class)
        as revenueratio
from store_sales, item, date_dim
where ss_item_sk = i_item_sk
    and i_category in ('Sports', 'Books', 'Home')
    and ss_sold_date_sk = d_date_sk
    and d_date between cast('1999-02-22' as date)
        and (cast('1999-02-22' as date) + interval '30' day)
group by i_item_id, i_item_desc, i_category, i_class, i_current_price
order by i_category, i_class, i_item_id, i_item_desc, revenueratio
""",
    3: """
select d_year, i_brand_id as brand_id, i_brand as brand,
    sum(ss_ext_sales_price) as sum_agg
from date_dim dt, store_sales, item
where dt.d_date_sk = store_sales.ss_sold_date_sk
    and store_sales.ss_item_sk = item.i_item_sk
    and item.i_manufact_id = 128
    and dt.d_moy = 11
group by d_year, i_brand_id, i_brand
order by d_year, sum_agg desc, brand_id
limit 100
""",
    7: """
select i_item_id, avg(ss_quantity) as agg1, avg(ss_list_price) as agg2,
    avg(ss_coupon_amt) as agg3, avg(ss_sales_price) as agg4
from store_sales, customer_demographics, date_dim, item, promotion
where ss_sold_date_sk = d_date_sk
    and ss_item_sk = i_item_sk
    and ss_cdemo_sk = cd_demo_sk
    and ss_promo_sk = p_promo_sk
    and cd_gender = 'M'
    and cd_marital_status = 'S'
    and cd_education_status = 'College'
    and (p_channel_email = 'N' or p_channel_event = 'N')
    and d_year = 2000
group by i_item_id
order by i_item_id
limit 100
""",
    13: """
select avg(ss_quantity) as a1, avg(ss_ext_sales_price) as a2,
    avg(ss_ext_wholesale_cost) as a3, sum(ss_ext_wholesale_cost) as a4
from store_sales, store, customer_demographics,
     household_demographics, customer_address, date_dim
where s_store_sk = ss_store_sk
    and ss_sold_date_sk = d_date_sk and d_year = 2001
    and ((ss_hdemo_sk = hd_demo_sk
        and cd_demo_sk = ss_cdemo_sk
        and cd_marital_status = 'M'
        and cd_education_status = 'Advanced Degree'
        and ss_sales_price between 100.00 and 150.00
        and hd_dep_count = 3)
    or (ss_hdemo_sk = hd_demo_sk
        and cd_demo_sk = ss_cdemo_sk
        and cd_marital_status = 'S'
        and cd_education_status = 'College'
        and ss_sales_price between 50.00 and 100.00
        and hd_dep_count = 1)
    or (ss_hdemo_sk = hd_demo_sk
        and cd_demo_sk = ss_cdemo_sk
        and cd_marital_status = 'W'
        and cd_education_status = '2 yr Degree'
        and ss_sales_price between 150.00 and 200.00
        and hd_dep_count = 1))
    and ((ss_addr_sk = ca_address_sk
        and ca_country = 'United States'
        and ca_state in ('TX', 'OH', 'TX')
        and ss_net_profit between 100 and 200)
    or (ss_addr_sk = ca_address_sk
        and ca_country = 'United States'
        and ca_state in ('OR', 'NM', 'KY')
        and ss_net_profit between 150 and 300)
    or (ss_addr_sk = ca_address_sk
        and ca_country = 'United States'
        and ca_state in ('VA', 'TX', 'MS')
        and ss_net_profit between 50 and 250))
""",
    19: """
select i_brand_id as brand_id, i_brand as brand, i_manufact_id,
    sum(ss_ext_sales_price) as ext_price
from date_dim, store_sales, item, customer, customer_address, store
where d_date_sk = ss_sold_date_sk
    and ss_item_sk = i_item_sk
    and i_manager_id = 8
    and d_moy = 11
    and d_year = 1998
    and ss_customer_sk = c_customer_sk
    and c_current_addr_sk = ca_address_sk
    and ss_store_sk = s_store_sk
    and substring(ca_zip, 1, 5) <> substring(s_city, 1, 5)
group by i_brand_id, i_brand, i_manufact_id
order by ext_price desc, brand_id, i_manufact_id
limit 100
""",
    26: """
select i_item_id, avg(cs_quantity) as agg1, avg(cs_list_price) as agg2,
    avg(cs_coupon_amt) as agg3, avg(cs_sales_price) as agg4
from catalog_sales, customer_demographics, date_dim, item, promotion
where cs_sold_date_sk = d_date_sk
    and cs_item_sk = i_item_sk
    and cs_cdemo_sk = cd_demo_sk
    and cs_promo_sk = p_promo_sk
    and cd_gender = 'M'
    and cd_marital_status = 'S'
    and cd_education_status = 'College'
    and (p_channel_email = 'N' or p_channel_event = 'N')
    and d_year = 2000
group by i_item_id
order by i_item_id
limit 100
""",
    42: """
select d_year, i_category, sum(ss_ext_sales_price) as total_sales
from date_dim dt, store_sales, item
where dt.d_date_sk = store_sales.ss_sold_date_sk
    and store_sales.ss_item_sk = item.i_item_sk
    and item.i_manager_id = 1
    and dt.d_moy = 11
    and dt.d_year = 2000
group by d_year, i_category
order by total_sales desc, d_year, i_category
limit 100
""",
    43: """
select s_store_name, s_store_id,
    sum(case when d_day_name = 'Sunday' then ss_sales_price else null end)
        as sun_sales,
    sum(case when d_day_name = 'Monday' then ss_sales_price else null end)
        as mon_sales,
    sum(case when d_day_name = 'Friday' then ss_sales_price else null end)
        as fri_sales,
    sum(case when d_day_name = 'Saturday' then ss_sales_price else null end)
        as sat_sales
from date_dim, store_sales, store
where d_date_sk = ss_sold_date_sk
    and s_store_sk = ss_store_sk
    and s_gmt_offset = -5
    and d_year = 2000
group by s_store_name, s_store_id
order by s_store_name, s_store_id
limit 100
""",
    52: """
select d_year, i_brand_id as brand_id, i_brand as brand,
    sum(ss_ext_sales_price) as ext_price
from date_dim dt, store_sales, item
where dt.d_date_sk = store_sales.ss_sold_date_sk
    and store_sales.ss_item_sk = item.i_item_sk
    and item.i_manager_id = 1
    and dt.d_moy = 11
    and dt.d_year = 2000
group by d_year, i_brand_id, i_brand
order by d_year, ext_price desc, brand_id
limit 100
""",
    55: """
select i_brand_id as brand_id, i_brand as brand,
    sum(ss_ext_sales_price) as ext_price
from date_dim, store_sales, item
where d_date_sk = ss_sold_date_sk
    and ss_item_sk = i_item_sk
    and i_manager_id = 28
    and d_moy = 11
    and d_year = 1999
group by i_brand_id, i_brand
order by ext_price desc, brand_id
limit 100
""",
    73: """
select c_last_name, c_first_name, c_customer_sk as c_salutation,
    ss_ticket_number, cnt
from (
    select ss_ticket_number, ss_customer_sk, count(*) as cnt
    from store_sales, date_dim, store, household_demographics
    where store_sales.ss_sold_date_sk = date_dim.d_date_sk
        and store_sales.ss_store_sk = store.s_store_sk
        and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        and date_dim.d_dom between 1 and 2
        and (household_demographics.hd_buy_potential = '>10000'
            or household_demographics.hd_buy_potential = 'Unknown')
        and household_demographics.hd_vehicle_count > 0
        and date_dim.d_year in (1999, 2000, 2001)
        and store.s_county in ('Williamson County', 'Franklin County',
                               'Bronx County', 'Orange County')
    group by ss_ticket_number, ss_customer_sk
) as dj, customer
where ss_customer_sk = c_customer_sk and cnt between 1 and 5
order by cnt desc, c_last_name asc, ss_ticket_number
limit 1000
""",
    90: """
select cast(amc as double) / cast(pmc as double) as am_pm_ratio
from (select count(*) as amc from web_sales, household_demographics,
        time_dim
    where ws_sold_time_sk = time_dim.t_time_sk
        and ws_hdemo_sk = household_demographics.hd_demo_sk
        and time_dim.t_hour between 8 and 9
        and household_demographics.hd_dep_count = 6) as at,
    (select count(*) as pmc from web_sales, household_demographics,
        time_dim
    where ws_sold_time_sk = time_dim.t_time_sk
        and ws_hdemo_sk = household_demographics.hd_demo_sk
        and time_dim.t_hour between 19 and 20
        and household_demographics.hd_dep_count = 6) as pt
order by am_pm_ratio
limit 100
""",
    93: """
select ss_customer_sk, sum(act_sales) as sumsales
from (
    select ss_customer_sk,
        case when sr_return_quantity is not null
            then (ss_quantity - sr_return_quantity) * ss_sales_price
            else ss_quantity * ss_sales_price end as act_sales
    from store_sales left outer join store_returns
        on (sr_item_sk = ss_item_sk and sr_ticket_number = ss_ticket_number)
) as t
group by ss_customer_sk
order by sumsales desc, ss_customer_sk
limit 100
""",
    97: """
with ssci as (
    select ss_customer_sk as customer_sk, ss_item_sk as item_sk
    from store_sales, date_dim
    where ss_sold_date_sk = d_date_sk and d_month_seq between 24 and 35
    group by ss_customer_sk, ss_item_sk),
csci as (
    select cs_customer_sk as customer_sk, cs_item_sk as item_sk
    from catalog_sales, date_dim
    where cs_sold_date_sk = d_date_sk and d_month_seq between 24 and 35
    group by cs_customer_sk, cs_item_sk)
select
    sum(case when ssci.customer_sk is not null and csci.customer_sk is null
        then 1 else 0 end) as store_only,
    sum(case when ssci.customer_sk is null and csci.customer_sk is not null
        then 1 else 0 end) as catalog_only,
    sum(case when ssci.customer_sk is not null
        and csci.customer_sk is not null then 1 else 0 end)
        as store_and_catalog
from ssci full outer join csci on (ssci.customer_sk = csci.customer_sk
    and ssci.item_sk = csci.item_sk)
limit 100
""",
    96: """
select count(*) as cnt
from store_sales, household_demographics, time_dim, store
where ss_sold_time_sk = time_dim.t_time_sk
    and ss_hdemo_sk = household_demographics.hd_demo_sk
    and ss_store_sk = s_store_sk
    and time_dim.t_hour = 20
    and time_dim.t_minute >= 30
    and household_demographics.hd_dep_count = 7
    and store.s_store_name = 'store a'
order by cnt
limit 100
""",
}
