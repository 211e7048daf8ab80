"""TPC-DS query subset (non-window queries over the generated tables).

Equivalent role to the reference's TPC-DS suite (liquid-cache
`benchmark/tpcds/manifest.json`, `tpcds_client.rs`; the reference mutes
several queries for upstream DataFusion bugs, `tpcds_notes.md`).  This
subset covers the star-join/filter/aggregate shapes of the official
queries q3 q7 q13 q19 q26 q42 q43 q52 q55 q73 q90 q93 q96 with the
official parameter style; window-function queries are out of dialect
scope (documented gap).
"""

QUERIES = {
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
