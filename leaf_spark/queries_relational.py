"""Relational-surface cases (SURVEY §2.B table: scan/filter/join/agg/
distinct/set-ops/sort-limit-offset/window/CTE/subqueries/recursive-CTE).

The reference delegates all of this to SQLite's planner; here Catalyst plans
it. Numeric aggregates use the decimal-sum pattern (see queries.py docstring)
so partition-parallel sums are order-independent and hash-match DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .queries import register, sql_case
from .session import load_tables

# --- q01: TPC-H Q1-style pricing summary (scan+filter+agg, the flagship) ----
_Q01_SPARK = """
select
  l_returnflag,
  l_linestatus,
  cast(sum(cast(l_quantity as decimal(38,6))) as double) as sum_qty,
  cast(sum(cast(l_extendedprice as decimal(38,6))) as double) as sum_base_price,
  cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(38,6))) as double) as sum_disc_price,
  cast(sum(cast(l_extendedprice * (1 - l_discount) * (1 + l_tax) as decimal(38,6))) as double) as sum_charge,
  cast(sum(cast(l_quantity as decimal(38,6))) as double) / count(*) as avg_qty,
  cast(sum(cast(l_discount as decimal(38,6))) as double) / count(*) as avg_disc,
  count(*) as count_order
from lineitem
where l_shipdate <= timestamp '1998-09-02 00:00:00'
group by l_returnflag, l_linestatus
"""
sql_case(
    "q01_pricing_summary",
    _Q01_SPARK,
    _Q01_SPARK,  # dialect overlap: identical ANSI text runs on DuckDB
    doc="scan+filter+aggregate; SURVEY 2.B aggregation row",
)

# --- q02: filter + projection + LIKE/IN/BETWEEN --------------------------------
_Q02 = """
select
  o_orderkey,
  upper(o_orderstatus) as status_u,
  o_totalprice,
  o_orderpriority
from orders
where o_totalprice between 100000 and 200000
  and o_orderpriority like '%URGENT%'
  and o_orderstatus in ('O', 'F')
"""
sql_case("q02_filter_project", _Q02, _Q02, doc="filter incl. LIKE/IN/BETWEEN; projection")

# --- q03: multi-join + aggregate (broadcast-able dims) ------------------------


@register(
    "q03_revenue_by_nation",
    """
    select n_name,
           count(*) as n_orders,
           cast(sum(cast(o_totalprice as decimal(38,6))) as double) as revenue
    from orders
    join customer on o_custkey = c_custkey
    join nation on c_nationkey = n_nationkey
    join region on n_regionkey = r_regionkey
    where r_name = 'ASIA'
    group by n_name
    """,
    doc="3-way join + agg; dims broadcast (SURVEY 2.B joins row)",
)
def q03_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, names=("region", "nation", "customer", "part", "orders", "lineitem"))
    # Explicit broadcast hints: nation/region/customer are dimension-sized;
    # at 100 TB the only shuffle here should be the orders-side aggregation.
    return (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("revenue"),
        )
    )


# --- q04: left join + null-aware count ---------------------------------------
_Q04 = """
select c_mktsegment,
       count(*) as n_customers,
       count(o_orderkey) as n_orders
from customer
left join orders on o_custkey = c_custkey
group by c_mktsegment
"""
sql_case("q04_left_join", _Q04, _Q04, doc="left outer join; count(col) null semantics")

# --- q05/q06: semi + anti joins ----------------------------------------------
_Q05 = """
select c_mktsegment, count(*) as n_big_spenders
from customer
where exists (
  select 1 from orders
  where o_custkey = c_custkey and o_totalprice > 250000
)
group by c_mktsegment
"""
sql_case("q05_semi_join", _Q05, _Q05, doc="EXISTS → left-semi join")

_Q06 = """
select c_mktsegment, count(*) as n_no_orders
from customer
where not exists (select 1 from orders where o_custkey = c_custkey)
group by c_mktsegment
"""
sql_case("q06_anti_join", _Q06, _Q06, doc="NOT EXISTS → left-anti join")

# --- q07: distinct ------------------------------------------------------------
_Q07 = """
select distinct o_orderstatus, o_orderpriority
from orders
"""
sql_case("q07_distinct", _Q07, _Q07, doc="SELECT DISTINCT")

# --- q08: set operations ------------------------------------------------------
_Q08 = """
select p_brand as brand from part where p_size > 40
union
select p_brand from part where p_retailprice > 1800
intersect
select p_brand from part where p_size <= 50
except
select p_brand from part where p_name like '%azure%' and p_size = 1 and p_retailprice < 0
"""
sql_case("q08_set_ops", _Q08, _Q08, doc="UNION / INTERSECT / EXCEPT")

# --- q09: order by + limit + offset (total order: unique tiebreak) -----------
_Q09 = """
select p_partkey, p_name, p_retailprice
from part
order by p_retailprice desc, p_partkey
limit 50 offset 10
"""
sql_case("q09_order_limit_offset", _Q09, _Q09, doc="ORDER BY ... LIMIT ... OFFSET")

# --- q10: group by + having ---------------------------------------------------
_Q10 = """
select o_custkey, count(*) as n_orders,
       cast(sum(cast(o_totalprice as decimal(38,6))) as double) as spend
from orders
group by o_custkey
having count(*) >= 5
"""
sql_case("q10_having", _Q10, _Q10, doc="HAVING post-aggregate filter")

# --- q11: window ranking (top-3 orders per customer) --------------------------
_Q11 = """
select o_custkey, o_orderkey, o_totalprice, rk
from (
  select o_custkey, o_orderkey, o_totalprice,
         row_number() over (
           partition by o_custkey
           order by o_totalprice desc, o_orderkey
         ) as rk
  from orders
) t
where rk <= 3
"""
sql_case("q11_window_topk", _Q11, _Q11, doc="row_number window; top-k per group")

# --- q12: running aggregate window -------------------------------------------
_Q12 = """
select o_custkey, o_orderkey,
       cast(sum(cast(o_totalprice as decimal(38,6))) over (
         partition by o_custkey
         order by o_orderdate, o_orderkey
         rows between unbounded preceding and current row
       ) as double) as running_spend
from orders
where o_custkey < 100
"""
sql_case("q12_window_running", _Q12, _Q12, doc="running-sum window frame")

# --- q13: CTE ----------------------------------------------------------------
_Q13 = """
with cust_spend as (
  select o_custkey, cast(sum(cast(o_totalprice as decimal(38,6))) as double) as spend
  from orders group by o_custkey
)
select c_mktsegment,
       count(*) as n,
       cast(sum(cast(spend as decimal(38,6))) as double) as segment_spend
from cust_spend
join customer on c_custkey = o_custkey
group by c_mktsegment
"""
sql_case("q13_cte", _Q13, _Q13, doc="WITH common table expression")

# --- q14: scalar subquery ----------------------------------------------------
_Q14 = """
select count(*) as n_above_avg
from orders
where o_totalprice > (select cast(sum(cast(o_totalprice as decimal(38,6))) as double)
                             / count(*) from orders)
"""
sql_case("q14_scalar_subquery", _Q14, _Q14, doc="uncorrelated scalar subquery")

# --- q15: correlated subquery ------------------------------------------------
_Q15 = """
select l_orderkey, l_linenumber, l_quantity
from lineitem l1
where l_quantity > 2 * (
  select cast(sum(cast(l_quantity as decimal(38,6))) as double) / count(*)
  from lineitem l2 where l2.l_orderkey = l1.l_orderkey
)
"""
# Spark side (r12): the same per-orderkey mean as a window — Catalyst's
# decorrelation planned aggregate + join, which SCANS lineitem twice (the
# second scan broadcast/shuffled back onto the first); the window form is
# one scan + one exchange + sort, measured 2× faster at sf0.1 and strictly
# less I/O at scale. Arithmetic is expression-identical (decimal(38,6) sum
# → double, / count, × 2 comparison), verified row-identical at all SFs;
# the DuckDB oracle keeps the correlated-subquery text.
_Q15_SPARK = """
select l_orderkey, l_linenumber, l_quantity
from (
  select l_orderkey, l_linenumber, l_quantity,
         cast(sum(cast(l_quantity as decimal(38,6)))
              over (partition by l_orderkey) as double)
           / count(*) over (partition by l_orderkey) as avg_q
  from lineitem
)
where l_quantity > 2 * avg_q
"""
sql_case(
    "q15_correlated_subquery",
    _Q15_SPARK,
    _Q15,
    doc="correlated scalar subquery (Spark: single-pass window form; "
    "oracle: the correlated subquery itself)",
)

# --- q16: cross join (small × small) -----------------------------------------
_Q16 = """
select r1.r_name as region_a, r2.r_name as region_b
from region r1 cross join region r2
where r1.r_regionkey < r2.r_regionkey
"""
sql_case("q16_cross_join", _Q16, _Q16, doc="CROSS JOIN")

# --- q17: recursive CTE — Spark lacks WITH RECURSIVE → iterative fixpoint ----


_Q17 = """
    with recursive seq(n) as (
      select 1
      union all
      select n + 1 from seq where n < 16
    )
    select n, count(o_orderkey) as n_orders
    from seq left join orders on (o_orderkey % 16) + 1 = n
    group by n
    """


@register(
    "q17_recursive_cte",
    _Q17,
    doc="WITH RECURSIVE in SQL text, routed to the driver-side fixpoint "
    "operator by DmlExecutor (SURVEY 2.B CTE gap; reference authorizer "
    "action Recursive, leaf-stream/src/lib.rs:1024)",
)
def q17_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dml import run_sql

    load_tables(spark, sf_dir, names=("supplier", "part", "orders"))
    return run_sql(spark, _Q17, {"orders": "orders"})


# --- q18: grouping over join with inequality predicate -----------------------
_Q18 = """
select s_name, count(*) as n_cheap_parts
from supplier
join part on p_size < 10 and (p_partkey % 100) = (s_suppkey % 100)
group by s_name
having count(*) > 0
"""
sql_case("q18_ineq_join", _Q18, _Q18, doc="join with non-equi conjunct")

# --- q19: multi-level aggregation (agg of agg) -------------------------------
_Q19 = """
select n_orders, count(*) as n_customers
from (
  select o_custkey, count(*) as n_orders from orders group by o_custkey
) t
group by n_orders
"""
sql_case("q19_agg_of_agg", _Q19, _Q19, doc="re-aggregation of aggregate output")
