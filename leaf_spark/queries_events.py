"""Event-stream query semantics (SURVEY §2.A: range scan A7, idx-window
paging A9/A10/A12, plus the analytics a stream table invites).

The driver testdata `events` table plays the role of the reference's event
log: `event_id` ≈ `idx` (dense, ordered), `user_id` ≈ `user`, `props` ≈
decoded payload. At 100 TB the log is partitioned by stream/time; every query
here filters or buckets on the ordering column so partition/file pruning
applies (min/max stats on event_id / ts).
"""

from __future__ import annotations

from .queries import sql_case

# --- A7 raw range scan + A9/A12 idx-window page ------------------------------
sql_case(
    "q30_events_page",
    """
    select event_id, user_id, event_type, value
    from events
    where event_id >= 1001
    order by event_id
    limit 1000
    """,
    """
    select event_id, user_id, event_type, value
    from events
    where event_id >= 1001
    order by event_id
    limit 1000
    """,
    doc="leaf query page: where idx >= $start order by idx limit $limit (A9/A12)",
)

sql_case(
    "q31_events_range_scan",
    """
    select event_id, user_id, event_type
    from events
    where event_id between 2500 and 3500
    """,
    """
    select event_id, user_id, event_type
    from events
    where event_id between 2500 and 3500
    """,
    doc="raw_get_events range scan (A7); file-skipping on idx min/max",
)

# --- stream aggregation ------------------------------------------------------
sql_case(
    "q32_events_type_stats",
    """
    select event_type,
           count(*) as n,
           cast(sum(cast(value as decimal(38,6))) as double) as value_sum,
           min(value) as value_min,
           max(value) as value_max,
           count(distinct user_id) as n_users
    from events
    group by event_type
    """,
    """
    select event_type,
           count(*) as n,
           cast(sum(cast(value as decimal(38,6))) as double) as value_sum,
           min(value) as value_min,
           max(value) as value_max,
           count(distinct user_id) as n_users
    from events
    group by event_type
    """,
    doc="per-type stats incl. distinct users",
)

# --- time-bucketed rollup ----------------------------------------------------
sql_case(
    "q33_events_time_buckets",
    """
    select date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:00') as hour_bucket,
           event_type,
           count(*) as n
    from events
    group by date_trunc('hour', ts), event_type
    """,
    """
    select strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') as hour_bucket,
           event_type,
           count(*) as n
    from events
    group by date_trunc('hour', ts), event_type
    """,
    doc="event-time windowed rollup (batch analog of streaming window agg)",
)

# --- sessionization (30-minute inactivity gap) -------------------------------
# ONE shared definition for every sessionizing query (q34/q99/q120): the
# gap compares MICROSECOND epochs on both engines. Truncated-second epochs
# (Spark unix_timestamp vs DuckDB epoch) disagree on a gap that straddles
# exactly 1800 s depending on the sub-second fractions — a data-dependent
# oracle divergence waiting for a regenerated dataset.
SESSIONIZE_CTE = """
    marked as (
      select user_id, ts, event_id, event_type, value,
             case when lag(ts) over w is null
                    or ({EPOCHUS} - lag({EPOCHUS}) over w) > 1800000000
                  then 1 else 0 end as is_new
      from events
      window w as (partition by user_id order by ts, event_id)
    ),
    sess as (
      select user_id, ts, event_id, event_type, value,
             sum(is_new) over (partition by user_id order by ts, event_id
                               rows unbounded preceding) as session_id
      from marked
    )"""

SPARK_EPOCH_US = "unix_micros(cast(ts as timestamp))"
DUCK_EPOCH_US = "epoch_us(ts)"


def sessionize_cte(engine: str) -> str:
    return SESSIONIZE_CTE.replace(
        "{EPOCHUS}", SPARK_EPOCH_US if engine == "spark" else DUCK_EPOCH_US
    )


_Q34_BODY = """
with {SESS}
select user_id, cast(max(session_id) as bigint) as n_sessions
from sess group by user_id
"""
sql_case(
    "q34_events_sessionize",
    _Q34_BODY.replace("{SESS}", sessionize_cte("spark")),
    _Q34_BODY.replace("{SESS}", sessionize_cte("duck")),
    doc="lag-window sessionization (shared SESSIONIZE_CTE, µs-exact gap); "
    "streaming analog = session window / state op",
)

# --- top-k users -------------------------------------------------------------
sql_case(
    "q35_events_topk_users",
    """
    select user_id, count(*) as n
    from events
    group by user_id
    order by n desc, user_id
    limit 10
    """,
    """
    select user_id, count(*) as n
    from events
    group by user_id
    order by n desc, user_id
    limit 10
    """,
    doc="top-k with total-order tiebreak",
)

# --- pagination completeness: two pages ≡ one range (A12 has_more drain) -----
sql_case(
    "q36_events_two_pages",
    """
    select event_id, event_type from (
      select event_id, event_type from events
      where event_id >= 1 order by event_id limit 500
    ) p1
    union all
    select event_id, event_type from (
      select event_id, event_type from events
      where event_id >= 501 order by event_id limit 500
    ) p2
    """,
    """
    select event_id, event_type from (
      select event_id, event_type from events
      where event_id >= 1 order by event_id limit 500
    ) p1
    union all
    select event_id, event_type from (
      select event_id, event_type from events
      where event_id >= 501 order by event_id limit 500
    ) p2
    """,
    doc="subscription backfill paging: concat of pages == contiguous range",
)

# --- skew mitigation (operators.skew): results ≡ unsalted equivalents --------
# Salt never leaks into the output, so both are oracle-checkable: the DuckDB
# side is the PLAIN group-by / join — proving salted == unsalted.

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from .queries import register  # noqa: E402
from .session import load_tables  # noqa: E402


@register(
    "q56_salted_agg",
    """
    select event_type,
           count(*) as n_events,
           cast(sum(cast(value as decimal(38,6))) as double) as total_value,
           min(user_id) as min_user,
           max(user_id) as max_user
    from events
    group by event_type
    """,
    doc="salted two-phase aggregation (skew.salted_agg) vs plain GROUP BY oracle",
)
def q56_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.skew import salted_agg

    t = load_tables(spark, sf_dir, names=("customer", "events"))
    ev = t["events"].withColumn("value_dec", F.col("value").cast("decimal(38,6)"))
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": ("count", "event_id"),
            "total_value": ("sum", "value_dec"),
            "min_user": ("min", "user_id"),
            "max_user": ("max", "user_id"),
        },
        num_salts=32,
    )
    return out.select(
        "event_type",
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
        "min_user",
        "max_user",
    )


@register(
    "q57_salted_join",
    """
    select c.c_mktsegment as segment,
           count(*) as n_events,
           cast(sum(cast(e.value as decimal(38,6))) as double) as total_value
    from events e
    join customer c on e.user_id = c.c_custkey
    group by c.c_mktsegment
    """,
    doc="salted fact-dim equi-join (skew.salted_join) vs plain JOIN oracle",
)
def q57_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.skew import salted_join

    t = load_tables(spark, sf_dir, names=("customer", "events"))
    fact = t["events"].select(F.col("user_id").alias("c_custkey"), "value")
    dim = t["customer"].select("c_custkey", "c_mktsegment")
    joined = salted_join(fact, dim, on=["c_custkey"], num_salts=8)
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
    )


# --- sketch aggregates (the 100 TB rollup tools) -----------------------------
# HLL / quantile sketches cannot hash-match an exact oracle; the catalog
# entry therefore emits the EXACT value (oracle-checkable) alongside a
# boolean proving the sketch landed within its error bound — if the sketch
# drifts, the boolean flips and the differential gate fails (same pattern
# as the ANN recall gates q51/q54).
sql_case(
    "q63_sketch_distinct",
    """
    select event_type,
           count(distinct user_id) as exact_users,
           abs(approx_count_distinct(user_id, 0.02) - count(distinct user_id))
             <= cast(ceil(0.06 * count(distinct user_id)) as bigint) as hll_ok
    from events
    group by event_type
    """,
    """
    select event_type,
           count(distinct user_id) as exact_users,
           true as hll_ok
    from events
    group by event_type
    """,
    doc="HyperLogLog distinct-user rollup per event type: exact value "
    "oracle-checked, sketch asserted within 6% = 3x its rsd=0.02 (a "
    "1-sigma bound is EXPECTED to fail ~32% of the time — the default-rsd "
    "estimate missed 5% at sf0.1 with a 6.7% error; 3 sigma holds at "
    "every sf) — the only distinct-count that scales to 100 TB without a "
    "shuffle of raw user ids",
)

sql_case(
    "q64_sketch_quantiles",
    """
    select event_type,
           cast(min(value) as double) as lo,
           cast(max(value) as double) as hi,
           approx_percentile(value, 0.5, 10000) between min(value) and max(value)
             and approx_percentile(value, 0.99, 10000)
                 >= approx_percentile(value, 0.5, 10000) as tdigest_ok
    from events
    group by event_type
    """,
    """
    select event_type,
           cast(min(value) as double) as lo,
           cast(max(value) as double) as hi,
           true as tdigest_ok
    from events
    group by event_type
    """,
    doc="approximate-percentile sketch per event type: min/max "
    "oracle-checked exactly, p50/p99 sketches asserted ordered and in "
    "range — single-pass mergeable quantiles (no sort at scale)",
)
