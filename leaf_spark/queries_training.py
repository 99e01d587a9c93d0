"""Training-corpus assembly queries — temporal joins over the event log plus
deterministic split/mix/sample/pack over the documents table.

These pair the `operators/temporal.py` and `operators/sampling.py` scale
operators with DuckDB oracles. The oracles restate each operator as plain
ANSI SQL (DuckDB's native ASOF JOIN, inequality joins, window prefix sums,
QUALIFY ranks) so the driver's value-hash gate proves the distributed
formulations exact, not just plausible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators.sampling import (
    hash_split,
    hex_threshold,
    pack_sequences,
    stratified_sample,
    weighted_mix,
)
from .operators.temporal import asof_join, range_join
from .queries import register
from .session import load_tables

# ---------------------------------------------------------------------------
# q65 — as-of join: attribute each click to the user's most recent view
# ---------------------------------------------------------------------------

_Q65_ORACLE = """
select c.event_id,
       c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') as click_ts,
       v.event_id as view_event_id,
       cast(case when v.event_id is null then null
                 else epoch(date_trunc('second', c.ts))
                    - epoch(date_trunc('second', v.ts)) end as bigint) as gap_s
from (select * from events where event_type = 'click') c
asof left join (select * from events where event_type = 'view') v
  on c.user_id = v.user_id and c.ts >= v.ts
"""


@register(
    "q65_asof_attribution",
    _Q65_ORACLE,
    doc="backward as-of join (union-and-carry, one shuffle) vs DuckDB ASOF JOIN",
)
def q65_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, names=("events",))
    ev = t["events"]
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = (
        ev.where(F.col("event_type") == "view")
        .select("user_id", "ts", F.col("event_id").alias("view_event_id"))
    )
    joined = asof_join(
        clicks,
        views,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        right_cols=["view_event_id"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        "view_event_id",
        (F.unix_timestamp("ts") - F.unix_timestamp("ts_right")).cast("bigint").alias(
            "gap_s"
        ),
    )


# ---------------------------------------------------------------------------
# q82 — skew-mitigated as-of join (time-bucketed window + cross-bucket carry)
# ---------------------------------------------------------------------------

_Q82_ORACLE = """
select p.event_id,
       p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') as purchase_ts,
       c.event_id as click_event_id,
       cast(case when c.event_id is null then null
                 else epoch(date_trunc('second', p.ts))
                    - epoch(date_trunc('second', c.ts)) end as bigint) as gap_s
from (select * from events where event_type = 'purchase') p
asof left join (select * from events where event_type = 'click') c
  on p.user_id = c.user_id and p.ts >= c.ts
"""


@register(
    "q82_asof_bucketed",
    _Q82_ORACLE,
    doc="skew-mitigated as-of join: (key, 30-min-bucket) windows + "
    "cross-bucket tail carry — a hot key's serial sort is O(#buckets), "
    "not O(#events); exact vs DuckDB ASOF JOIN",
)
def q82_asof_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, names=("events",))
    ev = t["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select("user_id", "ts", F.col("event_id").alias("click_event_id"))
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        right_cols=["click_event_id"],
        time_bucket=1800.0,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "click_event_id",
        (F.unix_timestamp("ts") - F.unix_timestamp("ts_right")).cast("bigint").alias(
            "gap_s"
        ),
    )


# ---------------------------------------------------------------------------
# q66 — range join: activity rollup in the 10 minutes after each error
# ---------------------------------------------------------------------------

_Q66_ORACLE = """
select w.event_id as err_id,
       count(*) as n_in_window,
       cast(sum(cast(e.value as decimal(38,6))) as double) as value_sum
from (select * from events where event_type = 'error') w
join events e
  on e.user_id = w.user_id and e.ts >= w.ts and e.ts < w.ts + interval 600 seconds
group by w.event_id
"""


@register(
    "q66_error_window_rollup",
    _Q66_ORACLE,
    doc="interval range join (bucketed equi-join, no nested loop) vs DuckDB inequality join",
)
def q66_error_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, names=("events", "documents"))
    ev = t["events"]
    windows = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("interval 600 seconds")).alias("w_end"),
    )
    points = ev.select("user_id", "ts", "value")
    joined = range_join(
        points,
        windows,
        on=["user_id"],
        point_time="ts",
        start_col="w_start",
        end_col="w_end",
        bucket_width=600.0,
    )
    return joined.groupBy("err_id").agg(
        F.count(F.lit(1)).alias("n_in_window"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("value_sum"),
    )


# ---------------------------------------------------------------------------
# q67 — deterministic train/val/test split (hash_split)
# ---------------------------------------------------------------------------

_SPLIT_FRACS = {"val": 0.05, "test": 0.05, "train": 0.90}
_T1 = hex_threshold(0.05)  # val
_T2 = hex_threshold(0.10)  # val + test

_Q67_ORACLE = f"""
select split, lang, count(*) as n_docs, cast(sum(n_chars) as bigint) as chars_total
from (
  select lang, n_chars,
         case when substr(md5('split' || cast(doc_id as varchar)), 1, 4) < '{_T1}' then 'val'
              when substr(md5('split' || cast(doc_id as varchar)), 1, 4) < '{_T2}' then 'test'
              else 'train' end as split
  from documents
) d
group by split, lang
"""


@register(
    "q67_train_split",
    _Q67_ORACLE,
    doc="shuffle-free deterministic split by md5 prefix; stable under corpus growth",
)
def q67_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, names=("documents",))
    docs = hash_split(t["documents"], "doc_id", _SPLIT_FRACS)
    return docs.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars_total"),
    )


# ---------------------------------------------------------------------------
# q68 — source-weighted mixing (weighted_mix)
# ---------------------------------------------------------------------------

# srcN keeps (N % 4 + 1)/4 of its docs — the classic up/down-weighting of
# sources by quality tier in a pretraining mix
_MIX_WEIGHTS = {f"src{i}": (i % 4 + 1) / 4 for i in range(20)}

_MIX_CASE = "case " + " ".join(
    f"when source = '{s}' then '{hex_threshold(w)}'" for s, w in _MIX_WEIGHTS.items()
) + f" else '{hex_threshold(1.0)}' end"

_Q68_ORACLE = f"""
select source, count(*) as n_kept, cast(sum(n_chars) as bigint) as chars_kept
from documents
where substr(md5('mix' || cast(doc_id as varchar)), 1, 4) < {_MIX_CASE}
group by source
"""


@register(
    "q68_source_mix",
    _Q68_ORACLE,
    doc="per-source keep-fraction as a broadcast-free literal CASE filter (zero shuffles)",
)
def q68_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, names=("documents",))
    kept = weighted_mix(t["documents"], "doc_id", "source", _MIX_WEIGHTS)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("chars_kept"),
    )


# ---------------------------------------------------------------------------
# q69 — stratified per-language sample (stratified_sample)
# ---------------------------------------------------------------------------

_Q69_ORACLE = """
select doc_id, lang
from documents
qualify row_number() over (
  partition by lang
  order by md5('strat' || cast(doc_id as varchar)), doc_id
) <= 20
"""


@register(
    "q69_stratified_sample",
    _Q69_ORACLE,
    doc="exact n-per-stratum via skew-proof two-level rank vs DuckDB QUALIFY",
)
def q69_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, names=("documents",))
    sampled = stratified_sample(t["documents"], ["lang"], 20, "doc_id")
    return sampled.select("doc_id", "lang")


# ---------------------------------------------------------------------------
# q70 — sequence packing into fixed token-budget bins (pack_sequences)
# ---------------------------------------------------------------------------

_Q70_ORACLE = """
select bin_id,
       count(*) as n_docs,
       cast(sum(tok) as bigint) as tokens_total,
       min(doc_id) as first_doc
from (
  select doc_id, tok,
         cast(floor(coalesce(sum(tok) over (
           order by doc_id rows between unbounded preceding and 1 preceding
         ), 0) / 2048) as bigint) as bin_id
  from (select doc_id, greatest(1, n_chars // 4) as tok from documents) d
) p
group by bin_id
"""


@register(
    "q70_pack_sequences",
    _Q70_ORACLE,
    doc="concat-and-chunk packing via distributed prefix sum (no global-order window)",
)
def q70_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, names=("documents",))
    docs = t["documents"].select(
        "doc_id", F.greatest(F.lit(1), (F.col("n_chars") / 4).cast("long")).alias("tok")
    )
    packed = pack_sequences(
        docs, order_col="doc_id", token_col="tok", budget=2048, range_width=100
    )
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").alias("tokens_total"),
        F.min("doc_id").alias("first_doc"),
    )
