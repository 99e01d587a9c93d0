"""Catalog entries q112-q114: data-quality / dataset-card diagnostics —
distribution drift (PSI) across the event timeline, label-noise detection
by embedding-neighborhood voting, and a generic column-profile report.

Determinism: bucket boundaries and halves derive from exact integer /
timestamp comparisons; PSI's ln terms round to 6 decimals and sum through
decimal(38,6); neighborhood votes use rounded cosines with id tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .queries import register, sql_case
from .session import load_tables

# ---------------------------------------------------------------------------
# q112 — population-stability-index drift between timeline halves
# ---------------------------------------------------------------------------
# Buckets events by value decile boundaries fixed from the FIRST half (the
# reference window), then PSI = sum over buckets of (p2-p1)*ln(p2/p1).
# Laplace-smoothed counts keep empty buckets finite. The drift alarm a
# continuously-ingested corpus needs before a distribution shift poisons
# training.

_Q112_BODY = """
    with m as (select {QMED} as mid from events),
    tagged as (
      select event_type, value, ({EPOCHUS} >= mid) as is_late
      from events cross join m
    ),
    bounds as (
      select event_type,
             {QUANTILES} as qs
      from tagged where not is_late group by event_type
    ),
    bucketed as (
      select t.event_type, t.is_late,
             case
               when t.value < qs[{I1}] then 0
               when t.value < qs[{I2}] then 1
               when t.value < qs[{I3}] then 2
               else 3
             end as bucket
      from tagged t join bounds b on t.event_type = b.event_type
    ),
    counts as (
      select event_type, bucket,
             cast(sum(case when is_late then 0 else 1 end) as bigint) as n1,
             cast(sum(case when is_late then 1 else 0 end) as bigint) as n2
      from bucketed group by event_type, bucket
    ),
    tot as (
      select event_type,
             cast(sum(n1) as bigint) as t1, cast(sum(n2) as bigint) as t2,
             count(*) as k
      from counts group by event_type
    ),
    terms as (
      select c.event_type,
             cast(round(
               ((n2 + 1.0) / (t2 + k) - (n1 + 1.0) / (t1 + k))
               * ln(((n2 + 1.0) / (t2 + k)) / ((n1 + 1.0) / (t1 + k))), 6)
               as decimal(38,6)) as term
      from counts c join tot using (event_type)
    )
    select event_type,
           cast(round(cast(sum(term) as double), 6) as double) as psi,
           cast(round(cast(sum(term) as double), 6) >= 0.1 as boolean)
             as drift_flag
    from terms group by event_type
    union all
    select event_type,
           cast(null as double) as psi,
           true as drift_flag
    from (select distinct event_type from tagged) t
    where event_type not in (select event_type from bounds)
"""

_SPARK_Q112 = _Q112_BODY.replace(
    # Spark bracket indexing is 0-based; DuckDB's is 1-based
    "{I1}", "0").replace("{I2}", "1").replace("{I3}", "2"
).replace(
    "{QMED}", "percentile(unix_micros(cast(ts as timestamp)), 0.5)"
).replace(
    "{EPOCHUS}", "unix_micros(cast(ts as timestamp))"
).replace(
    "{QUANTILES}",
    "array(round(percentile(value, 0.25), 3), round(percentile(value, 0.5), 3), "
    "round(percentile(value, 0.75), 3))",
)
_DUCK_Q112 = _Q112_BODY.replace(
    "{I1}", "1").replace("{I2}", "2").replace("{I3}", "3"
).replace(
    "{QMED}", "quantile_cont(epoch_us(ts), 0.5)"
).replace(
    "{EPOCHUS}", "epoch_us(ts)"
).replace(
    "{QUANTILES}",
    "[round(quantile_cont(value, 0.25), 3), round(quantile_cont(value, 0.5), 3), "
    "round(quantile_cont(value, 0.75), 3)]",
)

sql_case(
    "q112_psi_drift",
    _SPARK_Q112,
    _DUCK_Q112,
    doc="population-stability-index drift per event type between timeline "
    "halves: quartile boundaries frozen on the reference (early) half; a "
    "type with NO reference-half rows (born after the midpoint — the most "
    "extreme shift) is emitted with psi NULL and drift_flag true instead "
    "of silently vanishing from the report. "
    "Laplace-smoothed bucket shares, PSI >= 0.1 flags drift — the "
    "continuous-ingest distribution alarm. Exact interpolated quantiles "
    "(percentile ≡ quantile_cont), decimal-routed ln terms",
)


# ---------------------------------------------------------------------------
# q113 — label-noise detection via embedding-neighborhood voting
# ---------------------------------------------------------------------------

_Q113_ORACLE = """
    with v as (
      select vec_id as id, label,
             list_transform(embedding, x -> cast(x as double)) as v
      from embeddings where vec_id < 200
    ),
    s as (
      select a.id, a.label, b.id as nid, b.label as nlabel,
             round(
               list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i]))
               / (sqrt(list_sum(list_transform(a.v, x -> x*x)))
                  * sqrt(list_sum(list_transform(b.v, x -> x*x)))),
               5) as sim
      from v a join v b on a.id <> b.id
    ),
    r as (
      select id, label, nlabel,
             row_number() over (partition by id order by sim desc, nid) as rk
      from s
    )
    select id as vec_id, label,
           cast(sum(case when nlabel <> label then 1 else 0 end) as bigint)
             as n_disagree,
           cast(sum(case when nlabel <> label then 1 else 0 end) >= 4 as boolean)
             as suspect
    from r where rk <= 5
    group by id, label
"""


@register(
    "q113_label_noise",
    _Q113_ORACLE,
    doc="label-noise detection (confident-learning proxy): each vector's 5 "
    "nearest neighbors vote; >= 4 disagreeing labels flags the row as "
    "suspect — the relabel/drop queue for classifier training data. "
    "Brute-force pass here (bounded to 200 vectors); the corpus-scale "
    "path swaps in the q51/q54 ANN candidates with the identical vote "
    "(operators/similarity.py batch_cosine_topk shape)",
)
def q113_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .operators.similarity import _to_double, cosine_expr

    t = load_tables(spark, sf_dir, names=("embeddings",))
    v = t["embeddings"].where(F.col("vec_id") < 200).select(
        F.col("vec_id").alias("id"), "label", _to_double(F.col("embedding")).alias("v")
    )
    a = v.select(F.col("id"), F.col("label"), F.col("v"))
    b = v.select(
        F.col("id").alias("nid"), F.col("label").alias("nlabel"), F.col("v").alias("nv")
    )
    scored = a.join(F.broadcast(b), F.col("id") != F.col("nid")).select(
        "id", "label", "nid", "nlabel",
        F.round(cosine_expr(F.col("v"), F.col("nv")), 5).alias("sim"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("sim"), "nid")
    top = scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 5)
    return top.groupBy(F.col("id").alias("vec_id"), "label").agg(
        F.sum((F.col("nlabel") != F.col("label")).cast("bigint"))
        .cast("bigint")
        .alias("n_disagree"),
        (
            F.sum((F.col("nlabel") != F.col("label")).cast("bigint")) >= 4
        ).alias("suspect"),
    )


# ---------------------------------------------------------------------------
# q114 — column-profile report (dataset-card primitive)
# ---------------------------------------------------------------------------

_Q114_BODY = """
    select 'value' as column_name,
           cast(count(*) as bigint) as n_rows,
           cast(count(*) - count(value) as bigint) as n_null,
           cast(count(distinct value) as bigint) as n_distinct,
           cast(min(value) as double) as min_d,
           cast(max(value) as double) as max_d,
           cast(null as string) as min_s, cast(null as string) as max_s
    from events
    union all
    select 'event_type',
           cast(count(*) as bigint),
           cast(count(*) - count(event_type) as bigint),
           cast(count(distinct event_type) as bigint),
           cast(null as double), cast(null as double),
           min(event_type), max(event_type)
    from events
    union all
    select 'user_id',
           cast(count(*) as bigint),
           cast(count(*) - count(user_id) as bigint),
           cast(count(distinct user_id) as bigint),
           cast(min(user_id) as double), cast(max(user_id) as double),
           cast(null as string), cast(null as string)
    from events
"""

sql_case(
    "q114_column_profile",
    _Q114_BODY,
    _Q114_BODY.replace("cast(null as string)", "cast(null as varchar)"),
    doc="column-profile report over events (row/null/distinct counts, "
    "min/max per column) — the dataset-card primitive every ingestion "
    "run emits; one scan, three aggregates that AQE executes as one "
    "stage per branch with map-side partials",
)


# ---------------------------------------------------------------------------
# q115 — MMR diversity-aware selection (greedy, 5 unrolled steps)
# ---------------------------------------------------------------------------

_COSR = (
    "round(list_sum(list_transform(range(1, len({A})+1), i -> {A}[i]*{B}[i]))"
    " / (sqrt(list_sum(list_transform({A}, x -> x*x)))"
    "    * sqrt(list_sum(list_transform({B}, x -> x*x)))), 5)"
)


def _q115_oracle(k: int = 5, lam: float = 0.5, pool: int = 100) -> str:
    cos_q = _COSR.format(A="c.v", B="q.qv")
    ctes = [
        f"""v as (
      select vec_id as id, list_transform(embedding, x -> cast(x as double)) as v
      from embeddings
    ),
    q as (select v as qv from v where id = 0),
    cand as (
      select c.id, c.v, {cos_q} as r
      from v c cross join q where c.id between 1 and {pool}
    )"""
    ]
    for t in range(1, k + 1):
        joins = " ".join(f"cross join s{u}" for u in range(1, t))
        excl = " and ".join(f"c.id <> s{u}.sid" for u in range(1, t)) or "true"
        if t == 1:
            pen = "0.0"
        else:
            sims = ", ".join(
                _COSR.format(A="c.v", B=f"s{u}.sv") for u in range(1, t)
            )
            pen = f"greatest({sims})" if t > 2 else sims
        ctes.append(
            f"""p{t} as (
      select c.id, c.v, c.r, {pen} as pen
      from cand c {joins} where {excl}
    ),
    s{t} as (
      select id as sid, v as sv, r, pen,
             round(r - {lam} * pen, 6) as mmr
      from p{t} order by r - {lam} * pen desc, id limit 1
    )"""
        )
    finals = "\n    union all\n    ".join(
        f"select {t} as rank, sid as id, r as relevance, pen as penalty, "
        f"mmr as mmr_score from s{t}"
        for t in range(1, k + 1)
    )
    return "with " + ",\n    ".join(ctes) + "\n    " + finals


@register(
    "q115_mmr_selection",
    _q115_oracle(),
    doc="greedy Maximal Marginal Relevance (Carbonell-Goldstein): 5 picks "
    "from the 100-candidate pool maximizing cosine-relevance to vector 0 "
    "minus 0.5x the max cosine to prior picks — the diversity re-rank "
    "between retrieval and example assembly. Driver holds k vectors; each "
    "step is one pool scan + top-1; rounded cosines, lowest-id ties "
    "(operators/selection.py mmr_select)",
)
def q115_mmr_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.selection import mmr_select

    t = load_tables(spark, sf_dir, names=("embeddings",))
    return mmr_select(t["embeddings"], query_id=0, k=5, lam=0.5, pool=100)
