"""Catalog entries q188-q200: retrieval/agreement evaluation and
behavioral-profile analytics — round-6 catalog growth.

- q188 expected calibration error (the scalar over q143's reliability
  bins), exact milli-unit rationals;
- q189 MRR@10 and q190 precision/recall@10 over the q165 retrieval task
  (same exact integer ranker, same graded relevance source);
- q191 Fleiss' kappa: multi-rater chance-corrected agreement (three
  deterministic md5-corrupted raters), the m-rater generalization of
  q147's Cohen kappa, in exact decimal(38,0) rational form;
- q192 RFM segmentation (recency/frequency/monetary) with histogram-
  join quintiles — no global windows;
- q193 inter-event burstiness coefficient (sigma-mu)/(sigma+mu) per
  event type from exact microsecond-gap moments;
- q194 Heaps'-law vocabulary growth: cumulative vocab vs cumulative
  tokens over doc-id buckets + the log-log OLS exponent;
- q195 Mann-Kendall trend test with tie-corrected variance over daily
  event counts (the nonparametric sibling of q175's OLS slope and
  q166's Theil-Sen);
- q196 Wilson score interval for the per-type conversion rate (the CI
  beside q160's z and q187's MDE);
- q197 Cochran-Armitage trend test of conversion vs an ordered dose
  band (exact component witnesses, no N^4 exact intermediates);
- q198 top 3-step behavior paths (the sequence extension of q154);
- q199 day-of-week seasonality index (exact rational witnesses over
  the checkpointed calendar-day table);
- q200 Fisher discriminant ratio of a quantized embedding component
  across labels (the feature-separability audit).

Determinism follows the q171-q187 discipline: counts/ranks/statistic
numerators are exact bigint/decimal(38,0); libm terms round to 6-9
digits and decimal-sum; closed-form quotients are fixed IEEE sequences
over exact integers; ORDER BY before LIMIT carries unique tiebreaks.

Scale notes: q188/q191 are single map-side-combinable aggregations over
fixed-cardinality groups; q189/q190 filter postings to the query terms
at the scan and rank with term-partitioned windows (q165's bound);
q192's quintiles come from bounded-histogram join-cums (broadcast-
hinted, the q179 recipe) — recency support <= calendar days, frequency
support <= distinct per-user activity counts, monetary banded to a log2
grid; q193's lag windows are (user, type)-partitioned (never single-
partition); q194 reduces the corpus to ONE (word x bucket) aggregation,
checkpoints it (vocab x buckets rows), and solves on buckets; q195
solves on a checkpointed calendar-day table (D^2 bounded pairs,
broadcast-hinted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .queries import register, sql_case
from .queries_retrieval import _q165_sql
from .session import load_tables

# Exact FLOOR division on BOTH engines: Spark's `div` AND DuckDB 1.0's
# `//` both truncate toward zero (verified: -7 // 2 = -3 in DuckDB
# 1.0.0), so a bare integer divide misattributes pre-1970 partial days
# (epoch_us -396e9 is day -5, trunc says -4) — the same
# sign-of-dividend family as the q199 dow bug (ADVICE r6). Both
# engines' `%` keeps the dividend's sign, so the identical correction
# term floors on both sides (ADVICE r7 — the r7 fix floored only
# Spark, silently diverging from the still-truncating oracle). Pure
# integer arithmetic: a floor(double/…) would misround near the
# 2^53-µs horizon.
_EPOCHDAY_SPARK = (
    "(unix_micros(cast(ts as timestamp)) div 86400000000"
    " - (case when unix_micros(cast(ts as timestamp)) % 86400000000 < 0"
    " then 1 else 0 end))"
)
_EPOCHDAY_DUCK = (
    "(epoch_us(ts) // 86400000000"
    " - (case when epoch_us(ts) % 86400000000 < 0 then 1 else 0 end))"
)
_EPOCHUS_SPARK = "unix_micros(cast(ts as timestamp))"
_EPOCHUS_DUCK = "epoch_us(ts)"


# ---------------------------------------------------------------------------
# q188 — expected calibration error: the headline scalar over q143's
# reliability bins. ECE = sum_b (n_b/N)|pos_b/n_b - mean_score_b| =
# sum_b |1000*pos_b - sum_score_milli_b| / (1000*N) — every numerator
# term is an exact bigint (the score is integer milli-units before any
# division), so ece_num/ece_den are exact rationals beside the rounded
# quotient. One 10-group aggregation, map-side combinable.
# ---------------------------------------------------------------------------

_Q188_BODY = """
    with s as (
      select least(greatest(cast(floor((cast({E1} as double) + 1.0) * 500)
                            as bigint), 0), 999) as score_milli,
             case when label >= 5 then 1 else 0 end as pos
      from embeddings
    ),
    b as (
      select cast(floor(score_milli / 100.0) as bigint) as bin,
             cast(count(*) as bigint) as n,
             cast(sum(pos) as bigint) as p,
             cast(sum(score_milli) as bigint) as ssm
      from s group by 1
    )
    select cast(count(*) as bigint) as n_bins,
           cast(sum(n) as bigint) as n_docs,
           cast(sum(abs(1000 * p - ssm)) as bigint) as ece_num,
           cast(sum(n) * 1000 as bigint) as ece_den,
           round(cast(sum(abs(1000 * p - ssm)) as double)
                 / (cast(sum(n) as double) * 1000.0), 6) as ece
    from b
"""

sql_case(
    "q188_expected_calibration_error",
    _Q188_BODY.replace("{E1}", "element_at(embedding, 1)"),
    _Q188_BODY.replace("{E1}", "embedding[1]"),
    doc="expected calibration error over q143's 10 reliability bins: "
    "ECE = sum_b |1000*pos_b - score_mass_b| / (1000*N) with exact "
    "bigint numerator terms (integer milli-unit scores) — the scalar a "
    "model-quality gate thresholds on. One map-side-combinable "
    "aggregation over 10 groups; no joins, no windows",
)


# ---------------------------------------------------------------------------
# q189 — MRR@10 per query term over the q165 retrieval task: system
# order by the exact integer score tf*1e6 div dl (doc_id tiebreak),
# relevance = tf >= 2 (q165's graded source, binarized). The reciprocal
# rank is emitted as the exact first_rel_rank bigint beside the rounded
# quotient; terms whose top-10 has no relevant doc yield NULL rank and
# rr = 0. Single consumer of the scored postings -> one corpus scan.
# ---------------------------------------------------------------------------

_Q189_FINAL = """
    with sysr as (
      select term, tf,
             row_number() over (
               partition by term order by sys_score desc, doc_id) as rk
      from {SCORED}
    )
    select term,
           cast(count(*) as bigint) as n_in_topk,
           cast(min(case when tf >= 2 then rk end) as bigint)
             as first_rel_rank,
           round(coalesce(cast(1.0 as double)
                          / min(case when tf >= 2 then rk end), 0.0), 6)
             as rr_at_10
    from sysr where rk <= 10
    group by term
    order by term
"""

sql_case(
    "q189_mrr_eval",
    _Q189_FINAL.replace("{SCORED}", "(" + _q165_sql("spark") + ")"),
    _Q189_FINAL.replace("{SCORED}", "(" + _q165_sql("duckdb") + ")"),
    doc="MRR@10 per query term on the q165 retrieval task (exact integer "
    "ranker tf*1e6 div dl, relevance tf>=2): exact first_rel_rank "
    "bigint beside the rounded reciprocal; NULL rank / rr=0 when the "
    "top-10 has no relevant doc. Postings filtered to the query terms "
    "at the scan; the rank window is term-partitioned",
)


# ---------------------------------------------------------------------------
# q190 — precision@10 / recall@10 per query term, same task. TWO
# consumers of the scored postings (the top-10 slice and the corpus
# relevant-count) — Catalyst re-inlines a CTE per consumer (the q141
# gotcha), so the Spark side localCheckpoints the retrieval-sized
# scored table and both aggregates read it; the DuckDB oracle keeps the
# inline CTE.
# ---------------------------------------------------------------------------

_Q190_FINAL = """
    with sysr as (
      select term, tf,
             row_number() over (
               partition by term order by sys_score desc, doc_id) as rk
      from {SCORED}
    ),
    rel as (
      select term, cast(count(*) as bigint) as n_rel
      from {SCORED} where tf >= 2 group by term
    ),
    topk as (
      select term,
             cast(sum(case when tf >= 2 then 1 else 0 end) as bigint)
               as rel_in_k,
             cast(count(*) as bigint) as k_eff
      from sysr where rk <= 10 group by term
    )
    select t.term, t.rel_in_k, t.k_eff, r.n_rel,
           round(cast(t.rel_in_k as double) / t.k_eff, 6) as precision_at_10,
           round(cast(t.rel_in_k as double) / nullif(r.n_rel, 0), 6)
             as recall_at_10
    from topk t left join rel r on t.term = r.term
    order by t.term
"""


def _q190_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, names=("documents",))
    scored = spark.sql(_q165_sql("spark")).localCheckpoint()
    scored.createOrReplaceTempView("__q190_scored__")
    return spark.sql(_Q190_FINAL.replace("{SCORED}", "__q190_scored__"))


register(
    "q190_precision_recall_at_k",
    _Q190_FINAL.replace("{SCORED}", "(" + _q165_sql("duckdb") + ")"),
    doc="precision@10 / recall@10 per query term on the q165 task: exact "
    "rel_in_k / k_eff / n_rel bigints beside the rounded quotients; "
    "recall NULL when the term has no relevant docs (0/0). The scored "
    "table is checkpointed so its two consumers (top-10 slice, corpus "
    "relevant count) cost one scan (the q141 CTE-inlining gotcha)",
)(_q190_spark)


# ---------------------------------------------------------------------------
# q191 — Fleiss' kappa: chance-corrected agreement for m=3 deterministic
# raters (each corrupts the stored label when its own md5 nibble < 3 —
# the q146/q147 predictor family with per-rater salts). With
# S = sum_i sum_j n_ij^2, c_j = column totals, N items, m raters:
#   P_bar  = (S - N*m) / (N*m*(m-1))
#   Pe_bar = sum_j c_j^2 / (N*m)^2
#   kappa  = (P_bar - Pe_bar) / (1 - Pe_bar)
#          = [(S - Nm)*(Nm)^2 - Nm*(m-1)*C] / [Nm*(m-1)*((Nm)^2 - C)]
# — all integers, decimal(38,0)-routed (nothing wraps at extreme N).
# With m=3, S_i = 3 + 2*(agreeing pairs among the three raters), so S
# needs no per-category pivot; the column totals come from one unpivot.
# Exact rationals ONLY (the q147 hash-robustness lesson): kappa's
# rounded quotient is recoverable as kappa_num/kappa_den.
# ---------------------------------------------------------------------------

def _q191_sql(engine: str) -> str:
    if engine == "spark":
        nib = (
            "cast(conv(substring(md5(concat('{S}:', cast(vec_id as string)"
            ")), 1, 1), 16, 10) as int)"
        )
        unnest3 = "explode(array(r1, r2, r3))"
    else:
        nib = "('0x' || substring(md5('{S}:' || vec_id), 1, 1))::int"
        unnest3 = "unnest([r1, r2, r3])"
    rater = (
        "case when " + nib + " < 3 then (label + {K}) % 10 else label end"
    )
    body = """
    with p as (
      select vec_id,
             {R1} as r1, {R2} as r2, {R3} as r3
      from embeddings
    ),
    s as (
      select cast(count(*) as decimal(38,0)) as n,
             cast(sum(3 + 2 * (case when r1 = r2 then 1 else 0 end
                               + case when r1 = r3 then 1 else 0 end
                               + case when r2 = r3 then 1 else 0 end))
                  as decimal(38,0)) as ss
      from p
    ),
    c as (
      select cast(sum(cast(cj as decimal(38,0)) * cast(cj as decimal(38,0)))
                  as decimal(38,0)) as csq
      from (select r, cast(count(*) as bigint) as cj
            from (select {UNNEST3} as r from p) group by r)
    )
    select cast(s.n as bigint) as n_items,
           cast(s.ss as bigint) as s_sum,
           cast(cast(c.csq as decimal(38,0)) as string) as c_sq,
           cast(cast((s.ss - 3 * s.n) * (9 * s.n * s.n) - 6 * s.n * c.csq
                as decimal(38,0)) as string) as kappa_num,
           cast(cast(6 * s.n * (9 * s.n * s.n - c.csq)
                as decimal(38,0)) as string) as kappa_den
    from s cross join c
"""
    return (
        body.replace("{R1}", rater.replace("{S}", "f1").replace("{K}", "1"))
        .replace("{R2}", rater.replace("{S}", "f2").replace("{K}", "2"))
        .replace("{R3}", rater.replace("{S}", "f3").replace("{K}", "3"))
        .replace("{UNNEST3}", unnest3)
    )


sql_case(
    "q191_fleiss_kappa",
    _q191_sql("spark"),
    _q191_sql("duckdb"),
    doc="Fleiss' kappa for three deterministic md5-corrupted raters over "
    "the stored labels (the m-rater generalization of q147's Cohen "
    "kappa): kappa_num/kappa_den as exact decimal(38,0) rationals — "
    "with m=3, per-item sum n_ij^2 = 3 + 2*agreeing-pairs, so one "
    "aggregation plus one unpivoted category count; no rounded double "
    "in the hashed projection (the q147 hash-robustness convention)",
)


# ---------------------------------------------------------------------------
# q192 — RFM segmentation: per-user Recency / Frequency / Monetary,
# bucketed into quintiles (R, F) and log2 bands (M), then segment-level
# rollup. Quintiles come from count-of-counts histogram JOIN-cums over
# bounded supports (recency <= calendar days, frequency <= distinct
# per-user activity counts), broadcast-hinted — never a global window;
# the quintile id is pure integer arithmetic ceil(5*cum/N) =
# (5*cum + N - 1) div N, exact on both engines. Monetary uses integer
# milli-units (floor(v*1000 + 0.5), a fixed IEEE sequence) and a
# binary-length band — log-scaled without libm. The per-user reduction
# is checkpointed on the Spark side: five consumers (two histograms,
# their cums, the final join) would otherwise rescan events five times.
# ---------------------------------------------------------------------------

_Q192_U = """
    select user_id,
           cast(max({EPOCHDAY}) as bigint) as last_day,
           cast(count(*) as bigint) as freq,
           cast(sum(cast(floor(value * 1000.0 + 0.5) as bigint)) as bigint)
             as m_milli
    from events
    group by user_id
"""

_Q192_FINAL = """
    with u as (select * from {U}),
    mx as (select cast(max(last_day) as bigint) as maxd,
                  cast(count(*) as bigint) as nu from u),
    r as (
      select u.user_id, cast(mx.maxd - u.last_day as bigint) as recency,
             u.freq, u.m_milli, mx.nu
      from u cross join mx
    ),
    hr as (select recency as v, cast(count(*) as bigint) as c
           from r group by recency),
    cr as (
      select /*+ BROADCAST(h2) */ h1.v, cast(sum(h2.c) as bigint) as cum
      from hr h1 join hr h2 on h2.v <= h1.v group by h1.v
    ),
    hf as (select freq as v, cast(count(*) as bigint) as c
           from r group by freq),
    cf as (
      select /*+ BROADCAST(h2) */ h1.v, cast(sum(h2.c) as bigint) as cum
      from hf h1 join hf h2 on h2.v <= h1.v group by h1.v
    ),
    seg as (
      select /*+ BROADCAST(cr, cf) */
             cast((5 * cr.cum + r.nu - 1) {IDIV} r.nu as bigint)
               as r_quintile,
             cast((5 * cf.cum + r.nu - 1) {IDIV} r.nu as bigint)
               as f_quintile,
             cast(case when r.m_milli <= 0 then 0
                  else length(bin(r.m_milli)) end as bigint) as m_band,
             r.m_milli
      from r
      join cr on r.recency = cr.v
      join cf on r.freq = cf.v
    )
    select r_quintile, f_quintile, m_band,
           cast(count(*) as bigint) as n_users,
           cast(sum(m_milli) as bigint) as sum_m_milli,
           round(cast(sum(m_milli) as double) / count(*) / 1000.0, 6)
             as avg_monetary
    from seg
    group by r_quintile, f_quintile, m_band
    order by r_quintile, f_quintile, m_band
"""


def _q192_sql(engine: str) -> str:
    day = _EPOCHDAY_SPARK if engine == "spark" else _EPOCHDAY_DUCK
    idiv = "div" if engine == "spark" else "//"
    return (
        _Q192_FINAL.replace("{U}", "(" + _Q192_U.replace("{EPOCHDAY}", day) + ")")
        .replace("{IDIV}", idiv)
    )


def _q192_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, names=("events",))
    u = spark.sql(
        _Q192_U.replace("{EPOCHDAY}", _EPOCHDAY_SPARK)
    ).localCheckpoint()
    u.createOrReplaceTempView("__q192_u__")
    return spark.sql(
        _Q192_FINAL.replace("{U}", "__q192_u__").replace("{IDIV}", "div")
    )


register(
    "q192_rfm_segments",
    _q192_sql("duckdb"),
    doc="RFM segmentation: per-user recency/frequency/monetary -> R and F "
    "quintiles via bounded-histogram join-cums (ceil(5*cum/N) in pure "
    "integer arithmetic), M into binary-length bands (log2 without "
    "libm, exact) — then segment rollup with exact milli-unit sums. "
    "The per-user table is checkpointed (five consumers, one events "
    "scan); histogram supports are bounded by calendar days / activity "
    "counts, with /*+ BROADCAST */ on the cum self-joins",
)(_q192_spark)


# ---------------------------------------------------------------------------
# q193 — inter-event burstiness per event type: the coefficient
# B = (sigma - mu)/(sigma + mu) over microsecond gaps between
# consecutive events of the same (user, type) stream — B -> -1 periodic,
# 0 Poisson, +1 bursty; the traffic-shape diagnostic behind q159's gap
# quantiles. Gaps come from a (user_id, event_type)-partitioned lag
# (hash-partitioned, never global; event_id tiebreak for equal
# timestamps); moments are exact decimal(38,0) sums, and B is one fixed
# IEEE sequence over them: B = (sqrt(n*Sxx - Sx^2) - Sx) /
# (sqrt(n*Sxx - Sx^2) + Sx).
# ---------------------------------------------------------------------------

_Q193_BODY = """
    with g as (
      select user_id, event_type, event_id, {EPOCHUS} as t
      from events
    ),
    d as (
      select event_type,
             t - lag(t) over (
               partition by user_id, event_type order by t, event_id) as gap
      from g
    ),
    m as (
      select event_type,
             cast(count(*) as bigint) as n_gaps,
             cast(sum(cast(gap as decimal(38,0))) as decimal(38,0)) as sx,
             cast(sum(cast(gap as decimal(19,0)) * cast(gap as decimal(19,0)))
                  as decimal(38,0)) as sxx
      from d where gap is not null
      group by event_type
    )
    select event_type, n_gaps,
           cast(cast(sx as decimal(38,0)) as string) as sum_gap_us,
           cast(cast(sxx as decimal(38,0)) as string) as sum_gap_sq,
           round((sqrt(cast(n_gaps as double) * cast(sxx as double)
                       - cast(sx as double) * cast(sx as double))
                  - cast(sx as double))
                 / nullif(sqrt(cast(n_gaps as double) * cast(sxx as double)
                               - cast(sx as double) * cast(sx as double))
                          + cast(sx as double), 0.0), 6) + 0.0
             as burstiness
    from m
    order by event_type
"""

sql_case(
    "q193_interevent_burstiness",
    _Q193_BODY.replace("{EPOCHUS}", _EPOCHUS_SPARK),
    _Q193_BODY.replace("{EPOCHUS}", _EPOCHUS_DUCK),
    doc="burstiness coefficient (sigma-mu)/(sigma+mu) of inter-event "
    "microsecond gaps per event type (-1 periodic, 0 Poisson, +1 "
    "bursty): gaps from a (user, type)-partitioned lag with event_id "
    "tiebreak, exact decimal moment sums, B as one fixed IEEE sequence "
    "(q172's bit-identical-double recipe); +0.0 normalizes -0.0",
)


# ---------------------------------------------------------------------------
# q194 — Heaps'-law vocabulary growth: cumulative distinct vocabulary vs
# cumulative tokens over ~20 ADAPTIVE doc_id buckets (width =
# (max_doc+1)/20, a 1-row broadcast — the bucket count stays ~20 at ANY
# corpus size, so the downstream B^2 join-cum solve is bounded at 100 TB
# where a fixed width would make it quadratic), plus the log-log OLS
# exponent beta (V ~ k*T^beta). ONE (word x bucket) corpus aggregation —
# checkpointed on the Spark side because BOTH the per-bucket token
# totals and the word-first-occurrence reduction consume it — then all
# solving happens on <= n_docs/500 bucket rows (join-cums, broadcast-
# hinted). ln terms round to 9 and decimal-sum (q175's discipline);
# a single bucket yields NULL beta via non-ANSI 0/0.
# ---------------------------------------------------------------------------

_Q194_G = """
    select word, cast(doc_id {IDIV} w.wd as bigint) as bucket,
           cast(count(*) as bigint) as c
    from (select doc_id, {TOK} as word
          from (select doc_id, {WS} as ws from documents))
    cross join (select greatest((cast(max(doc_id) as bigint) + 1) {IDIV} 20,
                                1) as wd
                from documents) w
    group by word, cast(doc_id {IDIV} w.wd as bigint)
"""

_Q194_FINAL = """
    with g as (select * from {G}),
    nb as (select bucket, cast(sum(c) as bigint) as toks
           from g group by bucket),
    nv as (
      select fb as bucket, cast(count(*) as bigint) as nw
      from (select word, cast(min(bucket) as bigint) as fb
            from g group by word)
      group by fb
    ),
    per as (
      select nb.bucket, nb.toks, coalesce(nv.nw, 0) as nw
      from nb left join nv on nb.bucket = nv.bucket
    ),
    cum as (
      select /*+ BROADCAST(p2) */ p1.bucket,
             cast(sum(p2.toks) as bigint) as cum_tokens,
             cast(sum(p2.nw) as bigint) as cum_vocab
      from per p1 join per p2 on p2.bucket <= p1.bucket
      group by p1.bucket
    ),
    ols as (
      select cast(count(*) as bigint) as n,
             cast(sum(cast(round(ln(cast(cum_tokens as double)), 9)
                           as decimal(28,9))) as decimal(38,9)) as sx,
             cast(sum(cast(round(ln(cast(cum_vocab as double)), 9)
                           as decimal(28,9))) as decimal(38,9)) as sy,
             cast(sum(cast(round(ln(cast(cum_tokens as double))
                                 * ln(cast(cum_vocab as double)), 9)
                           as decimal(28,9))) as decimal(38,9)) as sxy,
             cast(sum(cast(round(ln(cast(cum_tokens as double))
                                 * ln(cast(cum_tokens as double)), 9)
                           as decimal(28,9))) as decimal(38,9)) as sxx
      from cum
    )
    select cum.bucket, cum.cum_tokens, cum.cum_vocab,
           round((cast(ols.n as double) * cast(ols.sxy as double)
                  - cast(ols.sx as double) * cast(ols.sy as double))
                 / nullif(cast(ols.n as double) * cast(ols.sxx as double)
                          - cast(ols.sx as double) * cast(ols.sx as double),
                          0.0), 6) as heaps_beta
    from cum cross join ols
    order by cum.bucket
"""

_TOK_SPARK_EVAL = (
    "explode(split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' '))"
)
_TOK_DUCK_EVAL = (
    "unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', "
    "'g')), ' '))"
)


# r12 (guide §2.3): the Spark side groups shingle TYPES only to count and
# min-bucket them — identity, never the text — so it shuffles the 8-byte
# structural xxhash64 of each 3-word slice instead of building and
# shuffling the concatenated shingle string (the oracle keeps strings;
# outputs are identical up to 64-bit collisions, none at any tested SF —
# same contract as the dedup operators' hash_grams).
_SHINGLE3H_SPARK = (
    "explode(case when size(ws) >= 3 then "
    "transform(sequence(1, size(ws) - 2), i -> xxhash64(slice(ws, i, 3))) "
    "else cast(array() as array<bigint>) end)"
)
_SHINGLE3_DUCK = (
    "unnest(list_transform(range(1, greatest(len(ws) - 1, 1)), "
    "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))"
)
_WS_SPARK = "split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ')"
_WS_DUCK = (
    "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"
)


def _q194_sql(engine: str) -> str:
    if engine == "spark":
        g = (
            _Q194_G.replace("{IDIV}", "div")
            .replace("{TOK}", _SHINGLE3H_SPARK)
            .replace("{WS}", _WS_SPARK)
        )
    else:
        g = (
            _Q194_G.replace("{IDIV}", "//")
            .replace("{TOK}", _SHINGLE3_DUCK)
            .replace("{WS}", _WS_DUCK)
        )
    return _Q194_FINAL.replace("{G}", "(" + g + ")")


def _q194_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import spread

    t = load_tables(spark, sf_dir, names=("documents",))
    # spread(): the shingle hashing under g is this query's dominant
    # compute (sf1.0 phase profile: 4.9 s of 6.0) and a single-file corpus
    # scan otherwise runs it on 2 partitions; no-op at real scale. Only
    # the ws subquery reads the spread view — the 1-row width aggregate
    # stays on the raw table (a repartition would cost more than the agg).
    spread(t["documents"]).createOrReplaceTempView("__q194_docs__")
    g = spark.sql(
        _Q194_G.replace("{IDIV}", "div")
        .replace("{TOK}", _SHINGLE3H_SPARK)
        .replace("{WS}", _WS_SPARK)
        .replace("as ws from documents", "as ws from __q194_docs__")
    ).localCheckpoint()
    g.createOrReplaceTempView("__q194_g__")
    return spark.sql(_Q194_FINAL.replace("{G}", "__q194_g__"))


register(
    "q194_heaps_law",
    _q194_sql("duckdb"),
    doc="Heaps'-law vocabulary growth: cumulative vocab vs cumulative "
    "3-shingle occurrences over ~20 adaptive doc-id buckets (shingle "
    "types, not bare words — a tiny closed word vocabulary saturates "
    "in one bucket; first-occurrence = min "
    "bucket per word), plus the log-log OLS exponent beta — the curve "
    "that sizes "
    "tokenizer vocabularies and dedup budgets. One (word x bucket) "
    "corpus aggregation, checkpointed for its two consumers; bucket "
    "join-cums broadcast-hinted; round-9 decimal-summed ln terms; "
    "single-bucket corpora yield NULL beta (non-ANSI 0/0)",
)(_q194_spark)


# ---------------------------------------------------------------------------
# q195 — Mann-Kendall trend test over daily event counts: the
# nonparametric trend sibling of q175 (OLS slope) and q166 (Theil-Sen
# median slope). S = sum over day pairs of sign(c_j - c_i) is an exact
# integer; the tie-corrected variance numerator
# n(n-1)(2n+5) - sum_t t(t-1)(2t+5) is an exact bigint (variance =
# num/18); z applies the continuity correction as one fixed IEEE
# sequence. The corpus reduces to the checkpointed day table once; the
# D^2 pair join is bounded by calendar days and broadcast-hinted.
# ---------------------------------------------------------------------------

_Q195_D = """
    select {EPOCHDAY} as day, cast(count(*) as bigint) as c
    from events
    group by {EPOCHDAY}
"""

_Q195_FINAL = """
    with d as (select * from {D}),
    nn as (select cast(count(*) as bigint) as n from d),
    s as (
      select /*+ BROADCAST(b) */ cast(coalesce(sum(
               case when b.c > a.c then 1
                    when b.c < a.c then -1 else 0 end), 0) as bigint) as s
      from d a join d b on b.day > a.day
    ),
    ties as (
      select cast(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) as bigint)
               as tie_term
      from (select cast(count(*) as bigint) as t from d group by c)
    )
    select nn.n as n_days, s.s as s_stat,
           cast(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term
                as bigint) as var_num,
           round(case
             when nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term <= 0
               then null
             when s.s > 0 then (cast(s.s as double) - 1.0)
               / sqrt(cast(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term
                           as double) / 18.0)
             when s.s < 0 then (cast(s.s as double) + 1.0)
               / sqrt(cast(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term
                           as double) / 18.0)
             else 0.0 end, 6) + 0.0 as z
    from nn cross join s cross join ties
"""


def _q195_sql(engine: str) -> str:
    day = _EPOCHDAY_SPARK if engine == "spark" else _EPOCHDAY_DUCK
    return _Q195_FINAL.replace("{D}", "(" + _Q195_D.replace("{EPOCHDAY}", day) + ")")


def _q195_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, names=("events",))
    d = spark.sql(
        _Q195_D.replace("{EPOCHDAY}", _EPOCHDAY_SPARK)
    ).localCheckpoint()
    d.createOrReplaceTempView("__q195_d__")
    return spark.sql(_Q195_FINAL.replace("{D}", "__q195_d__"))


register(
    "q195_mann_kendall",
    _q195_sql("duckdb"),
    doc="Mann-Kendall trend test over daily event counts: exact integer "
    "S from the sign-pair sum, exact bigint tie-corrected variance "
    "numerator (variance = num/18), z with continuity correction as "
    "one fixed IEEE sequence (+0.0 normalizes -0.0). The corpus "
    "reduces once to a checkpointed calendar-day table; the D^2 pair "
    "join is bounded and broadcast-hinted (the q166/q179 recipe)",
)(_q195_spark)


# ---------------------------------------------------------------------------
# q196 — Wilson score 95% interval for the per-type conversion rate:
# the CI that stays inside [0,1] and behaves at small n / extreme p
# where the Wald interval collapses (the number a launch-review reads
# next to q160's z). z = 1.959964 as a decimal literal (the q187
# convention, never engine-inverse-normal); exact x/n witnesses beside
# the fixed-IEEE center/half-width. One types-bounded aggregation.
# ---------------------------------------------------------------------------

_Q196_BODY = """
    with a as (
      select event_type,
             cast(count(*) as bigint) as n,
             cast(sum(case when value >= 100.0 then 1 else 0 end) as bigint)
               as x
      from events
      group by event_type
    )
    select event_type, n, x,
           round(cast(x as double) / n, 6) + 0.0 as rate,
           round(((cast(x as double) + 1.959964 * 1.959964 / 2.0)
                  - 1.959964 * sqrt((cast(x as double)
                                     * (cast(n as double)
                                        - cast(x as double)))
                                    / cast(n as double)
                                    + 1.959964 * 1.959964 / 4.0))
                 / (cast(n as double) + 1.959964 * 1.959964), 6) + 0.0
             as wilson_lo,
           round(((cast(x as double) + 1.959964 * 1.959964 / 2.0)
                  + 1.959964 * sqrt((cast(x as double)
                                     * (cast(n as double)
                                        - cast(x as double)))
                                    / cast(n as double)
                                    + 1.959964 * 1.959964 / 4.0))
                 / (cast(n as double) + 1.959964 * 1.959964), 6) + 0.0
             as wilson_hi
    from a
    order by event_type
"""

sql_case(
    "q196_wilson_interval",
    _Q196_BODY,
    _Q196_BODY,
    doc="Wilson score 95% CI for the per-type conversion rate (value >= "
    "100): exact x/n witnesses, z=1.959964 as a decimal literal, "
    "center +- half-width as one fixed IEEE sequence (+0.0 against "
    "-0.0) — stays in [0,1] at small n where Wald collapses. One "
    "types-bounded aggregation, no joins. SHARED-BODY: semantics "
    "pinned by tests/test_eval_queries.py planted recomputes",
)


# ---------------------------------------------------------------------------
# q197 — Cochran-Armitage trend test: is the conversion rate MONOTONE
# in an ordered exposure (hour-of-day band 0/1/2 as the dose score)?
# The categorical-trend companion to q160's two-arm z and q195's
# count trend. T = sum(s*x) - p_bar*sum(s*n); Var = p_bar*(1-p_bar) *
# (sum(n*s^2) - sum(s*n)^2/N); all five component statistics are exact
# bigints (emitted as witnesses) and z = T/sqrt(Var) is one fixed IEEE
# sequence over them — no N^4-scale exact intermediate, so nothing can
# overflow decimal(38,0) at any corpus size. Dose groups are bounded
# (3), per event type.
# ---------------------------------------------------------------------------

_Q197_BODY = """
    with d as (
      select event_type,
             cast(hour(ts) as bigint) / 8 as dosef,
             case when value >= 100.0 then 1 else 0 end as conv
      from events
    ),
    g as (
      select event_type, cast(floor(dosef) as bigint) as s,
             cast(count(*) as bigint) as n,
             cast(sum(conv) as bigint) as x
      from d group by event_type, cast(floor(dosef) as bigint)
    ),
    t as (
      select event_type,
             cast(sum(n) as bigint) as nn,
             cast(sum(x) as bigint) as xx,
             cast(sum(s * x) as bigint) as sx,
             cast(sum(s * n) as bigint) as sn,
             cast(sum(n * s * s) as bigint) as nss
      from g group by event_type
    )
    select event_type, nn as n, xx as x, sx as sum_sx, sn as sum_sn,
           nss as sum_nss,
           round((cast(sx as double)
                  - (cast(xx as double) / cast(nn as double))
                    * cast(sn as double))
                 / nullif(sqrt((cast(xx as double) / cast(nn as double))
                               * (1.0 - cast(xx as double)
                                  / cast(nn as double))
                               * (cast(nss as double)
                                  - (cast(sn as double)
                                     * cast(sn as double))
                                    / cast(nn as double))), 0.0), 6) + 0.0
             as ca_z
    from t
    order by event_type
"""

sql_case(
    "q197_cochran_armitage",
    _Q197_BODY,
    _Q197_BODY,
    doc="Cochran-Armitage trend test of conversion vs the ordered "
    "hour-of-day dose band (0-7/8-15/16-23 -> scores 0/1/2): the five "
    "component statistics (N, X, sum sx, sum sn, sum ns^2) are exact "
    "bigint witnesses and z is one fixed IEEE sequence over them — no "
    "N^4 exact intermediate, so nothing overflows at any corpus size; "
    "NULL z on zero variance (all-converted / none-converted types). "
    "SHARED-BODY: semantics pinned by tests/test_eval_queries.py",
)


# ---------------------------------------------------------------------------
# q198 — top 3-step behavior paths: the frequency table of consecutive
# (type -> type -> type) transitions within a user's stream — the
# sequence-mining extension of q154's 1-step Markov matrix (paths, not
# edges: "view->click->purchase" vs independent pairs). Two leads over
# the (user)-partitioned event-time order (hash-partitioned windows,
# event_id tiebreak), one count, top-20 with full tiebreaks.
# ---------------------------------------------------------------------------

_Q198_BODY = """
    with s as (
      select user_id, event_type,
             lead(event_type, 1) over (
               partition by user_id order by ts, event_id) as t2,
             lead(event_type, 2) over (
               partition by user_id order by ts, event_id) as t3
      from events
    )
    select event_type as step1, t2 as step2, t3 as step3,
           cast(count(*) as bigint) as n
    from s
    where t2 is not null and t3 is not null
    group by event_type, t2, t3
    order by n desc, step1, step2, step3
    limit 20
"""

sql_case(
    "q198_top_trigram_paths",
    _Q198_BODY,
    _Q198_BODY,
    doc="top-20 3-step behavior paths (consecutive event-type trigrams "
    "within each user's time-ordered stream) — the sequence-mining "
    "extension of q154's 1-step Markov matrix. Two leads over "
    "user-partitioned windows (event_id tiebreak), one bounded "
    "(types^3) aggregation, TakeOrderedAndProject top-k with full "
    "tiebreaks. SHARED-BODY: semantics pinned by planted path tests",
)


# ---------------------------------------------------------------------------
# q199 — day-of-week seasonality index: per-dow event volume vs the
# all-days mean (index 1.0 = flat), the seasonal profile a forecast or
# anomaly threshold normalizes by. Exact integer witnesses: per-dow
# counts and day tallies; the index is n_dow*total_days / (days_dow*N)
# in exact rational form beside the rounded quotient. One bounded
# (<= 7 x days) aggregation chain over the checkpointed day table.
# ---------------------------------------------------------------------------

_Q199_D = """
    select {EPOCHDAY} as day, cast(count(*) as bigint) as c
    from events
    group by {EPOCHDAY}
"""

# epoch day 0 = 1970-01-01 = a Thursday = dow 4 under ISO (Mon=1..Sun=7).
# Double-% nonnegative modulus: both engines' % is sign-of-dividend, so a
# bare (day + 3) % 7 + 1 yields buckets <= 0 for pre-1970 timestamps
# (epoch day -5 -> dow -1); ((x % 7) + 7) % 7 folds them in (ADVICE r6).
_Q199_FINAL = """
    with d as (select * from {D}),
    w as (
      select cast(((day + 3) % 7 + 7) % 7 + 1 as bigint) as dow,
             cast(count(*) as bigint) as n_days,
             cast(sum(c) as bigint) as n_events
      from d group by cast(((day + 3) % 7 + 7) % 7 + 1 as bigint)
    ),
    tot as (
      select cast(sum(n_days) as bigint) as total_days,
             cast(sum(n_events) as bigint) as total_events
      from w
    )
    select w.dow, w.n_days, w.n_events,
           cast(w.n_events * tot.total_days as bigint) as idx_num,
           cast(w.n_days * tot.total_events as bigint) as idx_den,
           round(cast(w.n_events * tot.total_days as double)
                 / (cast(w.n_days as double)
                    * cast(tot.total_events as double)), 6) as seasonality
    from w cross join tot
    order by w.dow
"""


def _q199_sql(engine: str) -> str:
    day = _EPOCHDAY_SPARK if engine == "spark" else _EPOCHDAY_DUCK
    return _Q199_FINAL.replace(
        "{D}", "(" + _Q199_D.replace("{EPOCHDAY}", day) + ")"
    )


def _q199_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, names=("events",))
    d = spark.sql(
        _Q199_D.replace("{EPOCHDAY}", _EPOCHDAY_SPARK)
    ).localCheckpoint()
    d.createOrReplaceTempView("__q199_d__")
    return spark.sql(_Q199_FINAL.replace("{D}", "__q199_d__"))


register(
    "q199_dow_seasonality",
    _q199_sql("duckdb"),
    doc="day-of-week seasonality index: per-ISO-dow volume vs the "
    "all-days mean (epoch day 0 = Thursday anchors the modular dow "
    "without engine date functions) — exact idx_num/idx_den bigint "
    "rationals beside the rounded index. The corpus reduces once to "
    "the checkpointed calendar-day table; everything downstream is "
    "<= 7 rows",
)(_q199_spark)


# ---------------------------------------------------------------------------
# q200 — Fisher discriminant ratio of the first embedding component
# across labels: between-class variance / within-class variance over
# exact integer-quantized values (milli-units), the separability audit
# that says whether a stored feature carries any label signal at all.
# Grouped exact moments (labels-bounded), then one fixed IEEE sequence:
#   between = sum_k n_k*(mu_k - mu)^2 / N,  within = sum_k n_k*var_k / N
# computed from the exact per-label (n, S1, S2) via the standard
# decomposition: N*S2_total - ... all in decimal(38,0).
# ---------------------------------------------------------------------------

_Q200_BODY = """
    with q as (
      select label,
             cast(floor(cast({E1} as double) * 1000.0 + 0.5) as bigint) as v
      from embeddings
    ),
    g as (
      select label, cast(count(*) as bigint) as n,
             cast(sum(cast(v as decimal(19,0))) as decimal(38,0)) as s1,
             cast(sum(cast(v as decimal(19,0)) * cast(v as decimal(19,0)))
                  as decimal(38,0)) as s2
      from q group by label
    ),
    t as (
      select cast(sum(n) as decimal(38,0)) as nn,
             cast(sum(s1) as decimal(38,0)) as ts1,
             cast(sum(s2) as decimal(38,0)) as ts2,
             cast(sum(cast(s1 * s1 as decimal(38,0)) / n) as double) as sb_raw
      from g
    )
    select cast(t.nn as bigint) as n_rows,
           cast((select count(*) from g) as bigint) as n_labels,
           cast(cast(t.ts1 as decimal(38,0)) as string) as sum_v,
           cast(cast(t.ts2 as decimal(38,0)) as string) as sum_v_sq,
           round((t.sb_raw - cast(t.ts1 as double) * cast(t.ts1 as double)
                             / cast(t.nn as double))
                 / nullif(cast(t.ts2 as double) - t.sb_raw, 0.0), 6) + 0.0
             as fisher_ratio
    from t
"""

sql_case(
    "q200_fisher_ratio",
    _Q200_BODY.replace("{E1}", "element_at(embedding, 1)"),
    _Q200_BODY.replace("{E1}", "embedding[1]"),
    doc="Fisher discriminant ratio (between-class SS / within-class SS) "
    "of the milli-quantized first embedding component across labels — "
    "the does-this-feature-separate-classes audit. Exact decimal "
    "moments per label (labels-bounded groups); the ratio uses the "
    "identity SS_between = sum_k s1_k^2/n_k - S1^2/N and SS_within = "
    "S2 - sum_k s1_k^2/n_k as one fixed IEEE sequence; NULL on zero "
    "within-class variance. SHARED-STRUCTURE planted-tested",
)
