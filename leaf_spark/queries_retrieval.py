"""Catalog entries q163-q165: retrieval-stack analytics — hybrid-ranker
reciprocal-rank fusion, Zipf tail-index estimation (Hill), and graded
ranking evaluation (nDCG@10).

These close the retrieval-quality loop the catalog already feeds: q71
(BM25) and q47 (cosine) produce rankings; q163 fuses two rankers, q165
scores a ranker against graded relevance, and q164 measures the
frequency skew (tail index) that sizes every vocab/sampling decision
upstream (q137's coverage curve tells you where the curve flattens;
q164 tells you the exponent that law follows).

Determinism conventions (the q117/q154 discipline): counts and ranks
exact bigints; RRF carries the exact rational (num, den) beside the
rounded quotient; every float term rounds to 6 before a decimal(38,6)
sum so partition order can't change totals; final quotients of already-
deterministic doubles round last.

Scale notes (SCALE.md §1): corpus-sized work is one scan + one
aggregation per ranker; top lists come from ORDER BY + LIMIT
(TakeOrderedAndProject — parallel partial top-k, never a global sort);
the only single-partition windows run over LIMIT-bounded lists (100 /
51 rows, allowlisted in tests/test_plans.py); nDCG's windows are
hash-partitioned by query term over term-filtered postings (q71's
retrieval-sized bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .queries import register, sql_case
from .session import load_tables

# shared tokenizer (q137's form): lower, collapse whitespace, split
_TOK_SPARK = (
    "explode(split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' '))"
)
_TOK_DUCK = (
    "unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', "
    "'g')), ' '))"
)


def _cos(engine: str, a: str, b: str) -> str:
    """Cosine similarity between two array columns (q47's forms)."""
    if engine == "spark":
        da = f"transform({a}, x -> cast(x as double))"
        db = f"transform({b}, x -> cast(x as double))"
        return (
            f"aggregate(zip_with({da}, {db}, (x, y) -> x * y), 0.0d, "
            f"(acc, x) -> acc + x) "
            f"/ (sqrt(aggregate({da}, 0.0d, (acc, x) -> acc + x * x)) "
            f"* sqrt(aggregate({db}, 0.0d, (acc, x) -> acc + x * x)))"
        )
    dot = (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> cast({a}[i] as double) * cast({b}[i] as double)))"
    )
    na = (
        f"sqrt(list_sum(list_transform({a}, "
        f"x -> cast(x as double) * cast(x as double))))"
    )
    nb = (
        f"sqrt(list_sum(list_transform({b}, "
        f"x -> cast(x as double) * cast(x as double))))"
    )
    return f"{dot} / ({na} * {nb})"


# ---------------------------------------------------------------------------
# q163 — reciprocal-rank fusion of a keyword ranker and an embedding
# ranker (RRF, Cormack et al. 2009: score = sum 1/(k + rank), k = 60).
# The hybrid-retrieval primitive: each ranker contributes its top-100
# list (ORDER BY + LIMIT → TakeOrderedAndProject, partial top-k per
# partition — never a global sort), ranks come from row_number over the
# two 100-row lists (bounded, allowlisted), and the fused score is the
# EXACT rational — num/den bigints ((120+r1+r2) / (60+r1)(60+r2) when
# both rankers hit, 1/(60+r) for a single hit) — beside the rounded
# quotient. Corpus-sized work: one documents scan (tf aggregation) and
# one embeddings scan (cosine projection).
# ---------------------------------------------------------------------------

_Q163_BODY = """
    with kw as (
      select doc_id, s from (
        select doc_id,
               cast(sum(case when tok in ('spark', 'join', 'vector')
                             then 1 else 0 end) as bigint) as s
        from (select doc_id, {TOKENS} as tok from documents)
        group by doc_id
      ) where s > 0
    ),
    kwtop as (select doc_id, s from kw order by s desc, doc_id limit 100),
    kr as (
      select doc_id,
             row_number() over (order by s desc, doc_id) as rk
      from kwtop
    ),
    probe as (select embedding as pv from embeddings where vec_id = 7),
    cos as (
      select vec_id, round({COS}, 6) as cs
      from embeddings cross join probe
    ),
    ctop as (select vec_id, cs from cos order by cs desc, vec_id limit 100),
    cr as (
      select vec_id,
             row_number() over (order by cs desc, vec_id) as rc
      from ctop
    ),
    f as (
      select coalesce(kr.doc_id, cr.vec_id) as id, kr.rk, cr.rc
      from kr full outer join cr on kr.doc_id = cr.vec_id
    ),
    g as (
      select id, rk, rc,
             cast(case when rk is not null and rc is not null
                       then 120 + rk + rc else 1 end as bigint) as rrf_num,
             cast(case when rk is not null and rc is not null
                       then (60 + rk) * (60 + rc)
                       else 60 + coalesce(rk, rc) end as bigint) as rrf_den
      from f
    )
    select id, rk as rank_kw, rc as rank_cos, rrf_num, rrf_den,
           round(cast(rrf_num as double) / rrf_den, 9) as rrf
    from g
    order by rrf desc, id
    limit 20
"""

sql_case(
    "q163_rrf_fusion",
    _Q163_BODY.replace("{TOKENS}", _TOK_SPARK).replace(
        "{COS}", _cos("spark", "embedding", "pv")
    ),
    _Q163_BODY.replace("{TOKENS}", _TOK_DUCK).replace(
        "{COS}", _cos("duckdb", "embedding", "pv")
    ),
    doc="reciprocal-rank fusion (k=60) of a keyword-tf ranker over "
    "documents and a cosine-to-probe ranker over embeddings: top-100 "
    "per ranker via ORDER BY + LIMIT (TakeOrderedAndProject partial "
    "top-k, never a global sort), ranks from row_number over the two "
    "100-row lists (bounded, allowlisted), fused score as the exact "
    "bigint rational beside the round-9 quotient — the hybrid-"
    "retrieval primitive. One scan per ranker",
)


# ---------------------------------------------------------------------------
# q164 — Zipf tail index of the token-frequency distribution via the
# Hill estimator over the top-k frequencies:
#   alpha = k / sum_{i=1..k} ln(f_i / f_{k+1}),  k = 50.
# The skew exponent that sizes vocab budgets, temperature mixing, and
# LSH banding upstream. The corpus reduces to ONE vocab aggregation
# whose top-51 rows (ORDER BY + LIMIT) are localCheckpointed; the
# bounded solve (rank, log-ratio terms, decimal sum) runs over the
# checkpointed 51-row table — zero parquet scans in the final plan,
# asserted by test_checkpointed_entries_do_not_rescan.
# ---------------------------------------------------------------------------

_Q164_TOP = """
    select tok, cast(count(*) as bigint) as c
    from (select {TOKENS} as tok from documents)
    where tok <> ''
    group by tok
    order by c desc, tok
    limit 51
"""

_Q164_FINAL = """
    with r as (
      select tok, c, row_number() over (order by c desc, tok) as rk
      from {TOP}
    ),
    kth as (select cast(c as bigint) as ck from r where rk = 51),
    s as (
      select cast(sum(cast(round(
               ln(cast(c as double) / (select ck from kth)), 6)
             as decimal(38,6))) as decimal(38,6)) as slog
      from r where rk <= 50
    )
    select cast(50 as bigint) as k,
           (select ck from kth) as f_kplus1,
           round(cast(slog as double), 6) as sum_log,
           round(50.0 / nullif(cast(slog as double), 0.0), 6) as alpha_hill
    from s
"""


def _q164_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, names=("documents",))
    top = spark.sql(_Q164_TOP.replace("{TOKENS}", _TOK_SPARK)).localCheckpoint()
    top.createOrReplaceTempView("__q164_top__")
    return spark.sql(_Q164_FINAL.replace("{TOP}", "__q164_top__"))


register(
    "q164_zipf_tail_index",
    _Q164_FINAL.replace(
        "{TOP}", "(" + _Q164_TOP.replace("{TOKENS}", _TOK_DUCK) + ")"
    ),
    doc="Hill estimator of the Zipf tail index over the top-50 token "
    "frequencies (threshold = the 51st): one vocab aggregation, top-51 "
    "via ORDER BY + LIMIT, then a checkpointed 51-row solve — exact "
    "counts, round-6 log-ratio terms decimal-summed, alpha as the "
    "final rounded quotient. The frequency-skew exponent that sizes "
    "vocab/sampling budgets; zero corpus rescans in the solve",
)(_q164_spark)


# ---------------------------------------------------------------------------
# q165 — nDCG@10 of a length-normalized tf ranker against graded tf
# relevance, per query term. The ranking-evaluation primitive (how good
# is a retrieval run, not just what it returns): system order ranks by
# the EXACT integer score tf*1e6 div dl (tie doc_id), the ideal order
# ranks by graded relevance min(tf, 3); DCG terms (2^rel - 1) /
# log2(rank + 1) round to 6 and decimal-sum. Postings are filtered to
# the query terms at the scan (retrieval-sized, q71's bound); both
# rank windows are hash-partitioned by term. The candidate table is
# localCheckpointed so the two rankings share ONE corpus scan.
# ---------------------------------------------------------------------------

_Q165_SCORED = """
    select term, doc_id, tf, dl,
           cast(tf * 1000000 {IDIV} dl as bigint) as sys_score,
           cast(least(tf, 3) as bigint) as rel
    from (
      select term, doc_id, cast(count(*) as bigint) as tf,
             cast(min(dl) as bigint) as dl
      from (
        select doc_id, {DL} as dl, {TERM} as term
        from (select doc_id, {WORDS} as words from documents)
      )
      where term in ('spark', 'join', 'vector')
      group by term, doc_id
    )
"""

_Q165_FINAL = """
    with sysr as (
      select term, rel,
             row_number() over (
               partition by term order by sys_score desc, doc_id) as rk
      from {SCORED}
    ),
    idl as (
      select term, rel,
             row_number() over (
               partition by term order by rel desc, doc_id) as rk
      from {SCORED}
    ),
    dcg as (
      select term,
             cast(sum(cast(round(
               (case rel when 1 then 1 when 2 then 3 else 7 end)
               / log2(cast(rk + 1 as double)), 6)
             as decimal(38,6))) as decimal(38,6)) as d
      from sysr where rk <= 10 group by term
    ),
    idcg as (
      select term,
             cast(sum(cast(round(
               (case rel when 1 then 1 when 2 then 3 else 7 end)
               / log2(cast(rk + 1 as double)), 6)
             as decimal(38,6))) as decimal(38,6)) as d
      from idl where rk <= 10 group by term
    )
    select dcg.term,
           round(cast(dcg.d as double), 6) as dcg10,
           round(cast(idcg.d as double), 6) as idcg10,
           round(cast(dcg.d as double) / cast(idcg.d as double), 6) as ndcg10
    from dcg join idcg on dcg.term = idcg.term
    order by dcg.term
"""


def _q165_sql(engine: str) -> str:
    if engine == "spark":
        scored = (
            _Q165_SCORED.replace("{IDIV}", "div")
            .replace("{DL}", "size(words)")
            .replace("{TERM}", "explode(words)")
            .replace(
                "{WORDS}",
                "split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ')",
            )
        )
    else:
        scored = (
            _Q165_SCORED.replace("{IDIV}", "//")
            .replace("{DL}", "len(words)")
            .replace("{TERM}", "unnest(words)")
            .replace(
                "{WORDS}",
                "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', "
                "'g')), ' ')",
            )
        )
    return scored


def _q165_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, names=("documents",))
    scored = spark.sql(_q165_sql("spark")).localCheckpoint()
    scored.createOrReplaceTempView("__q165_scored__")
    return spark.sql(_Q165_FINAL.replace("{SCORED}", "__q165_scored__"))


register(
    "q165_ndcg_eval",
    _Q165_FINAL.replace("{SCORED}", "(" + _q165_sql("duckdb") + ")"),
    doc="nDCG@10 per query term: system order by the exact integer score "
    "tf*1e6 div dl, ideal order by graded relevance min(tf,3), DCG "
    "terms (2^rel - 1)/log2(rank+1) rounded to 6 and decimal-summed — "
    "the ranking-evaluation primitive. Postings filtered to the query "
    "terms at the scan; rank windows hash-partitioned by term; the "
    "candidate table is checkpointed so both rankings share one scan",
)(_q165_spark)
