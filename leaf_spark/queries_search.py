"""Catalog entries q71-q75: retrieval, quality gating, LM scoring, semantic
dedup, and corpus rollup stats — the round-3 training-pipeline additions.

Float-determinism conventions (same as the rest of the catalog): cosine and
per-term partial scores round to 5-6 decimals before any reordering
aggregate; order-sensitive double sums route through decimal(38,6); final
scores round to 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .queries import register
from .session import load_tables

_BM25_TERMS = ["spark", "join", "vector"]


@register(
    "q71_bm25_topk",
    """
    with w as (
      select doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') as words
      from documents
    ),
    stats as (select count(*) as n_docs, sum(len(words)) as total_len from w),
    posting as (select doc_id, len(words) as dl, unnest(words) as term from w),
    tf as (
      select doc_id, dl, term, count(*) as tf
      from posting where term in ('spark', 'join', 'vector')
      group by 1, 2, 3
    ),
    dfreq as (select term, count(*) as df from tf group by term)
    select doc_id,
           round(cast(sum(cast(round(
             ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             * (tf * (1.2 + 1.0))
             / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl
                            / (cast(total_len as double) / n_docs))),
             6) as decimal(38,6))) as double), 4) as score
    from tf join dfreq using (term) cross join stats
    group by doc_id
    order by score desc, doc_id
    limit 10
    """,
    doc="BM25 top-10 for a 3-term query — postings filtered to query terms "
    "at the scan (shuffle is O(matching postings), not O(corpus)); df/stats "
    "broadcast; decimal-summed term scores (operators/search.py)",
)
def q71_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.search import bm25_topk

    t = load_tables(spark, sf_dir, names=("documents",))
    return bm25_topk(t["documents"], _BM25_TERMS, k=10)


@register(
    "q72_gopher_filter",
    """
    with base as (
      select doc_id,
             text,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) as nt
      from documents
    ),
    feat as (
      select doc_id,
             string_split(nt, ' ') as w,
             case when length(nt) = 0 then 0 else len(string_split(nt, ' ')) end as n_tokens,
             length(text) as n_chars,
             length(regexp_replace(text, '[^\\p{L}]', '', 'g')) as alpha,
             length(regexp_replace(text, '[^#…]', '', 'g')) as symbol,
             string_split(text, chr(10)) as lines
      from base
    ),
    rules as (
      select doc_id,
             cast(n_tokens as bigint) as n_tokens,
             n_tokens >= 50 and n_tokens <= 100000 as r_len,
             cast(alpha as double) / greatest(n_tokens, 1) >= 3.0
               and cast(alpha as double) / greatest(n_tokens, 1) <= 10.0 as r_avg_len,
             cast(symbol as double) / greatest(n_chars, 1) <= 0.1 as r_symbol,
             cast(len(list_filter(lines, x -> regexp_matches(trim(x), '^[-*•]')))
                  as double) / greatest(len(lines), 1) <= 0.9 as r_bullet,
             cast(len(list_filter(w, x -> regexp_matches(x, '\\p{L}')))
                  as double) / greatest(n_tokens, 1) >= 0.8 as r_alpha_word,
             len(list_intersect(list_distinct(w),
                 ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'])) >= 2
               as r_stopword
      from feat
    )
    select doc_id, n_tokens, r_len, r_avg_len, r_symbol, r_bullet,
           r_alpha_word, r_stopword,
           r_len and r_avg_len and r_symbol and r_bullet and r_alpha_word
             and r_stopword as keep
    from rules
    """,
    doc="Gopher-rule hard quality gates (Rae et al. 2021): per-rule verdicts "
    "+ final keep flag; single shuffle-free projection "
    "(operators/text.py gopher_filter)",
)
def q72_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import gopher_filter

    t = load_tables(spark, sf_dir, names=("documents", "embeddings"))
    return gopher_filter(t["documents"])


@register(
    "q73_semantic_dedup",
    """
    with seeds as (
      select vec_id as sid, embedding as sv from embeddings order by vec_id limit 8
    ),
    sims as (
      select e.vec_id as id, s.sid,
             round(
               list_sum(list_transform(range(1, len(e.embedding) + 1),
                 i -> cast(e.embedding[i] as double) * cast(s.sv[i] as double)))
               / (sqrt(list_sum(list_transform(e.embedding,
                       x -> cast(x as double) * cast(x as double))))
                  * sqrt(list_sum(list_transform(s.sv,
                       x -> cast(x as double) * cast(x as double))))),
               5) as sim
      from embeddings e cross join seeds s
    ),
    assigned as (
      select id, sid as cluster from (
        select id, sid,
               row_number() over (partition by id order by sim desc, sid) as rn
        from sims
      ) where rn = 1
    )
    select a1.cluster, a1.id as id_a, a2.id as id_b,
           round(
             list_sum(list_transform(range(1, len(x.embedding) + 1),
               i -> cast(x.embedding[i] as double) * cast(y.embedding[i] as double)))
             / (sqrt(list_sum(list_transform(x.embedding,
                     x1 -> cast(x1 as double) * cast(x1 as double))))
                * sqrt(list_sum(list_transform(y.embedding,
                     y1 -> cast(y1 as double) * cast(y1 as double))))),
             5) as cosine
    from assigned a1
    join assigned a2 on a1.cluster = a2.cluster and a1.id < a2.id
    join embeddings x on x.vec_id = a1.id
    join embeddings y on y.vec_id = a2.id
    where round(
             list_sum(list_transform(range(1, len(x.embedding) + 1),
               i -> cast(x.embedding[i] as double) * cast(y.embedding[i] as double)))
             / (sqrt(list_sum(list_transform(x.embedding,
                     x1 -> cast(x1 as double) * cast(x1 as double))))
                * sqrt(list_sum(list_transform(y.embedding,
                     y1 -> cast(y1 as double) * cast(y1 as double))))),
             5) >= 0.3
    """,
    doc="SemDeDup-style semantic near-dup pairs: deterministic seed-argmax "
    "clustering (broadcast seeds), within-cluster-only cosine pairs — the "
    "O(n²)→O(Σ|c|²) pruning (operators/similarity.py semantic_dedup_pairs)",
)
def q73_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import semantic_dedup_pairs

    t = load_tables(spark, sf_dir, names=("documents", "embeddings"))
    return semantic_dedup_pairs(t["embeddings"], num_seeds=8, threshold=0.3)


@register(
    "q74_corpus_stats",
    """
    with w as (
      select source, lang,
             case when length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) = 0
                  then 0
                  else len(string_split(
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))
             end as n_tokens,
             n_chars
      from documents
    )
    select source, lang,
           cast(count(*) as bigint) as n_docs,
           cast(sum(n_tokens) as bigint) as total_tokens,
           round(cast(cast(sum(n_tokens) as decimal(38,6)) / count(*) as double), 4)
             as avg_tokens,
           cast(min(n_tokens) as bigint) as min_tokens,
           cast(max(n_tokens) as bigint) as max_tokens,
           cast(sum(n_chars) as bigint) as total_chars
    from w
    group by source, lang
    """,
    doc="per-(source, lang) corpus rollup: doc/token/char totals + exact "
    "decimal-safe averages — the dataset-card stats pass, one shuffle on a "
    "low-cardinality key",
)
def q74_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import token_count

    t = load_tables(spark, sf_dir, names=("documents",))
    w = t["documents"].select(
        "source", "lang", token_count(F.col("text")).alias("n_tokens"), "n_chars"
    )
    return w.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(
            (F.sum("n_tokens").cast("decimal(38,6)") / F.count(F.lit(1))).cast(
                "double"
            ),
            4,
        ).alias("avg_tokens"),
        F.min("n_tokens").cast("bigint").alias("min_tokens"),
        F.max("n_tokens").cast("bigint").alias("max_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@register(
    "q75_unigram_logprob",
    """
    with toks as (
      select doc_id,
             unnest(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) as tok
      from documents
    ),
    total as (select count(*) as n_total from toks),
    vocab as (select tok, count(*) as n_tok from toks group by tok)
    select doc_id,
           cast(count(*) as bigint) as n_tokens,
           round(cast(sum(cast(round(
                   -ln(cast(n_tok as double) / n_total), 6) as decimal(38,6)))
                 as double) / count(*), 4) as mean_neglogprob
    from toks join vocab using (tok) cross join total
    group by doc_id
    """,
    doc="mean per-token unigram -log p — the cheap LM-quality / perplexity "
    "proxy; Zipf-bounded vocab table, AQE-chosen join, decimal-safe sums "
    "(operators/search.py unigram_logprob)",
)
def q75_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.search import unigram_logprob

    t = load_tables(spark, sf_dir, names=("documents",))
    return unigram_logprob(t["documents"])


@register(
    "q76_clean_pipeline",
    """
    with base as (
      select doc_id, source, text,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) as nt
      from documents
    ),
    feat as (
      select doc_id, source, text, nt,
             string_split(nt, ' ') as w,
             case when length(nt) = 0 then 0 else len(string_split(nt, ' ')) end as n_tokens,
             length(text) as n_chars,
             length(regexp_replace(text, '[^\\p{L}]', '', 'g')) as alpha,
             length(regexp_replace(text, '[^#…]', '', 'g')) as symbol,
             string_split(text, chr(10)) as lines
      from base
    ),
    gated as (
      select doc_id, source, nt, n_tokens
      from feat
      where (n_tokens >= 50 and n_tokens <= 100000)
        and cast(alpha as double) / greatest(n_tokens, 1) >= 3.0
        and cast(alpha as double) / greatest(n_tokens, 1) <= 10.0
        and cast(symbol as double) / greatest(n_chars, 1) <= 0.1
        and cast(len(list_filter(lines, x -> regexp_matches(trim(x), '^[-*•]')))
                 as double) / greatest(len(lines), 1) <= 0.9
        and cast(len(list_filter(w, x -> regexp_matches(x, '\\p{L}')))
                 as double) / greatest(n_tokens, 1) >= 0.8
        and len(list_intersect(list_distinct(w),
                ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'])) >= 2
    ),
    deduped as (
      select doc_id, source, n_tokens from (
        select doc_id, source, n_tokens,
               row_number() over (partition by nt order by doc_id) as rn
        from gated
      ) where rn = 1
    ),
    input_counts as (select source, count(*) as n_input from base group by source)
    select i.source,
           cast(i.n_input as bigint) as n_input,
           cast(coalesce(g.n_gated, 0) as bigint) as n_gated,
           cast(coalesce(d.n_unique, 0) as bigint) as n_unique,
           cast(coalesce(d.total_tokens, 0) as bigint) as total_tokens
    from input_counts i
    left join (select source, count(*) as n_gated from gated group by source) g
      using (source)
    left join (select source, count(*) as n_unique, sum(n_tokens) as total_tokens
               from deduped group by source) d
      using (source)
    """,
    doc="end-to-end cleaning pipeline: Gopher gate → corpus-level exact "
    "dedup (first doc_id per normalized text wins) → per-source funnel "
    "stats; the gate (shuffle-free) runs BEFORE any data moves, dedup is "
    "one winner-election shuffle on the normalized-content key",
)
def q76_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import normalized
    from .operators.text import gopher_filter, token_count

    t = load_tables(spark, sf_dir, names=("documents",))
    docs = t["documents"]
    gate = gopher_filter(docs).where("keep").select("doc_id")
    gated = docs.join(gate, "doc_id").select(
        "doc_id",
        "source",
        normalized(F.col("text")).alias("nt"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    from pyspark.sql.window import Window

    deduped = (
        gated.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("nt").orderBy("doc_id")),
        )
        .where(F.col("rn") == 1)
        .drop("rn", "nt")
    )
    inputs = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_input"))
    g = gated.groupBy("source").agg(F.count(F.lit(1)).alias("n_gated"))
    d = deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    return (
        inputs.join(g, "source", "left")
        .join(d, "source", "left")
        .select(
            "source",
            F.col("n_input").cast("bigint").alias("n_input"),
            F.coalesce("n_gated", F.lit(0)).cast("bigint").alias("n_gated"),
            F.coalesce("n_unique", F.lit(0)).cast("bigint").alias("n_unique"),
            F.coalesce("total_tokens", F.lit(0)).cast("bigint").alias("total_tokens"),
        )
    )


@register(
    "q77_incremental_dedup",
    """
    with n as (
      select doc_id, source,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) as nt
      from documents
    ),
    corpus as (select * from n where doc_id % 10 < 8),
    batch as (select * from n where doc_id % 10 >= 8),
    fresh as (
      select b.* from batch b
      where not exists (select 1 from corpus c where c.nt = b.nt)
    ),
    kept as (
      select doc_id, source from (
        select doc_id, source,
               row_number() over (partition by nt order by doc_id) as rn
        from fresh
      ) where rn = 1
    )
    select source,
           cast(count(*) as bigint) as n_new_docs,
           cast(min(doc_id) as bigint) as first_id,
           cast(max(doc_id) as bigint) as last_id
    from kept
    group by source
    """,
    doc="ingest-time incremental dedup: new-batch docs (doc_id%10>=8) "
    "anti-joined on the content hash against the existing corpus "
    "(doc_id%10<8), then first-occurrence-wins within the batch — per-source "
    "admission stats (operators/dedup.py incremental_dedup)",
)
def q77_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import incremental_dedup

    t = load_tables(spark, sf_dir, names=("orders", "documents"))
    docs = t["documents"]
    out = incremental_dedup(
        docs.where(F.col("doc_id") % 10 >= 8),
        docs.where(F.col("doc_id") % 10 < 8),
    )
    return out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_new_docs"),
        F.min("doc_id").cast("bigint").alias("first_id"),
        F.max("doc_id").cast("bigint").alias("last_id"),
    )


@register(
    "q78_window_breadth",
    """
    select o_custkey,
           o_orderkey,
           ntile(4) over w as quartile,
           round(percent_rank() over w, 6) as pct_rank,
           round(cume_dist() over w, 6) as cdist,
           lag(o_orderkey) over w as prev_order,
           lead(o_orderkey) over w as next_order,
           first_value(o_orderkey) over w as first_order
    from orders
    where o_custkey < 200
    window w as (partition by o_custkey order by o_orderkey)
    """,
    doc="window-function breadth: ntile / percent_rank / cume_dist / "
    "lag / lead / first_value over one named window — one shuffle on the "
    "partition key, single sort serves all six functions",
)
def q78_window_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, names=("orders", "documents"))
    return spark.sql(
        """
        select o_custkey,
               o_orderkey,
               ntile(4) over w as quartile,
               round(percent_rank() over w, 6) as pct_rank,
               round(cume_dist() over w, 6) as cdist,
               lag(o_orderkey) over w as prev_order,
               lead(o_orderkey) over w as next_order,
               first_value(o_orderkey) over w as first_order
        from orders
        where o_custkey < 200
        window w as (partition by o_custkey order by o_orderkey)
        """
    )


@register(
    "q79_rollup_stats",
    """
    select coalesce(source, '<all>') as source,
           coalesce(lang, '<all>') as lang,
           cast(count(*) as bigint) as n_docs,
           cast(sum(n_chars) as bigint) as total_chars,
           cast(grouping(source) as bigint) as g_source,
           cast(grouping(lang) as bigint) as g_lang
    from documents
    group by rollup (source, lang)
    """,
    doc="ROLLUP dataset-card stats: per-(source,lang), per-source subtotal, "
    "and grand total in one aggregate pass (partial aggregation covers all "
    "grouping sets before the single shuffle)",
)
def q79_rollup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, names=("documents",))
    return spark.sql(
        """
        select coalesce(source, '<all>') as source,
               coalesce(lang, '<all>') as lang,
               cast(count(*) as bigint) as n_docs,
               cast(sum(n_chars) as bigint) as total_chars,
               cast(grouping(source) as bigint) as g_source,
               cast(grouping(lang) as bigint) as g_lang
        from documents
        group by rollup (source, lang)
        """
    )


@register(
    "q80_editdist_blocked",
    """
    with n as (
      select doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) as nt
      from documents
    ),
    blocked as (
      select doc_id, nt, substr(nt, 1, 12) as blk from n where length(nt) >= 12
    )
    select a.doc_id as id_a, b.doc_id as id_b,
           cast(levenshtein(substr(a.nt, 1, 60), substr(b.nt, 1, 60)) as bigint)
             as edit_dist
    from blocked a
    join blocked b on a.blk = b.blk and a.doc_id < b.doc_id
    where levenshtein(substr(a.nt, 1, 60), substr(b.nt, 1, 60)) <= 20
    """,
    doc="entity-resolution-style near-dup: block on the first 12 normalized "
    "chars (uniform prefix buckets — never an all-pairs join), verify with "
    "bounded-prefix Levenshtein ≤ 20; the blocking-join shape survives "
    "corpus scale because candidate pairs are O(Σ|block|²), not O(n²)",
)
def q80_editdist_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, names=("documents",))
    return spark.sql(
        """
        with n as (
          select doc_id,
                 trim(regexp_replace(lower(text), '\\\\s+', ' ')) as nt
          from documents
        ),
        blocked as (
          select doc_id, nt, substr(nt, 1, 12) as blk from n where length(nt) >= 12
        )
        select a.doc_id as id_a, b.doc_id as id_b,
               cast(levenshtein(substr(a.nt, 1, 60), substr(b.nt, 1, 60)) as bigint)
                 as edit_dist
        from blocked a
        join blocked b on a.blk = b.blk and a.doc_id < b.doc_id
        where levenshtein(substr(a.nt, 1, 60), substr(b.nt, 1, 60)) <= 20
        """
    )


@register(
    "q81_temperature_mix",
    """
    with s as (
      select source, count(*) as n_docs from documents group by source
    ),
    p as (
      select source, n_docs,
             round(pow(cast(n_docs as double), 0.7), 6) as w
      from s
    ),
    z as (select cast(sum(cast(w as decimal(38,6))) as double) as z from p)
    select source,
           cast(n_docs as bigint) as n_docs,
           round(w / z, 6) as p_sample,
           cast(round(100000 * w / z, 0) as bigint) as docs_per_100k
    from p cross join z
    """,
    doc="temperature-based source mixing (p ∝ n^0.7, the multilingual "
    "pretraining-sampling recipe): per-source sampling probability and "
    "docs-per-100k budget — one tiny aggregate + broadcast normalizer; "
    "composes with assembly.source_mix for the actual draw",
)
def q81_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, names=("documents",))
    return spark.sql(
        """
        with s as (
          select source, count(*) as n_docs from documents group by source
        ),
        p as (
          select source, n_docs,
                 round(pow(cast(n_docs as double), 0.7d), 6) as w
          from s
        ),
        z as (select cast(sum(cast(w as decimal(38,6))) as double) as z from p)
        select source,
               cast(n_docs as bigint) as n_docs,
               round(w / z, 6) as p_sample,
               cast(round(100000 * w / z, 0) as bigint) as docs_per_100k
        from p cross join z
        """
    )


@register(
    "q83_chunk_windows",
    """
    with c as (
      select doc_id, text,
             unnest(range(0, cast(ceil(greatest(length(text) - 64, 1) / 448.0)
                                  as bigint))) as chunk_id
      from documents
    )
    select doc_id,
           cast(chunk_id as int) as chunk_id,
           substr(text, cast(chunk_id as int) * 448 + 1, 512) as chunk,
           cast(length(substr(text, cast(chunk_id as int) * 448 + 1, 512)) as int)
             as chunk_len
    from c
    """,
    doc="RAG/pretraining chunk prep: 512-char windows every 448 chars "
    "(64 overlap) via per-row sequence+explode — a shuffle-free narrow "
    "projection (operators/text.py chunk_text); oracle recomputes every "
    "window with generate_series + substr",
)
def q83_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import chunk_text

    t = load_tables(spark, sf_dir, names=("documents",))
    return chunk_text(t["documents"], size=512, overlap=64)


@register(
    "q84_ngram_novelty",
    """
    with w as (
      select doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') as words
      from documents
    ),
    grams as (
      select doc_id, unnest(list_distinct(
               case when len(words) >= 8
                    then list_transform(range(1, len(words) - 6),
                                        i -> array_to_string(words[i:i+7], ' '))
                    else [] end)) as gram
      from w
    ),
    firsts as (select gram, min(doc_id) as first_doc from grams group by gram)
    select g.doc_id,
           cast(count(*) as bigint) as n_grams,
           cast(sum(case when f.first_doc = g.doc_id then 1 else 0 end) as bigint)
             as n_novel,
           cast(sum(case when f.first_doc = g.doc_id then 1 else 0 end) as double)
             / count(*) as novel_frac
    from grams g join firsts f using (gram)
    group by g.doc_id
    """,
    doc="per-doc marginal novelty: fraction of its distinct 8-grams whose "
    "first corpus occurrence (min doc id) is this doc — the crawl-triage / "
    "curriculum signal; window-min over the gram-hash partition, the dual "
    "of q59's shared-gram count (operators/cleaning.py ngram_novelty)",
)
def q84_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.cleaning import ngram_novelty

    t = load_tables(spark, sf_dir, names=("documents",))
    return ngram_novelty(t["documents"])


@register(
    "q85_tfidf_top_terms",
    """
    with toks as (
      select source,
             unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) as term
      from documents
    ),
    tf as (select source, term, count(*) as tf from toks group by 1, 2),
    gdf as (select term, count(*) as gdf from tf group by term),
    ng as (select count(distinct source) as n_groups from documents)
    select source, cast(rank as int) as rank, term, cast(tf as bigint) as tf, score
    from (
      select t.source, t.term, t.tf,
             round(t.tf * ln(n.n_groups / g.gdf), 6) as score,
             row_number() over (
               partition by t.source
               order by round(t.tf * ln(n.n_groups / g.gdf), 6) desc, t.term
             ) as rank
      from tf t join gdf g using (term) cross join ng n
    ) ranked
    where rank <= 5
    """,
    doc="per-source top-5 characteristic terms by tf-idf (idf over "
    "groups): what a mixing pipeline reads before weighting sources — one "
    "uniform token shuffle with map-side combine, small aggregates "
    "broadcast back, per-group top-k window (operators/search.py "
    "tfidf_top_terms)",
)
def q85_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.search import tfidf_top_terms

    t = load_tables(spark, sf_dir, names=("documents",))
    return tfidf_top_terms(t["documents"], group_col="source", k=5)
