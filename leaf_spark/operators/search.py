"""Full-text relevance search over the documents table.

The reference's query surface is SQL-only (no FTS module is wired into
leaf-stream; SURVEY §2.C), so BM25 here is a pipeline extension in the same
family as the dedup/similarity operators: the retrieval primitive a
training-data pipeline uses for targeted corpus mining ("find docs about X")
and for decontamination triage.

Scale shape (the part that matters at 100 TB):

- the corpus scan filters to QUERY TERMS at the tokenizer (an
  ``array_contains``-style filter right after the split) — only postings for
  the handful of query terms ever leave the scan, so shuffle volume is
  O(matching postings), not O(corpus tokens);
- document frequencies and corpus stats (N, avgdl) are single-row /
  per-term aggregates, broadcast back — no second corpus pass joins
  anything big;
- the final per-doc score sum routes through decimal(38,6) so partition
  order cannot perturb the double sum (same convention as the catalog's
  aggregate queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import normalized


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k retrieval for a bag-of-words query.

    Uses the Lucene/ATIRE idf variant ``ln(1 + (N - df + 0.5)/(df + 0.5))``
    (always positive). Per-term partial scores are rounded to 6 decimals and
    summed as decimal(38,6) so the result is independent of partition order;
    the final score is rounded to 4.
    """
    words = docs.select(
        F.col(id_col), F.split(normalized(F.col(text_col)), " ").alias("w")
    )
    # corpus stats: one row, broadcast into the per-term scoring join
    stats = words.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("w")).alias("total_len"),
    )
    postings = (
        words.select(F.col(id_col), F.size("w").alias("dl"), F.explode("w").alias("term"))
        .where(F.col("term").isin([t.lower() for t in query_terms]))
    )
    tf = postings.groupBy(id_col, "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = F.col("n_docs").cast("double")
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    idf = F.log(F.lit(1.0) + (n - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_d = F.col("tf").cast("double")
    term_score = idf * (
        tf_d * (k1 + 1.0)
        / (tf_d + k1 * (1.0 - b + b * F.col("dl").cast("double") / avgdl))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.round(term_score, 6).cast("decimal(38,6)").alias("term_score"),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("term_score").cast("double"), 4).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def tfidf_top_terms(
    docs: DataFrame,
    group_col: str = "source",
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per group by tf-idf — the "what is this
    source about" profile a mixing pipeline reads before weighting sources.

    tf = term occurrences within the group; idf = ln(#groups / #groups
    containing the term), so terms present in every group score 0. Shape:
    one token shuffle into (group, term) counts (uniform keys, map-side
    combine), then group-count and group-total are small aggregates joined
    back (AQE broadcasts them), then a per-group top-k window over ≤ vocab
    rows. Scores round to 6 before ranking so both engines rank
    identically; ties break on the term string.
    """
    toks = docs.select(
        F.col(group_col), F.explode(F.split(normalized(F.col(text_col)), " ")).alias("term")
    )
    tf = toks.groupBy(group_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_groups = docs.select(group_col).distinct().agg(
        F.count(F.lit(1)).alias("n_groups")
    )
    gdf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("gdf"))
    score = F.round(
        F.col("tf").cast("double")
        * F.log(F.col("n_groups").cast("double") / F.col("gdf").cast("double")),
        6,
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        tf.join(F.broadcast(gdf), "term")
        .crossJoin(F.broadcast(n_groups))
        .select(F.col(group_col), "term", "tf", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            group_col,
            F.col("rank").cast("int").alias("rank"),
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            "score",
        )
    )


def unigram_logprob(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Mean per-token unigram negative log-probability (a perplexity proxy —
    the classic cheap LM-quality signal for corpus filtering).

    Two shuffles: one groupBy on the token (uniform) to build the corpus
    unigram table, one back on the doc id for the per-doc mean. The token
    count join keys on the token string; at corpus scale the unigram table
    is Zipf-bounded (vocab ≪ corpus) and AQE picks broadcast vs shuffle
    join on actual size. Per-doc sums go through decimal(38,6).
    """
    toks = docs.select(
        F.col(id_col), F.explode(F.split(normalized(F.col(text_col)), " ")).alias("tok")
    )
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    neglogp = -F.log(
        F.col("n_tok").cast("double") / F.col("n_total").cast("double")
    )
    return (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.round(neglogp, 6).cast("decimal(38,6)").alias("nlp"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # cast the exact decimal sum to double BEFORE dividing: decimal
            # division can land exactly on a rounding half-boundary that the
            # oracle's double division sits just below — double-ops-only is
            # bitwise reproducible across engines
            F.round(
                F.sum("nlp").cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_neglogprob"),
        )
    )


def bigram_logprob(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Mean per-bigram add-one-smoothed negative log-probability
    p(w2|w1) = (c(w1 w2)+1) / (c(w1)+V) — the step past unigram_logprob
    that actually penalizes scrambled or template text (unigram stats can't
    see word order; KenLM-style filters are bigram+).

    Bigrams are built array-side (slice+zip on the already-split words), so
    no self-join and no window over exploded tokens. Three aggregates:
    corpus bigram counts, context (w1) counts, vocab size — Zipf-bounded
    tables joined back to the per-doc bigram stream (AQE broadcasts when
    they fit). Per-doc sums route through decimal(38,6), as everywhere.
    """
    ws = F.split(normalized(F.col(text_col)), " ")
    pairs = F.zip_with(
        F.expr("slice(__ws__, 1, greatest(size(__ws__) - 1, 0))"),
        F.expr("slice(__ws__, 2, greatest(size(__ws__) - 1, 0))"),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    base = docs.select(F.col(id_col), ws.alias("__ws__"))
    doc_bigrams = base.select(
        F.col(id_col),
        F.explode(pairs).alias("bigram"),
    ).withColumn("w1", F.split(F.col("bigram"), " ")[0])

    bg_counts = doc_bigrams.groupBy("bigram").agg(F.count(F.lit(1)).alias("c_bg"))
    ctx_counts = doc_bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c_w1"))
    vocab_size = base.select(F.explode("__ws__").alias("tok")).agg(
        F.countDistinct("tok").alias("v")
    )

    nlp = -F.log(
        (F.col("c_bg").cast("double") + 1.0)
        / (F.col("c_w1").cast("double") + F.col("v").cast("double"))
    )
    return (
        doc_bigrams.join(bg_counts, "bigram")
        .join(ctx_counts, "w1")
        .crossJoin(F.broadcast(vocab_size))
        .select(F.col(id_col), F.round(nlp, 6).cast("decimal(38,6)").alias("nlp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum("nlp").cast("double") / F.count(F.lit(1)), 4).alias(
                "mean_neglogprob"
            ),
        )
    )


def dsir_logratio(
    docs: DataFrame,
    target_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weight (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per document, the summed
    log-likelihood ratio of its tokens under a smoothed unigram model of a
    TARGET slice vs the whole corpus. Positive ⇒ the doc looks more like the
    target distribution; resampling by these weights tilts a raw corpus
    toward a quality/domain target.

    ``target_pred`` is a Column predicate selecting the target slice (e.g.
    ``F.col("lang") == "en"``).

    Shape: token explode (narrow) → two Zipf-bounded count aggregates
    (target and corpus share one shuffle pass via conditional sums) → join
    the vocab table back to the token stream → per-doc decimal sum. The
    published method hashes tokens into a fixed bucket count to bound the
    model size; the vocab table here is exact, and the hashed variant is the
    same plan with ``hash(tok) % B`` as the join key.
    """
    toks = docs.select(
        F.col(id_col),
        target_pred.alias("is_target"),
        F.explode(F.split(normalized(F.col(text_col)), " ")).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("c_s"),
        F.sum(F.col("is_target").cast("bigint")).alias("c_t"),
    )
    totals = vocab.agg(
        F.sum("c_s").alias("n_s"),
        F.sum("c_t").alias("n_t"),
        F.count(F.lit(1)).alias("v"),
    )
    term = F.log(
        (F.col("c_t").cast("double") + 1.0)
        / (F.col("n_t").cast("double") + F.col("v").cast("double"))
    ) - F.log(
        (F.col("c_s").cast("double") + 1.0)
        / (F.col("n_s").cast("double") + F.col("v").cast("double"))
    )
    return (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(totals))
        .select(F.col(id_col), F.round(term, 6).cast("decimal(38,6)").alias("lr"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # no final rounding: the decimal sum is exact, and casting the
            # same exact decimal to double is bit-identical cross-engine —
            # a round(,4) here would sit on half-boundaries 1-in-100 rows
            # (6-decimal terms sum to exact 6-decimal values)
            F.sum("lr").cast("double").alias("importance_logratio"),
        )
        .withColumn("selected", F.col("importance_logratio") > 0.0)
    )


def build_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_freq: int = 1,
    first_n: int = 5,
) -> DataFrame:
    """Inverted-index build: per-term postings statistics — doc frequency,
    total term frequency, and the first ``first_n`` posting doc ids. The
    materialization step a retrieval/mining pipeline runs once and then
    keeps bucketed by term (operators/bucketing.py) so query-time lookups
    never reshuffle.

    One shuffle: tokens reduce on (term, doc) with map-side partial counts,
    then on term. Both keys are uniform-ish (Zipf head terms are exactly
    what ``min_doc_freq`` is for — at corpus scale stopword postings are
    capped or dropped by the caller's frequency bounds before they hit
    storage).
    """
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(normalized(F.col(text_col)), " ")).alias("term"),
    )
    tf = toks.groupBy("term", "doc").agg(F.count(F.lit(1)).alias("tf"))
    return (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("doc_freq"),
            F.sum("tf").cast("bigint").alias("total_tf"),
            F.array_join(
                F.transform(
                    F.slice(F.array_sort(F.collect_list("doc")), 1, first_n),
                    lambda d: d.cast("string"),
                ),
                ",",
            ).alias("first_docs"),
        )
        .where(F.col("doc_freq") >= min_doc_freq)
    )
