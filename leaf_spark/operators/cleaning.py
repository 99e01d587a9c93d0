"""Corpus-cleaning operators for LLM training-data pipelines.

The filtering/cleaning stages a large-scale pretraining pipeline runs after
dedup (reference scope: the engine's query surface; these extend it the way
a 100 TB corpus job would — Gopher/C4-style rules re-expressed Spark-first):

- repetition_metrics      Gopher-style intra-doc repetition signals
                          (dup-word frac, top-bigram frac, dup-5-gram frac)
                          — single projection, all builtin HOFs, no shuffle
- crossdoc_ngram_overlap  per-doc fraction of n-grams shared with any other
                          document — one shuffle on the gram hash (uniform)
- decontaminate           flag training docs sharing any n-gram with a
                          holdout/benchmark set — broadcast the (small)
                          holdout gram set, no full shuffle of the corpus
- pii_scrub               count + mask emails / phone numbers / IPv4s with
                          builtin regexp_count/regexp_replace (JVM, codegen)
- line_dedup              corpus-level exact line dedup (CCNet-style):
                          first occurrence (by doc id, line position) wins;
                          reassembles cleaned text order-preserving

Scale notes: repetition metrics and pii_scrub are embarrassingly parallel
projections. crossdoc/line_dedup shuffle once on a hash that is uniform by
construction (no skew); decontaminate broadcasts the holdout set, which is
the realistic shape (benchmarks are MBs, the corpus is TBs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import let_, normalized, spread


def words_of(text: Column) -> Column:
    return F.split(normalized(text), " ")


def word_ngrams(words: Column, n: int) -> Column:
    """All (non-distinct) n-word grams of a word array; empty when the doc
    has fewer than n words.

    ``words`` is let_-bound so each gram slices a bound variable instead of
    re-evaluating the caller's word expression — lambdas have no CSE, so an
    inlined split(text) here used to cost O(len²) per doc (see
    :func:`leaf_spark.operators.dedup.let_`)."""
    return let_(
        words,
        lambda w: F.when(
            F.size(w) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(w) - n),
                lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


def hashed_word_ngrams(words: Column, n: int) -> Column:
    """Distinct n-gram hashes as array<bigint>, built by structural
    ``xxhash64`` over each n-word slice — the hashed counterpart of
    ``array_distinct(word_ngrams(...))`` + per-gram ``xxhash64`` that never
    allocates the gram string (r12, guide §2.3/§4.2; measured ~30% off the
    gram-index build at sf0.1 with identical row and distinct counts).
    Hash VALUES differ from xxhash64-of-concatenated-string; every consumer
    treats gram hashes as opaque identity keys, so outputs are unchanged up
    to 64-bit collisions — the documented contract of ``hash_grams``."""
    return let_(
        words,
        lambda w: F.array_distinct(
            F.when(
                F.size(w) >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size(w) - n),
                    lambda i: F.xxhash64(F.slice(w, i + 1, n)),
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        ),
    )


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals, one row per document.

    All builtin higher-order functions over the word array — a single
    narrow projection (no shuffle, linear scan at any scale). The word
    array and both gram arrays are let_-bound, so the split and each gram
    construction run exactly ONCE per document; the four metric columns are
    unpacked from one struct in a second projection (the struct producer is
    expensive + multiply-referenced, so CollapseProject keeps the split and
    the struct is evaluated once per row). Before the r12 binding rewrite
    this projection re-expanded the split per gram and per column —
    measured 18.7 s → see OPTIMIZATION_r12.md (q58).

    All three signals use gram/word IDENTITY only (distinct counts, run
    lengths of equal values), so grams travel as structural xxhash64 longs
    (r12, guide §2.3/§4.2): the sort behind the top-bigram run scan and
    both array_distincts compare 8-byte longs instead of strings, and no
    gram string is ever allocated — ~20% off the projection at sf0.1,
    bit-identical outputs (the longest equal-run of a sorted array is
    permutation-invariant, so the hash-order sort changes nothing up to
    64-bit collisions — none at any tested SF).
    """

    def hgrams(w: Column, n: int) -> Column:
        # non-distinct n-gram hashes (repetition needs multiplicities)
        return F.when(
            F.size(w) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(w) - n),
                lambda i: F.xxhash64(F.slice(w, i + 1, n)),
            ),
        ).otherwise(F.array().cast("array<bigint>"))

    def run_best(sorted_grams: Column) -> Column:
        # Top-gram multiplicity as the longest run in the sorted gram array —
        # one linear aggregate pass. (-1 sentinel: xxhash64 output is never
        # compared against it on the first element in a way that can tie,
        # because run/best start at 0 and the first element always opens a
        # run of 1 via the otherwise branch — identical to the old "" seed.)
        return F.aggregate(
            sorted_grams,
            F.struct(
                F.lit(-1).cast("long").alias("prev"),
                F.lit(0).alias("run"),
                F.lit(0).alias("best"),
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc["prev"], acc["run"] + 1)
                .otherwise(F.lit(1))
                .alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
                ).alias("best"),
            ),
        )["best"]

    def metrics(w: Column) -> Column:
        n_words = F.size(w)
        return let_(
            F.struct(hgrams(w, 2).alias("bi"), hgrams(w, 5).alias("five")),
            lambda g: F.struct(
                n_words.cast("bigint").alias("n_words"),
                (
                    1.0
                    - F.size(
                        F.array_distinct(F.transform(w, lambda x: F.xxhash64(x)))
                    )
                    / F.greatest(n_words, F.lit(1))
                ).alias("dup_word_frac"),
                (
                    F.coalesce(run_best(F.array_sort(g["bi"])), F.lit(0))
                    / F.greatest(F.size(g["bi"]), F.lit(1))
                ).alias("top_bigram_frac"),
                F.when(F.size(g["five"]) == 0, F.lit(0.0))
                .otherwise(
                    1.0 - F.size(F.array_distinct(g["five"])) / F.size(g["five"])
                )
                .alias("dup_5gram_frac"),
            ),
        )

    # spread(): a single-file corpus arrives as 1-2 scan partitions and this
    # projection is the heaviest per-row compute in the text family — at
    # real scale (files >> cores) the repartition is a no-op (r12, guide §2)
    staged = spread(df).select(
        F.col(id_col), let_(words_of(F.col(text_col)), metrics).alias("__m__")
    )
    return staged.select(
        F.col(id_col),
        F.col("__m__.n_words").alias("n_words"),
        F.col("__m__.dup_word_frac").alias("dup_word_frac"),
        F.col("__m__.top_bigram_frac").alias("top_bigram_frac"),
        F.col("__m__.dup_5gram_frac").alias("dup_5gram_frac"),
    )


def crossdoc_ngram_overlap(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_grams: bool = True,
) -> DataFrame:
    """Per document: how many of its distinct n-grams appear in ANY other
    document, and the overlap fraction.

    Exactly two shuffles — groupBy on the gram (uniformly distributed text
    hash) to count distinct source docs, then groupBy back on the doc id.
    No self-join of documents; the gram table is the join surrogate, which
    is the shape that survives 100 TB.

    With ``hash_grams`` (default) each gram travels as its xxhash64 — the
    gram-count shuffle and the count-join key are 8-byte longs instead of
    ~8-word strings (~6× fewer shuffle bytes). A 64-bit collision would
    merge two distinct grams; expected collisions stay ≪1 until ~10^9
    distinct grams, and the per-doc outputs are hash-invariant otherwise.
    Pass ``hash_grams=False`` for exact gram identity.
    """
    if hash_grams:
        grams = spread(df).select(
            F.col(id_col),
            F.explode(hashed_word_ngrams(words_of(F.col(text_col)), n)).alias(
                "gram"
            ),
        )
    else:
        grams = spread(df).select(
            F.col(id_col),
            F.explode(
                F.array_distinct(word_ngrams(words_of(F.col(text_col)), n))
            ).alias("gram"),
        )
    # Grams are distinct per doc, so count(*) over the gram partition IS the
    # number of docs containing the gram. A window count beats the
    # groupBy-then-join-back shape: one gram extraction (the join shape
    # recomputes the explode on both join inputs), two shuffles, no join.
    from pyspark.sql.window import Window

    per_gram = F.count(F.lit(1)).over(Window.partitionBy("gram"))
    return (
        grams.withColumn("n_docs_with_gram", per_gram)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("n_docs_with_gram") > 1, 1).otherwise(0)).alias(
                "n_shared_grams"
            ),
        )
        .select(
            F.col(id_col),
            "n_grams",
            "n_shared_grams",
            (F.col("n_shared_grams") / F.col("n_grams")).alias("shared_frac"),
        )
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_grams: bool = True,
) -> DataFrame:
    """Per document: how many of its distinct n-grams occur for the FIRST
    time in the corpus at this doc (first = min doc id among docs containing
    the gram), and the novelty fraction — the marginal-novelty signal a
    crawl-triage / curriculum pipeline ranks sources by.

    Same two-shuffle shape as :func:`crossdoc_ngram_overlap` (this is the
    dual question — "is the gram mine first?" instead of "is it shared?"):
    a window min over the gram partition (uniform hash key), then the
    per-doc rollup. No doc self-join, gram strings travel as xxhash64 longs
    (same collision tradeoff, documented there).
    """
    if hash_grams:
        grams = spread(df).select(
            F.col(id_col),
            F.explode(hashed_word_ngrams(words_of(F.col(text_col)), n)).alias(
                "gram"
            ),
        )
    else:
        grams = spread(df).select(
            F.col(id_col),
            F.explode(
                F.array_distinct(word_ngrams(words_of(F.col(text_col)), n))
            ).alias("gram"),
        )
    from pyspark.sql.window import Window

    first_doc = F.min(id_col).over(Window.partitionBy("gram"))
    return (
        grams.withColumn("first_doc", first_doc)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col(id_col), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            F.col(id_col),
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.col("n_novel").cast("bigint").alias("n_novel"),
            (F.col("n_novel") / F.col("n_grams")).alias("novel_frac"),
        )
    )


def decontaminate(
    train: DataFrame,
    holdout: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_grams: bool = True,
) -> DataFrame:
    """Benchmark decontamination: per training doc, the number of distinct
    n-grams that also occur in the holdout set, plus a contaminated flag.

    The holdout gram set is broadcast (benchmarks are small relative to the
    corpus), so the corpus is scanned exactly once with no shuffle of the
    training side; the final per-doc rollup groups on the doc id.

    With ``hash_grams`` (default) the broadcast set and the probe key are
    xxhash64 longs, not gram strings — the broadcast table shrinks ~6× and
    the hash-join probe compares 8 bytes instead of ~8 words. Collision
    risk as in :func:`crossdoc_ngram_overlap`; ``hash_grams=False`` keeps
    exact string identity.
    """
    def grams(d: DataFrame) -> DataFrame:
        if hash_grams:
            return d.select(
                F.col(id_col),
                F.explode(hashed_word_ngrams(words_of(F.col(text_col)), n)).alias(
                    "gram"
                ),
            )
        return d.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(word_ngrams(words_of(F.col(text_col)), n))
            ).alias("gram"),
        )

    hold_grams = grams(holdout).select("gram").distinct()
    return (
        grams(spread(train))
        .join(F.broadcast(hold_grams).withColumn("hit", F.lit(1)), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_contaminated_grams"),
        )
        .select(
            F.col(id_col),
            "n_grams",
            "n_contaminated_grams",
            (F.col("n_contaminated_grams") > 0).alias("contaminated"),
        )
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9()\-. ]{6,}[0-9]"
_IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def pii_scrub(
    df: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Detect + mask emails, phone-like numbers, and IPv4 addresses.

    Pure builtin regexp_count / regexp_replace — JVM regex inside codegen,
    an embarrassingly parallel projection. Masking order matters: emails
    first (an email never contains a phone match once masked), then IPs,
    then phones (the loosest pattern last so it cannot eat IP octets).
    """
    t = F.col(text_col)
    masked = F.regexp_replace(t, _EMAIL_RE, "<EMAIL>")
    masked = F.regexp_replace(masked, _IPV4_RE, "<IP>")
    masked = F.regexp_replace(masked, _PHONE_RE, "<PHONE>")
    # spread(): six regex passes per row — parallelize small single-file
    # scans; no-op once the input spans >= cores partitions (r12, guide §2)
    return spread(df).withColumns(
        {
            "n_emails": F.regexp_count(t, F.lit(_EMAIL_RE)).cast("bigint"),
            "n_phones": F.regexp_count(
                F.regexp_replace(F.regexp_replace(t, _EMAIL_RE, " "), _IPV4_RE, " "),
                F.lit(_PHONE_RE),
            ).cast("bigint"),
            "n_ipv4": F.regexp_count(
                F.regexp_replace(t, _EMAIL_RE, " "), F.lit(_IPV4_RE)
            ).cast("bigint"),
            out_col: masked,
        }
    )


def line_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-level exact line dedup (CCNet-style): a line (trimmed,
    non-empty) is kept only at its first occurrence across the whole corpus,
    ordered by (doc id, line position); later occurrences are dropped.
    Returns (id, n_lines, n_kept, clean_text) with order-preserving
    reassembly of the surviving lines.

    One shuffle on the line hash (uniform) to elect the winner, one back on
    the doc id to reassemble. The winner-election aggregate and its join key
    are xxhash64 longs — line text never enters that shuffle; the string
    rides only on the reassembly side, where it is needed anyway.
    """
    lines = (
        spread(df)
        .select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
        )
        .withColumn("line", F.trim(F.col("line")))
        .where(F.length("line") > 0)
        .withColumn("line_h", F.xxhash64("line"))
    )
    w = lines.select("line_h", id_col, "pos").groupBy("line_h").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first_at")
    )
    kept = lines.join(w, "line_h").where(
        (F.col(id_col) == F.col("first_at")[id_col])
        & (F.col("pos") == F.col("first_at")["pos"])
    )
    total = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
    )
    return total.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )
