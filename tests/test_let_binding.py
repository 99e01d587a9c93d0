"""let_ lambda binding (r12 optimization) — the O(len²) → O(len) fix for
gram/shingle construction.

Higher-order-function lambdas are CodegenFallback expressions without
common-subexpression elimination, so an expression inlined into a lambda
body is re-evaluated per element. ``let_`` binds it as a lambda variable
(computed once per row). These tests pin down both the semantics (bit-
identical results on the edge cases) and the structure (the expensive
subexpression appears exactly once in the bound expression tree).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a b c d e f g h"),
        (1, "a a a a a a"),  # all-equal words: bigram runs, left==right grams
        (2, "one"),  # shorter than any n-gram
        (3, ""),  # empty text
        (4, None),  # null text
        (5, "  Mixed   CASE   wOrds  with   runs runs runs  "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_let_binds_value_once_in_expression_tree(spark):
    """The split pipeline must appear exactly once inside word_ngrams /
    _word_shingles — re-inlining (e.g. a future optimizer rule collapsing
    transform-over-literal-array) would silently restore the O(len²)
    behavior."""
    from leaf_spark.operators.cleaning import word_ngrams, words_of
    from leaf_spark.operators.dedup import _word_shingles

    gram_sql = str(word_ngrams(words_of(F.col("text")), 3)._jc)
    assert gram_sql.count("regexp_replace") == 1
    shingle_sql = str(_word_shingles(F.col("text"), 3)._jc)
    assert shingle_sql.count("regexp_replace") == 1


def test_word_ngrams_matches_unbound_form(spark, docs):
    """Bound form computes exactly what the pre-r12 inlined form computed,
    including null/empty/short-doc edge cases."""
    from leaf_spark.operators.cleaning import word_ngrams, words_of

    def unbound_ngrams(words, n):
        return F.when(
            F.size(words) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    for n in (2, 5):
        got = docs.select(
            "doc_id", word_ngrams(words_of(F.col("text")), n).alias("g")
        ).collect()
        want = docs.select(
            "doc_id", unbound_ngrams(words_of(F.col("text")), n).alias("g")
        ).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want)), n


def test_word_shingles_matches_unbound_form(spark, docs):
    from leaf_spark.operators.dedup import _word_shingles, normalized

    def unbound_shingles(text, n):
        words = F.split(normalized(text), " ")
        return F.array_distinct(
            F.when(
                F.size(words) >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size(words) - n),
                    lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
                ),
            ).otherwise(F.array(F.concat_ws(" ", words)))
        )

    got = docs.select("doc_id", _word_shingles(F.col("text"), 3).alias("s")).collect()
    want = docs.select("doc_id", unbound_shingles(F.col("text"), 3).alias("s")).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_repetition_metrics_edge_cases(spark, docs):
    """Struct-staged projection returns the same values the flat projection
    produced (q58's oracle window re-verifies at the catalog level; this
    pins the edge rows a tiny corpus exercises)."""
    from leaf_spark.operators.cleaning import repetition_metrics

    rows = {r["doc_id"]: r for r in repetition_metrics(docs).collect()}
    assert rows[0]["n_words"] == 8 and rows[0]["dup_word_frac"] == 0.0
    # all-equal words: 5 bigrams all identical -> top_bigram_frac 1.0
    assert rows[1]["top_bigram_frac"] == 1.0
    assert rows[1]["dup_word_frac"] == pytest.approx(1 - 1 / 6)
    # single word: no bigrams/5-grams
    assert rows[2]["n_words"] == 1
    assert rows[2]["top_bigram_frac"] == 0.0
    assert rows[2]["dup_5gram_frac"] == 0.0
    # null text: legacy size(null) = -1 under ansi=false (same value the
    # pre-rewrite projection produced — pinned so a rewrite can't drift)
    assert rows[4]["n_words"] == -1
