"""Unit tests for corpus-cleaning operators (operators/cleaning.py).

The catalog queries q58-q62 give these operators differential DuckDB
oracles over the testdata; here we pin the semantics on hand-crafted
fixtures where the expected values are computable by eye.
"""

import pytest

from leaf_spark.operators.cleaning import (
    crossdoc_ngram_overlap,
    decontaminate,
    line_dedup,
    pii_scrub,
    repetition_metrics,
)


def _by_id(rows, key="doc_id"):
    return {r[key]: r.asDict() for r in rows}


class TestRepetitionMetrics:
    def test_known_values(self, spark):
        df = spark.createDataFrame(
            [
                (1, "a b a b a b"),          # words: 6, distinct 2
                (2, "one two three four"),   # all unique
                (3, "x"),                    # single word, no grams
            ],
            ["doc_id", "text"],
        )
        out = _by_id(repetition_metrics(df).collect())
        d1 = out[1]
        assert d1["n_words"] == 6
        assert d1["dup_word_frac"] == pytest.approx(1 - 2 / 6)
        # bigrams: ab,ba,ab,ba,ab -> top 'a b' x3 of 5
        assert d1["top_bigram_frac"] == pytest.approx(3 / 5)
        # 5-grams: ababa, babab -> both unique
        assert d1["dup_5gram_frac"] == pytest.approx(0.0)
        d2 = out[2]
        assert d2["dup_word_frac"] == pytest.approx(0.0)
        assert d2["top_bigram_frac"] == pytest.approx(1 / 3)
        d3 = out[3]
        assert d3["n_words"] == 1
        assert d3["top_bigram_frac"] == 0.0
        assert d3["dup_5gram_frac"] == 0.0

    def test_case_and_whitespace_normalized(self, spark):
        df = spark.createDataFrame([(1, "The  THE the")], ["doc_id", "text"])
        row = repetition_metrics(df).collect()[0]
        assert row["n_words"] == 3
        assert row["dup_word_frac"] == pytest.approx(1 - 1 / 3)


class TestCrossdocOverlap:
    def test_shared_vs_unique(self, spark):
        shared = "w1 w2 w3 w4 w5 w6 w7 w8"  # exactly one 8-gram
        df = spark.createDataFrame(
            [(1, shared), (2, shared), (3, "u1 u2 u3 u4 u5 u6 u7 u8")],
            ["doc_id", "text"],
        )
        out = _by_id(crossdoc_ngram_overlap(df, n=8).collect())
        assert out[1]["n_shared_grams"] == 1 and out[1]["shared_frac"] == 1.0
        assert out[2]["n_shared_grams"] == 1
        assert out[3]["n_shared_grams"] == 0 and out[3]["shared_frac"] == 0.0

    def test_short_docs_dropped(self, spark):
        df = spark.createDataFrame([(1, "too short")], ["doc_id", "text"])
        assert crossdoc_ngram_overlap(df, n=8).count() == 0


class TestDecontaminate:
    def test_flags_holdout_overlap(self, spark):
        bench = spark.createDataFrame(
            [(100, "q1 q2 q3 q4 q5 q6 q7 q8 tail")], ["doc_id", "text"]
        )
        train = spark.createDataFrame(
            [
                (1, "pre q1 q2 q3 q4 q5 q6 q7 q8 post"),  # contains bench gram
                (2, "c1 c2 c3 c4 c5 c6 c7 c8 c9"),
            ],
            ["doc_id", "text"],
        )
        out = _by_id(decontaminate(train, bench, n=8).collect())
        assert out[1]["contaminated"] is True
        assert out[1]["n_contaminated_grams"] >= 1
        assert out[2]["contaminated"] is False


class TestPiiScrub:
    def test_counts_and_masking(self, spark):
        df = spark.createDataFrame(
            [
                (1, "mail bob.smith+x@corp.example.org now"),
                (2, "call +1 (555) 010-7788 or 555-123-4567 ok"),
                (3, "host 192.168.0.1 and 10.0.0.255 up"),
                (4, "clean text with no contact info"),
            ],
            ["doc_id", "text"],
        )
        out = _by_id(pii_scrub(df).collect())
        assert out[1]["n_emails"] == 1 and "<EMAIL>" in out[1]["clean_text"]
        assert "bob.smith" not in out[1]["clean_text"]
        assert out[2]["n_phones"] == 2
        assert out[2]["clean_text"].count("<PHONE>") == 2
        assert out[3]["n_ipv4"] == 2
        assert out[3]["clean_text"].count("<IP>") == 2
        assert out[4]["n_emails"] == out[4]["n_phones"] == out[4]["n_ipv4"] == 0
        assert out[4]["clean_text"] == out[4]["text"]

    def test_email_not_double_counted_as_phone(self, spark):
        df = spark.createDataFrame(
            [(1, "x12345678@example.com")], ["doc_id", "text"]
        )
        row = pii_scrub(df).collect()[0]
        assert row["n_emails"] == 1 and row["n_phones"] == 0
        assert row["clean_text"] == "<EMAIL>"


class TestLineDedup:
    def test_first_occurrence_wins(self, spark):
        df = spark.createDataFrame(
            [
                (1, "alpha\nbeta\ngamma"),
                (2, "beta\ndelta"),        # beta already seen in doc 1
                (3, "alpha\nalpha\nepsilon"),  # intra-doc dup + cross-doc dup
            ],
            ["doc_id", "text"],
        )
        out = _by_id(line_dedup(df).collect())
        assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 3
        assert out[1]["clean_text"] == "alpha\nbeta\ngamma"
        assert out[2]["n_lines"] == 2 and out[2]["n_kept"] == 1
        assert out[2]["clean_text"] == "delta"
        assert out[3]["n_lines"] == 3 and out[3]["n_kept"] == 1
        assert out[3]["clean_text"] == "epsilon"

    def test_blank_lines_ignored_and_trimmed(self, spark):
        df = spark.createDataFrame(
            [(1, "  a  \n\n   \nb"), (2, "a")], ["doc_id", "text"]
        )
        out = _by_id(line_dedup(df).collect())
        assert out[1]["n_lines"] == 2 and out[1]["clean_text"] == "a\nb"
        assert out[2]["n_kept"] == 0 and out[2]["clean_text"] == ""

    def test_all_duplicate_doc_survives_with_empty_text(self, spark):
        df = spark.createDataFrame([(1, "x"), (2, "x")], ["doc_id", "text"])
        out = _by_id(line_dedup(df).collect())
        assert out[2]["n_kept"] == 0 and out[2]["clean_text"] == ""


class TestNgramNovelty:
    def test_first_occurrence_attribution(self, spark):
        from leaf_spark.operators.cleaning import ngram_novelty

        base = "a b c d e f g h"           # exactly one 8-gram
        longer = base + " i"               # two 8-grams, one new
        docs = spark.createDataFrame(
            [(1, base), (2, base), (3, longer), (4, "too short")],
            "doc_id bigint, text string",
        )
        out = {r["doc_id"]: r for r in ngram_novelty(docs).collect()}
        assert out[1]["n_grams"] == 1 and out[1]["n_novel"] == 1
        assert out[2]["n_grams"] == 1 and out[2]["n_novel"] == 0
        assert out[3]["n_grams"] == 2 and out[3]["n_novel"] == 1
        assert out[3]["novel_frac"] == 0.5
        assert 4 not in out  # fewer than n words → no gram rows

    def test_hash_and_exact_agree(self, spark):
        from leaf_spark.operators.cleaning import ngram_novelty

        docs = spark.createDataFrame(
            [(i, f"w{i % 3} " * 10 + "x y z q r s t u v") for i in range(20)],
            "doc_id bigint, text string",
        )
        a = {tuple(r) for r in ngram_novelty(docs, hash_grams=True).collect()}
        b = {tuple(r) for r in ngram_novelty(docs, hash_grams=False).collect()}
        assert a == b


class TestChunkText:
    def test_windows_cover_and_overlap(self, spark):
        from leaf_spark.operators.text import chunk_text

        text = "".join(chr(97 + i % 26) for i in range(100))
        docs = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
        rows = sorted(
            chunk_text(docs, size=10, overlap=3).collect(),
            key=lambda r: r["chunk_id"],
        )
        stride = 7
        import math

        assert len(rows) == math.ceil((100 - 3) / stride)
        for r in rows:
            start = r["chunk_id"] * stride
            assert r["chunk"] == text[start : start + 10]
            assert r["chunk_len"] == len(r["chunk"])
        # every char position is covered by at least one chunk
        covered = set()
        for r in rows:
            covered.update(range(r["chunk_id"] * stride, r["chunk_id"] * stride + r["chunk_len"]))
        assert covered == set(range(100))

    def test_empty_doc_yields_one_empty_chunk(self, spark):
        from leaf_spark.operators.text import chunk_text

        docs = spark.createDataFrame([(1, "")], "doc_id bigint, text string")
        rows = chunk_text(docs, size=10, overlap=3).collect()
        assert len(rows) == 1
        assert rows[0]["chunk"] == "" and rows[0]["chunk_len"] == 0

    def test_rejects_bad_overlap(self, spark):
        from leaf_spark.operators.text import chunk_text

        docs = spark.createDataFrame([(1, "abc")], "doc_id bigint, text string")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            chunk_text(docs, size=10, overlap=10)
