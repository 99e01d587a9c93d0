"""Corpus source formats: JSONL/CSV read with quarantined corrupt rows,
JSONL write round-trip, gzip handling."""

from __future__ import annotations

import gzip
import json
import os

import pytest
from pyspark.sql import functions as F


def _docs_rows():
    return [
        {"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s1", "n_chars": 10},
        {"doc_id": 2, "text": "gamma", "lang": "de", "source": "s2", "n_chars": 5},
    ]


def test_jsonl_roundtrip_and_corrupt_quarantine(spark, tmp_path):
    from leaf_spark.sources import read_jsonl_corpus
    from leaf_spark.sources.corpus import split_corrupt

    p = tmp_path / "corpus"
    p.mkdir()
    lines = [json.dumps(r) for r in _docs_rows()]
    lines.insert(1, '{"doc_id": 3, "text": "broken')          # malformed JSON
    (p / "part-0.jsonl").write_text("\n".join(lines) + "\n")

    df = read_jsonl_corpus(spark, str(p))
    clean, bad = split_corrupt(df)
    got = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert got == {1: "alpha beta", 2: "gamma"}
    assert "_corrupt" not in clean.columns
    raws = [r["_corrupt"] for r in bad.collect()]
    assert len(raws) == 1 and raws[0].startswith('{"doc_id": 3')


def test_jsonl_gzip_reads_transparently(spark, tmp_path):
    from leaf_spark.sources import read_jsonl_corpus
    from leaf_spark.sources.corpus import split_corrupt

    p = tmp_path / "gz"
    p.mkdir()
    payload = "\n".join(json.dumps(r) for r in _docs_rows()) + "\n"
    with gzip.open(p / "part-0.jsonl.gz", "wt") as f:
        f.write(payload)
    clean, bad = split_corrupt(read_jsonl_corpus(spark, str(p)))
    assert clean.count() == 2 and bad.count() == 0


def test_csv_schema_pinning_and_corrupt_row(spark, tmp_path):
    from leaf_spark.sources import read_csv_corpus
    from leaf_spark.sources.corpus import split_corrupt

    p = tmp_path / "csv"
    p.mkdir()
    (p / "part-0.csv").write_text(
        "doc_id,text,lang,source,n_chars\n"
        '1,"alpha, beta",en,s1,11\n'
        "not_a_number,oops,en,s1,3\n"     # doc_id fails the LongType schema
        "2,gamma,de,s2,5\n"
    )
    clean, bad = split_corrupt(read_csv_corpus(spark, str(p)))
    got = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert got == {1: "alpha, beta", 2: "gamma"}   # RFC-4180 quoted comma
    assert bad.count() == 1


def test_write_jsonl_roundtrip(spark, tmp_path):
    from leaf_spark.sources import read_jsonl_corpus, write_jsonl_corpus
    from leaf_spark.sources.corpus import split_corrupt

    src = spark.createDataFrame(
        [(1, "alpha", "en", "s1", 5), (2, "beta", "de", "s2", 4)],
        "doc_id bigint, text string, lang string, source string, n_chars int",
    )
    out = str(tmp_path / "written")
    write_jsonl_corpus(src, out, compression="gzip")
    assert any(f.endswith(".json.gz") for f in os.listdir(out))
    clean, bad = split_corrupt(read_jsonl_corpus(spark, out))
    assert bad.count() == 0
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}


def test_orc_corpus_roundtrip_and_drift_guard(spark, tmp_path):
    from pyspark.sql import functions as F

    from leaf_spark.sources.corpus import (
        DOCUMENTS_SCHEMA,
        read_orc_corpus,
        write_orc_corpus,
    )

    docs = spark.createDataFrame(
        [(1, "hello world", "en", "web", 11), (2, "zwei", "de", "books", 4)],
        DOCUMENTS_SCHEMA,
    )
    p = str(tmp_path / "docs_orc")
    write_orc_corpus(docs, p)
    back = read_orc_corpus(spark, p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))

    # extra provider column is dropped, not silently kept
    extra = docs.withColumn("new_col", F.lit("x"))
    p2 = str(tmp_path / "docs_extra")
    write_orc_corpus(extra, p2)
    assert read_orc_corpus(spark, p2).columns == [f.name for f in DOCUMENTS_SCHEMA]

    # missing column → loud failure naming the column
    p3 = str(tmp_path / "docs_missing")
    write_orc_corpus(docs.drop("lang"), p3)
    with pytest.raises(ValueError, match="lang"):
        read_orc_corpus(spark, p3)

    # type drift → loud failure naming expected vs actual
    p4 = str(tmp_path / "docs_retyped")
    write_orc_corpus(docs.withColumn("n_chars", F.col("n_chars").cast("string")), p4)
    with pytest.raises(ValueError, match="n_chars"):
        read_orc_corpus(spark, p4)
