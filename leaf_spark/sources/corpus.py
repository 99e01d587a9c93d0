"""Corpus source formats beyond parquet: JSONL and CSV readers with
explicit schemas and quarantined corrupt records.

Real crawl/annotation dumps arrive as JSONL (one document per line) or
CSV; at 100 TB the two failure modes that matter are (a) silent schema
drift — a provider adds a column and inference reshapes the table — and
(b) a single malformed line poisoning a 128 MB split. Both readers
therefore REQUIRE an explicit schema (inference is opt-in nowhere) and
run PERMISSIVE with a `_corrupt` quarantine column, so bad lines surface
as rows you can count/inspect instead of task failures; gzip/zstd
compressed inputs work unchanged through Spark's codec inference.

Splittability note (the scale property): plain and bzip2 files split;
gzip does not — a 10 GB .jsonl.gz is ONE task. Production layouts shard
compressed corpora into ~256 MB files so parallelism comes from file
count; these readers accept directories/globs for exactly that shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt"

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.IntegerType()),
    ]
)


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType([*schema.fields, T.StructField(CORRUPT_COL, T.StringType())])


def read_jsonl_corpus(
    spark: SparkSession, path: str, schema: T.StructType = DOCUMENTS_SCHEMA
) -> DataFrame:
    """One JSON document per line → rows of ``schema`` plus a ``_corrupt``
    column holding the raw line for anything that fails to parse (NULL for
    clean rows). Multiline JSON is deliberately off: line-delimited input
    is what keeps the format splittable."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV with the same contract: explicit schema, PERMISSIVE quarantine,
    RFC-4180 quoting (embedded newlines require multiLine=false-compatible
    quoting from the producer — multiline CSV is not splittable)."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the quarantine column, corrupt rows with the raw
    line in ``_corrupt``) — the triage step: count/inspect the second,
    proceed with the first.

    Caches the parsed scan first: Spark refuses raw-scan queries whose
    referenced columns prune down to ONLY the internal corrupt-record
    column (QUERY_ONLY_CORRUPT_RECORD_COLUMN — column pruning recreates
    that shape even under a select *), and its documented remedy is
    materializing the parse. Triage consumes both sides anyway, so the
    cache does double duty: one file scan feeds clean rows AND the
    quarantine. Call ``df.unpersist()`` on the input when done."""
    df = df.cache()
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull())
    return clean, bad


def write_jsonl_corpus(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Writer counterpart (sharded by Spark's partitioning; pass
    ``compression='gzip'`` only with bounded file sizes — see module note)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_orc_corpus(
    spark: SparkSession, path: str, schema: T.StructType = DOCUMENTS_SCHEMA
) -> DataFrame:
    """ORC reader with the same schema-drift contract, adapted for a
    self-describing columnar format: there is no per-line corrupt record
    to quarantine (the stripe either decodes or the task fails), so the
    drift guard moves to the FILE schema — every expected column must
    exist with the expected type, and extra provider columns are dropped
    loudly here rather than silently reshaping downstream tables.

    Raises ``ValueError`` naming the missing/mistyped columns; ORC stripes
    split, so unlike gzip JSONL the parallelism story needs no sharding
    discipline from the producer."""
    df = spark.read.orc(path)  # one reader: schema check + select share it
    actual = {f.name: f.dataType for f in df.schema.fields}
    problems = []
    for f in schema.fields:
        got = actual.get(f.name)
        if got is None:
            problems.append(f"missing column {f.name!r} ({f.dataType.simpleString()})")
        elif got != f.dataType:
            problems.append(
                f"column {f.name!r}: expected {f.dataType.simpleString()}, "
                f"file has {got.simpleString()}"
            )
    if problems:
        raise ValueError(f"ORC schema drift at {path}: " + "; ".join(problems))
    return df.select(*[f.name for f in schema.fields])


def write_orc_corpus(
    df: DataFrame, path: str, compression: str = "zstd"
) -> None:
    """Writer counterpart (zstd default — best ratio/speed for text; ORC
    stripes stay splittable under every codec, unlike gzip JSONL)."""
    df.write.mode("overwrite").option("compression", compression).orc(path)
