"""Continuous corpus-curation path: quality-gate a document stream and
route survivors/rejects to separate parquet sinks (the streaming mirror of
the batch q72 Gopher gate + quarantine pattern).

The gate itself (`operators.text.gopher_filter`) is a shuffle-free
projection, so it runs inside a streaming micro-batch with zero state —
the only stateful piece is the checkpointed source offset tracking.
Routing uses foreachBatch with a per-batch-id overwrite so micro-batch
REPLAYS after a crash are idempotent: each (epoch) writes to a
``_batch_id=<n>`` partition with dynamic partition overwrite, making the
sink exactly-once without a transactional format.

At scale this is the canonical continuous-curation front end: files land
from the crawler, each micro-batch is gated in parallel (narrow), and the
quarantine side keeps the REJECTED rows with their per-rule verdicts so a
threshold change can be audited (and replayed) later from real data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.text import gopher_filter


def documents_stream(
    spark: SparkSession,
    src_dir: str,
    max_files: int = 16,
    schema=None,
) -> DataFrame:
    """File-arrival stream over a documents parquet directory.

    Streaming sources need an explicit schema. When ``schema`` is not
    given it is read ONCE from the parquet footers already present rather
    than hardcoded, because the driver testdata has changed
    integer/timestamp widths between rounds (the same
    precision-adaptivity rule as ``load_tables``). Files that arrive
    later must match the footprint of the first ones — a schema-drifting
    producer fails the micro-batch loudly, which is the correct behavior
    for a curation pipeline. Starting the stream BEFORE any file exists
    (the normal deploy order for a crawler front end) requires passing
    ``schema`` explicitly — footer inference has nothing to read, and the
    error below says exactly that instead of a bare AnalysisException."""
    if schema is None:
        try:
            schema = spark.read.parquet(src_dir).schema
        except Exception as e:
            raise ValueError(
                f"documents_stream({src_dir!r}): no parquet files to infer "
                "a schema from yet — pass schema= explicitly to start the "
                "stream before the first file lands"
            ) from e
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(src_dir)
    )


def _gate_sink(out_dir: str, quarantine_dir: str):
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        gated = gopher_filter(batch_df).withColumn(
            "_batch_id", F.lit(int(batch_id))
        )
        # one pass computes the verdicts; persist so the two writes below
        # don't re-run the gate per sink
        gated.persist()
        try:
            # dynamic partition overwrite: a replayed batch id rewrites
            # ONLY its own partition → idempotent under at-least-once
            # foreachBatch. Set as a per-WRITE option, never on the
            # session conf — a session-wide "dynamic" would silently
            # change every other overwrite+partitionBy write (e.g. the
            # training-shard sink) from truncate to merge semantics.
            (
                gated.where(F.col("keep"))
                .select("doc_id", "_batch_id")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(out_dir)
            )
            (
                gated.where(~F.col("keep"))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(quarantine_dir)
            )
        finally:
            gated.unpersist()

    return sink


def gated_corpus_ingest(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    max_files: int = 16,
    schema=None,
):
    """Start (availableNow) the gated ingest; returns the StreamingQuery.

    Survivor sink carries ids only (the corpus itself stays in the source
    files — no byte duplication); the quarantine sink carries the FULL
    rows plus per-rule verdicts for audit/replay. Pass ``schema`` to
    start before the first source file lands."""
    src = documents_stream(spark, src_dir, max_files, schema=schema)
    return (
        src.writeStream.foreachBatch(_gate_sink(out_dir, quarantine_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
