"""Structured Streaming over the event log — the Spark-native scale path
(BASELINE.json north star: "Structured Streaming + custom event delivery").

The reference has no event-time semantics (idx-total-order only, SURVEY
§2.B streaming note); these helpers are therefore *extensions*: the same
parquet event log doubles as a streaming source, so large-scale consumers
(rollups, feature pipelines) run as real Structured Streaming jobs with
watermarks, while protocol-level delivery keeps the reference's cursor
semantics (streaming/subscribe.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..stream import EVENT_SCHEMA, Stream


def events_readstream(stream: Stream, max_files_per_trigger: int = 64) -> DataFrame:
    """The stream's event log as a Structured Streaming source.

    File-based source over the append-only parquet dir: each committed batch
    is a new immutable file → exactly the file-source contract. At scale the
    same code points at the partitioned log root (all streams) and filters
    by stream_did via partition pruning.
    """
    return (
        stream.spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(stream.events_dir)
    )


def decoded_payloads(events: DataFrame) -> DataFrame:
    """events + payload decoded to a JSON string column (`payload_json`) —
    decode once per event, then everything downstream is JVM-side
    get_json_object/variant ops."""
    return events.withColumn("payload_json", F.expr("drisl_to_json(payload)"))


def idx_window_counts(events: DataFrame, window_size: int = 100) -> DataFrame:
    """Arrival-order rollup: counts per idx window (the reference's only
    notion of order). Works identically in batch and streaming."""
    return (
        events.withColumn("idx_bucket", (F.col("idx") / window_size).cast("long"))
        .groupBy("idx_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("idx").alias("first_idx"),
            F.max("idx").alias("last_idx"),
            F.approx_count_distinct("user").alias("approx_users"),
        )
    )


def run_available_now(
    stream: Stream, transform, checkpoint_dir: str, output_table: str
) -> None:
    """Drain the current log through a streaming transform with
    Trigger.AvailableNow into an in-memory table — the batch-equivalent
    execution of a streaming query (used by tests; in production swap the
    sink for parquet/Kafka and drop availableNow)."""
    src = events_readstream(stream)
    q = (
        transform(src)
        .writeStream.format("memory")
        .queryName(output_table)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def foreach_batch_ingest(
    spark: SparkSession,
    source_df: DataFrame,
    stream: Stream,
    to_incoming,
    checkpoint_dir: str,
    max_rows_per_chunk: int = 10_000,
):
    """Scale ingestion: an upstream streaming source (Kafka, files, …) is
    folded into a Stream inside foreachBatch — the single-writer commit path
    runs on the driver per micro-batch, exactly once per batch id.

    ``to_incoming(row) -> IncomingEvent`` maps source rows to events.
    The micro-batch lands on the driver in bounded chunks
    (``toLocalIterator`` + ``max_rows_per_chunk``) so a fat trigger file
    can't blow driver memory — maxFilesPerTrigger bounds files, this
    bounds rows regardless of file size. Appends are atomic per chunk;
    exactly-once across micro-batch REPLAYS is kept by a progress sidecar
    in the stream dir: committed (batch_id, chunk) pairs are recorded
    after each append and skipped when the checkpoint re-runs the batch.
    """
    return (
        source_df.writeStream.foreachBatch(
            make_ingest_sink(stream, to_incoming, max_rows_per_chunk)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def make_ingest_sink(stream: Stream, to_incoming, max_rows_per_chunk: int = 10_000):
    """Build the foreachBatch sink (exposed for replay-semantics tests)."""
    import json
    import os

    progress_path = os.path.join(stream.dir, "ingest_progress.json")

    def _load_progress() -> dict:
        if os.path.exists(progress_path):
            with open(progress_path) as f:
                return json.load(f)
        return {}

    def _mark(done: dict, batch_id: int, chunk_no: int) -> None:
        done[str(batch_id)] = chunk_no + 1
        tmp = progress_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(done, f)
        os.replace(tmp, progress_path)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        done = _load_progress()
        committed = done.get(str(batch_id), 0)
        chunk_no = 0
        buf = []

        def flush() -> None:
            nonlocal chunk_no
            if buf and chunk_no >= committed:
                stream.add_events(buf)
                _mark(done, batch_id, chunk_no)
            chunk_no += 1

        for r in batch_df.toLocalIterator():
            buf.append(to_incoming(r))
            if len(buf) >= max_rows_per_chunk:
                flush()
                buf = []
        flush()

    return _sink
