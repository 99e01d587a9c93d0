"""Stateful Structured Streaming operators — the 100 TB scale path.

The reference has no event-time semantics (SURVEY §2.B streaming note: idx
total order only, no watermarks, no late data — leaf-stream/src/lib.rs:
647-657), so everything here is a *scale extension* over the driver's
``events`` table shape (event_id, ts, user_id, event_type, value, props):

- ``windowed_event_counts``  tumbling event-time windows + watermark —
  late data handled by Spark's state store, partial aggregation map-side.
- ``sessionized``            native ``session_window`` gap sessions (the
  streaming analog of the batch lag-window sessionize in q34).
- ``running_user_stats``     custom per-key stateful fold via
  ``applyInPandasWithState`` — arbitrary state (counters, last-seen) that
  built-in aggregations can't express incrementally.

All three run identically under ``Trigger.AvailableNow`` (bounded drain,
used in tests) and continuous micro-batch triggers (production). State is
keyed by user/window, so a 1000-executor cluster shards the state store by
the same keys the shuffle already hashes on — no skew beyond the data's own.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Older driver testdata carried TIMESTAMP(NANOS) (readable only as a long
# under the legacy nanosAsLong flag); current testdata is TIMESTAMP(MICROS)
# (reads as a native timestamp). The streaming file source needs an explicit
# schema, so probe the directory with a batch read and adapt — hardcoding
# either precision silently corrupts event time for the other (a ÷1000 on
# micros compresses the whole timeline 1000×, and every gap/window semantic
# with it).
EVENTS_NANOS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos since epoch
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_batch(spark: SparkSession, events_dir: str) -> DataFrame:
    """Batch read of an events directory with ``ts`` normalized to a real
    timestamp regardless of the parquet's on-disk precision."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(events_dir)
    if dict(df.dtypes)["ts"] == "bigint":  # TIMESTAMP(NANOS) under the flag
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Watermarks reject TIMESTAMP_NTZ; under the UTC session timezone the
    # cast to TIMESTAMP is value-preserving.
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def events_stream(spark: SparkSession, events_dir: str, max_files: int = 16) -> DataFrame:
    """The driver's events table shape as a streaming source with a real
    event-time ``ts`` (timestamp) column, adapting to the on-disk timestamp
    precision (see ``events_batch``)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probe = spark.read.parquet(events_dir)
    nanos = dict(probe.dtypes)["ts"] == "bigint"
    schema = EVENTS_NANOS_SCHEMA if nanos else probe.schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files))
        .parquet(events_dir)
    )
    if nanos:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time rollup per type; watermark bounds state for late
    data. In append mode a window emits once the watermark passes its end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
            "approx_users",
        )
    )


def sessionized(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "0 seconds"
) -> DataFrame:
    """Gap-based sessions per user via the native ``session_window`` state
    operator (the streaming analog of q34's batch lag-window sessionize)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


_RUN_OUT_SCHEMA = (
    "user_id long, n_events long, total_value double, last_seen timestamp"
)
_RUN_STATE_SCHEMA = "n long, total double, last_us long"


def _running_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].max().value // 1_000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_seen": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful fold: per-user cumulative (count, value sum, last-seen)
    maintained across micro-batches in the state store — the
    ``applyInPandasWithState`` pattern for operators that built-in streaming
    aggregations can't express (arbitrary Python state transition).

    Output mode: update — one refreshed row per user per micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_update,
        outputStructType=_RUN_OUT_SCHEMA,
        stateStructType=_RUN_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def drain(
    df: DataFrame,
    checkpoint_dir: str,
    table: str,
    output_mode: str,
    timeout_s: int = 180,
) -> None:
    """Run a streaming transform to completion (AvailableNow) into an
    in-memory table; production swaps the sink, not the transform."""
    q = (
        df.writeStream.format("memory")
        .queryName(table)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    time_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: emit only the first occurrence of each
    normalized-content hash, with bounded state.

    ``dropDuplicatesWithinWatermark`` keys the state store on the content
    hash (uniform by construction — same shape as the batch ``exact_dedup``
    shuffle) and evicts entries older than the watermark, so state size is
    bounded by the duplicate-arrival horizon rather than the corpus: the
    property that keeps this runnable forever on a 1000-executor ingest
    pipeline. Exact-forever dedup at rest stays the batch operator's job;
    this dedups the firehose before it lands.
    """
    hashed = docs.withColumn(
        "content_hash",
        F.sha2(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), 256),
    )
    return hashed.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def stream_stream_attribution(
    actions: DataFrame,
    exposures: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
    action_type: str = "purchase",
    exposure_type: str = "click",
) -> DataFrame:
    """Watermarked stream-stream interval join: attribute each action event
    to the same user's exposure events in the preceding ``horizon`` — the
    streaming analog of the batch as-of/interval joins (q65/q66/q82).

    Both sides carry a watermark and the join predicate bounds exposure
    time to [action - horizon, action], so Spark can evict exposure state
    once the watermark passes the horizon: state is O(events within the
    horizon), not O(stream history) — the property that makes a
    click-to-conversion join runnable forever on a 1000-executor ingest
    path. The state store shards on user_id, the equi-key the shuffle
    already hashes on.

    Output (append mode, emitted once both watermarks clear the pair):
    one row per (action, matching exposure).
    """
    a = (
        actions.where(F.col("event_type") == action_type)
        .select(
            F.col("event_id").alias("action_id"),
            F.col("user_id"),
            F.col("ts").alias("action_ts"),
            F.col("value").alias("action_value"),
        )
        .withWatermark("action_ts", watermark)
    )
    e = (
        exposures.where(F.col("event_type") == exposure_type)
        .select(
            F.col("event_id").alias("exposure_id"),
            F.col("user_id").alias("e_user_id"),
            F.col("ts").alias("exposure_ts"),
        )
        .withWatermark("exposure_ts", watermark)
    )
    return a.join(
        e,
        (F.col("user_id") == F.col("e_user_id"))
        & (F.col("exposure_ts") <= F.col("action_ts"))
        & (F.col("exposure_ts") >= F.col("action_ts") - F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select("action_id", "user_id", "action_ts", "action_value", "exposure_id", "exposure_ts")


# ---------------------------------------------------------------------------
# Event-time disorder monitor (the streaming counterpart of batch q130)
# ---------------------------------------------------------------------------

_DIS_OUT_SCHEMA = (
    "user_id long, n_events long, n_out_of_order long, max_backstep_ms long"
)
_DIS_STATE_SCHEMA = "prev_us long, n long, n_ooo long, max_back_us long"


def _disorder_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    prev_us, n, n_ooo, max_back = (
        state.get if state.exists else (-1, 0, 0, 0)
    )
    # a group can arrive as SEVERAL Arrow chunks within one micro-batch
    # (maxRecordsPerBatch splits, multi-file batches) — concat and sort
    # ONCE so the event_id order holds across chunk seams, not just
    # inside each chunk; across micro-batches the file source delivers
    # ids ascending (the log's append order)
    chunks = list(pdfs)
    whole = (
        pd.concat(chunks, ignore_index=True).sort_values("event_id")
        if chunks
        else pd.DataFrame({"ts": []})
    )
    for ts in whole["ts"]:
        us = int(ts.value // 1_000)
        if prev_us >= 0 and us < prev_us:
            n_ooo += 1
            max_back = max(max_back, prev_us - us)
        prev_us = us  # q130 semantics: compare to the PREVIOUS event,
        n += 1        # not the running max
    state.update((prev_us, n, n_ooo, max_back))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "n_out_of_order": [n_ooo],
            "max_backstep_ms": [max_back // 1_000],
        }
    )


def disorder_monitor(events: DataFrame) -> DataFrame:
    """Per-user event-time disorder tracking across micro-batches: how many
    events arrived with a timestamp EARLIER than their predecessor's, and
    the worst backstep — the live feed of the watermark-sizing number q130
    computes at rest (an out-of-order rate trending up means the deployed
    watermark is about to start dropping data).

    Same state discipline as ``running_user_stats``: state shards on
    user_id (the key the shuffle already hashes on), a few longs per user.
    Output mode: update — one refreshed row per user per micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _disorder_update,
        outputStructType=_DIS_OUT_SCHEMA,
        stateStructType=_DIS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Live Markov transition matrix (the streaming counterpart of batch q154)
# ---------------------------------------------------------------------------

_TR_OUT_SCHEMA = "user_id long, cur string, nxt string, n long"
_TR_STATE_SCHEMA = "last_type string, counts_json string"


def _transition_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import json

    last_type, cj = state.get if state.exists else (None, "{}")
    counts: dict[str, int] = json.loads(cj)
    chunks = list(pdfs)
    if chunks:
        # same chunk-seam discipline as _disorder_update: concat + sort
        # once per micro-batch so event_id order holds across Arrow chunks
        whole = pd.concat(chunks, ignore_index=True).sort_values("event_id")
        for et in whole["event_type"]:
            if last_type is not None:
                k = f"{last_type}\x00{et}"
                counts[k] = counts.get(k, 0) + 1
            last_type = et
    state.update((last_type, json.dumps(counts, sort_keys=True)))
    if counts:
        items = sorted(counts.items())
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(items),
                "cur": [k.split("\x00")[0] for k, _ in items],
                "nxt": [k.split("\x00")[1] for k, _ in items],
                "n": [v for _, v in items],
            }
        )


def transition_counts(events: DataFrame) -> DataFrame:
    """Per-user first-order transition counts maintained live across
    micro-batches — the streaming counterpart of the batch q154 Markov
    matrix, in PROCESSING order (event_id, the log's append order; the
    event-time-ordered matrix is the batch entry's job). State per user
    is one string + a #event_types²-bounded JSON counter map, sharded on
    the user_id key the shuffle already hashes on; a downstream stateless
    ``groupBy(cur, nxt).sum(n)`` of the latest per-user rows yields the
    corpus matrix.

    Output mode: update — the user's refreshed transition rows per batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _transition_update,
        outputStructType=_TR_OUT_SCHEMA,
        stateStructType=_TR_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# streaming SCD-2: live type-2 version history (counterpart of batch q168)
# ---------------------------------------------------------------------------

_SCD_OUT_SCHEMA = (
    "user_id long, attr string, valid_from_us long, valid_to_us long"
)
_SCD_STATE_SCHEMA = "attr string, from_us long"


def _scd2_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    attr, from_us = state.get if state.exists else (None, None)
    rows: dict[str, list] = {
        "user_id": [], "attr": [], "valid_from_us": [], "valid_to_us": []
    }
    chunks = list(pdfs)
    if chunks:
        # chunk-seam discipline (see _disorder_update): concat + sort once
        # per micro-batch so event_id order holds across Arrow chunks
        whole = pd.concat(chunks, ignore_index=True).sort_values("event_id")
        for et, us in zip(whole["event_type"], whole["ts_us"]):
            us = int(us)
            if attr is None:
                attr, from_us = et, us
            elif et != attr:
                rows["user_id"].append(key[0])
                rows["attr"].append(attr)
                rows["valid_from_us"].append(from_us)
                rows["valid_to_us"].append(us)
                attr, from_us = et, us
    state.update((attr, from_us))
    if rows["user_id"]:
        yield pd.DataFrame(rows)


def scd2_versions(events: DataFrame) -> DataFrame:
    """Live type-2 slowly-changing-dimension history of each user's
    current event type — the streaming counterpart of the batch q168
    build, in PROCESSING order (event_id, the log's append order; the
    event-time-ordered history is the batch entry's job). A CLOSED
    version [valid_from_us, valid_to_us) is emitted the moment the
    user's type changes; the OPEN version lives only in state (one
    string + one long per user, sharded on the user_id key the shuffle
    already hashes on). Closed versions are immutable, so append mode
    fits exactly — no retraction, every output row is final.

    Output mode: append — closed versions only."""
    ev = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _scd2_update,
        outputStructType=_SCD_OUT_SCHEMA,
        stateStructType=_SCD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Live count-min sketch (the streaming counterpart of batch q174)
# ---------------------------------------------------------------------------


def cms_bucket_cols(key_col: str, d: int = 4, w: int = 64) -> list:
    """The d (row, bucket) pairs for a key — the same md5-derived hash
    family as the batch q174 sketch, as pure JVM-side expressions."""
    pairs = []
    for r in range(d):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{r}:"), F.col(key_col).cast("string"))), 1, 12
            ),
            16,
            10,
        ).cast("long")
        pairs.append(
            F.struct(F.lit(r).alias("r"), F.pmod(h, F.lit(w)).alias("bucket"))
        )
    return pairs


def cms_cells(events: DataFrame, key_col: str = "user_id", d: int = 4, w: int = 64) -> DataFrame:
    """Live count-min sketch over a high-cardinality key: each event
    increments one cell per sketch row, and the running cells table IS a
    streaming aggregation — fully declarative, no custom state, partial
    aggregation map-side, at most d*w = 256 rows of state total
    regardless of corpus size. Point estimates read
    ``min(cell over the key's d buckets)`` >= true count, exactly as the
    batch q174 entry audits.

    Output mode: update — refreshed cells each micro-batch."""
    return (
        events.where(F.col(key_col).isNotNull())
        .select(F.explode(F.array(*cms_bucket_cols(key_col, d, w))).alias("rb"))
        .select("rb.r", "rb.bucket")
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cell"))
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (bounded-state streaming top-k)
# ---------------------------------------------------------------------------

_MG_OUT_SCHEMA = "shard long, key string, est long, shard_n long"
_MG_STATE_SCHEMA = "n long, ks string, cs string"


def _mg_update_factory(k: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, ks, cs = state.get
            counters = (
                dict(zip(ks.split("\x1f"), (int(c) for c in cs.split("\x1f"))))
                if ks
                else {}
            )
        else:
            n, counters = 0, {}
        chunks = list(pdfs)
        whole = (
            pd.concat(chunks, ignore_index=True).sort_values("event_id")
            if chunks
            else pd.DataFrame({"mg_key": []})
        )
        for x in whole["mg_key"]:
            n += 1
            if x in counters:
                counters[x] += 1
            elif len(counters) < k:
                counters[x] = 1
            else:
                # decrement-all step: every counter pays one, zeros drop
                counters = {y: c - 1 for y, c in counters.items() if c > 1}
        items = sorted(counters.items())
        state.update(
            (
                n,
                "\x1f".join(y for y, _ in items),
                "\x1f".join(str(c) for _, c in items),
            )
        )
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(items),
                "key": [y for y, _ in items],
                "est": [c for _, c in items],
                "shard_n": [n] * len(items),
            }
        )

    return update


def heavy_hitters(
    events: DataFrame, key_col: str = "user_id", k: int = 8, nshards: int = 8
) -> DataFrame:
    """Misra-Gries heavy hitters over the stream with BOUNDED state: each
    shard keeps at most k counters (the classic guarantee per shard:
    true_count - est <= shard_n / (k + 1), and any key with frequency
    above that bound is present). Shards split the key space so the k
    counters and the per-item work distribute; merging summaries across
    shards at read time keeps the same additive error bound, because each
    key lives in exactly one shard (disjoint key ranges, not replicas).

    Where ``cms_cells`` answers "how often is key X?" (point query, fixed
    256 cells), this answers "WHICH keys are frequent?" without holding
    the full key set — the pair every streaming frequency stack ships.

    State per shard: one long + k counters. Output mode: update — each
    micro-batch re-emits a touched shard's full summary stamped with
    shard_n; readers keep each shard's highest-shard_n rows (a key can
    LEAVE the summary, so stale rows must not linger).

    ``key_col`` values must not contain the \\x1f unit separator (state
    serialization); event keys here are numeric ids rendered as strings."""
    ev = events.where(F.col(key_col).isNotNull()).select(
        F.pmod(F.col(key_col).cast("long"), F.lit(nshards)).alias("shard"),
        F.col(key_col).cast("string").alias("mg_key"),
        "event_id",
    )
    return ev.groupBy("shard").applyInPandasWithState(
        _mg_update_factory(k),
        outputStructType=_MG_OUT_SCHEMA,
        stateStructType=_MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Live inter-event gap moments (the streaming counterpart of batch q193)
# ---------------------------------------------------------------------------

_GAP_OUT_SCHEMA = (
    "user_id long, event_type string, n_gaps long, "
    "sum_gap_us string, sum_gap_sq string"
)
_GAP_STATE_SCHEMA = "last_us long, n_gaps long, sum_gap string, sum_sq string"


def _gap_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    last_us, n, s, s2 = state.get if state.exists else (-1, 0, "0", "0")
    si, s2i = int(s), int(s2)  # exact python ints — gap^2 overflows int64
    chunks = list(pdfs)
    if chunks:
        # chunk-seam discipline (see _disorder_update): concat + sort once
        whole = pd.concat(chunks, ignore_index=True).sort_values("event_id")
        for ts in whole["ts_us"]:
            us = int(ts)
            if last_us >= 0:
                g = us - last_us
                n += 1
                si += g
                s2i += g * g
            last_us = us
    state.update((last_us, n, str(si), str(s2i)))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_type": [key[1]],
            "n_gaps": [n],
            "sum_gap_us": [str(si)],
            "sum_gap_sq": [str(s2i)],
        }
    )


def gap_moments(events: DataFrame) -> DataFrame:
    """Live inter-event gap moments per (user, type) stream — the state
    that feeds q193's burstiness coefficient (sigma-mu)/(sigma+mu)
    continuously: summing the emitted rows per event_type gives exactly
    the batch entry's n/Sx/Sxx moments (when the log arrives in event-time
    order; under disorder the gaps are PROCESSING-order deltas — the
    event-time-ordered statistic stays the batch entry's job, the scd2
    convention, and negative deltas are q130's disorder signal).

    State shards on the (user_id, event_type) key the shuffle already
    hashes on: one long + three exact counters per stream. The squared
    sums are decimal-string encoded in both state and output — a
    microsecond gap squared overflows int64 at day-scale gaps, the same
    reason the batch side routes through decimal(38,0).

    Output mode: update — one refreshed moments row per stream per
    micro-batch."""
    ev = events.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return ev.groupBy("user_id", "event_type").applyInPandasWithState(
        _gap_update,
        outputStructType=_GAP_OUT_SCHEMA,
        stateStructType=_GAP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Live conversion counts (the streaming counterpart of batch q196/q160)
# ---------------------------------------------------------------------------


def conversion_counts(
    events: DataFrame, threshold: float = 100.0
) -> DataFrame:
    """Live per-type conversion tallies — the exact (n, x) state behind
    q196's Wilson interval and q160's two-proportion z, maintained as a
    DECLARATIVE streaming aggregation (no custom state function): one
    update-mode groupBy whose state is two longs per event type, exactly
    the shape Spark's agg state store already handles. Downstream
    monitors derive rate/CI from the exact counts at read time (the
    Wilson formula is a deterministic function of n and x — keeping the
    math OUT of the stream keeps the state minimal and replay-safe).

    Output mode: update — one refreshed (event_type, n, x) row per type
    per micro-batch."""
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("value") >= threshold, 1).otherwise(0)
            ).alias("x"),
        )
    )
