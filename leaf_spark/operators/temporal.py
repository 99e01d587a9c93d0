"""Temporal join operators — as-of join and range (interval) join.

Spark has no built-in AS-OF join (DuckDB/Pandas/kdb do) and a naive
`t1.ts BETWEEN t2.lo AND t2.hi` join compiles to a broadcast/cartesian
nested-loop. Both operators here are re-expressed as equi-joins so Catalyst
can shuffle-partition them like any other join:

- ``asof_join``   union-and-carry: tag both sides, sort each key's rows by
  time once, and carry the latest right-side row forward with
  ``last(..., ignorenulls=True)`` over an unbounded-preceding window. Cost
  is ONE shuffle on the join key (the window's partitionBy) — no join at
  all, no per-key nested loop, and the right side is never re-scanned per
  left row. Skewed keys (one user holding 100 M events) would serialize one
  partition's sort, so ``time_bucket=<width>`` switches to the
  skew-mitigated form: the window partitions by (key, time-bucket) — a hot
  key spreads over its time range — and the latest right-side value crosses
  bucket boundaries through a per-(key, bucket) tail aggregate plus a tiny
  window over the one-row-per-bucket tail table (rows there = #buckets per
  key, not #events). Exact same semantics, two extra bounded shuffles.
- ``range_join``  interval bucketing: each interval registers on every
  fixed-width time bucket it overlaps (≤ 2 when ``bucket_width`` ≥ max
  interval length — enforced), each point registers on its one bucket, and
  the pair equi-joins on (key…, bucket) before re-checking the exact range
  predicate. Candidate fan-out is bounded by bucket occupancy instead of
  |points| × |intervals|; the join is an ordinary shuffled equi-join AQE
  can re-plan.

Reference parity note: the reference has no temporal joins (SQLite's
nearest equivalent is a correlated MAX subquery); these are scale
extensions for event-log analytics (attribution, windowed rollups) per the
north star in BASELINE.json.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

_SIDE = "__side__"
_TIME = "__t__"
_CARRY = "__rv__"
_BUCKET = "__bucket__"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    time_bucket: float | None = None,
) -> DataFrame:
    """Backward as-of LEFT join: for every left row, attach the right row
    with the greatest ``right_time`` ≤ ``left_time`` within the same ``on``
    key (DuckDB ``ASOF LEFT JOIN`` semantics, exact-time matches included).

    Left rows with no earlier right row keep NULLs. Right-side time ties
    within a key are broken by the carried column order (last wins after a
    deterministic sort on all carried columns), so retries reproduce the
    same answer.

    ``time_bucket`` (numeric: whole seconds for timestamp columns, plain
    units for numerics) opts into the skew-mitigated plan for hot keys —
    see the module docstring. Result is identical for any width > 0.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in on and c != right_time
    ]
    carried = [right_time, *[c for c in right_cols if c != right_time]]

    r = right.select(
        *on,
        F.col(right_time).alias(_TIME),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c) for c in carried]).alias(_CARRY),
    )
    l = left.select(
        *on,
        F.col(left_time).alias(_TIME),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_CARRY].dataType).alias(_CARRY),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow__"),
    )
    unioned = l.unionByName(
        r.select(
            *on,
            _TIME,
            _SIDE,
            _CARRY,
            F.lit(None).cast(l.schema["__lrow__"].dataType).alias("__lrow__"),
        )
    )

    # Right rows sort before left rows at equal time (side 0 < 1) so an
    # exact-time right row is visible to the left row; _CARRY is the final
    # sort key so equal-(time,side) right duplicates resolve deterministically.
    carried_out = [
        F.col("__m__")[c].alias(f"{c}{suffix}" if c in left.columns else c)
        for c in carried
    ]
    out_cols = [*[F.col("__lrow__")[c].alias(c) for c in left.columns], *carried_out]

    if time_bucket is None:
        w = (
            Window.partitionBy(*on)
            .orderBy(_TIME, _SIDE, _CARRY)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            unioned.withColumn("__m__", F.last(_CARRY, ignorenulls=True).over(w))
            .where(F.col(_SIDE) == 1)
            .select(*out_cols)
        )

    # Skew-mitigated plan: partition the carry window by (key, time-bucket)
    # so a hot key spreads across its time range, then stitch buckets with a
    # cross-bucket carry computed on the tiny per-(key, bucket) tail table.
    tnum = F.col(_TIME)
    if unioned.schema[_TIME].dataType.typeName().startswith("timestamp"):
        tnum = F.unix_timestamp(tnum).cast("double")
    else:
        tnum = tnum.cast("double")
    tagged = unioned.withColumn(
        _BUCKET, F.floor(tnum / F.lit(float(time_bucket))).cast("long")
    )

    # within-bucket carry: identical order, partition narrowed by bucket
    wb = (
        Window.partitionBy(*on, _BUCKET)
        .orderBy(_TIME, _SIDE, _CARRY)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = tagged.withColumn("__m__", F.last(_CARRY, ignorenulls=True).over(wb))

    # per-(key, bucket) tail = the max-(time, carry) right row of the bucket
    # (same total order the window uses: _SIDE is constant 0 on right rows),
    # NULL for buckets containing only left rows.  One row per (key, bucket).
    tails = tagged.groupBy(*on, _BUCKET).agg(
        F.max(
            F.when(F.col(_SIDE) == 0, F.struct(F.col(_TIME), F.col(_CARRY)))
        ).alias("__tail__")
    )
    # exclusive running carry over buckets: rows here = #buckets per key —
    # bounded by time-range/width, never by event count, so the hot key's
    # serial work is O(#buckets), not O(#events)
    wprev = Window.partitionBy(*on).orderBy(_BUCKET).rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev = tails.withColumn(
        "__prev__", F.last("__tail__", ignorenulls=True).over(wprev)
    ).select(*on, _BUCKET, F.col("__prev__")[_CARRY].alias("__pc__"))

    return (
        local.join(prev, [*on, _BUCKET], "left")
        .withColumn("__m__", F.coalesce("__m__", "__pc__"))
        .where(F.col(_SIDE) == 1)
        .select(*out_cols)
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_time: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row (same ``on`` key) whose
    ``[start_col, end_col)`` half-open range contains ``point_time``.

    ``bucket_width`` is numeric in the time column's number domain —
    whole seconds for timestamp columns, plain units for numerics — and
    must be ≥ the maximum interval length so an interval spans at most 2
    buckets; asserted at plan-build time with a scalar aggregate over the
    intervals side (cheap: one column, map-side reduced).
    """

    def as_num(df: DataFrame, name: str) -> Column:
        # timestamps → epoch seconds via unix_timestamp (ANSI-safe in any
        # caller session, unlike a timestamp→double cast); truncation to
        # whole seconds only coarsens the bucket key — the exact range
        # predicate below re-checks on the original values.
        c = F.col(name)
        if df.schema[name].dataType.typeName().startswith("timestamp"):
            return F.unix_timestamp(c).cast("double")
        return c.cast("double")

    def bucket_of(num: Column) -> Column:
        return F.floor(num / F.lit(float(bucket_width))).cast("long")

    # guard: widest interval must fit bucket_width (else candidate loss)
    widest = intervals.select(
        F.max(as_num(intervals, end_col) - as_num(intervals, start_col)).alias("w")
    ).first()["w"]
    if widest is not None and widest > float(bucket_width):
        raise ValueError(
            f"bucket_width {bucket_width} < widest interval {widest}; "
            "an interval would span >2 buckets and lose candidates"
        )

    lo_b = bucket_of(as_num(intervals, start_col))
    hi_b = bucket_of(as_num(intervals, end_col))
    # explicit aliases: both sides often derive from the same scan (e.g. a
    # self range-join of an event log), where bare df[col] references are
    # ambiguous lineage and Spark warns about trivially-true predicates
    iv = intervals.withColumn(
        _BUCKET, F.explode(F.array_distinct(F.array(lo_b, hi_b)))
    ).alias("__iv__")
    pt = points.withColumn(_BUCKET, bucket_of(as_num(points, point_time))).alias(
        "__pt__"
    )

    P = lambda c: F.col(f"__pt__.{c}")  # noqa: E731
    I = lambda c: F.col(f"__iv__.{c}")  # noqa: E731
    cond = [P(c) == I(c) for c in on]
    cond += [
        P(_BUCKET) == I(_BUCKET),
        P(point_time) >= I(start_col),
        P(point_time) < I(end_col),
    ]
    out_cols = [P(c) for c in points.columns] + [
        I(c) for c in intervals.columns if c not in on
    ]
    return pt.join(iv, reduce(lambda a, b: a & b, cond), how).select(*out_cols)
