"""Bucketed-table layout: pre-shuffled storage for repeated co-located joins.

At 100 TB the dominant recurring cost of a pipeline is re-shuffling the same
fact table on the same key for every join/aggregate that uses it. Spark's
bucketed tables move that shuffle to WRITE time: data lands hash-partitioned
(and optionally sorted) by the key into a fixed bucket count, and every
subsequent equi-join or aggregation on that key reads the buckets
co-located — the exchange disappears from the plan (verified by
``tests/test_bucketing.py``).

This is the storage-side complement to the runtime strategies in
``operators/skew.py`` (salting) and AQE: salt what is skewed, broadcast what
is small, bucket what is joined repeatedly.

Rules that make bucketing actually work (encoded in the helpers):
- both sides of a join must be bucketed INTO THE SAME BUCKET COUNT on the
  join keys (Spark does not coalesce mismatched counts unless
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` is on);
- bucket pruning applies to equality filters on the bucket key (scan skips
  buckets), a free partition-pruning analog for point lookups;
- ``sortBy`` on the bucket key additionally removes the Sort from
  sort-merge joins — buckets stream directly into the merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str] | str,
    buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> DataFrame:
    """Persist ``df`` as a parquet table bucketed (and sorted) by ``keys``.

    Returns the re-read table, whose scan exposes the bucketing to the
    planner. One shuffle is paid here, once, instead of per downstream job.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    spark = df.sparkSession
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)
    return spark.table(table)


def cobucketed_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two tables bucketed on their join keys with equal bucket
    counts. The ``merge`` hint pins sort-merge join (broadcast would hide
    the co-location win under this test's data sizes); with matched
    bucketing the physical plan contains NO exchange on either side.
    """
    return left.hint("merge").join(
        right, left[left_on] == right[right_on], how
    )


def drop_bucketed(spark: SparkSession, *tables: str) -> None:
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
