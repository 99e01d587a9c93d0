"""Bucketed-table layout tests — the write-once-shuffle-never contract.

The value of bucketing is invisible in row-level results (the join output
is identical); what these tests pin down is the PLAN: with both sides
bucketed on the join key at equal bucket counts, the sort-merge join runs
with no exchange (and, with sortBy, no per-task sort of the streamed side
beyond the bucket files themselves)."""

from __future__ import annotations

import re

import pytest

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "simple") -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def shuffles(plan: str) -> int:
    return len(re.findall(r"Exchange (?:hash|range|Single)", plan))


@pytest.fixture()
def bucketed_pair(spark):
    # tables land in the session's default warehouse (spark.sql.warehouse.dir
    # is static, not settable per-test); DROP TABLE below cleans them up
    from leaf_spark.operators.bucketing import drop_bucketed, write_bucketed
    from leaf_spark.session import load_tables

    t = load_tables(spark, SF_DIR)
    a = write_bucketed(t["orders"], "b_orders", "o_custkey", buckets=4)
    b = write_bucketed(t["customer"], "b_customer", "c_custkey", buckets=4)
    yield a, b
    drop_bucketed(spark, "b_orders", "b_customer")


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    from leaf_spark.operators.bucketing import cobucketed_join

    a, b = bucketed_pair
    j = cobucketed_join(a, b, "o_custkey", "c_custkey")
    plan = plan_of(j)
    assert "SortMergeJoin" in plan
    assert shuffles(plan) == 0, plan
    # and the result matches the plain (shuffling) join
    from leaf_spark.session import load_tables

    t = load_tables(spark, SF_DIR)
    plain = t["orders"].join(
        t["customer"], t["orders"]["o_custkey"] == t["customer"]["c_custkey"]
    )
    assert j.count() == plain.count()


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_pair):
    from pyspark.sql import functions as F

    a, _ = bucketed_pair
    agg = a.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    assert shuffles(plan_of(agg)) == 0


def test_mismatched_bucket_counts_still_correct(spark, bucketed_pair):
    """Guard the failure mode: unequal bucket counts fall back to a correct
    (if shuffling) join rather than wrong rows."""
    from leaf_spark.operators.bucketing import (
        cobucketed_join,
        drop_bucketed,
        write_bucketed,
    )
    from leaf_spark.session import load_tables

    t = load_tables(spark, SF_DIR)
    a, _ = bucketed_pair
    c = write_bucketed(t["customer"], "b_customer6", "c_custkey", buckets=6)
    try:
        j = cobucketed_join(a, c, "o_custkey", "c_custkey")
        plain = t["orders"].join(
            t["customer"], t["orders"]["o_custkey"] == t["customer"]["c_custkey"]
        )
        assert j.count() == plain.count()
    finally:
        drop_bucketed(spark, "b_customer6")
