"""Unit tests for the temporal-join and sampling/packing operators
(operators/temporal.py, operators/sampling.py) — edge cases the catalog's
DuckDB-differential entries (q65-q70) don't exercise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from leaf_spark.operators.sampling import (
    hash_split,
    hex_threshold,
    pack_sequences,
    stratified_sample,
    weighted_mix,
)
from leaf_spark.operators.temporal import asof_join, range_join


class TestAsofJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "a", 5), (4, "b", 100), (5, "c", 7)],
            "id bigint, k string, t bigint",
        )
        right = spark.createDataFrame(
            [("a", 8, "r8"), ("a", 10, "r10"), ("a", 15, "r15"), ("b", 200, "r200")],
            "k string, t bigint, v string",
        )
        return left, right

    def test_backward_semantics(self, spark):
        left, right = self._frames(spark)
        out = {
            r["id"]: (r["v"], r["t_right"])
            for r in asof_join(
                left, right, on=["k"], left_time="t", right_time="t"
            ).collect()
        }
        assert out[1] == ("r10", 10)  # exact-time match included
        assert out[2] == ("r15", 15)  # most recent ≤ 20
        assert out[3] == (None, None)  # earliest right row (t=8) is after t=5
        assert out[4] == (None, None)  # right row is in the future
        assert out[5] == (None, None)  # key has no right rows at all

    def test_all_left_rows_survive(self, spark):
        left, right = self._frames(spark)
        assert asof_join(left, right, on=["k"], left_time="t", right_time="t").count() == left.count()

    def test_time_bucket_matches_default_on_skewed_keys(self, spark):
        """Property: the skew-mitigated plan (time_bucket set) returns byte-
        identical results to the single-window plan for ANY bucket width —
        exercised with one key holding half of all rows and widths spanning
        many-buckets-per-key through everything-in-one-bucket."""
        import random

        rng = random.Random(42)
        left_rows = [
            (i, "hot" if i % 2 else f"k{i % 5}", rng.randrange(0, 1000))
            for i in range(400)
        ]
        right_rows = [
            (f"k{i % 7}" if i % 3 else "hot", rng.randrange(0, 1000), f"v{i}")
            for i in range(300)
        ]
        left = spark.createDataFrame(left_rows, "id bigint, k string, t bigint")
        right = spark.createDataFrame(right_rows, "k string, t bigint, v string")
        base = asof_join(left, right, on=["k"], left_time="t", right_time="t")
        want = {(r["id"], r["v"], r["t_right"]) for r in base.collect()}
        for width in (7.0, 100.0, 5000.0):
            got = asof_join(
                left,
                right,
                on=["k"],
                left_time="t",
                right_time="t",
                time_bucket=width,
            )
            assert {(r["id"], r["v"], r["t_right"]) for r in got.collect()} == want, width

    def test_right_time_tie_is_deterministic(self, spark):
        left = spark.createDataFrame([(1, "a", 10)], "id bigint, k string, t bigint")
        right = spark.createDataFrame(
            [("a", 10, "x"), ("a", 10, "y")], "k string, t bigint, v string"
        )
        vals = {
            asof_join(left, right, on=["k"], left_time="t", right_time="t")
            .collect()[0]["v"]
            for _ in range(3)
        }
        assert vals == {"y"}  # struct sort order: last carried wins, every run


class TestRangeJoin:
    def _frames(self, spark):
        points = spark.createDataFrame(
            [("a", 5.0, 1), ("a", 10.0, 2), ("a", 19.9, 3), ("a", 20.0, 4), ("b", 5.0, 5)],
            "k string, t double, pid bigint",
        )
        intervals = spark.createDataFrame(
            [("a", 0.0, 20.0, 100), ("a", 15.0, 25.0, 101), ("b", 50.0, 60.0, 102)],
            "k string, lo double, hi double, iid bigint",
        )
        return points, intervals

    def test_half_open_containment(self, spark):
        points, intervals = self._frames(spark)
        got = {
            (r["pid"], r["iid"])
            for r in range_join(
                points, intervals, on=["k"], point_time="t",
                start_col="lo", end_col="hi", bucket_width=20.0,
            ).collect()
        }
        assert got == {(1, 100), (2, 100), (3, 100), (3, 101), (4, 101)}
        # pid 4 at t=20.0 excluded from [0,20) but in [15,25); pid 5 matches nothing

    def test_matches_naive_inequality_join(self, spark):
        points, intervals = self._frames(spark)
        fast = range_join(
            points, intervals, on=["k"], point_time="t",
            start_col="lo", end_col="hi", bucket_width=20.0,
        )
        naive = points.join(
            intervals,
            (points["k"] == intervals["k"])
            & (points["t"] >= intervals["lo"])
            & (points["t"] < intervals["hi"]),
        ).select(points["pid"], intervals["iid"])
        assert {tuple(r) for r in fast.select("pid", "iid").collect()} == {
            tuple(r) for r in naive.collect()
        }

    def test_rejects_undersized_bucket(self, spark):
        points, intervals = self._frames(spark)
        with pytest.raises(ValueError, match="bucket_width"):
            range_join(
                points, intervals, on=["k"], point_time="t",
                start_col="lo", end_col="hi", bucket_width=5.0,
            )


class TestHashSplit:
    def test_partition_and_stability(self, spark):
        df = spark.range(1000).withColumnRenamed("id", "k")
        out = hash_split(df, "k", {"val": 0.1, "test": 0.1, "train": 0.8})
        counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert sum(counts.values()) == 1000
        assert 60 < counts["val"] < 140 and 60 < counts["test"] < 140
        # growth stability: the first 500 keys keep their split
        sub = hash_split(spark.range(500).withColumnRenamed("id", "k"),
                         "k", {"val": 0.1, "test": 0.1, "train": 0.8})
        full = {r["k"]: r["split"] for r in out.collect()}
        assert all(full[r["k"]] == r["split"] for r in sub.collect())

    def test_thresholds(self):
        assert hex_threshold(0.0) == "0000"
        assert hex_threshold(1.0) == "g"  # sorts after every hex prefix
        assert hex_threshold(0.5) == "8000"
        assert "ffff" < hex_threshold(1.0)  # the lexicographic guarantee


class TestWeightedMix:
    def test_full_weight_keeps_everything(self, spark):
        df = spark.range(200).select(
            F.col("id").alias("k"), F.lit("s").alias("src")
        )
        assert weighted_mix(df, "k", "src", {"s": 1.0}).count() == 200

    def test_zero_weight_drops_everything(self, spark):
        df = spark.range(200).select(
            F.col("id").alias("k"), F.lit("s").alias("src")
        )
        assert weighted_mix(df, "k", "src", {"s": 0.0}).count() == 0

    def test_mixed_sources_approx_fraction(self, spark):
        df = spark.range(2000).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("src"),
        )
        kept = weighted_mix(df, "k", "src", {"even": 0.25, "odd": 1.0})
        n_even = kept.where(F.col("src") == "even").count()
        assert kept.where(F.col("src") == "odd").count() == 1000
        assert 170 < n_even < 330


class TestStratifiedSample:
    def test_exact_n_and_matches_single_window(self, spark):
        df = spark.range(3000).select(
            F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("g")
        )
        got = stratified_sample(df, ["g"], 25, "k")
        per = {r["g"]: r["n"] for r in got.groupBy("g").agg(F.count("*").alias("n")).collect()}
        assert per == {"0": 25, "1": 25, "2": 25}
        # two-level rank must equal the plain one-window rank
        from pyspark.sql.window import Window

        h = F.md5(F.concat(F.lit("strat"), F.col("k").cast("string")))
        w = Window.partitionBy("g").orderBy(h, F.col("k"))
        ref = df.withColumn("r", F.row_number().over(w)).where(F.col("r") <= 25)
        assert {(r["g"], r["k"]) for r in got.collect()} == {
            (r["g"], r["k"]) for r in ref.collect()
        }

    def test_small_stratum_returned_whole(self, spark):
        df = spark.range(10).select(F.col("id").alias("k"), F.lit("only").alias("g"))
        assert stratified_sample(df, ["g"], 25, "k").count() == 10


class TestPackSequences:
    def test_matches_naive_cumsum(self, spark):
        rows = [(i, (i * 37) % 90 + 10) for i in range(400)]
        df = spark.createDataFrame(rows, "doc bigint, tok bigint")
        packed = {
            r["doc"]: (r["bin_id"], r["start_offset"])
            for r in pack_sequences(df, "doc", "tok", budget=256, range_width=50).collect()
        }
        run = 0
        for doc, tok in rows:
            assert packed[doc] == (run // 256, run), doc
            run += tok

    def test_offsets_are_contiguous(self, spark):
        df = spark.createDataFrame([(i, 10) for i in range(100)], "doc bigint, tok bigint")
        out = pack_sequences(df, "doc", "tok", budget=64, range_width=16)
        assert out.agg(F.max("start_offset")).first()[0] == 990
        assert out.where(F.col("doc") == 0).first()["start_offset"] == 0
