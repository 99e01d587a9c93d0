"""Distributed embedding clustering (Lloyd's k-means) for corpus curation.

Training-data pipelines cluster document embeddings constantly — topic
bucketing, cluster-balanced sampling, SemDeDup-style pruning — so k-means is
a first-class operator here, not a sample-and-collect helper (the bounded
sample trainer in ``similarity.ivf_train_centroids`` remains the coarse
quantizer for ANN).

Two modes:

- ``kmeans``: float path. Centroids live in a k×d DataFrame, the corpus
  never leaves executors: each Lloyd iteration is one broadcast join
  (corpus × k centroids, distance via in-order ``zip_with``/``aggregate``
  fold), an ``min_by`` arg-min, and one tiny shuffle to re-average
  centroids (partial aggregation map-side; shuffle rows = k×d, independent
  of corpus size). Iterations are a driver loop but only the k×d centroid
  table is ever collected.

- ``kmeans_quantized``: the differential-testing mode. Embeddings are
  quantized to integers (``round(x * scale)``), so every distance, every
  arg-min, and every centroid update (``floor(sum / n)``) is exact integer
  arithmetic — bit-identical across Spark and any ANSI-SQL oracle,
  immune to float summation-order nondeterminism. Same plan shape as the
  float path.

At 100 TB: per iteration the corpus is scanned once with only narrow rows
shuffled (id → cid assignments never shuffle; centroid re-averaging
shuffles k×d partial sums). k and d are small, so the broadcast is cheap.
Driver holds k×d ints between iterations — nothing corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..localdf import arrow_local_df


def _sqdist_int(v: Column, c: Column) -> Column:
    """Exact integer squared L2 distance via an in-order fold."""
    return F.aggregate(
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def quantize(vec: Column, scale: int = 1000) -> Column:
    """array<float> → array<bigint> by round(x*scale); makes all downstream
    k-means arithmetic exact (and oracle-checkable)."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * F.lit(float(scale))).cast("bigint")
    )


def _assign(quant: DataFrame, cents: DataFrame) -> DataFrame:
    """(id, qv) × broadcast (cid, cvec) → nearest cid per id; ties broken by
    the smaller cid. One broadcast join, no corpus shuffle."""
    scored = quant.join(F.broadcast(cents)).select(
        "id", "qv", "cid", _sqdist_int(F.col("qv"), F.col("cvec")).alias("d2")
    )
    return scored.groupBy("id").agg(
        F.first("qv").alias("qv"),
        F.min_by("cid", F.struct("d2", "cid")).alias("cid"),
    )


def _update(assigned: DataFrame) -> DataFrame:
    """New integer centroids: per (cid, dim) floor(avg). The explode is
    k-bounded fan-in: shuffle carries (cid, d, v) narrow rows with map-side
    partial sums, reducing to k×d rows."""
    exploded = assigned.select(
        "cid", F.posexplode("qv").alias("d", "v")
    )
    per_dim = exploded.groupBy("cid", "d").agg(
        F.floor(F.sum("v") / F.count(F.lit(1))).cast("bigint").alias("cv")
    )
    return (
        per_dim.groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("d", "cv"))).alias("pairs"))
        .select("cid", F.transform("pairs", lambda p: p["cv"]).alias("cvec"))
    )


def kmeans_quantized(
    corpus: DataFrame,
    k: int = 4,
    iters: int = 2,
    scale: int = 1000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact-arithmetic Lloyd's k-means. Init = the k lowest-id vectors
    (deterministic, no RNG). Returns (id, cluster_id) for every corpus row.

    The init collect is k rows; each iteration materializes only the k×d
    centroid table on the driver (so the lineage stays short and the
    broadcast is a literal, not a recomputed subplan).
    """
    quant = corpus.select(
        F.col(id_col).alias("id"), quantize(F.col(vec_col), scale).alias("qv")
    )

    init = quant.orderBy("id").limit(k).collect()
    cents_rows = [
        (i, list(r["qv"])) for i, r in enumerate(sorted(init, key=lambda r: r["id"]))
    ]
    spark = corpus.sparkSession
    cents = arrow_local_df(spark, cents_rows, "cid int, cvec array<bigint>")

    for _ in range(iters):
        assigned = _assign(quant, cents)
        new_cents = _update(assigned).collect()
        # keep empty clusters at their previous centroid (reference-free,
        # deterministic; matches the unrolled-SQL oracle which coalesces)
        got = {r["cid"]: list(r["cvec"]) for r in new_cents}
        cents_rows = [(cid, got.get(cid, cvec)) for cid, cvec in cents_rows]
        cents = arrow_local_df(spark, cents_rows, "cid int, cvec array<bigint>")

    final = _assign(quant, cents)
    return final.select("id", F.col("cid").alias("cluster_id"))


def kmeans(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Float Lloyd's k-means, same plan shape as the quantized mode (broadcast
    assign + k×d-bounded centroid shuffle per iteration). Deterministic
    lowest-id init; use for production clustering where exact cross-engine
    reproducibility isn't required."""
    doubled = corpus.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("qv"),
    )
    spark = corpus.sparkSession
    init = doubled.orderBy("id").limit(k).collect()
    cents_rows = [
        (i, list(r["qv"])) for i, r in enumerate(sorted(init, key=lambda r: r["id"]))
    ]
    cents = arrow_local_df(spark, cents_rows, "cid int, cvec array<double>")

    def _sqdist(v: Column, c: Column) -> Column:
        return F.aggregate(
            F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    for _ in range(iters):
        scored = doubled.join(F.broadcast(cents)).select(
            "id", "qv", "cid", _sqdist(F.col("qv"), F.col("cvec")).alias("d2")
        )
        assigned = scored.groupBy("id").agg(
            F.first("qv").alias("qv"),
            F.min_by("cid", F.struct("d2", "cid")).alias("cid"),
        )
        per_dim = assigned.select("cid", F.posexplode("qv").alias("d", "v")).groupBy(
            "cid", "d"
        ).agg(F.avg("v").alias("cv"))
        new_cents = (
            per_dim.groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("d", "cv"))).alias("pairs"))
            .select("cid", F.transform("pairs", lambda p: p["cv"]).alias("cvec"))
            .collect()
        )
        got = {r["cid"]: list(r["cvec"]) for r in new_cents}
        cents_rows = [(cid, got.get(cid, cvec)) for cid, cvec in cents_rows]
        cents = arrow_local_df(spark, cents_rows, "cid int, cvec array<double>")

    scored = doubled.join(F.broadcast(cents)).select(
        "id", "cid", _sqdist(F.col("qv"), F.col("cvec")).alias("d2")
    )
    return (
        scored.groupBy("id")
        .agg(F.min_by("cid", F.struct("d2", "cid")).alias("cluster_id"))
        .select("id", "cluster_id")
    )
