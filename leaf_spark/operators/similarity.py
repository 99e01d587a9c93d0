"""Similarity search over embedding columns (array<float>).

- cosine_expr       pure-Column cosine (zip_with product, in-order aggregate
                    fold — deterministic, JVM-side, codegen-friendly)
- cosine_topk       brute-force top-k for one query vector (baseline)
- batch_cosine_topk top-k for a (small) query set — broadcast the queries,
                    one pass over the corpus, window top-k
- hyperplane_signature / ann_lsh_topk
                    random-hyperplane LSH bucketing: the scale path — the
                    corpus is bucketed once (shuffle on signature), probes
                    only scan matching buckets (multi-probe via hamming-1
                    neighbors for recall)

The hyperplanes are pseudo-random but fully deterministic: plane p,
dimension i has weight sign(xxhash64(p, i)) ∈ {-1, +1} — reproducible across
runs and executors with zero stored model state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    """In-order fold of the elementwise product (deterministic summation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force exact top-k: one scan, no shuffle until the final
    global top-k (Spark's orderBy+limit = per-partition top-k then merge)."""
    q = F.transform(F.array(*[F.lit(float(x)) for x in query_vec]), lambda x: x)
    v = _to_double(F.col(vec_col))
    return (
        df.select(F.col(id_col).alias("id"), cosine_expr(v, q).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id"))
        .limit(k)
    )


def batch_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Top-k neighbors for every query row. The query side is broadcast —
    corpus × queries stays a map-side nested loop, no corpus shuffle; the
    only shuffle is the per-query window top-k."""
    from pyspark.sql import Window

    c = corpus.select(F.col(id_col).alias("id"), _to_double(F.col(vec_col)).alias("v"))
    q = queries.select(
        F.col(query_id_col).alias("qid"), _to_double(F.col(query_vec_col)).alias("qv")
    )
    scored = c.join(F.broadcast(q)).select(
        "qid", "id", cosine_expr(F.col("v"), F.col("qv")).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .drop("rk")
    )


def signature_bits(vec: Column, num_planes: int = 16) -> Column:
    """LSH bit array: bit p = [dot(vec, plane_p) > 0], planes from
    sign(xxhash64(p, i)). Returns array<string> of '0'/'1'."""

    def plane_dot(p: Column) -> Column:
        return F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: x.cast("double")
                * F.when(F.xxhash64(p, i) > 0, F.lit(1.0)).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return F.transform(
        F.sequence(F.lit(0), F.lit(num_planes - 1)),
        lambda p: F.when(plane_dot(p) > 0, F.lit("1")).otherwise(F.lit("0")),
    )


def hyperplane_signature(vec: Column, num_planes: int = 16) -> Column:
    """String bucket id, e.g. '0110…' — join-key-friendly and flippable for
    multi-probe."""
    return F.concat_ws("", signature_bits(vec, num_planes))


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 12,
    multiprobe_bits: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: bucket corpus by hyperplane signature; each query
    probes its own bucket plus all hamming<=multiprobe_bits neighbor buckets
    (recall knob). Join key = bucket id → uniform shuffle, candidate set
    ~ corpus/2^planes per probe instead of the full corpus."""
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("id"),
        _to_double(F.col(vec_col)).alias("v"),
        hyperplane_signature(F.col(vec_col), num_planes).alias("bucket"),
    )
    bits = signature_bits(F.col(query_vec_col), num_planes)
    flip = lambda b: F.when(b == "1", F.lit("0")).otherwise(F.lit("1"))  # noqa: E731
    hamming1 = F.transform(
        F.sequence(F.lit(0), F.lit(num_planes - 1)),
        lambda p: F.concat_ws(
            "", F.transform(bits, lambda x, i: F.when(i == p, flip(x)).otherwise(x))
        ),
    )
    probes = F.array_distinct(
        F.concat(
            F.array(F.concat_ws("", bits)),
            hamming1 if multiprobe_bits >= 1 else F.array().cast("array<string>"),
        )
    )
    q = queries.select(
        F.col(query_id_col).alias("qid"),
        _to_double(F.col(query_vec_col)).alias("qv"),
        F.explode(probes).alias("bucket"),
    )
    scored = c.join(q, "bucket").select(
        "qid", "id", cosine_expr(F.col("v"), F.col("qv")).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("id"))
    return (
        scored.dropDuplicates(["qid", "id"])
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .drop("rk")
    )
