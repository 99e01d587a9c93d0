"""Similarity search over embedding columns (array<float>).

- cosine_expr       pure-Column cosine (zip_with product, in-order aggregate
                    fold — deterministic, JVM-side, codegen-friendly)
- cosine_topk       brute-force top-k for one query vector (baseline)
- batch_cosine_topk top-k for a (small) query set — broadcast the queries,
                    one pass over the corpus, window top-k
- hyperplane_signature / ann_lsh_topk
                    multi-table random-hyperplane LSH: a scale path — the
                    corpus is bucketed per table (shuffle on signature),
                    probes only scan matching buckets (L independent tables
                    + hamming-1 multi-probe for recall)
- ivf_train_centroids / ivf_assign / ann_ivf_topk
                    IVF (inverted-file) ANN: k-means coarse quantizer on a
                    bounded sample, corpus bucketed by nearest centroid,
                    queries scan only their nprobe nearest buckets

The hyperplanes are pseudo-random but fully deterministic: plane p,
dimension i has weight sign(xxhash64(p, i)) ∈ {-1, +1} — reproducible across
runs and executors with zero stored model state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..localdf import arrow_local_df


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


# Hyperplane weights are evaluated ONCE per query as a scalar-subquery
# tensor, not per row (r12, guide §1.2/§4): sign(xxhash64(t, p, i)) is
# data-independent, but the original signature expression re-evaluated it
# per vector element PER ROW — num_tables x num_planes x dim interpreted
# hash calls per row dominated the ANN operators (q51 measured ~10 s at
# sf0.1). The tensor subquery reads `from range(1)` so it stays a real
# ScalarSubquery (a no-FROM body is inlined back into the per-row
# expression by OptimizeOneRowRelationSubquery); Spark executes it once
# and references the result as a runtime constant. Signatures are then
# num_planes in-order zip_with folds over the let_-bound plane rows —
# bit-identical to the per-row hash form (same integer-typed hash calls,
# same fold order). Two alternatives were tried and rejected: literal
# plane arrays (CreateArray trees of `dim` literals made Catalyst
# analysis the bottleneck — q113 went 4.5 s -> 14 s) and a broadcast
# plane DataFrame (plans as BroadcastNestedLoopJoin, which the
# no-nested-loop scale contract in tests/test_plans.py forbids).
#
# Dimension probe: tensor width is max(size(vec)) over the table, not
# the first row (ADVICE r12): a mixed-width corpus (or a null/short
# first row) would make zip_with null-pad the plane slice, nulling the
# dot products so every bit of the wider rows collapsed to '0' — silent
# recall loss plus one hot all-pairs bucket. With the max width, shorter
# rows slice the plane to their own width (exactly what the per-row
# hash form did) and null vectors are ignored by the aggregate.


def _probe_dim(df: DataFrame, vec_col: str) -> int | None:
    """Max embedding width over the table (None on empty/all-null input)."""
    row = df.select(F.max(F.size(F.col(vec_col))).alias("d")).first()
    return int(row["d"]) if row is not None and row["d"] is not None else None


def _plane_tensor(dim: int, num_planes: int, num_tables: int) -> Column:
    """array<array<array<double>>> [table][plane][dim] of ±1.0 weights as a
    run-once scalar subquery; xxhash64 argument types (int, int, int) match
    the original per-row expression exactly, so every sign is identical."""
    return F.expr(
        f"(select transform(sequence(0, {num_tables - 1}), t -> "
        f"transform(sequence(0, {num_planes - 1}), p -> "
        f"transform(sequence(0, {dim - 1}), i -> "
        "case when xxhash64(t, p, i) > 0 then 1.0d else -1.0d end))) "
        "from range(1))"
    )


def _sig_expr(vec: Column, m: Column, num_planes: int) -> Column:
    """'0'/'1' bit array: bit p = [dot(vec, m[p]) > 0] — the same in-order
    fold as the hash form, weights read from the bound plane matrix."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_planes - 1)),
        lambda p: F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.slice(F.element_at(m, p + F.lit(1)), 1, F.size(vec)),
                    lambda x, s: x.cast("double") * s,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )


def signature_bits(vec: Column, num_planes: int = 16, table: int = 0) -> Column:
    """LSH bit array via per-row hashing (kept for single-signature uses;
    the bucket/probe builders below use the run-once plane tensor).
    Returns array<string> of '0'/'1'."""

    def plane_dot(p: Column) -> Column:
        return F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: x.cast("double")
                * F.when(F.xxhash64(F.lit(table), p, i) > 0, F.lit(1.0)).otherwise(
                    F.lit(-1.0)
                ),
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


def _corpus_buckets(c: DataFrame, num_planes: int, num_tables: int) -> DataFrame:
    """(id, v, bucket) — each vector exploded into its ``num_tables``
    "table:signature" index buckets via the run-once plane tensor.

    posexplode(tensor) makes each table's plane matrix a plain ATTRIBUTE
    (subquery expressions are rejected inside higher-order functions, so
    the matrix must already be a bound column when the signature lambda
    reads it)."""
    dim = _probe_dim(c, "v") or 1
    tensor = _plane_tensor(dim, num_planes, num_tables)
    return c.select(
        "id", "v", F.posexplode(tensor).alias("tbl", "m")
    ).select(
        "id",
        "v",
        F.concat_ws(
            ":",
            F.col("tbl").cast("string"),
            F.concat_ws("", _sig_expr(F.col("v"), F.col("m"), num_planes)),
        ).alias("bucket"),
    )


def _query_probes(
    q: DataFrame, num_planes: int, num_tables: int, multiprobe_bits: int
) -> DataFrame:
    """(qid, qv, bucket) — each query exploded into its own bucket plus the
    hamming<=multiprobe_bits flips, per table.

    The bit array is let_-bound, so the signature folds run ONCE per
    (query, table) and every multiprobe flip is a cheap string edit of the
    bound bits — the old form re-evaluated the full signature expression
    once per flipped position."""
    from .dedup import let_

    dim = _probe_dim(q, "qv") or 1
    tensor = _plane_tensor(dim, num_planes, num_tables)
    tbl_s = F.col("tbl").cast("string")
    flip = lambda b: F.when(b == "1", F.lit("0")).otherwise(F.lit("1"))  # noqa: E731

    def probes_of(bits: Column) -> Column:
        own = F.array(F.concat_ws(":", tbl_s, F.concat_ws("", bits)))
        if multiprobe_bits < 1:
            return own
        hamming1 = F.transform(
            F.sequence(F.lit(0), F.lit(num_planes - 1)),
            lambda p: F.concat_ws(
                ":",
                tbl_s,
                F.concat_ws(
                    "",
                    F.transform(
                        bits, lambda x, i: F.when(i == p, flip(x)).otherwise(x)
                    ),
                ),
            ),
        )
        return F.concat(own, hamming1)

    probes = F.array_distinct(
        let_(_sig_expr(F.col("qv"), F.col("m"), num_planes), probes_of)
    )
    return q.select(
        "qid", "qv", F.posexplode(tensor).alias("tbl", "m")
    ).select("qid", "qv", F.explode(probes).alias("bucket"))


def lsh_self_candidate_pairs(
    df: DataFrame,
    num_planes: int = 4,
    num_tables: int = 12,
    multiprobe_bits: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Distinct (id, nid) self-kNN candidate pairs via multi-table
    hyperplane LSH — the scale-safe replacement for an all-pairs self-join.

    Pairs carry IDS ONLY (the dedup-family discipline): callers join the
    vectors back on equi-keys for exact verification, so the candidate
    shuffle payload is two bigints per pair no matter the embedding width.
    The bucket join is a plain equi-join on "table:signature" (uniform
    keys, AQE-splittable) — never a broadcast nested loop over the corpus;
    candidate count ≈ L·(1+b)·n²/2^b instead of n². Recall of a true
    neighbor at plane-collision prob p is 1-(1-(p^b + b·p^(b-1)(1-p)))^L —
    at the defaults (b=4, L=12, hamming-1) that is >0.9999 for cosine≥0.5
    neighbors, and every miss is verifiable because the pipeline is
    deterministic end-to-end."""
    c = df.select(F.col(id_col).alias("id"), _to_double(F.col(vec_col)).alias("v"))
    cb = _corpus_buckets(c, num_planes, num_tables)
    probes = _query_probes(
        c.select(F.col("id").alias("qid"), F.col("v").alias("qv")),
        num_planes,
        num_tables,
        multiprobe_bits,
    )
    return (
        cb.join(probes.select("qid", "bucket"), "bucket")
        .where(F.col("qid") != F.col("id"))
        .select(F.col("qid").alias("id"), F.col("id").alias("nid"))
        .dropDuplicates(["id", "nid"])
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 6,
    num_tables: int = 8,
    multiprobe_bits: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH.

    ``num_tables`` independent plane sets (textbook L-table LSH): a true
    neighbor is missed only if it splits from the query in EVERY table, so
    recall ≈ 1-(1-p^b)^L instead of p^b. Each query additionally probes
    hamming<=multiprobe_bits neighbor buckets per table. Join key =
    "table:signature" → uniform shuffle; candidate set ≈
    L·(1+b·multiprobe)·corpus/2^b instead of the full corpus. The corpus
    side explodes ×L — the standard LSH space/recall trade."""
    from pyspark.sql import Window

    c = corpus.select(F.col(id_col).alias("id"), _to_double(F.col(vec_col)).alias("v"))
    cb = _corpus_buckets(c, num_planes, num_tables)
    q = queries.select(
        F.col(query_id_col).alias("qid"),
        _to_double(F.col(query_vec_col)).alias("qv"),
    )
    q = _query_probes(q, num_planes, num_tables, multiprobe_bits)

    scored = cb.join(q, "bucket").select(
        "qid", "id", cosine_expr(F.col("v"), F.col("qv")).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("id"))
    return (
        scored.dropDuplicates(["qid", "id"])
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .drop("rk")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path (coarse quantizer + probes)
# ---------------------------------------------------------------------------


def ivf_train_centroids(
    corpus: DataFrame,
    num_centroids: int = 32,
    iters: int = 8,
    sample_limit: int = 20_000,
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[float]]:
    """Lloyd's k-means on a driver-side sample → coarse centroids.

    The model is tiny (k × d floats) and broadcastable; the sample is capped,
    so at 100 TB this is a bounded single collect of ``sample_limit`` rows
    (use ``corpus.sample(fraction)`` upstream to debias a sorted layout).
    Deterministic: fixed seed, fixed iteration count.
    """
    import numpy as np

    rows = corpus.select(vec_col).limit(sample_limit).collect()
    x = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rnd = np.random.RandomState(seed)
    cent = x[rnd.choice(len(x), size=min(num_centroids, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cent.T  # cosine on normalized vectors
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return [[float(v) for v in c] for c in cent]


def _centroids_df(spark, centroids: list[list[float]]) -> DataFrame:
    return arrow_local_df(
        spark, [(i, c) for i, c in enumerate(centroids)],
        "cid int, cvec array<double>",
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, v, cid): nearest-centroid bucket per vector. Broadcast the k
    centroids against the corpus (map-side, no corpus shuffle), then one
    small-payload shuffle on id for the arg-max reduction."""
    cents = _centroids_df(corpus.sparkSession, centroids)
    c = corpus.select(F.col(id_col).alias("id"), _to_double(F.col(vec_col)).alias("v"))
    scored = c.join(F.broadcast(cents)).select(
        "id", "v", "cid", cosine_expr(F.col("v"), F.col("cvec")).alias("sim")
    )
    return scored.groupBy("id").agg(
        F.first("v").alias("v"), F.max_by("cid", F.struct("sim", "cid")).alias("cid")
    )


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_centroids: int = 32,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: bucket the corpus by nearest centroid; each
    query scans only its ``nprobe`` nearest buckets (~nprobe/k of the corpus
    instead of all of it). Join key = cid → bounded fan-out; skew bounded by
    k-means balance + AQE skew-join splitting."""
    from pyspark.sql import Window

    if centroids is None:
        centroids = ivf_train_centroids(corpus, num_centroids, vec_col=vec_col)
    bucketed = ivf_assign(corpus, centroids, vec_col, id_col)

    cents = _centroids_df(corpus.sparkSession, centroids)
    q = queries.select(
        F.col(query_id_col).alias("qid"), _to_double(F.col(query_vec_col)).alias("qv")
    )
    qs = q.join(F.broadcast(cents)).select(
        "qid", "qv", "cid", cosine_expr(F.col("qv"), F.col("cvec")).alias("sim")
    )
    wp = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid"))
    probes = qs.withColumn("pr", F.row_number().over(wp)).where(F.col("pr") <= nprobe)

    scored = bucketed.join(probes.select("qid", "qv", "cid"), "cid").select(
        "qid", "id", cosine_expr(F.col("v"), F.col("qv")).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .drop("rk")
    )


def semantic_dedup_pairs(
    df: DataFrame,
    num_seeds: int = 8,
    threshold: float = 0.3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023): partition
    the embedding space into clusters, then compare pairs only WITHIN each
    cluster — the pruning that turns O(n²) global comparison into
    sum-over-clusters O(|c|²).

    Cluster assignment here is deterministic-by-construction: the seeds are
    the first ``num_seeds`` vectors by id (broadcast), each vector joins its
    argmax-cosine seed (cosine rounded to 5 decimals; ties → lowest seed id,
    so the assignment is reproducible across engines and retries). Real
    deployments swap the seed table for trained k-means centroids (see
    ``ivf_topk``'s trainer) — the dataflow is identical.

    Output: (cluster, id_a, id_b, cosine) for within-cluster pairs with
    rounded cosine ≥ threshold, id_a < id_b.

    Scale: the seed join is a broadcast (num_seeds rows); the within-cluster
    self-join shuffles on the cluster id. Cluster-size skew is the known
    failure mode at 100 TB — production raises num_seeds so |c| stays
    bounded and salts the self-join (operators/skew.py) for hot clusters.
    """
    # r12 plan/arithmetic notes (values bit-identical to the pre-r12 form):
    # - vector norms are computed ONCE per row/seed and reused — cosine =
    #   dot/(norm_a*norm_b) multiplies the same sqrt results the inlined
    #   cosine_expr produced, but the quadratic within-cluster stage now
    #   folds 1 array aggregate per pair instead of 3;
    # - the argmax cluster comes straight out of the seed-scores
    #   aggregation (max over (sim, -sid) structs carrying the vector) —
    #   the old shape re-joined the scored rows against the argmax, which
    #   re-ran the broadcast join + all seed cosines a second time.
    v = df.select(
        F.col(id_col).alias("id"), _to_double(F.col(vec_col)).alias("v")
    ).withColumn("nv", norm_expr(F.col("v")))
    seeds = (
        v.orderBy("id")
        .limit(num_seeds)
        .select(F.col("id").alias("sid"), F.col("v").alias("sv"), F.col("nv").alias("nsv"))
    )
    sims = v.join(F.broadcast(seeds)).select(
        "id",
        "v",
        "nv",
        "sid",
        F.round(
            dot_expr(F.col("v"), F.col("sv")) / (F.col("nv") * F.col("nsv")), 5
        ).alias("sim"),
    )
    assigned = (
        sims.groupBy("id")
        .agg(
            F.max(
                F.struct(
                    F.col("sim"),
                    (-F.col("sid")).alias("neg_sid"),
                    F.col("v"),
                    F.col("nv"),
                )
            ).alias("b")
        )
        .select(
            (-F.col("b.neg_sid")).alias("cluster"),
            "id",
            F.col("b.v").alias("v"),
            F.col("b.nv").alias("nv"),
        )
    )
    a = assigned.select(
        "cluster",
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("nv").alias("na"),
    )
    b = assigned.select(
        "cluster",
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("nv").alias("nb"),
    )
    return (
        a.join(b, "cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "cluster",
            "id_a",
            "id_b",
            F.round(
                dot_expr(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 5
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
