"""Phase-level profiling for the sf1.0 heavies (guide §1): times each
internal stage of q49/q90/q194 separately so optimization effort goes to
the dominant phase, not the query total.

Usage: python tools/phase_profile_r12.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from leaf_spark.session import get_spark, load_tables  # noqa: E402


def t(label, fn, runs=3):
    xs = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        xs.append(time.perf_counter() - t0)
    xs.sort()
    print(f"{label:50s} med {xs[len(xs)//2]:7.3f}  min {xs[0]:7.3f}")
    return xs[len(xs) // 2]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1.0"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("phase-profile-r12")
    spark.sparkContext.setLogLevel("ERROR")
    tables = load_tables(spark, sf_dir, names=("documents",))
    docs = tables["documents"]

    from leaf_spark.operators import dedup as dd

    # ---- q49 minhash phases ----
    spark.sparkContext.setJobDescription("q49 sigs")
    sigs = None

    def build_sigs():
        nonlocal sigs
        sigs = dd.minhash_signatures(docs, "text", "doc_id", 64, 3).localCheckpoint()

    t("q49: signatures (scan+shingle+64 minhash) ckpt", build_sigs, runs)
    r = 64 // 16
    banded = sigs.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda b: F.aggregate(
                    F.slice("minhash_sig", b * r + 1, r),
                    F.xxhash64(b),
                    lambda acc, x: F.xxhash64(acc, x),
                ),
            )
        ).alias("band_id", "bucket"),
    )
    spark.sparkContext.setJobDescription("q49 pairs")
    cand = dd._bucketed_pairs(banded, ["band_id", "bucket"], 1000)
    t("q49: banded candidate pairs (noop)", lambda: noop(cand), runs)
    hsets = sigs.select("id", "hs")
    paired = (
        cand.join(hsets.select(F.col("id").alias("id_a"), F.col("hs").alias("sh_a")), "id_a")
        .join(hsets.select(F.col("id").alias("id_b"), F.col("hs").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    ver = paired.select(
        "id_a", "id_b", (inter.cast("double") / union).alias("jaccard")
    ).where(F.col("jaccard") >= 0.5)
    spark.sparkContext.setJobDescription("q49 verify")
    t("q49: full (pairs + verify join) (noop)", lambda: noop(ver), runs)

    # ---- q90 containment phases ----
    spark.sparkContext.setJobDescription("q90 index")
    exploded = None

    def build_idx():
        nonlocal exploded
        exploded = (
            dd.spread(docs)
            .select(
                F.col("doc_id").alias("id"),
                F.explode(dd._shingle_hash_sets(F.col("text"), 3)).alias("h"),
            )
            .localCheckpoint()
        )

    t("q90: shingle index explode ckpt", build_idx, runs)
    spark.sparkContext.setJobDescription("q90 bigh")
    big_h = (
        exploded.groupBy("h")
        .agg(F.count(F.lit(1)).alias("__bsz__"))
        .where(F.col("__bsz__") > 1000)
        .select("h")
    )
    t("q90: big-bucket probe (limit1 count)", lambda: big_h.limit(1).count(), runs)
    a, b = exploded.alias("a"), exploded.alias("b")
    pair_counts = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("__ns__"))
    )
    spark.sparkContext.setJobDescription("q90 pairs")
    t("q90: pair self-join + agg (noop)", lambda: noop(pair_counts), runs)
    sizes = exploded.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    paired90 = (
        pair_counts.withColumn("__inter__", F.col("__ns__").cast("double"))
        .join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
    )
    small_first = F.col("sz_a") <= F.col("sz_b")
    out90 = paired90.select(
        F.when(small_first, F.col("id_a")).otherwise(F.col("id_b")).alias("id_small"),
        F.when(small_first, F.col("id_b")).otherwise(F.col("id_a")).alias("id_big"),
        (F.col("__inter__") / F.least("sz_a", "sz_b")).alias("containment"),
    ).where(F.col("containment") >= 0.8)
    spark.sparkContext.setJobDescription("q90 full")
    t("q90: full (pairs + sizes joins) (noop)", lambda: noop(out90), runs)

    # ---- q194 phases ----
    from leaf_spark import queries_eval as qe

    spark.sparkContext.setJobDescription("q194 g")
    g = None

    def build_g():
        nonlocal g
        g = spark.sql(
            qe._Q194_G.replace("{IDIV}", "div")
            .replace("{TOK}", qe._SHINGLE3H_SPARK)
            .replace("{WS}", qe._WS_SPARK)
        ).localCheckpoint()

    t("q194: g (word x bucket) agg ckpt", build_g, runs)
    g.createOrReplaceTempView("__q194_g_prof__")
    rest = spark.sql(qe._Q194_FINAL.replace("{G}", "__q194_g_prof__"))
    spark.sparkContext.setJobDescription("q194 rest")
    t("q194: solve from ckpt g (noop)", lambda: noop(rest), runs)
    print("g rows:", g.count())


if __name__ == "__main__":
    main()
