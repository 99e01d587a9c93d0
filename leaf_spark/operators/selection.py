"""Diversity-aware selection: greedy Maximal Marginal Relevance (MMR,
Carbonell & Goldstein 1998) over an embedding column.

The curation step between retrieval and few-shot/eval-set assembly: pick
k items maximizing relevance MINUS a redundancy penalty (the max cosine
to anything already selected), so the selected set covers the space
instead of clustering around the single best hit.

Greedy selection is sequential by definition (step t needs the t-1
selections), so the driver loop holds the selected rows — k vectors, the
same bounded-driver-state pattern as kmeans/pagerank/BPE. Each step is
one scan of the candidate pool: the selected vectors enter the plan as
literal arrays (k×d doubles — broadcast-sized by construction), the
penalty is a greatest() over k rounded cosines, and the argmax is a
TakeOrderedAndProject. At 100 TB the pool is the output of a retrieval
stage (q71/q47) — thousands of rows, not the corpus — which is what
keeps k scans cheap; determinism comes from rounding every cosine to 5
decimals before the comparison and breaking ties toward the lowest id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..localdf import arrow_local_df

from .similarity import _to_double, cosine_expr


def mmr_select(
    df: DataFrame,
    query_id: int = 0,
    k: int = 5,
    lam: float = 0.5,
    pool: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Greedy MMR: returns (rank, id, relevance, penalty, mmr_score) for
    the k selections from the candidate pool (ids 1..pool), relevance =
    cosine to the ``query_id`` vector."""
    spark = df.sparkSession
    v = df.select(F.col(id_col).alias("id"), _to_double(F.col(vec_col)).alias("v"))
    q = v.where(F.col("id") == query_id).select(F.col("v").alias("qv"))
    cand = (
        v.where(
            (F.col("id") >= 1) & (F.col("id") <= pool) & (F.col("id") != query_id)
        )
        .crossJoin(F.broadcast(q))
        .select(
            "id", "v", F.round(cosine_expr(F.col("v"), F.col("qv")), 5).alias("r")
        )
        .localCheckpoint()
    )

    selected: list = []
    out_rows = []
    for rank in range(1, k + 1):
        if selected:
            pens = [
                F.round(
                    cosine_expr(
                        F.col("v"), F.array(*[F.lit(float(x)) for x in s["v"]])
                    ),
                    5,
                )
                for s in selected
            ]
            pen = F.greatest(*pens) if len(pens) > 1 else pens[0]
        else:
            pen = F.lit(0.0)
        pool_df = cand
        for s in selected:
            pool_df = pool_df.where(F.col("id") != s["id"])
        top = (
            pool_df.select("id", "v", "r", pen.alias("pen"))
            .orderBy((F.col("r") - F.lit(lam) * F.col("pen")).desc(), "id")
            .limit(1)
            .collect()
        )
        if not top:  # pool exhausted before k picks — return what exists
            break
        best = top[0]
        selected.append(best)
        out_rows.append(
            (
                rank,
                best["id"],
                best["r"],
                best["pen"],
                # r, pen sit on a 1e-5 grid, so r-lam*pen lives on 5e-6:
                # rounding THERE (5 decimals) hits the half-way boundary for
                # ~half of all values and engines disagree on fp halves.
                # 6 decimals represents the grid exactly — no boundary.
                round(best["r"] - lam * best["pen"], 6),
            )
        )
    return arrow_local_df(
        spark,
        out_rows,
        "rank int, id bigint, relevance double, penalty double, mmr_score double",
    )
