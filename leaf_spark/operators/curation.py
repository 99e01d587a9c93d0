"""Training-data curation operators: contrastive triplet mining, int8
embedding-quantization audit, and cross-corpus doc-level contamination.

These extend the reference's query surface (muni-town/leaf keeps all data
ops inside module SQL — leaf-stream/src/lib.rs query dispatch) with the
curation steps a large-scale training pipeline runs between ingestion and
shard export.  Everything here is JVM-side DataFrame algebra: no Python in
the hot path, broadcasts for the small sides, rounded floats before any
argmax so results are deterministic cross-engine.

- triplet_mining        anchor → (hardest positive, hardest negative) by
                        cosine; the batch-mining step for contrastive /
                        embedding training (Schroff et al. 2015 FaceNet
                        semi-hard mining, done corpus-side)
- int8_quant_stats      per-dimension symmetric int8 quantization audit
                        (absmax scale, floor quantizer): saturation counts +
                        mean reconstruction error — the go/no-go report
                        before storing embeddings quantized (4× smaller
                        shuffles for every ANN op downstream)
- doc_contamination     per-training-doc max word-set Jaccard against a
                        holdout corpus via an inverted word index — the
                        doc-level complement of cleaning.decontaminate's
                        n-gram hit counting
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .similarity import _to_double, cosine_expr


def triplet_mining(
    df: DataFrame,
    anchor_pred: Column,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    round_digits: int = 5,
) -> DataFrame:
    """Hardest-positive / hardest-negative mining for contrastive training.

    For every anchor row (``anchor_pred``): the non-anchor row with the
    highest cosine among SAME-label rows (hardest positive to keep close)
    and among DIFFERENT-label rows (hardest negative to push away).

    Plan: anchors are broadcast (the anchor set is small by construction —
    mining runs per training batch), the corpus is scanned once map-side
    (BroadcastNestedLoopJoin — the documented dense-scoring pass, same shape
    as ``batch_cosine_topk``), and both argmaxes reduce in ONE groupBy via
    conditional max-of-struct (no second scan, no window).  Cosine is
    rounded before the argmax; ties break toward the lowest candidate id —
    deterministic across engines, partitionings, and retries.

    At 100 TB: corpus never shuffles; the only shuffle is the per-anchor
    aggregation whose key count = #anchors.  For anchor sets too big to
    broadcast, swap the dense pass for ann_lsh_topk/ann_ivf_topk candidates
    and keep the same conditional-argmax reduction.
    """
    v = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        _to_double(F.col(vec_col)).alias("v"),
    )
    anchors = v.where(anchor_pred).select(
        F.col("id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("v").alias("av"),
    )
    scored = (
        v.join(F.broadcast(anchors))
        .where(F.col("id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "anchor_label",
            "id",
            "label",
            F.round(cosine_expr(F.col("v"), F.col("av")), round_digits).alias("sim"),
        )
    )
    pick = F.struct(F.col("sim"), (-F.col("id")).alias("nid"))
    agg = scored.groupBy("anchor_id", "anchor_label").agg(
        F.max(F.when(F.col("label") == F.col("anchor_label"), pick)).alias("p"),
        F.max(F.when(F.col("label") != F.col("anchor_label"), pick)).alias("n"),
    )
    return agg.select(
        "anchor_id",
        "anchor_label",
        (-F.col("p.nid")).alias("pos_id"),
        F.col("p.sim").alias("pos_cos"),
        (-F.col("n.nid")).alias("neg_id"),
        F.col("n.sim").alias("neg_cos"),
    )


def int8_quant_stats(
    df: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension symmetric int8 quantization audit.

    Scale = per-dim absmax / 127 (the standard absmax scheme); quantizer is
    ``floor(x / amax * 127)`` — floor, not round, so both engines agree
    bit-for-bit (round-half direction differs across engines; floor never
    does).  Reports, per dimension: absmax, saturation count (|q| = 127)
    and mean |x - dequant(q)| — the decision report for storing embeddings
    int8-quantized (4× smaller vectors → 4× lighter ANN shuffles).

    Plan: one posexplode projection, one groupBy(dim) for absmax (64–4096
    groups — broadcast-sized), broadcast-join back, one groupBy(dim) for the
    error sums.  The corpus crosses the wire only as (dim, partial-agg)
    rows; errors sum through decimal(38,12) so partition order can't change
    the result.
    """
    dims = df.select(
        F.posexplode(_to_double(F.col(vec_col))).alias("dim", "x")
    )
    amax = dims.groupBy("dim").agg(
        F.greatest(F.max(F.abs(F.col("x"))), F.lit(1e-12)).alias("amax")
    )
    q = F.floor(F.col("x") / F.col("amax") * F.lit(127.0))
    err = F.abs(F.col("x") - F.col("qv") * F.col("amax") / F.lit(127.0))
    quant = dims.join(F.broadcast(amax), "dim").select(
        "dim", "x", "amax", q.alias("qv")
    )
    return (
        quant.select(
            "dim",
            "amax",
            "qv",
            F.round(err, 9).cast("decimal(38,12)").alias("abs_err"),
        )
        .groupBy("dim")
        .agg(
            F.round(F.first("amax"), 6).alias("amax"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum((F.abs(F.col("qv")) >= 127).cast("bigint"))
            .cast("bigint")
            .alias("n_saturated"),
            F.round(F.sum("abs_err").cast("double") / F.count(F.lit(1)), 8).alias(
                "mean_abs_err"
            ),
        )
    )


def doc_contamination(
    train: DataFrame,
    holdout: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-training-doc max word-set Jaccard against a holdout corpus.

    The doc-level complement of ``cleaning.decontaminate`` (which counts
    13-gram hits): a training doc that is a light paraphrase of an eval doc
    shares most of its vocabulary even when no long n-gram survives.

    Candidates come from an inverted word index (equi-join on the word, the
    q46/q55 shape): only train docs sharing ≥1 word with a holdout doc are
    scored, recall is exact.  Jaccard is rounded before the per-train-doc
    argmax (ties → lowest holdout id).  At 100 TB the holdout side is
    benchmarks (MBs): its word index broadcasts, so the training corpus is
    scanned once and only matching (train, holdout) pairs shuffle.
    """
    words = lambda d: d.select(  # noqa: E731
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
        ).alias("word"),
    )
    wt, wh = words(train), words(holdout)
    sz_t = wt.groupBy("id").agg(F.count(F.lit(1)).alias("sz_t"))
    sz_h = wh.groupBy("id").agg(F.count(F.lit(1)).alias("sz_h"))
    inter = (
        wt.join(
            wh.select(F.col("id").alias("hid"), "word").hint("broadcast"), "word"
        )
        .groupBy("id", "hid")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    scored = (
        inter.join(sz_t, "id")
        .join(sz_h.select(F.col("id").alias("hid"), "sz_h"), "hid")
        .select(
            "id",
            "hid",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("sz_t") + F.col("sz_h") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
    best = scored.groupBy("id").agg(
        F.max(F.struct(F.col("jaccard"), (-F.col("hid")).alias("nhid"))).alias("b")
    )
    return (
        best.select(
            F.col("id").alias(id_col),
            (-F.col("b.nhid")).alias("holdout_id"),
            F.col("b.jaccard").alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def feature_hash_vectors(
    df: DataFrame,
    dims: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Feature-hashing (hashing-trick) document vectors: token t adds ±1 to
    dimension md5(t) % dims, sign from a second hash bit — Weinberger et
    al. 2009, the featurizer that needs NO vocabulary table, no fitting,
    and no driver state, which is why it is the default at corpus scale
    (any vocabulary-indexed featurizer needs a 100 GB broadcast where this
    needs nothing).

    The vector builds array-side per row (aggregate over the token list
    into a dims-length int array) — a pure projection, ZERO shuffles, and
    exact integer arithmetic so any engine reproduces it bit-for-bit.  The
    sparse alternative (explode → groupBy(id, bucket) → reassemble) was
    measured and rejected: it shuffles corpus-tokens-sized rows twice,
    which at 100 TB is the whole job, to save nothing per-row.  The one
    cost of the wide fold is a one-time ~5 s janino compile of its
    generated code per session (measured; warm runs are sub-second) —
    irrelevant once amortized over a real corpus.
    Output: (id, vector array<bigint>, n_tokens). Downstream: the cosine /
    ANN operators (operators/similarity.py) consume it unchanged.
    """
    from .text import words_expr

    toks = words_expr(F.col(text_col))
    # ONE md5 per token: digests materialize first, then (bucket, sign)
    # derive from substrings of the same digest — higher-order-function
    # lambdas get no common-subexpression elimination, so a single
    # F.transform computing md5 twice would pay two digests per token
    digests = F.transform(toks, lambda t: F.md5(t))
    hashed = F.transform(
        digests,
        lambda d: F.struct(
            (F.conv(F.substring(d, 1, 8), 16, 10).cast("bigint") % dims).alias("b"),
            F.when(
                F.conv(F.substring(d, 9, 1), 16, 10).cast("bigint") % 2 == 0,
                F.lit(1).cast("bigint"),
            )
            .otherwise(F.lit(-1).cast("bigint"))
            .alias("s"),
        ),
    )
    vec = F.aggregate(
        hashed,
        F.array_repeat(F.lit(0).cast("bigint"), dims),
        lambda acc, p: F.transform(
            acc,
            lambda v, i: v
            + F.when(p["b"] == i.cast("bigint"), p["s"]).otherwise(
                F.lit(0).cast("bigint")
            ),
        ),
    )
    return df.select(
        F.col(id_col).alias("id"),
        vec.alias("vector"),
        F.size(toks).cast("bigint").alias("n_tokens"),
    )
