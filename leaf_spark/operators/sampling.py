"""Deterministic sampling, splitting, mixing, and sequence packing — the
corpus-assembly stage of a training-data pipeline.

Everything here is keyed on **content-derived md5 prefixes**, never
``rand()``: a row's fate is a pure function of its id, so (a) task retries
and speculative execution reproduce identical samples, (b) re-running the
pipeline on a grown corpus keeps every previously-selected row stable, and
(c) a DuckDB oracle can recompute the exact same selection (md5 hex is
engine-portable; hash()/xxhash64 are not). Comparisons happen on
fixed-width lowercase hex prefixes, where lexicographic order equals
numeric order — no hex→int conversion needed on either engine.

Shuffle inventory at 100 TB:
- ``hash_split`` / ``weighted_mix``  narrow projections + filter — ZERO
  shuffles, embarrassingly parallel, fate decided per-row.
- ``stratified_sample``  two-level rank: level 1 shuffles on
  (stratum, 256-way hash sub-key) — uniform by construction, so a hot
  stratum spreads over 256 reducers — and level 2 ranks the ≤ 256·n
  survivors per stratum (a near-empty shuffle).
- ``pack_sequences``  two-level distributed prefix-sum: per-range partial
  sums (one narrow pass), per-super-range sums whose ~#ranges/range_width
  rows take the only single-reducer ordered window, offsets rejoined on
  uniform keys — no driver materialization, and the global-order window
  over the DATA never happens.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _hex_prefix(key, salt: str, width: int = 4):
    """First ``width`` chars of md5(salt || key) — uniform in [0,16^width)."""
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, width)


def hex_threshold(fraction: float, width: int = 4) -> str:
    """Hex string h such that P[hex_prefix < h] == round(fraction * 16^width)
    / 16^width — the portable comparison constant for a keep-fraction.

    fraction ≥ 1 returns "g": one char, ASCII-after 'f', so every
    fixed-width hex prefix sorts below it (the natural '10000' encoding is
    lexicographically SMALLER than most 4-char prefixes and would silently
    drop ~94% of a full-weight group)."""
    n = 16**width
    k = round(fraction * n)
    if k >= n:
        return "g"
    return format(max(0, k), f"0{width}x")


def hash_split(
    df: DataFrame,
    key: str,
    fractions: dict[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split (train/val/test…) by hashed key.

    ``fractions`` maps label → fraction; they must sum to ≤ 1 and the
    remainder falls to the LAST label listed (so pass the catch-all split
    last with its nominal fraction). Assignment is stable under corpus
    growth: a doc's split never changes when other docs appear.
    """
    labels = list(fractions)
    h = _hex_prefix(F.col(key), salt)
    expr = None
    cum = 0.0
    for label in labels[:-1]:
        cum += fractions[label]
        cond = h < F.lit(hex_threshold(cum))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    expr = F.lit(labels[-1]) if expr is None else expr.otherwise(labels[-1])
    return df.withColumn(out_col, expr)


def weighted_mix(
    df: DataFrame,
    key: str,
    weight_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Down-sample each group (source/domain/lang) to its mixing weight.

    ``weights`` maps ``weight_col`` values → keep-fraction in [0,1]. The
    per-row decision broadcasts the (tiny) weight table as a literal CASE —
    no join, no shuffle: a 100 TB corpus streams through a single filter.
    """
    w = None
    for val, frac in weights.items():
        cond = F.col(weight_col) == val
        thr = F.lit(hex_threshold(frac))
        w = F.when(cond, thr) if w is None else w.when(cond, thr)
    w = F.lit(hex_threshold(default_weight)) if w is None else w.otherwise(
        hex_threshold(default_weight)
    )
    return df.where(_hex_prefix(F.col(key), salt) < w)


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    n_per_stratum: int,
    key: str,
    salt: str = "strat",
) -> DataFrame:
    """Deterministic n-per-stratum sample: the n rows with the smallest
    md5(salt||key) in each stratum (a uniform random draw, frozen by seed).

    Skew-proof two-level rank (same pattern as ``skew.salted_agg``): a hot
    stratum ('en' at 60% of a web corpus) must never sort on one reducer.
    Level 1 ranks within (strata, bucket) where bucket = the rank hash's
    own first 2 hex chars — 256 uniform sub-keys per stratum — and keeps
    each sub-key's top-n. Level 2 ranks the ≤ 256·n survivors per stratum
    globally. Both shuffles have uniformly distributed keys; the second
    carries almost nothing. Every level-1 group's top-n is a superset of
    the stratum top-n members hashing into it, so the result is exact.
    """
    h = F.md5(F.concat(F.lit(salt), F.col(key).cast("string")))
    rank_key = [h, F.col(key)]
    lvl1 = Window.partitionBy(*strata, F.substring(h, 1, 2)).orderBy(*rank_key)
    lvl2 = Window.partitionBy(*strata).orderBy(*rank_key)
    return (
        df.withColumn("__lr__", F.row_number().over(lvl1))
        .where(F.col("__lr__") <= n_per_stratum)
        .withColumn("__gr__", F.row_number().over(lvl2))
        .where(F.col("__gr__") <= n_per_stratum)
        .drop("__lr__", "__gr__")
    )


def distributed_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    range_width: int,
    out_col: str,
    inclusive: bool = False,
) -> DataFrame:
    """Running sum of ``value_col`` in ``order_col`` order WITHOUT a
    global-order window: the two-level shape shared by pack_sequences
    (exclusive offsets) and systematic_sample (inclusive cumulative).

    Rows bucket into ranges of ``range_width`` order values; per-range
    totals aggregate to ~N/range_width rows; those bucket again into
    SUPER-ranges whose ~N/range_width² totals take the only globally-
    ordered window (a single-partition sort of the doubly-reduced count).
    Offsets flow back down through two equi-joins on uniform range ids +
    intra-range partitioned windows. ``order_col`` must be unique numeric.
    Construction is fully lazy.

    Misuse fails loudly, not silently: a non-numeric ``order_col`` raises
    here at plan time, and a NULL order value raises at execution time —
    the inner equi-join on ``__rid__`` would otherwise silently DROP
    null-range rows and return a partial prefix sum (a wrong sample from
    systematic_sample, wrong offsets from pack_sequences)."""
    dtype = dict(df.dtypes).get(order_col)
    if dtype is None or not re.match(
        r"^(tinyint|smallint|int|bigint|float|double|decimal)", dtype
    ):
        raise ValueError(
            f"distributed_prefix_sum: order_col {order_col!r} must be a "
            f"numeric column (got {dtype!r}); a non-numeric order would "
            "cast to NULL range ids and silently drop rows"
        )
    rid_raw = (F.col(order_col) / range_width).cast("long")
    rid = F.when(rid_raw.isNull(), F.raise_error(
        F.lit(
            f"distributed_prefix_sum: NULL {order_col} (or a value that "
            "casts to NULL) — every row needs a non-null numeric order"
        )
    ).cast("long")).otherwise(rid_raw)
    tagged = df.withColumn("__rid__", rid)

    # level 1: per-range totals (one narrow shuffle, ~N/range_width rows)
    totals = tagged.groupBy("__rid__").agg(F.sum(value_col).alias("__rt__"))

    # level 2: per-super-range totals and their exclusive global prefix —
    # the single-partition window sorts only ~N/range_width² rows
    stotals = (
        totals.withColumn("__srid__", (F.col("__rid__") / range_width).cast("long"))
        .groupBy("__srid__")
        .agg(F.sum("__rt__").alias("__st__"))
    )
    sw = Window.orderBy("__srid__").rowsBetween(Window.unboundedPreceding, -1)
    soff = stotals.withColumn(
        "__soff__", F.coalesce(F.sum("__st__").over(sw), F.lit(0)).cast("long")
    ).select("__srid__", "__soff__")

    # exclusive per-range offsets = super-range offset + intra-super prefix
    rw = (
        Window.partitionBy("__srid__")
        .orderBy("__rid__")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off_df = (
        totals.withColumn("__srid__", (F.col("__rid__") / range_width).cast("long"))
        .join(soff, "__srid__")
        .withColumn(
            "__roff__",
            (F.col("__soff__") + F.coalesce(F.sum("__rt__").over(rw), F.lit(0))).cast(
                "long"
            ),
        )
        .select("__rid__", "__roff__")
    )

    upper = 0 if inclusive else -1
    w = (
        Window.partitionBy("__rid__")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    return (
        tagged.join(off_df, "__rid__")
        .withColumn(
            out_col,
            (
                F.col("__roff__")
                + F.coalesce(F.sum(value_col).over(w), F.lit(0))
            ).cast("long"),
        )
        .drop("__rid__", "__roff__")
    )


def pack_sequences(
    df: DataFrame,
    order_col: str,
    token_col: str,
    budget: int,
    range_width: int,
    bin_col: str = "bin_id",
    offset_col: str = "start_offset",
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid end-to-end in
    ``order_col`` order and cut into fixed ``budget``-token context bins;
    each doc gets its bin id and its token offset within the global stream
    (the standard pre-tokenization layout for LLM training shards).

    Fully distributed two-level prefix-sum, not a global-order window and
    not a driver loop: rows bucket into ranges of ``range_width`` order
    values; per-range totals aggregate down to ~N/range_width rows; those
    totals bucket again into SUPER-ranges of ``range_width`` ranges, whose
    ~N/range_width² totals take the only globally-ordered window (a
    single-partition sort of the doubly-reduced row count — 10 M rows for a
    100 B-doc corpus at width 100, vs the 1 B-row driver ``collect()`` this
    replaced). Exclusive offsets then flow back down: totals join the
    super-range offsets on ``__srid__`` + an intra-super-range window, and
    the data joins the per-range offsets on ``__rid__`` + an intra-range
    window. Both joins are plain equi-joins on uniform keys — AQE
    broadcasts them while the offset side is small and falls back to a
    shuffle join when it is not, so nothing here caps the corpus size.
    ``order_col`` must be unique per row (doc id). Construction is fully
    lazy: no Spark job runs until the result is acted on. The prefix-sum
    machinery itself lives in ``distributed_prefix_sum`` (shared with
    systematic_sample).
    """
    return distributed_prefix_sum(
        df, order_col, token_col, range_width, offset_col, inclusive=False
    ).withColumn(bin_col, (F.col(offset_col) / budget).cast("long"))


def budget_allocation(
    per_group: DataFrame,
    budget: int,
    temperature: float = 0.7,
    group_col: str = "source",
    size_col: str = "n_tokens",
) -> DataFrame:
    """Capped temperature-weighted token-budget allocation (water-filling,
    one redistribution round): share_g ∝ size_g^T, alloc_g = min(size_g,
    floor(budget·share_g)); sources that hit their cap free budget that is
    re-shared among the uncapped ones in proportion to the same weights.
    The one-round version is the standard practical compromise (exact
    water-filling iterates to a fixpoint; one round captures ~all of it
    when only head sources cap).

    Input is already one row per group (a tiny aggregate of the corpus), so
    every step here is arithmetic over ≤ #groups rows — the corpus-sized
    work happened upstream. ``floor`` (never round-half) keeps the integer
    outputs insensitive to last-ulp pow/divide differences across engines.
    """
    w = F.round(F.pow(F.col(size_col).cast("double"), F.lit(float(temperature))), 6)
    g = per_group.select(
        F.col(group_col), F.col(size_col).cast("bigint").alias("sz"), w.alias("w")
    )
    tot = g.agg(F.sum(F.col("w").cast("decimal(38,6)")).cast("double").alias("tw"))
    r1 = (
        g.crossJoin(F.broadcast(tot))
        .withColumn(
            "want", F.floor(F.lit(float(budget)) * F.col("w") / F.col("tw")).cast("bigint")
        )
        .withColumn("alloc1", F.least(F.col("sz"), F.col("want")))
        .withColumn("capped", F.col("alloc1") < F.col("want"))
    )
    left = r1.agg(
        (F.lit(budget) - F.sum("alloc1")).alias("leftover"),
        F.sum(F.when(~F.col("capped"), F.col("w").cast("decimal(38,6)")).otherwise(F.lit(0).cast("decimal(38,6)"))).cast("double").alias("wu"),
    )
    return (
        r1.crossJoin(F.broadcast(left))
        .withColumn(
            "alloc",
            F.when(
                F.col("capped") | (F.col("wu") <= 0.0), F.col("alloc1")
            ).otherwise(
                F.least(
                    F.col("sz"),
                    F.col("alloc1")
                    + F.floor(
                        F.col("leftover").cast("double") * F.col("w") / F.col("wu")
                    ).cast("bigint"),
                )
            ),
        )
        .select(
            group_col,
            F.col("sz").alias(size_col),
            "w",
            F.col("alloc").cast("bigint").alias("alloc_tokens"),
            F.col("capped").alias("was_capped"),
        )
    )


def _md5_u32(*cols) -> F.Column:
    """First 8 hex chars of md5(concat_ws(':', cols)) as a bigint in
    [0, 2^32) — the engine-portable uniform hash (Spark conv ≡ DuckDB
    '0x'-cast; xxhash64 exists only on the Spark side)."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", *[c.cast("string") for c in cols])), 1, 8),
        16,
        10,
    ).cast("bigint")


def rendezvous_shard(
    df: DataFrame,
    num_shards: int,
    id_col: str = "doc_id",
    out_col: str = "shard",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment.

    shard(doc) = argmax over s < num_shards of hash(doc_id, s) — the
    consistent-placement scheme: when the shard count changes, ONLY rows
    whose argmax involves the added/removed shard move (1/k of the corpus),
    versus rehash-everything for ``pmod(hash, k)``. That is what a 100 TB
    pipeline wants for incremental shard rebalancing and cache affinity.

    A pure per-row projection — zero shuffles; the argmax folds over a
    k-element array inside whole-stage codegen. Ties (2⁻³² per pair) break
    toward the lowest shard id, deterministically on both engines.
    """
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(num_shards - 1)),
        lambda s: F.struct(
            _md5_u32(F.col(id_col), s).alias("w"), (-s).alias("ns")
        ),
    )
    return df.withColumn(out_col, (-F.array_max(arr)["ns"]).cast("int"))


def systematic_sample(
    df: DataFrame,
    target: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Systematic (fixed-interval) sampling by cumulative weight: walk the
    id-ordered corpus and pick a row whenever the running weight total
    crosses one of ``target`` evenly-spaced thresholds — every selection
    window contributes proportionally (stratified-in-weight, zero variance
    across contiguous regions), unlike an iid sample at the same rate.

    All-integer math: a row is selected iff
    ``(cum*target) div total > ((cum-w)*target) div total`` — bigint
    division floors on both engines, so the pick set is engine-exact.

    The id-ordered running sum IS the q70 two-level distributed
    prefix-sum (``distributed_prefix_sum``, inclusive form): no
    corpus-wide global window anywhere — the only single-partition sort
    runs over the doubly-reduced super-range totals.
    """
    cum = distributed_prefix_sum(
        df.select(F.col(id_col), F.col(weight_col).cast("bigint").alias("w")),
        id_col,
        "w",
        range_width=65536,
        out_col="cum",
        inclusive=True,
    )
    tot = cum.agg(F.sum("w").cast("bigint").alias("total"))
    c = cum.crossJoin(F.broadcast(tot))
    bucket = F.expr(f"(cum * {target}) div total")
    prev_bucket = F.expr(f"((cum - w) * {target}) div total")
    return (
        c.where(bucket > prev_bucket)
        .select(id_col, "w", "cum", bucket.cast("bigint").alias("bucket"))
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "ws",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis 2006):
    each row draws u ~ U(0,1] from its content hash and gets priority
    -ln(u)/w; the k smallest priorities ARE a weighted sample without
    replacement. One projection + a top-k (TakeOrderedAndProject — a
    per-partition heap then a k-row merge, never a global sort): the
    distributed-sampling staple that replaces sequential reservoirs.

    u derives from the md5 of (salt, id) — deterministic across engines,
    retries, and partitionings; priorities round to 6 decimals with an id
    tiebreak so the boundary of the selected set is engine-stable.
    """
    u = (_md5_u32(F.lit(salt), F.col(id_col)) + F.lit(1.0)) / F.lit(4294967297.0)
    pri = F.round(-F.log(u) / F.col(weight_col).cast("double"), 6)
    return (
        df.select(
            F.col(id_col),
            F.col(weight_col).cast("bigint").alias("w"),
            pri.alias("priority"),
        )
        .orderBy("priority", id_col)
        .limit(k)
    )
