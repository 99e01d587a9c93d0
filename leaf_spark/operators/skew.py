"""Skew-mitigation operators — salting for hot keys.

At 100 TB a handful of hot keys (a viral stream's DID, a boilerplate
document hash, an 'und' language bucket) can put one shuffle partition
hours behind the rest. AQE's skew-join split handles sort-merge joins it
can see; these operators handle the two cases it doesn't:

- ``salted_join``  broadcast-sized-but-not-broadcastable dim joins where
  one fact key dominates: the dim side is replicated ``num_salts`` times,
  the fact side picks a deterministic per-row salt, and the hot key's rows
  spread over ``num_salts`` partitions instead of one.
- ``salted_agg``   two-phase aggregation: partial aggregate on
  (keys, salt) — the hot key's partials compute in parallel — then merge
  on the keys alone. The second shuffle carries one row per
  (key, salt) instead of the raw rows, so the hot key costs ``num_salts``
  rows in phase two. (Spark's own partial aggregation covers this when
  the map-side combine is effective; explicit salting is for
  high-cardinality-payload aggs like collect_list/array_agg where
  map-side combine doesn't shrink the hot key.)

Results are exactly those of the unsalted equivalents — salt never leaks
into the output — so both are DuckDB-oracle-checkable (q56/q57).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SALT = "__salt__"

# partial-phase fn, merge-phase fn for each supported algebraic aggregate
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    "collect_list": (F.collect_list, lambda c: F.flatten(F.collect_list(c))),
    "collect_set": (F.collect_set, lambda c: F.array_distinct(F.flatten(F.collect_list(c)))),
}


def _fact_salt(df: DataFrame, num_salts: int) -> Column:
    """Deterministic per-row salt in [0, num_salts): hash of all columns.

    Row-content hashing keeps the salt stable across retries/replays
    (unlike rand() or partition-id) so speculative re-execution of a task
    produces identical shuffle routing."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(num_salts)).cast("int")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "inner",
    num_salts: int = 16,
) -> DataFrame:
    """Equi-join with the dim side replicated over ``num_salts`` salts.

    Join keys become (on…, salt): a fact key held by 40% of rows now
    hash-partitions into ``num_salts`` different reducers. The dim side
    grows ``num_salts``×, so this is for dims too big to broadcast but far
    smaller than the fact table — the classic mid-size-dim skew case.
    Output ≡ ``fact.join(dim, on, how)`` (salt column dropped).
    """
    salt_values = F.explode(
        F.sequence(F.lit(0), F.lit(num_salts - 1))
    ).alias(_SALT)
    dim_rep = dim.select("*", salt_values)
    fact_s = fact.withColumn(_SALT, _fact_salt(fact, num_salts))
    return fact_s.join(dim_rep, [*on, _SALT], how).drop(_SALT)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 32,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column → (fn, input column) with fn one of
    sum/count/min/max/collect_list/collect_set. Output ≡
    ``df.groupBy(keys).agg(...)`` up to array ordering in collect_list
    (Spark never guarantees that ordering anyway — sort downstream).
    """
    for name, (fn, _) in aggs.items():
        if fn not in _ALGEBRAIC:
            raise ValueError(f"{name}: {fn!r} is not an algebraic aggregate")
    salted = df.withColumn(_SALT, _fact_salt(df, num_salts))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[_ALGEBRAIC[fn][0](col).alias(name) for name, (fn, col) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_ALGEBRAIC[fn][1](F.col(name)).alias(name) for name, (fn, _) in aggs.items()]
    )
