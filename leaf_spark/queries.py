"""Named query catalog — the driver-checkable contract (SURVEY §2 / §7.4).

Every entry pairs a Spark implementation with an equivalent DuckDB oracle SQL
string. The driver runs both at sf0.01 and compares row-count + schema +
order-insensitive value-hash, so:

- every computed column is aliased identically on both sides;
- double aggregates go through ``decimal(38,6)`` sums (order-independent,
  exact) and are cast back to double, so Spark's partition-parallel summation
  matches DuckDB bit-for-bit;
- timestamps are projected as formatted strings;
- any LIMIT is preceded by a total ORDER BY (unique key tiebreak) so both
  engines pick the same rows.

Coverage keys follow SURVEY §2.B (relational surface + function allowlist)
plus the events-stream semantics of §2.A and the LLM-pipeline extensions
(dedup / similarity / text analysis).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .session import load_tables


@dataclass(frozen=True)
class QueryCase:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible, rows-only check
    doc: str = ""


_REGISTRY: dict[str, QueryCase] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QueryCase(name, fn, oracle, doc)
        return fn

    return deco


def sql_case(name: str, spark_sql: str, oracle: str, doc: str = "") -> None:
    """Register a case whose Spark side is a plain Spark-SQL string (Catalyst
    plans it; these are fully declarative — pushdown/pruning for free)."""

    def fn(spark: SparkSession, sf_dir: str, _sql=spark_sql) -> DataFrame:
        load_tables(spark, sf_dir)
        return spark.sql(_sql)

    _REGISTRY[name] = QueryCase(name, fn, oracle, doc)


def all_cases() -> dict[str, QueryCase]:
    # import for side effects: modules register their cases on import
    from . import queries_relational  # noqa: F401
    from . import queries_functions  # noqa: F401
    from . import queries_events  # noqa: F401
    from . import queries_pipeline  # noqa: F401
    from . import queries_training  # noqa: F401

    return dict(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: c.spark_fn for n, c in all_cases().items()}


def oracle_sql() -> dict[str, str]:
    return {n: c.oracle for n, c in all_cases().items() if c.oracle is not None}
