"""Recursive-CTE emulation (SURVEY §2.B: SQLite allows WITH RECURSIVE —
authorizer action ``Recursive``, reference leaf-stream/src/lib.rs:1024 —
while Spark SQL has no recursive CTE).

Strategy: driver-side fixpoint loop over DataFrames — each iteration derives
the next frontier from the previous one and unions it into the accumulator.
``localCheckpoint`` every few iterations truncates the lineage so deep
recursions don't blow up the plan. This is the standard Spark pattern for
iterative graph/hierarchy expansion; each iteration is still a fully
distributed job.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def recursive_cte(
    base: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iterations: int = 100,
    union_all: bool = True,
    checkpoint_every: int = 8,
) -> DataFrame:
    """UNION-ALL recursive CTE: result = base ∪ step(base) ∪ step²(base) …

    ``step`` receives the previous frontier only (matching SQLite's
    WITH RECURSIVE evaluation, where the recursive select reads the rows
    produced in the previous round). Set ``union_all=False`` for
    UNION-distinct semantics (rows already seen do not re-enter the
    frontier — required for cyclic graphs to terminate).
    """
    acc = base
    frontier = base
    for i in range(max_iterations):
        nxt = step(frontier)
        if not union_all:
            nxt = nxt.distinct().exceptAll(acc.distinct())
        # Frontier sizes are usually tiny vs the full data; count() per round
        # is the fixpoint test (same as SQLite's empty-delta termination).
        if nxt.isEmpty():
            return acc
        acc = acc.unionAll(nxt)
        frontier = nxt
        if (i + 1) % checkpoint_every == 0:
            acc = acc.localCheckpoint(eager=True)
            frontier = frontier.localCheckpoint(eager=True)
    return acc
