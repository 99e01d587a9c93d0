"""WITH RECURSIVE inside module SQL text (VERDICT missing #3).

The reference authorizer explicitly allows recursion in module SQL
(action Recursive, leaf-stream/src/lib.rs:1024); DmlExecutor must detect
``WITH RECURSIVE`` and route the self-referencing CTE to the
operators.recursive fixpoint — Spark SQL itself has no recursive CTE.
"""

import pytest

from leaf_spark import drisl
from leaf_spark.dml import run_sql
from leaf_spark.module import BasicModuleDef, QueryDef
from leaf_spark.stream import Stream
from leaf_spark.types import IncomingEvent, LeafQuery

ORG = BasicModuleDef(
    init_sql=(
        "create table if not exists edges (child text not null, parent text not null)"
    ),
    materializer=(
        "insert into edges (child, parent) select "
        "drisl_extract(payload, '.child'), drisl_extract(payload, '.parent') "
        "from event;"
    ),
    queries=(
        QueryDef(
            "descendants",
            "with recursive sub(name) as ("
            "  select child from edges where parent = 'root'"
            "  union all"
            "  select e.child from edges e join sub on e.parent = sub.name"
            ") select name from sub order by name",
        ),
        QueryDef(
            "reachable",
            # UNION (distinct) — terminates on cyclic graphs
            "with recursive r(name) as ("
            "  select child from edges where parent = 'a'"
            "  union"
            "  select e.child from edges e join r on e.parent = r.name"
            ") select name from r order by name",
        ),
    ),
)


def edge(child: str, parent: str) -> IncomingEvent:
    return IncomingEvent("u", drisl.encode({"child": child, "parent": parent}))


class TestRecursiveModuleSql:
    def test_descendants_query(self, spark, tmp_root):
        s = Stream(spark, tmp_root, "did:plc:org")
        s.provide_module(ORG)
        s.add_events(
            [edge("a", "root"), edge("b", "root"), edge("c", "a"), edge("d", "c")]
        )
        rows = s.query(None, LeafQuery("descendants"))
        assert [r["name"] for r in rows] == ["a", "b", "c", "d"]

    def test_union_distinct_terminates_on_cycle(self, spark, tmp_root):
        s = Stream(spark, tmp_root, "did:plc:org2")
        s.provide_module(ORG)
        # cycle: a → b → c → a
        s.add_events([edge("b", "a"), edge("c", "b"), edge("a", "c")])
        rows = s.query(None, LeafQuery("reachable"))
        assert [r["name"] for r in rows] == ["a", "b", "c"]


class TestRunSqlRecursive:
    def test_oracle_match_shape(self, spark):
        df = run_sql(
            spark,
            "with recursive seq(n) as (select 1 union all "
            "select n + 1 from seq where n < 5) select n from seq",
        )
        assert sorted(r["n"] for r in df.collect()) == [1, 2, 3, 4, 5]

    def test_multiple_ctes_mixing_recursive_and_plain(self, spark):
        df = run_sql(
            spark,
            "with recursive seq(n) as (select 1 union all "
            "select n + 1 from seq where n < 3), "
            "doubled as (select n * 2 as d from seq) "
            "select d from doubled",
        )
        assert sorted(r["d"] for r in df.collect()) == [2, 4, 6]

    def test_missing_union_is_loud(self, spark):
        from leaf_spark.sqlcompat import SqlTranslationError

        with pytest.raises(SqlTranslationError, match="UNION"):
            run_sql(
                spark,
                "with recursive bad(n) as (select n + 1 from bad) select n from bad",
            )
