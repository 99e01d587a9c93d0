"""Every function in the reference's query allowlist must EXECUTE through
the module-SQL path, not merely pass authorization: the allowlist
(leaf-stream/src/lib.rs:1104-1110) is the exact SQL surface a module query
may use, so a shim gap here is a module that authorizes and then dies at
runtime. Table-driven: one representative call per function, executed via
DmlExecutor (translate + UDF registration), value-asserted against SQLite
semantics."""

from __future__ import annotations

import pytest

from leaf_spark.dml import DmlExecutor, TableStore
from leaf_spark.sqlcompat import _QUERY_FN_ALLOWLIST


@pytest.fixture(scope="module")
def ex(spark):
    st = TableStore(spark, "t_allowlist_")
    e = DmlExecutor(st)
    e.execute("create table vals (x integer)")
    e.execute("insert into vals values (1), (3)")
    return e


SCALAR_CASES = [
    # fn name, sqlite-dialect call, expected value
    ("coalesce", "select coalesce(null, 1) as v", 1),
    ("ifnull", "select ifnull(null, 2) as v", 2),
    ("nullif", "select nullif(3, 3) as v", None),
    ("iif", "select iif(1, 'a', 'b') as v", "a"),
    ("json_object", "select json_object('a', 1) as v", '{"a":1}'),
    ("json_array", "select json_array(1, 2) as v", "[1,2]"),
    (
        "json_patch",
        """select json_patch('{"a":1}', '{"b":2}') as v""",
        '{"a":1,"b":2}',
    ),
    ("json_set", "select json_set('{}', '$.a', 5) as v", '{"a":5}'),
    (
        "json_extract",
        """select json_extract('{"a":{"b":7}}', '$.a.b') as v""",
        "7",
    ),
    ("abs", "select abs(-4) as v", 4),
    ("round", "select round(2.345, 2) as v", 2.35),
    ("length", "select length('abc') as v", 3),
    ("substr", "select substr('abcde', 2, 3) as v", "bcd"),
    ("substring", "select substring('abcde', 2, 3) as v", "bcd"),
    ("trim", "select trim('  a  ') as v", "a"),
    ("ltrim", "select ltrim('xxaxx', 'x') as v", "axx"),
    ("rtrim", "select rtrim('xxaxx', 'x') as v", "xxa"),
    ("upper", "select upper('ab') as v", "AB"),
    ("lower", "select lower('AB') as v", "ab"),
    ("replace", "select replace('banana', 'na', 'o') as v", "baoo"),
    ("instr", "select instr('hello', 'll') as v", 3),
    ("printf", "select printf('%s-%02d', 'a', 3) as v", "a-03"),
    ("format", "select format('%s!', 'hi') as v", "hi!"),
    ("typeof", "select typeof(1) as v", "integer"),
    ("typeof", "select typeof(1.5) as v", "real"),
    ("typeof", "select typeof('x') as v", "text"),
    ("typeof", "select typeof(null) as v", "null"),
    ("date", "select date('2024-01-02 10:00:00') as v", "2024-01-02"),
    ("time", "select time('2024-01-02 10:11:12') as v", "10:11:12"),
    (
        "datetime",
        "select datetime('2024-01-02 10:11:12') as v",
        "2024-01-02 10:11:12",
    ),
    ("strftime", "select strftime('%Y|%m', '2024-01-02') as v", "2024|01"),
    ("unixepoch", "select unixepoch('1970-01-01 00:01:00') as v", 60),
]

AGG_CASES = [
    ("max", "select max(x) as v from vals", 3),
    ("min", "select min(x) as v from vals", 1),
    ("sum", "select sum(x) as v from vals", 4),
    ("avg", "select avg(x) as v from vals", 2.0),
    ("count", "select count(x) as v from vals", 2),
    ("total", "select total(x) as v from vals", 4.0),
    ("group_concat", "select group_concat(x) as v from vals", "1,3"),
    ("json_group_array", "select json_group_array(x) as v from vals", "[1,3]"),
]


@pytest.mark.parametrize("fn,sql,expected", SCALAR_CASES + AGG_CASES)
def test_allowlisted_function_executes(ex, fn, sql, expected):
    assert fn in _QUERY_FN_ALLOWLIST, f"{fn} fell out of the allowlist"
    got = ex.execute(sql).first()["v"]
    if isinstance(expected, float):
        # Spark types round(<decimal literal>) as DECIMAL where SQLite says
        # real; the typeof shim papers over that (decimal% -> 'real'), so
        # here we compare the value, not the Python type.
        assert float(got) == pytest.approx(expected)
    else:
        assert got == expected


def test_json_each_table_valued(ex):
    rows = ex.execute(
        "select value from json_each('[5,6,7]')"
    ).collect()
    assert sorted(r["value"] for r in rows) == ["5", "6", "7"] or sorted(
        int(r["value"]) for r in rows
    ) == [5, 6, 7]


def test_drisl_udfs_execute(spark):
    from leaf_spark import drisl

    drisl.register_udfs(spark)
    payload = drisl.encode({"a": {"b": 9}})
    spark.createDataFrame([(bytearray(payload),)], "payload binary").createOrReplaceTempView(
        "dr_t"
    )
    r = spark.sql(
        "select drisl_extract(payload, '.a.b') as v, "
        "drisl_exists(payload, '.a.b') as e, "
        "drisl_exists(payload, '.zz') as ne from dr_t"
    ).first()
    # SQLite has no boolean type — drisl_exists returns 0/1 integers
    assert r["e"] == 1 and r["ne"] == 0
    assert r["v"] is not None


def test_throw_and_unauthorized_abort(ex):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        ex.execute("select throw('boom', 42) as v").collect()
    assert "boom" in str(ei.value)
    with pytest.raises(Exception) as ei:
        ex.execute("select unauthorized('nope') as v").collect()
    assert "Unauthorized" in str(ei.value)


def test_every_allowlist_entry_has_an_execution_case():
    """Completeness of THIS file: any function added to the allowlist
    without an execution case here fails loudly."""
    covered = {fn for fn, _, _ in SCALAR_CASES + AGG_CASES} | {
        "json_each",  # table-valued, separate test
        "drisl_extract", "drisl_exists",  # binary-payload UDFs, separate
        "throw", "unauthorized",  # abort fns, separate
    }
    assert _QUERY_FN_ALLOWLIST - covered == set()


def test_json_each_correlated_lateral(ex):
    """json_each(t.col) as a join source enumerates per-row — the
    SQLite idiom `FROM t, json_each(t.col) j` (lateral correlation)."""
    ex.execute("create table docs (id integer, props text)")
    ex.execute(
        """insert into docs values
           (1, '{"a": 1, "b": 2}'), (2, '[7, 8, 9]'), (3, '{}')"""
    )
    rows = ex.execute(
        "select d.id, j.key, j.value from docs d, json_each(d.props) j "
        "order by d.id, j.key"
    ).collect()
    got = [(r["id"], r["key"], r["value"]) for r in rows]
    assert got == [
        (1, "a", "1"), (1, "b", "2"),
        (2, "0", "7"), (2, "1", "8"), (2, "2", "9"),
    ]


def test_json_each_hardened_forms(ex):
    """The review-found grammar gaps, executed end-to-end: uppercase AS
    alias, LEFT JOIN (null-padding) spelling, a relation written AFTER the
    json_each, the 2-argument path form, and string literals that merely
    LOOK like a json_each source."""
    ex.execute("create table jd (id integer, props text)")
    ex.execute(
        """insert into jd values
           (1, '{"a": 1}'), (2, '{}'), (3, '{"nest": {"x": 5, "y": 6}}')"""
    )
    # uppercase AS alias
    rows = ex.execute(
        "select d.id, J.value from jd d, json_each(d.props) AS J"
    ).collect()
    assert {(r["id"], r["value"]) for r in rows} == {(1, "1"), (3, '{"x":5,"y":6}')}
    # LEFT JOIN spelling null-pads the empty document instead of dropping
    rows = ex.execute(
        "select d.id, j.key from jd d left join json_each(d.props) j"
    ).collect()
    assert {(r["id"], r["key"]) for r in rows} == {
        (1, "a"), (2, None), (3, "nest"),
    }
    # json_each first, another relation after the comma
    rows = ex.execute(
        "select j.value, d.id from json_each('[7]') j, jd d where d.id = 2"
    ).collect()
    assert [(r["value"], r["id"]) for r in rows] == [("7", 2)]
    # 2-argument form enumerates the value AT the path
    rows = ex.execute(
        "select j.key, j.value from jd d, json_each(d.props, '$.nest') j "
        "where d.id = 3"
    ).collect()
    assert {(r["key"], r["value"]) for r in rows} == {("x", "5"), ("y", "6")}
    # a string literal containing 'from x, json_each(...)' is untouched
    r = ex.execute("select 'from t, json_each(x) j' as v").first()
    assert r["v"] == "from t, json_each(x) j"


def test_json_each_on_clause_raises_cleanly(ex):
    from leaf_spark.sqlcompat import SqlTranslationError

    with pytest.raises(SqlTranslationError, match="ON clause"):
        ex.execute(
            "select d.id from jd d join json_each(d.props) j on j.key = 'a'"
        )


def test_json_each_scalar_and_join_variants(ex):
    """Review-found gaps, round 2: scalar documents emit ONE (NULL, value)
    row like SQLite; a 2-arg path landing on a scalar does the same; LEFT
    OUTER JOIN behaves as LEFT JOIN; RIGHT/FULL JOIN raise cleanly."""
    from leaf_spark.sqlcompat import SqlTranslationError

    # scalar document: one row, key NULL, unquoted value
    rows = ex.execute("select key, value from json_each('5')").collect()
    assert [(r["key"], r["value"]) for r in rows] == [(None, "5")]
    rows = ex.execute("select value from json_each('\"abc\"')").collect()
    assert [r["value"] for r in rows] == ["abc"]
    # 2-arg path landing on a scalar
    ex.execute("create table j2 (id integer, props text)")
    ex.execute("""insert into j2 values (1, '{"a": 7, "b": [1, 2]}')""")
    rows = ex.execute(
        "select j.key, j.value from j2 d, json_each(d.props, '$.a') j"
    ).collect()
    assert [(r["key"], r["value"]) for r in rows] == [(None, "7")]
    # ... and on an array: enumerates it
    rows = ex.execute(
        "select j.value from j2 d, json_each(d.props, '$.b') j"
    ).collect()
    assert sorted(r["value"] for r in rows) == ["1", "2"]
    # LEFT OUTER JOIN = LEFT JOIN (null-pads an empty doc)
    ex.execute("insert into j2 values (2, '{}')")
    rows = ex.execute(
        "select d.id, j.key from j2 d left outer join json_each(d.props) j"
    ).collect()
    assert {(r["id"], r["key"]) for r in rows} >= {(2, None)}
    # RIGHT/FULL raise rather than emitting dangling tokens
    for kind in ("right join", "full outer join"):
        with pytest.raises(SqlTranslationError, match="not supported"):
            ex.execute(f"select d.id from j2 d {kind} json_each(d.props) j")
