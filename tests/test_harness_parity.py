"""Harness-parity: the driver builds its OWN SparkSession (no builder confs)
and calls ``__spark_entry__.queries()[name](spark, sf_dir)`` — possibly from a
cwd outside the repo. Round-1 lost all 50 correctness rows to exactly this
gap (``spark.sql.legacy.parquet.nanosAsLong`` only set in our builder), so
this test reproduces the driver environment in a subprocess:

- bare ``SparkSession.builder.master(...).getOrCreate()`` — none of our confs
- cwd = a temp dir, repo only on ``sys.path``
- runs a nano-timestamp-reading query (q01), a timestamp-function query
  (q23), and a pandas-UDF query (q38, imports ``leaf_spark`` on workers)
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"

_DRIVER_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[4]").appName("parity").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e
qs = e.queries()
for name in ["q01_pricing_summary", "q23_datetime", "q38_json_set_patch"]:
    rows = qs[name](spark, {sf_dir!r}).collect()
    assert len(rows) > 0, name
    print("OK", name, len(rows), flush=True)
print("PARITY_PASS", flush=True)
"""


def test_checker_surfaces_hugeint_typing():
    """Regression for the round-3 q67/q68/q70 reds: a bare ``sum(INTEGER)``
    in a DuckDB oracle is HUGEINT, which the driver (and now tools/check.py)
    materializes via Arrow as Decimal — it must hash differently from the
    Python int a Spark BIGINT collects to, and the cast-to-bigint form must
    hash identically."""
    import duckdb

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from check import duck_rows, value_hash

    con = duckdb.connect()
    con.execute("create table t as select * from (values (1), (2), (41)) v(x)")

    bare, bare_dec = duck_rows(con, "select sum(x) as s from t")
    import decimal

    assert isinstance(bare[0]["s"], decimal.Decimal)
    assert bare_dec == ["s"]  # the checker now also flags the column itself
    spark_like = [{"s": 44}]  # what Spark's BIGINT sum collects to
    assert value_hash(bare) != value_hash(spark_like)

    cast, cast_dec = duck_rows(con, "select cast(sum(x) as bigint) as s from t")
    assert isinstance(cast[0]["s"], int)
    assert cast_dec == []
    assert value_hash(cast) == value_hash(spark_like)


def test_training_oracles_cast_integer_sums():
    """The q67/q68/q70 oracles must keep their integer sums wrapped in
    cast(... as bigint) — Arrow-fetching them must yield ints, not Decimals."""
    import decimal

    import duckdb

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from check import duck_rows

    import __spark_entry__ as e

    oracles = e.oracle_sql()
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"create or replace view {t} as select * from '{SF_DIR}/{t}.parquet'"
        )
    for name in ["q67_train_split", "q68_source_mix", "q70_pack_sequences"]:
        rows, dec_cols = duck_rows(con, oracles[name])
        assert rows, name
        assert dec_cols == [], name
        for r in rows:
            for k, v in r.items():
                assert not isinstance(v, decimal.Decimal), (name, k, type(v))


def test_no_decimal_in_any_oracle_output():
    """Catalog-wide no-DECIMAL-output contract, oracle side (VERDICT r6
    "Next round #2"). DECIMAL/HUGEINT-typed OUTPUT columns hash-fail at the
    driver even when values are bit-identical locally — the 9-for-9 law
    across six rounds (r3 q67/q68/q70; r5+r6 q147/q150/q158/q161/q162).
    DuckDB DESCRIBE binds the query without executing it, so this covers
    every oracle cheaply; r3's reds were oracle-side-only, hence the
    independent check of this side."""
    import duckdb

    import __spark_entry__ as e

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"create or replace view {t} as select * from '{SF_DIR}/{t}.parquet'"
        )
    offenders = {}
    for name, sql in e.oracle_sql().items():
        cols = con.execute("describe " + sql).fetchall()
        bad = [
            c[0]
            for c in cols
            if "DECIMAL" in c[1].upper() or "HUGEINT" in c[1].upper()
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"DECIMAL/HUGEINT output columns (driver hash-fail guaranteed): "
        f"{offenders} — cast exact witnesses to string (plain-digit render "
        f"both engines), keep decimal arithmetic internal"
    )


def test_no_decimal_in_any_spark_output(spark):
    """Catalog-wide no-DECIMAL-output contract, Spark side. Builds every
    entry's DataFrame at sf0.001 and walks the schema (nested types
    included); lazy for pure-SQL entries, executes only the checkpointed
    builders."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from check import spark_decimal_cols

    import __spark_entry__ as e

    offenders = {}
    for name, fn in e.queries().items():
        bad = spark_decimal_cols(fn(spark, SF_DIR))
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"DecimalType output columns (driver hash-fail guaranteed): "
        f"{offenders} — cast exact witnesses to string, keep decimal "
        f"arithmetic internal"
    )


@pytest.mark.slow
def test_bare_session_from_foreign_cwd(tmp_path):
    script = _DRIVER_SCRIPT.format(repo=REPO, sf_dir=SF_DIR)
    env = dict(os.environ)
    # Drop anything that would leak our tuned session into the subprocess.
    env.pop("PYSPARK_SUBMIT_ARGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    assert "PARITY_PASS" in proc.stdout
