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
