"""Arrow staging for small driver-local DataFrames.

``spark.createDataFrame(list)`` parallelizes a PYTHON RDD: every action
on the resulting plan — and on every plan that joins it — re-runs a
Python-worker round trip (~295 ms measured, SCALE.md §3) to produce a
handful of rows. Staging through pandas/Arrow instead yields a JVM
``LocalTableScan`` (~6 ms), which matters everywhere small model state
enters an iterative job: k-means centroids, BPE merge tables, IVF coarse
quantizers, top-k result frames, staged event batches.

Always falls back to the classic path on conversion failure — never a
correctness dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def arrow_local_df(spark, rows, schema) -> DataFrame:
    """rows: list of tuples/lists in field order; schema: StructType or
    DDL string ("cid int, cvec array<double>")."""
    try:
        import pandas as pd

        st = (
            schema
            if isinstance(schema, T.StructType)
            else T.StructType.fromDDL(schema)
        )
        names = [f.name for f in st.fields]
        if not rows:
            # empty pandas frames still stage as Python RDDs — use a
            # pure-JVM empty plan instead (same trick as TableStore)
            proj = [
                f"cast(null as {f.dataType.simpleString()}) as `{f.name}`"
                for f in st.fields
            ]
            return spark.range(0, 0, 1, 1).selectExpr(*proj)
        pdf = pd.DataFrame(
            [tuple(r) for r in rows], columns=names, dtype=object
        )
        for f in st.fields:
            if isinstance(f.dataType, T.BinaryType):
                pdf[f.name] = pdf[f.name].map(
                    lambda b: bytes(b) if b is not None else None
                )
        return spark.createDataFrame(pdf, st)
    except Exception:
        return spark.createDataFrame(rows, schema)
