"""pandas UDF bodies for drisl.register_udfs.

Kept in a separate module WITHOUT ``from __future__ import annotations`` —
pandas_udf infers the eval type from real (non-stringified) type hints.
The decorators are applied inside ``make_udfs`` (not at import time) so
executor-side re-imports of this module never touch the SparkSession.
"""

import pandas as pd

from .drisl import drisl_exists, drisl_extract, drisl_to_json


# Spark is statically typed while the reference (SQLite) is dynamic; these
# four conversions define the typed projections of a dynamic drisl value.
# They are shared by the pandas UDFs below AND by localexec.py's driver-side
# sqlite registrations, so the local fast path and the distributed path are
# value-identical by construction.

def conv_extract_str(v):
    if v is None:
        return None
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, str):
        return v
    if isinstance(v, float):
        return repr(v)
    return str(v)


def conv_extract_int(v):
    if isinstance(v, bool):
        return 1 if v else 0
    if isinstance(v, (int, float)):
        return int(v)
    return None


def conv_extract_real(v):
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return float(v)
    return None


def conv_extract_blob(v):
    return v if isinstance(v, bytes) else None


def _series_extract(payloads, paths, conv):
    out = []
    for blob, path in zip(payloads, paths):
        if blob is None or path is None:
            out.append(None)
            continue
        try:
            v = drisl_extract(bytes(blob), path)
        except Exception:
            v = None
        out.append(conv(v))
    return pd.Series(out, dtype="object")


def make_udfs():
    """Build the pandas UDFs (requires an active SparkSession)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def extract_str(payloads: pd.Series, paths: pd.Series) -> pd.Series:
        return _series_extract(payloads, paths, conv_extract_str)

    @pandas_udf("long")
    def extract_int(payloads: pd.Series, paths: pd.Series) -> pd.Series:
        return _series_extract(payloads, paths, conv_extract_int)

    @pandas_udf("double")
    def extract_real(payloads: pd.Series, paths: pd.Series) -> pd.Series:
        return _series_extract(payloads, paths, conv_extract_real)

    @pandas_udf("binary")
    def extract_blob(payloads: pd.Series, paths: pd.Series) -> pd.Series:
        return _series_extract(payloads, paths, conv_extract_blob)

    @pandas_udf("int")
    def exists_udf(payloads: pd.Series, paths: pd.Series) -> pd.Series:
        out = []
        for blob, path in zip(payloads, paths):
            if blob is None or path is None:
                out.append(0)
                continue
            try:
                out.append(drisl_exists(bytes(blob), path))
            except Exception:
                out.append(0)
        return pd.Series(out, dtype="object")

    @pandas_udf("string")
    def to_json_udf(payloads: pd.Series) -> pd.Series:
        out = []
        for blob in payloads:
            if blob is None:
                out.append(None)
                continue
            try:
                out.append(drisl_to_json(bytes(blob)))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype="object")

    return {
        "drisl_extract": extract_str,
        "drisl_extract_int": extract_int,
        "drisl_extract_real": extract_real,
        "drisl_extract_blob": extract_blob,
        "drisl_exists": exists_udf,
        "drisl_to_json": to_json_udf,
    }
