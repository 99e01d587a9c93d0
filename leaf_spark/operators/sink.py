"""Training-data export sink: sharded, partitioned, manifested parquet.

The last stage of a corpus pipeline is writing training shards that a data
loader can consume deterministically: bounded file sizes (loader-friendly
shards), directory partitioning on the mixing key (source/lang/split), and
a manifest recording exactly what was written. At 100 TB the write IS a
distributed job — everything here happens executor-side except the
manifest rollup, which aggregates per-partition counts (rows the size of
the partition count, not the data).

Reference scope note: the reference persists materialized state per stream
(leaf-server/src/streams.rs); a bulk training-export sink has no analog
there — this is part of the LLM-pipeline extension surface, same family as
operators/assembly.py (which decides WHAT goes in each split; this writes
it out).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


def write_training_shards(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    shard_max_records: int = 100_000,
    order_by: list[str] | None = None,
) -> dict:
    """Write ``df`` as partitioned parquet shards + a ``_manifest.json``.

    - ``partition_by``: directory partitioning (e.g. ["split", "source"]) —
      consumers prune at the path level;
    - ``shard_max_records``: bounds rows per file (maxRecordsPerFile), so
      shard sizes stay loader-friendly regardless of input partitioning;
    - ``order_by``: optional sortWithinPartitions before the write — e.g.
      pack sequences in curriculum order inside each shard without a global
      (shuffling) sort.

    Returns the manifest dict: total rows, per-partition-key rows, and the
    shard file count. All counts come from the written files' parquet
    FOOTERS (pyarrow metadata reads, a few KB per shard) — the input is
    scanned exactly once, by the write job itself; the old per-key
    ``groupBy().collect()`` / ``df.count()`` second scan is gone. Footer
    reads are a driver loop over shard files (bounded by shard count, not
    data size); a fleet-scale export with millions of shards would
    parallelize the same footer reads over executors.
    """
    partition_by = partition_by or []
    out = df
    if order_by:
        out = out.sortWithinPartitions(*order_by)
    writer = (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", str(shard_max_records))
        .format("parquet")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)

    import pyarrow.parquet as pq

    # Hive directory names are strings; restore each partition value to the
    # COLUMN's type so manifest keys compare equal to DataFrame values (a
    # bucket=3 INT partition must record 3, not "3" — the silent type flip
    # breaks any consumer matching manifest rows against data rows).
    casters = {}
    for f_ in out.schema.fields:
        if partition_by and f_.name in partition_by:
            t = f_.dataType.simpleString()
            if t in ("tinyint", "smallint", "int", "bigint"):
                casters[f_.name] = int
            elif t in ("float", "double"):
                casters[f_.name] = float
            elif t == "boolean":
                casters[f_.name] = lambda v: v == "true"

    def _typed(k: str, v: str | None):
        if v is None:
            return None
        c = casters.get(k)
        return c(v) if c is not None else v

    per_key: dict[tuple, int] = {}
    n_files = 0
    total = 0
    for root, _dirs, files in os.walk(path):
        kv = _partition_values(os.path.relpath(root, path))
        for f in files:
            if not f.endswith(".parquet") or f.startswith(("_", ".")):
                continue
            n_files += 1
            nr = pq.read_metadata(os.path.join(root, f)).num_rows
            total += nr
            if partition_by:
                key = tuple(_typed(k, kv.get(k)) for k in partition_by)
                per_key[key] = per_key.get(key, 0) + nr

    per_key_rows = [
        {**dict(zip(partition_by, key)), "rows": rows}
        for key, rows in per_key.items()
    ]
    manifest = {
        "total_rows": total,
        "partition_by": partition_by,
        "shard_max_records": shard_max_records,
        "n_shard_files": n_files,
        "partitions": sorted(
            per_key_rows, key=lambda p: tuple(str(p[k]) for k in partition_by)
        ),
    }
    with open(os.path.join(path, "_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return manifest


def _partition_values(rel_dir: str) -> dict[str, str | None]:
    """Decode Hive-style ``key=value`` path segments (the writer URL-escapes
    special characters; ``__HIVE_DEFAULT_PARTITION__`` encodes NULL)."""
    from urllib.parse import unquote

    kv: dict[str, str | None] = {}
    if rel_dir in (".", ""):
        return kv
    for seg in rel_dir.split(os.sep):
        if "=" in seg:
            k, v = seg.split("=", 1)
            kv[unquote(k)] = (
                None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
            )
    return kv
