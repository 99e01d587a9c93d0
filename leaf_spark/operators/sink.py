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

from pyspark.sql import DataFrame, functions as F


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
    shard file count, computed with one aggregate job + one listing.
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

    if partition_by:
        per_key_rows = [
            {**{k: r[k] for k in partition_by}, "rows": r["rows"]}
            for r in df.groupBy(*partition_by)
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        ]
    else:
        per_key_rows = []
    total = sum(p["rows"] for p in per_key_rows) if per_key_rows else df.count()

    n_files = 0
    for root, _dirs, files in os.walk(path):
        n_files += sum(
            1 for f in files if f.endswith(".parquet") and not f.startswith("_")
        )
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
