"""A21 backup / export / restore — parity with the reference's incremental
S3 backup loop (leaf-server/src/storage.rs:635-825 backup, 827-1056 restore).

Reference behavior reproduced:

- **Incremental event-range archives**: events are exported in contiguous
  idx ranges as ``{start}-{end}.events.drisl.zstd`` — a zstd frame around the
  DRISL encoding of ``{"events": [{idx, user, payload, signature}, …]}``,
  byte-layout-identical to the reference's ``EventArchive``
  (leaf-server/src/storage.rs:46,757-764,1070-1073).  Archives written by
  earlier rounds as ``{start}-{end}.events.parquet`` remain restorable.
- **Module blob**: the content-addressed module codec, DRISL-encoded then
  zstd-compressed as ``{cid}.module.drisl.zstd`` (reference
  MODULE_ARCHIVE_EXT, storage.rs:45,660-680); legacy ``module_{cid}.drisl.gz``
  blobs from earlier rounds still restore.
- **State snapshot**: the ephemeral state tables, which are NOT recoverable
  by replay (state events never hit the log), snapshotted per table
  (reference snapshots the whole state DB via ``VACUUM INTO``,
  storage.rs:743-771).
- **Metadata doc**: a DRISL ``metadata.drisl`` with the reference's
  StreamMetadata fields ``{did, did_key, owners, module_cid}``
  (storage.rs:48,708-719,1075-1081), plus a local ``metadata.json`` playing
  the role of the server DB's backup-cursor columns
  (``backup_latest_event`` / exported ranges, storage.rs:680-699).
- **Restore validates contiguous ranges** starting at 1 and covering
  metadata's latest idx, then raw-imports and replays (storage.rs:827-1056).

Scale note: archives are written driver-side (an event batch fits in driver
memory, like the reference's per-range archives). At 100 TB the event log is
already durable columnar storage — backup degrades to a partition-pruned
``events_df.write.parquet(dest)`` per new range, which distributes; the
driver-side path here mirrors the reference's range-archive protocol so
backups round-trip bit-exactly.
"""

from __future__ import annotations

import gzip
import json
import os
import re

import pyarrow.parquet as pq
from pyspark.sql import SparkSession

from . import drisl, zstd_compat
from .module import BasicModuleDef
from .stream import Stream, StreamError
from .types import Event

# {start}-{end}.events.drisl.zstd (reference EVENTS_ARCHIVE_EXT,
# storage.rs:46) or the legacy parquet container from earlier rounds.
_RANGE_RE = re.compile(r"^(\d+)-(\d+)\.events\.(drisl\.zstd|parquet)$")


def _meta_path(backup_dir: str) -> str:
    return os.path.join(backup_dir, "metadata.json")


def _load_meta(backup_dir: str) -> dict | None:
    p = _meta_path(backup_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def backup_stream(stream: Stream, backup_dir: str) -> dict:
    """Incremental backup: export events beyond the last backed-up idx as one
    new range archive, the module blob (if changed), and a fresh state
    snapshot. Returns the updated metadata doc. Safe to call on a timer —
    a no-change call writes nothing new (reference 60 s loop,
    storage.rs:1121-1128)."""
    os.makedirs(os.path.join(backup_dir, "events"), exist_ok=True)
    meta = _load_meta(backup_dir) or {
        "stream_did": stream.stream_did,
        "latest_idx": 0,
        "module_cid": None,
        "ranges": [],
    }
    if meta["stream_did"] != stream.stream_did:
        raise StreamError(
            f"backup dir {backup_dir} belongs to {meta['stream_did']}"
        )

    with stream._lock:
        latest = stream.state.latest_idx
        lo = meta["latest_idx"] + 1
        if latest >= lo:
            events = stream.raw_get_events(lo, latest)
            _write_range(backup_dir, events)
            meta["ranges"].append([lo, latest])
            meta["latest_idx"] = latest

        if stream.module is not None and meta["module_cid"] != stream.state.module_cid:
            cid = stream.module.cid()
            blob = zstd_compat.compress(drisl.encode(stream.module.to_codec()))
            with open(
                os.path.join(backup_dir, f"{cid}.module.drisl.zstd"), "wb"
            ) as f:
                f.write(blob)
            meta["module_cid"] = cid

        _snapshot_state(stream, backup_dir)

    # reference StreamMetadata doc (storage.rs:708-719): stream identity for
    # any restorer; the json below is our backup-cursor record (DB columns in
    # the reference, storage.rs:680-699).
    with open(os.path.join(backup_dir, "metadata.drisl"), "wb") as f:
        f.write(
            drisl.encode(
                {
                    "did": meta["stream_did"],
                    "did_key": None,
                    "owners": [],
                    "module_cid": meta["module_cid"],
                }
            )
        )
    tmp = _meta_path(backup_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(backup_dir))
    return meta


def _write_range(backup_dir: str, events: list[Event]) -> None:
    """Reference EventArchive layout (storage.rs:757-764): zstd frame around
    DRISL of ``{"events": [...]}``, named ``{start}-{end}.events.drisl.zstd``
    with unpadded idx bounds exactly like the reference filenames."""
    archive = {
        "events": [
            {
                "idx": e.idx,
                "user": e.user,
                "payload": e.payload,
                "signature": e.signature or b"",
            }
            for e in events
        ]
    }
    path = os.path.join(
        backup_dir,
        "events",
        f"{events[0].idx}-{events[-1].idx}.events.drisl.zstd",
    )
    with open(path, "wb") as f:
        f.write(zstd_compat.compress(drisl.encode(archive)))


def _read_range(path: str) -> list[Event]:
    if path.endswith(".events.drisl.zstd"):
        archive = drisl.decode(zstd_compat.decompress(_read_file(path)))
        return [
            Event(
                int(e["idx"]),
                str(e["user"]),
                bytes(e["payload"]),
                bytes(e["signature"] or b""),
            )
            for e in archive["events"]
        ]
    t = pq.read_table(path)  # legacy parquet archives from earlier rounds
    return [
        Event(
            int(r["idx"]),
            str(r["user"]),
            bytes(r["payload"]),
            bytes(r["signature"] or b""),
        )
        for r in t.to_pylist()
    ]


def _read_file(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()


def _snapshot_state(stream: Stream, backup_dir: str) -> None:
    """≈ VACUUM INTO: state tables are not replay-recoverable, so snapshot
    their current rows (storage.rs:743-771).

    Written with ``df.write.parquet`` from executors — a large materialized
    state table never lands on the driver (each ``{name}.parquet`` entry is
    a parquet directory, scannable by Spark and pyarrow alike)."""
    state_dir = os.path.join(backup_dir, "state")
    names = stream.store.state_tables()
    if not names:
        return
    os.makedirs(state_dir, exist_ok=True)
    for name in names:
        (
            stream.store.tables[name]
            .write.mode("overwrite")
            .option("compression", "zstd")
            .parquet(os.path.join(state_dir, f"{name}.parquet"))
        )


def validate_backup(backup_dir: str) -> dict:
    """Check the archive set is contiguous from idx 1 through
    metadata.latest_idx (reference restore validation, storage.rs:868-930).
    Returns the metadata doc; raises StreamError on gaps/mismatch."""
    meta = _load_meta(backup_dir)
    if meta is None:
        raise StreamError(f"no backup metadata in {backup_dir}")
    ev_dir = os.path.join(backup_dir, "events")
    found: list[tuple[int, int]] = []
    if os.path.isdir(ev_dir):
        for fn in os.listdir(ev_dir):
            m = _RANGE_RE.match(fn)
            if m:
                found.append((int(m.group(1)), int(m.group(2))))
    found.sort()
    expect = 1
    for lo, hi in found:
        if lo != expect or hi < lo:
            raise StreamError(
                f"backup range gap: expected range starting at {expect}, found {lo}-{hi}"
            )
        expect = hi + 1
    if expect - 1 != meta["latest_idx"]:
        raise StreamError(
            f"backup covers 1-{expect - 1} but metadata.latest_idx={meta['latest_idx']}"
        )
    if meta["latest_idx"] > 0 and meta["module_cid"]:
        cid = meta["module_cid"]
        if not any(
            os.path.exists(os.path.join(backup_dir, fn))
            for fn in (f"{cid}.module.drisl.zstd", f"module_{cid}.drisl.gz")
        ):
            raise StreamError(f"module blob missing for cid {cid}")
    return meta


def _load_module_blob(backup_dir: str, cid: str) -> bytes:
    """Decompressed module codec bytes — reference zstd layout first, then
    the legacy gzip name from earlier rounds."""
    p = os.path.join(backup_dir, f"{cid}.module.drisl.zstd")
    if os.path.exists(p):
        return zstd_compat.decompress(_read_file(p))
    return gzip.decompress(_read_file(os.path.join(backup_dir, f"module_{cid}.drisl.gz")))


def restore_stream(
    spark: SparkSession,
    backup_dir: str,
    root_dir: str,
) -> Stream:
    """Full restore into ``root_dir``: validate ranges → raw-import events in
    order → provide the module (triggers deterministic replay, A6) → load the
    state snapshot (storage.rs:827-1056)."""
    meta = validate_backup(backup_dir)
    stream = Stream(spark, root_dir, meta["stream_did"])
    if stream.state.latest_idx > 0:
        raise StreamError(f"restore target {root_dir} already has events")

    ev_dir = os.path.join(backup_dir, "events")
    if os.path.isdir(ev_dir):
        ranged = []
        for fn in os.listdir(ev_dir):
            m = _RANGE_RE.match(fn)
            if m:
                ranged.append((int(m.group(1)), fn))
        for _, fn in sorted(ranged):  # numeric order, not lexicographic
            stream.raw_import_events(_read_range(os.path.join(ev_dir, fn)))

    if meta["module_cid"]:
        codec = drisl.decode(_load_module_blob(backup_dir, meta["module_cid"]))
        module = BasicModuleDef.from_codec(codec)
        if module.cid() != meta["module_cid"]:
            raise StreamError(
                f"module blob cid mismatch: {module.cid()} != {meta['module_cid']}"
            )
        stream.state.module_cid = module.cid()  # restore recorded identity
        stream.provide_module(module)  # replays the imported log (A6)
        _restore_state(spark, stream, backup_dir)
    return stream


def _restore_state(spark: SparkSession, stream: Stream, backup_dir: str) -> None:
    state_dir = os.path.join(backup_dir, "state")
    if not os.path.isdir(state_dir):
        return
    for fn in sorted(os.listdir(state_dir)):
        if not fn.endswith(".parquet"):
            continue
        name = fn[: -len(".parquet")]
        if name not in stream.store.defs or not stream.store.defs[name].is_state:
            continue  # snapshot of a table the current module doesn't define
        tdef = stream.store.defs[name]
        # distributed read (the snapshot is a parquet directory)
        df = spark.read.schema(tdef.schema).parquet(os.path.join(state_dir, fn))
        stream.store.mutated(name, df)
    stream.store.checkpoint_all()
