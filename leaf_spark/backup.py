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
- **Object-store transport** (r12): every entry point takes a destination
  that may be a plain path, a ``file://`` URL, any ``scheme://`` URL
  resolvable by ``fsspec`` (when installed — no bucket names are baked
  in), or an explicit filesystem object via ``fs=`` implementing the
  fsspec core surface (``open/exists/isdir/ls/makedirs/mv``). The
  reference's 60 s incremental cadence (storage.rs:1121-1136) ships as
  ``BackupDaemon``.

Scale note: archives are written driver-side (an event batch fits in driver
memory, like the reference's per-range archives). At 100 TB the event log is
already durable columnar storage — backup degrades to a partition-pruned
``events_df.write.parquet(dest)`` per new range, which distributes; the
driver-side path here mirrors the reference's range-archive protocol so
backups round-trip bit-exactly. State snapshots write from executors when
the destination is local; on a remote filesystem they stage to a local
temp dir and upload per file (state tables are bounded working state, not
the log).
"""

from __future__ import annotations

import gzip
import io
import json
import os
import posixpath
import re
import shutil
import tempfile
import threading
import time

import pyarrow.parquet as pq
from pyspark.sql import SparkSession

from . import drisl, zstd_compat
from .module import BasicModuleDef
from .stream import Stream, StreamError
from .types import Event

# {start}-{end}.events.drisl.zstd (reference EVENTS_ARCHIVE_EXT,
# storage.rs:46) or the legacy parquet container from earlier rounds.
_RANGE_RE = re.compile(r"^(\d+)-(\d+)\.events\.(drisl\.zstd|parquet)$")


# ---------------------------------------------------------------------------
# filesystem abstraction (fsspec core surface; no hard fsspec dependency)
# ---------------------------------------------------------------------------


class LocalFileSystem:
    """The default transport: plain local paths (and ``file://`` URLs).
    Implements the same core surface fsspec's AbstractFileSystem exposes,
    so any real fsspec filesystem is a drop-in via ``fs=``."""

    is_local = True

    def open(self, path: str, mode: str = "rb"):
        if "w" in mode:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        return open(path, mode)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def ls(self, path: str, detail: bool = False) -> list[str]:
        return [os.path.join(path, n) for n in os.listdir(path)]

    def makedirs(self, path: str, exist_ok: bool = True) -> None:
        os.makedirs(path, exist_ok=exist_ok)

    def mv(self, src: str, dst: str) -> None:
        os.replace(src, dst)


class MemoryFileSystem:
    """In-memory filesystem with the same core surface — the test double
    for object-store destinations (and a useful scratch target). Paths
    are POSIX-style; directories are implicit like an object store."""

    is_local = False

    def __init__(self):
        self.files: dict[str, bytes] = {}
        self._dirs: set[str] = set()

    def _norm(self, path: str) -> str:
        return path.rstrip("/")

    def open(self, path: str, mode: str = "rb"):
        path = self._norm(path)
        if "r" in mode and "w" not in mode:
            if path not in self.files:
                raise FileNotFoundError(path)
            data = self.files[path]
            return io.BytesIO(data) if "b" in mode else io.StringIO(
                data.decode("utf-8")
            )
        fs = self

        class _Writer(io.BytesIO):
            def close(self) -> None:
                fs.files[path] = self.getvalue()
                super().close()

        class _TextWriter(io.StringIO):
            def close(self) -> None:
                fs.files[path] = self.getvalue().encode("utf-8")
                super().close()

        return _Writer() if "b" in mode else _TextWriter()

    def exists(self, path: str) -> bool:
        path = self._norm(path)
        return path in self.files or self.isdir(path)

    def isdir(self, path: str) -> bool:
        path = self._norm(path)
        pfx = path + "/"
        return path in self._dirs or any(k.startswith(pfx) for k in self.files)

    def ls(self, path: str, detail: bool = False) -> list[str]:
        path = self._norm(path)
        pfx = path + "/"
        names = {
            pfx + k[len(pfx):].split("/", 1)[0]
            for k in list(self.files) + sorted(self._dirs)
            if k != path and k.startswith(pfx)
        }
        return sorted(names)

    def makedirs(self, path: str, exist_ok: bool = True) -> None:
        self._dirs.add(self._norm(path))

    def mv(self, src: str, dst: str) -> None:
        self.files[self._norm(dst)] = self.files.pop(self._norm(src))


def _resolve_fs(dest: str, fs=None) -> tuple[object, str]:
    """(filesystem, path) for a destination that is a plain path, a
    ``file://`` URL, an fsspec-resolvable URL, or pre-resolved ``fs=``."""
    if fs is not None:
        # strip a scheme the caller left on the path (fsspec convention)
        if "://" in dest:
            dest = dest.split("://", 1)[1]
        return fs, dest
    if dest.startswith("file://"):
        return LocalFileSystem(), dest[len("file://"):]
    if "://" in dest:
        try:
            import fsspec  # optional dependency — never hard-required
        except ImportError as ex:
            raise StreamError(
                f"destination {dest!r} needs the fsspec package (or pass "
                "an explicit fs= filesystem object)"
            ) from ex
        f, path = fsspec.core.url_to_fs(dest)
        return f, path

    return LocalFileSystem(), dest


def _is_local(fs) -> bool:
    if getattr(fs, "is_local", False):
        return True
    # real fsspec LocalFileSystem advertises the "file" protocol
    proto = getattr(fs, "protocol", None)
    if isinstance(proto, (list, tuple)):
        return "file" in proto
    return proto == "file"


def _basenames(fs, path: str) -> list[str]:
    if not fs.isdir(path):
        return []
    return [posixpath.basename(p.rstrip("/")) for p in fs.ls(path, detail=False)]


def _meta_path(backup_dir: str) -> str:
    return posixpath.join(backup_dir, "metadata.json")


def _load_meta(fs, backup_dir: str) -> dict | None:
    p = _meta_path(backup_dir)
    if not fs.exists(p):
        return None
    with fs.open(p, "rb") as f:
        return json.loads(f.read().decode("utf-8"))


def _save_meta(fs, backup_dir: str, meta: dict) -> None:
    p = _meta_path(backup_dir)
    if _is_local(fs):
        # local rename is the atomic commit point
        tmp = p + ".tmp"
        with fs.open(tmp, "wb") as f:
            f.write(json.dumps(meta).encode("utf-8"))
        fs.mv(tmp, p)
    else:
        # a single object PUT is atomic on every real object store
        with fs.open(p, "wb") as f:
            f.write(json.dumps(meta).encode("utf-8"))


def backup_stream(stream: Stream, backup_dir: str, fs=None) -> dict:
    """Incremental backup: export events beyond the last backed-up idx as one
    new range archive, the module blob (if changed), and a fresh state
    snapshot. Returns the updated metadata doc. Safe to call on a timer —
    a no-change call writes nothing new (reference 60 s loop,
    storage.rs:1121-1128). ``backup_dir`` may be a path, a URL, or a path
    on an explicit ``fs=`` filesystem."""
    fs, backup_dir = _resolve_fs(backup_dir, fs)
    fs.makedirs(posixpath.join(backup_dir, "events"), exist_ok=True)
    meta = _load_meta(fs, backup_dir) or {
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
        changed = latest >= lo
        if changed:
            events = stream.raw_get_events(lo, latest)
            _write_range(fs, backup_dir, events)
            meta["ranges"].append([lo, latest])
            meta["latest_idx"] = latest

        if stream.module is not None and meta["module_cid"] != stream.state.module_cid:
            cid = stream.module.cid()
            blob = zstd_compat.compress(drisl.encode(stream.module.to_codec()))
            with fs.open(
                posixpath.join(backup_dir, f"{cid}.module.drisl.zstd"), "wb"
            ) as f:
                f.write(blob)
            meta["module_cid"] = cid
            changed = True

        if changed or not fs.isdir(posixpath.join(backup_dir, "state")):
            # state refresh rides the same cadence as new events — an
            # unchanged log cannot have changed materialized state
            _snapshot_state(fs, stream, backup_dir)

    # reference StreamMetadata doc (storage.rs:708-719): stream identity for
    # any restorer; the json below is our backup-cursor record (DB columns in
    # the reference, storage.rs:680-699).
    with fs.open(posixpath.join(backup_dir, "metadata.drisl"), "wb") as f:
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
    _save_meta(fs, backup_dir, meta)
    return meta


def _write_range(fs, backup_dir: str, events: list[Event]) -> None:
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
    path = posixpath.join(
        backup_dir,
        "events",
        f"{events[0].idx}-{events[-1].idx}.events.drisl.zstd",
    )
    with fs.open(path, "wb") as f:
        f.write(zstd_compat.compress(drisl.encode(archive)))


def _read_range(fs, path: str) -> list[Event]:
    if path.endswith(".events.drisl.zstd"):
        archive = drisl.decode(zstd_compat.decompress(_read_file(fs, path)))
        return [
            Event(
                int(e["idx"]),
                str(e["user"]),
                bytes(e["payload"]),
                bytes(e["signature"] or b""),
            )
            for e in archive["events"]
        ]
    # legacy parquet archives from earlier rounds
    t = pq.read_table(io.BytesIO(_read_file(fs, path)))
    return [
        Event(
            int(r["idx"]),
            str(r["user"]),
            bytes(r["payload"]),
            bytes(r["signature"] or b""),
        )
        for r in t.to_pylist()
    ]


def _read_file(fs, path: str) -> bytes:
    with fs.open(path, "rb") as f:
        return f.read()


def _snapshot_state(fs, stream: Stream, backup_dir: str) -> None:
    """≈ VACUUM INTO: state tables are not replay-recoverable, so snapshot
    their current rows (storage.rs:743-771).

    Local destination: written with ``df.write.parquet`` from executors —
    a large materialized state table never lands on the driver. Remote
    destination: staged to a local temp dir the same way, then uploaded
    file-by-file (state tables are bounded working state)."""
    state_dir = posixpath.join(backup_dir, "state")
    names = stream.store.state_tables()
    if not names:
        return
    if _is_local(fs):
        fs.makedirs(state_dir, exist_ok=True)
        for name in names:
            (
                stream.store.tables[name]
                .write.mode("overwrite")
                .option("compression", "zstd")
                .parquet(os.path.join(state_dir, f"{name}.parquet"))
            )
        return
    stage = tempfile.mkdtemp(prefix="leaf_backup_state_")
    try:
        fs.makedirs(state_dir, exist_ok=True)
        for name in names:
            local = os.path.join(stage, f"{name}.parquet")
            (
                stream.store.tables[name]
                .write.mode("overwrite")
                .option("compression", "zstd")
                .parquet(local)
            )
            remote = posixpath.join(state_dir, f"{name}.parquet")
            for fn in os.listdir(local):
                if fn.startswith(("_", ".")):
                    continue  # _SUCCESS / .crc sidecars
                with open(os.path.join(local, fn), "rb") as src, fs.open(
                    posixpath.join(remote, fn), "wb"
                ) as dst:
                    shutil.copyfileobj(src, dst)
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def validate_backup(backup_dir: str, fs=None) -> dict:
    """Check the archive set is contiguous from idx 1 through
    metadata.latest_idx (reference restore validation, storage.rs:868-930).
    Returns the metadata doc; raises StreamError on gaps/mismatch."""
    fs, backup_dir = _resolve_fs(backup_dir, fs)
    meta = _load_meta(fs, backup_dir)
    if meta is None:
        raise StreamError(f"no backup metadata in {backup_dir}")
    ev_dir = posixpath.join(backup_dir, "events")
    found: list[tuple[int, int]] = []
    for fn in _basenames(fs, ev_dir):
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
            fs.exists(posixpath.join(backup_dir, fn))
            for fn in (f"{cid}.module.drisl.zstd", f"module_{cid}.drisl.gz")
        ):
            raise StreamError(f"module blob missing for cid {cid}")
    return meta


def _load_module_blob(fs, backup_dir: str, cid: str) -> bytes:
    """Decompressed module codec bytes — reference zstd layout first, then
    the legacy gzip name from earlier rounds."""
    p = posixpath.join(backup_dir, f"{cid}.module.drisl.zstd")
    if fs.exists(p):
        return zstd_compat.decompress(_read_file(fs, p))
    return gzip.decompress(
        _read_file(fs, posixpath.join(backup_dir, f"module_{cid}.drisl.gz"))
    )


def restore_stream(
    spark: SparkSession,
    backup_dir: str,
    root_dir: str,
    fs=None,
) -> Stream:
    """Full restore into ``root_dir``: validate ranges → raw-import events in
    order → provide the module (triggers deterministic replay, A6) → load the
    state snapshot (storage.rs:827-1056). ``backup_dir`` may live on any
    filesystem; ``root_dir`` is always local (it becomes the live stream)."""
    fs, backup_dir = _resolve_fs(backup_dir, fs)
    meta = validate_backup(backup_dir, fs=fs)
    stream = Stream(spark, root_dir, meta["stream_did"])
    if stream.state.latest_idx > 0:
        raise StreamError(f"restore target {root_dir} already has events")

    ev_dir = posixpath.join(backup_dir, "events")
    ranged = []
    for fn in _basenames(fs, ev_dir):
        m = _RANGE_RE.match(fn)
        if m:
            ranged.append((int(m.group(1)), fn))
    for _, fn in sorted(ranged):  # numeric order, not lexicographic
        stream.raw_import_events(_read_range(fs, posixpath.join(ev_dir, fn)))

    if meta["module_cid"]:
        codec = drisl.decode(_load_module_blob(fs, backup_dir, meta["module_cid"]))
        module = BasicModuleDef.from_codec(codec)
        if module.cid() != meta["module_cid"]:
            raise StreamError(
                f"module blob cid mismatch: {module.cid()} != {meta['module_cid']}"
            )
        stream.state.module_cid = module.cid()  # restore recorded identity
        stream.provide_module(module)  # replays the imported log (A6)
        _restore_state(spark, stream, backup_dir, fs)
    return stream


def _restore_state(
    spark: SparkSession, stream: Stream, backup_dir: str, fs
) -> None:
    state_dir = posixpath.join(backup_dir, "state")
    if not fs.isdir(state_dir):
        return
    stage = None
    try:
        for fn in sorted(_basenames(fs, state_dir)):
            if not fn.endswith(".parquet"):
                continue
            name = fn[: -len(".parquet")]
            if name not in stream.store.defs or not stream.store.defs[name].is_state:
                continue  # snapshot of a table the current module doesn't define
            tdef = stream.store.defs[name]
            src = posixpath.join(state_dir, fn)
            if not _is_local(fs):
                # stage the parquet directory locally for the distributed read
                if stage is None:
                    stage = tempfile.mkdtemp(prefix="leaf_restore_state_")
                local = os.path.join(stage, fn)
                os.makedirs(local, exist_ok=True)
                for part in _basenames(fs, src):
                    with fs.open(posixpath.join(src, part), "rb") as rf, open(
                        os.path.join(local, part), "wb"
                    ) as wf:
                        shutil.copyfileobj(rf, wf)
                src = local
            # distributed read (the snapshot is a parquet directory)
            df = spark.read.schema(tdef.schema).parquet(src)
            if stage is not None and src.startswith(stage):
                # the staged files are deleted below — pin the rows first
                df = df.localCheckpoint(eager=True)
            stream.store.mutated(name, df)
        stream.store.checkpoint_all()
    finally:
        if stage is not None:
            shutil.rmtree(stage, ignore_errors=True)


class BackupDaemon:
    """The reference's periodic incremental backup loop
    (storage.rs:1121-1136: a 60 s tokio interval calling backup_stream;
    errors are logged and the loop continues). ``start()`` returns self;
    ``stop()`` joins the thread. ``run_once()`` is the testable body."""

    def __init__(
        self,
        stream: Stream,
        backup_dir: str,
        fs=None,
        interval: float = 60.0,
    ):
        self.stream = stream
        self.backup_dir = backup_dir
        self.fs = fs
        self.interval = interval
        self.runs = 0
        self.errors: list[str] = []
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def run_once(self) -> dict | None:
        try:
            meta = backup_stream(self.stream, self.backup_dir, fs=self.fs)
            self.runs += 1
            return meta
        except Exception as ex:  # keep the cadence (reference logs + continues)
            self.errors.append(f"{type(ex).__name__}: {ex}")
            return None

    def _loop(self) -> None:
        while not self._stop.wait(self.interval):
            self.run_once()

    def start(self) -> "BackupDaemon":
        if self._thread is not None:
            return self
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
