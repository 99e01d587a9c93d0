"""A21 backup/export/restore round-trip tests (reference
leaf-server/src/storage.rs:635-1056): incremental range archives, module
blob, state snapshot, contiguity validation, full restore + replay."""

import os

import pytest

from leaf_spark.backup import backup_stream, restore_stream, validate_backup
from leaf_spark.stream import Stream, StreamError
from leaf_spark.types import LeafQuery

from .fixtures import CHAT, marker, msg


@pytest.fixture()
def backed_up(spark, tmp_path):
    root = str(tmp_path / "live")
    bdir = str(tmp_path / "bak")
    s = Stream(spark, root, "did:plc:bak")
    s.provide_module(CHAT)
    s.add_events([msg("did:plc:alice", "one", 100), msg("did:plc:bob", "two", 105)])
    backup_stream(s, bdir)
    s.add_events([msg("did:plc:alice", "three", 110)])
    s.add_state_events([marker("did:plc:alice", 2)])
    backup_stream(s, bdir)
    return s, bdir, tmp_path


def test_incremental_ranges_are_contiguous(backed_up):
    _, bdir, _ = backed_up
    meta = validate_backup(bdir)
    assert meta["latest_idx"] == 3
    assert meta["ranges"] == [[1, 2], [3, 3]]
    names = sorted(os.listdir(os.path.join(bdir, "events")))
    # reference EVENTS_ARCHIVE_EXT naming (storage.rs:46,764)
    assert names == [
        "1-2.events.drisl.zstd",
        "3-3.events.drisl.zstd",
    ]


def test_archive_bytes_match_reference_layout(backed_up):
    """zstd(drisl({"events": [...]})) — EventArchive, storage.rs:757-764."""
    from leaf_spark import drisl, zstd_compat

    _, bdir, _ = backed_up
    raw = open(os.path.join(bdir, "events", "1-2.events.drisl.zstd"), "rb").read()
    assert raw[:4] == bytes.fromhex("28b52ffd")  # zstd frame magic
    archive = drisl.decode(zstd_compat.decompress(raw))
    assert set(archive) == {"events"}
    assert [e["idx"] for e in archive["events"]] == [1, 2]
    assert set(archive["events"][0]) == {"idx", "user", "payload", "signature"}
    assert isinstance(archive["events"][0]["payload"], bytes)


def test_metadata_drisl_doc(backed_up):
    """StreamMetadata doc fields — storage.rs:708-719,1075-1081."""
    from leaf_spark import drisl

    s, bdir, _ = backed_up
    doc = drisl.decode(open(os.path.join(bdir, "metadata.drisl"), "rb").read())
    assert doc["did"] == "did:plc:bak"
    assert doc["module_cid"] == s.module.cid()
    assert doc["did_key"] is None and doc["owners"] == []


def test_restore_reads_legacy_parquet_ranges(spark, backed_up, tmp_path):
    """Archives written by earlier rounds (parquet container) still restore."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from leaf_spark.stream import _ARROW_SCHEMA

    s, bdir, _ = backed_up
    ev_dir = os.path.join(bdir, "events")
    path = os.path.join(ev_dir, "1-2.events.drisl.zstd")
    events = [e for e in s.raw_get_events(1, 2)]
    os.remove(path)
    t = pa.Table.from_pydict(
        {
            "idx": [e.idx for e in events],
            "user": [e.user for e in events],
            "payload": [e.payload for e in events],
            "signature": [e.signature for e in events],
        },
        schema=_ARROW_SCHEMA,
    )
    pq.write_table(t, os.path.join(ev_dir, "000000000001-000000000002.events.parquet"))
    r = restore_stream(spark, bdir, str(tmp_path / "legacy"))
    assert r.raw_get_events() == s.raw_get_events()


def test_noop_backup_writes_no_new_range(backed_up):
    s, bdir, _ = backed_up
    before = sorted(os.listdir(os.path.join(bdir, "events")))
    meta = backup_stream(s, bdir)
    assert sorted(os.listdir(os.path.join(bdir, "events"))) == before
    assert meta["latest_idx"] == 3


def test_restore_round_trips_events_queries_and_state(spark, backed_up):
    s, bdir, tmp_path = backed_up
    r = restore_stream(spark, bdir, str(tmp_path / "restored"))
    assert [e.idx for e in r.raw_get_events()] == [1, 2, 3]
    assert r.raw_get_events() == s.raw_get_events()  # signatures included
    assert r.query(None, LeafQuery("messages")) == s.query(None, LeafQuery("messages"))
    # state snapshot survived (not replay-recoverable)
    unread = r.query("did:plc:alice", LeafQuery("my_unread"))
    assert unread[0]["unread"] == 1


def test_restore_rejects_gap(backed_up, spark, tmp_path):
    _, bdir, _ = backed_up
    os.remove(os.path.join(bdir, "events", "1-2.events.drisl.zstd"))
    with pytest.raises(StreamError, match="gap"):
        restore_stream(spark, bdir, str(tmp_path / "r2"))


def test_backup_dir_is_stream_scoped(spark, backed_up, tmp_path):
    _, bdir, _ = backed_up
    other = Stream(spark, str(tmp_path / "other"), "did:plc:other")
    other.provide_module(CHAT)
    with pytest.raises(StreamError, match="belongs to"):
        backup_stream(other, bdir)
