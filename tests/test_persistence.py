"""Persistent materialized state across process restarts (VERDICT missing #2).

The reference keeps module_<cid>.db + state.db files per stream
(leaf-server/src/streams.rs:101-150); here the equivalent is a versioned
parquet snapshot + fold cursor. Reopening a stream must restore tables from
the snapshot WITHOUT re-folding the log (assert zero fold calls), while full
replay stays available as the recovery path.
"""

import pytest

from leaf_spark.stream import Stream
from leaf_spark.types import LeafQuery

from .fixtures import CHAT, COUNTER, bump, marker, msg


def _no_fold(*a, **k):
    raise AssertionError("fold ran during snapshot-based reopen")


class TestSnapshotReopen:
    def test_reopen_without_refolding(self, spark, tmp_root, monkeypatch):
        s = Stream(spark, tmp_root, "did:plc:persist")
        s.provide_module(CHAT)
        s.add_events([msg("a", "m1", 1), msg("b", "m2", 2)])
        s.add_state_events([marker("a", 1)])
        s.persist_state()
        expect = s.query(None, LeafQuery("messages"))

        s2 = Stream(spark, tmp_root, "did:plc:persist")
        monkeypatch.setattr(Stream, "_fold_df", _no_fold)
        s2.provide_module(CHAT)  # must load the snapshot, fold nothing
        assert s2.query(None, LeafQuery("messages")) == expect
        # state.* tables persist too (reference state.db is a durable file)
        assert s2.query("a", LeafQuery("my_unread"))[0]["unread"] == 1

    def test_reopen_replays_only_tail(self, spark, tmp_root):
        s = Stream(spark, tmp_root, "did:plc:persist2")
        s.provide_module(COUNTER)
        s.add_events([bump("u", "x", 1), bump("u", "x", 10)])
        s.persist_state()
        # events past the snapshot cursor…
        s.add_events([bump("u", "x", 100)])

        s2 = Stream(spark, tmp_root, "did:plc:persist2")
        folded = []
        orig = Stream._fold_df

        def counting(self, events, *a, **k):
            folded.append([r["idx"] for r in events.select("idx").collect()])
            return orig(self, events, *a, **k)

        import unittest.mock as mock

        with mock.patch.object(Stream, "_fold_df", counting):
            s2.provide_module(COUNTER)
        # only idx 3 (the tail) refolds — not 1 and 2
        assert folded == [[3]]
        assert s2.query(None, LeafQuery("counters")) == [
            {"name": "x", "value": 111}
        ]

    def test_auto_snapshot_interval(self, spark, tmp_root):
        s = Stream(spark, tmp_root, "did:plc:persist3", snapshot_every=2)
        s.provide_module(CHAT)
        s.add_events([msg("a", "m1", 1), msg("a", "m2", 2)])  # hits interval
        import os

        assert os.path.exists(s._snapshot_manifest_path())

        s2 = Stream(spark, tmp_root, "did:plc:persist3")
        s2.provide_module(CHAT)
        assert len(s2.query(None, LeafQuery("messages"))) == 2

    def test_module_swap_invalidates_snapshot(self, spark, tmp_root):
        s = Stream(spark, tmp_root, "did:plc:persist4")
        s.provide_module(COUNTER)
        s.add_events([bump("u", "x", 1)])
        s.persist_state()
        s.update_module(COUNTER)  # swap resets cursor + drops snapshot
        import os

        assert not os.path.exists(s._snapshot_manifest_path())
        assert s.query(None, LeafQuery("counters")) == [{"name": "x", "value": 1}]

    def test_full_replay_still_works_without_snapshot(self, spark, tmp_root):
        s = Stream(spark, tmp_root, "did:plc:persist5")
        s.provide_module(CHAT)
        s.add_events([msg("a", "m1", 1)])
        # no persist_state() → reopen falls back to full replay
        s2 = Stream(spark, tmp_root, "did:plc:persist5")
        s2.provide_module(CHAT)
        assert len(s2.query(None, LeafQuery("messages"))) == 1

    def test_clear_state_is_durable(self, spark, tmp_root):
        s = Stream(spark, tmp_root, "did:plc:persist6")
        s.provide_module(CHAT)
        s.add_events([msg("a", "m1", 1), msg("a", "m2", 2)])
        s.add_state_events([marker("a", 2)])
        s.persist_state()
        s.clear_state()
        s2 = Stream(spark, tmp_root, "did:plc:persist6")
        s2.provide_module(CHAT)
        # the marker must NOT come back from the snapshot
        assert s2.query("a", LeafQuery("my_unread"))[0]["unread"] == 2


class TestCrashedPersistLeftovers:
    def test_stale_parts_from_crashed_attempt_are_cleared(
        self, spark, tmp_root
    ):
        """A persist that crashes AFTER writing table parts but BEFORE
        the manifest rename never advances seq — the next persist reuses
        the same v<seq> dir and must not merge the crashed attempt's
        files with its own (advice r9: the pyarrow fast path lacked the
        Spark writer's mode('overwrite') clearing)."""
        import os
        import shutil

        s = Stream(spark, tmp_root, "did:plc:crashp")
        s.provide_module(CHAT)
        s.add_events([msg("a", "m1", 1), msg("b", "m2", 2)])
        s.persist_state()  # seq 1

        # simulate the crashed attempt: v000002/messages already holds a
        # part file (copy of v1's data) with a non-colliding name
        base = s._snapshot_base()
        stale_dir = os.path.join(base, "v000002", "messages")
        os.makedirs(stale_dir, exist_ok=True)
        src_dir = os.path.join(base, "v000001", "messages")
        part = next(
            f for f in os.listdir(src_dir) if f.endswith(".parquet")
        )
        shutil.copy(
            os.path.join(src_dir, part),
            os.path.join(stale_dir, "part-stale.parquet"),
        )

        s.add_events([msg("a", "m3", 3), msg("b", "m4", 4)])
        s.persist_state()  # seq 2 — reuses v000002

        s2 = Stream(spark, tmp_root, "did:plc:crashp")
        s2.provide_module(CHAT)  # snapshot restore, no refold
        rows = s2.query(None, LeafQuery("messages"))
        assert [r["content"] for r in rows] == ["m1", "m2", "m3", "m4"]
