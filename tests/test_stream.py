"""End-to-end Stream engine tests — chat fixture golden assertions
(FIXTURES.md F2), atomicity, replay, state namespace, module swap, raw
import/export, per-event fold fallback."""

import pytest

from leaf_spark import drisl
from leaf_spark.stream import BatchRejected, Stream
from leaf_spark.types import Event, IncomingEvent, LeafQuery, SqlValue

from .fixtures import CHAT, COUNTER, bump, marker, msg


@pytest.fixture(scope="module")
def chat_stream(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("chatstream"))
    s = Stream(spark, root, "did:plc:chat")
    s.provide_module(CHAT)
    s.add_events(
        [
            msg("did:plc:alice", "hello", 100),
            msg("did:plc:bob", "hi alice", 105),
            msg("did:plc:alice", "how goes", 110),
        ]
    )
    return s


class TestChatFixture:
    def test_materialized_rowcount_matches_accepted(self, chat_stream):
        rows = chat_stream.query(None, LeafQuery("messages"))
        assert [r["idx"] for r in rows] == [1, 2, 3]
        assert rows[0] == {
            "idx": 1,
            "sender": "did:plc:alice",
            "content": "hello",
            "sent_at": 100,
        }

    def test_rejected_batch_is_atomic(self, chat_stream):
        before = chat_stream.state.latest_idx
        with pytest.raises(BatchRejected, match="missing content"):
            chat_stream.add_events(
                [
                    msg("did:plc:bob", "ok", 120),
                    IncomingEvent("did:plc:bob", drisl.encode({"nope": 1})),
                ]
            )
        assert chat_stream.state.latest_idx == before
        assert len(chat_stream.query(None, LeafQuery("messages"))) == before

    def test_typed_param_query(self, chat_stream):
        rows = chat_stream.query(
            None,
            LeafQuery("messages_by_sender", {"sender": SqlValue.of("did:plc:alice")}),
        )
        assert [r["content"] for r in rows] == ["hello", "how goes"]

    def test_pagination_concat_equals_range(self, chat_stream):
        p1 = chat_stream.query(None, LeafQuery("messages", start=1, limit=2))
        p2 = chat_stream.query(None, LeafQuery("messages", start=3, limit=2))
        assert [r["idx"] for r in p1 + p2] == [1, 2, 3]

    def test_state_events_and_requesting_user(self, chat_stream):
        chat_stream.add_state_events([marker("did:plc:alice", 2)])
        unread_alice = chat_stream.query("did:plc:alice", LeafQuery("my_unread"))
        unread_bob = chat_stream.query("did:plc:bob", LeafQuery("my_unread"))
        assert unread_alice[0]["unread"] == 1
        assert unread_bob[0]["unread"] == 3

    def test_clear_state_resets(self, chat_stream):
        chat_stream.add_state_events([marker("did:plc:alice", 3)])
        chat_stream.clear_state()
        unread = chat_stream.query("did:plc:alice", LeafQuery("my_unread"))
        assert unread[0]["unread"] == 3  # marker gone

    def test_replay_reproduces_identical_tables(self, spark, chat_stream):
        s2 = Stream(spark, chat_stream.dir.rsplit("/streams/", 1)[0], "did:plc:chat")
        s2.provide_module(CHAT)
        assert s2.query(None, LeafQuery("messages")) == chat_stream.query(
            None, LeafQuery("messages")
        )

    def test_wire_codec(self, chat_stream):
        rows = chat_stream.query(None, LeafQuery("messages", limit=1))
        wire = chat_stream.rows_to_wire(rows)
        assert wire[0]["idx"] == {"$type": "muni.town.sqliteValue.integer", "value": 1}

    def test_raw_range_scan(self, chat_stream):
        evs = chat_stream.raw_get_events(2, 3)
        assert [e.idx for e in evs] == [2, 3]
        assert evs[0].user == "did:plc:bob"

    def test_unknown_query_name(self, chat_stream):
        with pytest.raises(KeyError):
            chat_stream.query(None, LeafQuery("nope"))


class TestModuleLifecycle:
    def test_provide_wrong_cid_rejected(self, spark, tmp_root, monkeypatch):
        s = Stream(spark, tmp_root, "did:plc:swap")
        s.provide_module(CHAT)
        s.add_events([msg("did:plc:alice", "one", 1)])
        from leaf_spark.stream import StreamError

        with pytest.raises(StreamError, match="cid mismatch"):
            s.provide_module(COUNTER)

    def test_update_module_replays_under_new_module(self, spark, tmp_root):
        s = Stream(spark, tmp_root, "did:plc:swap2")
        s.provide_module(COUNTER)
        s.add_events([bump("u", "clicks", 2), bump("u", "clicks", 3), bump("u", "views", 1)])
        rows = s.query(None, LeafQuery("counters"))
        assert rows == [{"name": "clicks", "value": 5}, {"name": "views", "value": 1}]
        # swap to chat module: counters' events lack .content → authorizer
        # does not run on replay (already-committed events), materializer
        # inserts nulls-able content → but content is not null → per the
        # reference, replay errors surface; here we swap back instead:
        s.update_module(COUNTER)
        assert s.query(None, LeafQuery("counters")) == rows  # replay determinism

    def test_counter_per_event_fold(self, spark, tmp_root):
        """COUNTER's UPDATE statement forces the per-event sequential path;
        cumulative semantics must survive batching."""
        s = Stream(spark, tmp_root, "did:plc:counter")
        s.provide_module(COUNTER)
        s.add_events([bump("u", "x", 1)])
        s.add_events([bump("u", "x", 10), bump("u", "x", 100)])
        rows = s.query(None, LeafQuery("counters"))
        assert rows == [{"name": "x", "value": 111}]


class TestRawImportExport:
    def test_roundtrip(self, spark, tmp_root):
        s = Stream(spark, tmp_root, "did:plc:exp")
        s.provide_module(CHAT)
        s.add_events([msg("a", "m1", 1), msg("a", "m2", 2)])
        exported = s.raw_get_events()

        s2 = Stream(spark, tmp_root + "/other", "did:plc:exp")
        s2.raw_import_events(exported)
        s2.provide_module(CHAT)
        assert s2.query(None, LeafQuery("messages")) == s.query(None, LeafQuery("messages"))

    def test_gap_rejected(self, spark, tmp_root):
        s = Stream(spark, tmp_root, "did:plc:gap")
        from leaf_spark.stream import StreamError

        with pytest.raises(StreamError, match="gap"):
            s.raw_import_events([Event(5, "u", b"\xa0", b"")])


class TestAuthorizerPaths:
    """The vectorized (one-pass-over-batch) authorizer and its per-event
    fallback must both enforce rejection."""

    def test_fallback_path_rejects(self, spark, tmp_path):
        from leaf_spark.module import BasicModuleDef, QueryDef

        # top-level WHERE → not provably vectorizable → per-event fallback
        mod = BasicModuleDef(
            init_sql="create table if not exists log (idx integer primary key)",
            authorizer=(
                "select throw('evil user') where (select user from event) = 'did:plc:evil'"
            ),
            materializer="insert into log (idx) select idx from event;",
            queries=(QueryDef("log", "select idx from log order by idx"),),
        )
        s = Stream(spark, str(tmp_path), "did:plc:authpaths")
        s.provide_module(mod)
        assert s._vectorize_auth_stmt(
            "select throw('x') where (select user from event) = 'y'"
        ) is None

        s.add_events([IncomingEvent("did:plc:ok", drisl.encode({"v": 1}))])
        assert s.state.latest_idx == 1
        with pytest.raises(BatchRejected, match="evil user"):
            s.add_events(
                [
                    IncomingEvent("did:plc:ok", drisl.encode({"v": 2})),
                    IncomingEvent("did:plc:evil", drisl.encode({"v": 3})),
                ]
            )
        assert s.state.latest_idx == 1  # whole batch rolled back

    def test_vectorized_path_used_for_chat(self, spark):
        s_check = Stream.__new__(Stream)  # only needs the regex/classifier
        for stmt in [
            "select iif(exists(select 1 from bans where user = (select user from event)), unauthorized('banned user'), 1)",
            "select iif(drisl_exists((select payload from event), '.content'), 1, throw('missing content'))",
        ]:
            assert Stream._vectorize_auth_stmt(s_check, stmt) is not None

    def test_compound_selects_not_vectorized(self, spark):
        """advice r10 low: the appended 'from event' would bind only to
        the LAST arm of a compound select, and event-free earlier arms
        with throw()/unauthorized() would evaluate once per batch instead
        of once per event — compounds must take the per-event path."""
        s_check = Stream.__new__(Stream)
        for stmt in [
            "select 1 union select iif((select user from event) = 'x', throw('a'), 1)",
            "select iif((select user from event) = 'x', throw('a'), 1) union all select 1",
            "select 1 intersect select (select user from event)",
            "select (select user from event) except select 'x'",
            "select 1 union values (2)",
        ]:
            assert Stream._vectorize_auth_stmt(s_check, stmt) is None
        # nested compounds inside a subquery stay vectorizable
        assert Stream._vectorize_auth_stmt(
            s_check,
            "select iif((select user from event) in "
            "(select 'a' union select 'b'), throw('x'), 1)",
        ) is not None

    def test_abort_detail_is_event_major(self, spark, tmp_path):
        """advice r10 low: when multiple (event, statement) pairs would
        abort, the reference reports the FIRST abort in event-major
        order (all statements per event, lib.rs:636-644). stmt1
        (vectorizable) aborts on event 2; stmt2 (per-event path) aborts
        on event 1 — event-major order means stmt2's message wins."""
        from leaf_spark.module import BasicModuleDef, QueryDef

        mod = BasicModuleDef(
            init_sql="create table if not exists log (idx integer primary key)",
            authorizer=(
                "select iif((select user from event) = 'u2', throw('stmt1 abort'), 1); "
                "select throw('stmt2 abort') where (select user from event) = 'u1'"
            ),
            materializer="insert into log (idx) select idx from event;",
            queries=(QueryDef("log", "select idx from log order by idx"),),
        )
        s = Stream(spark, str(tmp_path), "did:plc:evmajor")
        s.provide_module(mod)
        with pytest.raises(BatchRejected, match="stmt2 abort"):
            s.add_events(
                [
                    IncomingEvent("u1", drisl.encode({"v": 1})),
                    IncomingEvent("u2", drisl.encode({"v": 2})),
                ]
            )
        assert s.state.latest_idx == 0

    def test_non_vectorizable_statements_share_one_pass(
        self, spark, tmp_path, monkeypatch
    ):
        """advice r10 low: N non-vectorizable local statements must run
        in ONE authorize() call (one event stage/delete/insert loop
        total), not one call per statement."""
        from leaf_spark import localexec
        from leaf_spark.module import BasicModuleDef, QueryDef

        mod = BasicModuleDef(
            init_sql="create table if not exists log (idx integer primary key)",
            authorizer=(
                "select throw('a') where (select user from event) = 'nobody'; "
                "select throw('b') where (select user from event) = 'nemo'"
            ),
            materializer="insert into log (idx) select idx from event;",
            queries=(QueryDef("log", "select idx from log order by idx"),),
        )
        s = Stream(spark, str(tmp_path), "did:plc:onepass")
        s.provide_module(mod)
        calls = []
        orig = localexec.LocalEval.authorize

        def counting(self, stmts, rows):
            calls.append(list(stmts))
            return orig(self, stmts, rows)

        monkeypatch.setattr(localexec.LocalEval, "authorize", counting)
        s.add_events(
            [IncomingEvent(f"u{i}", drisl.encode({"v": i})) for i in range(3)]
        )
        assert s.state.latest_idx == 3
        assert len(calls) == 1 and len(calls[0]) == 2


class TestLogCompaction:
    def _mk(self, spark, tmp_path, batches=6, per=3):
        s = Stream(spark, str(tmp_path), "did:plc:compact")
        s.provide_module(CHAT)
        n = 0
        for b in range(batches):
            s.add_events([msg("did:plc:u", f"m{b}-{i}", n * 10 + i) for i in range(per)])
            n += 1
        return s

    def test_compact_preserves_events_and_replay(self, spark, tmp_path):
        s = self._mk(spark, tmp_path)
        before = s.raw_get_events()
        nfiles_before = len(s._log_files())
        assert nfiles_before == 6
        merged = s.compact_log(target_bytes=10**9)
        assert merged == 1
        files = s._log_files()
        assert len(files) == 1
        # merged file spans the full committed range, name encodes it
        assert (files[0][0], files[0][1]) == (1, before[-1].idx)
        after = s.raw_get_events()
        assert [(e.idx, e.user, e.payload, e.signature) for e in after] == [
            (e.idx, e.user, e.payload, e.signature) for e in before
        ]
        # replay from the compacted log reproduces the same state
        s2 = Stream(spark, str(tmp_path), "did:plc:compact")
        s2.provide_module(CHAT)
        s2._drop_snapshot()
        s2.catch_up()
        rows = s2.query(None, LeafQuery("messages"))
        assert len(rows) == len(before)

    def test_compact_respects_target_and_grouping(self, spark, tmp_path):
        s = self._mk(spark, tmp_path, batches=5)
        # tiny target → no group reaches min_group size of 2? files are a
        # few KB each; a target below one file's size keeps them separate
        assert s.compact_log(target_bytes=1) == 0
        assert len(s._log_files()) == 5
        # generous target merges everything
        assert s.compact_log(target_bytes=10**9) == 1
        assert len(s._log_files()) == 1
        # idempotent: a single file is never re-merged
        assert s.compact_log(target_bytes=10**9) == 0

    def test_compact_skips_uncommitted_orphans(self, spark, tmp_path):
        import os

        s = self._mk(spark, tmp_path, batches=3)
        # fabricate an orphan beyond the commit point (crash leftover)
        lo = s.state.latest_idx + 1
        orphan = [
            Event(lo, "did:plc:u", b"x", b""),
            Event(lo + 1, "did:plc:u", b"y", b""),
        ]
        s._append_parquet(orphan)
        assert s.compact_log(target_bytes=10**9) == 1
        files = s._log_files()
        # orphan file untouched, committed range merged
        assert len(files) == 2
        assert files[-1][0] == lo
        assert os.path.exists(files[-1][2])

    def test_crash_after_journal_rolls_forward(self, spark, tmp_path):
        import json
        import os
        import shutil

        s = self._mk(spark, tmp_path, batches=4)
        before = [(e.idx, e.payload) for e in s.raw_get_events()]
        files = s._log_files()
        start, end = files[0][0], files[-1][1]
        tmp = os.path.join(s.events_dir, f"_compacting-{start:012d}-{end:012d}.parquet")
        final = os.path.join(s.events_dir, f"part-{start:012d}-{end:012d}.parquet")
        # simulate: merged tmp fully written + journal published, then crash
        # BEFORE any source delete
        import pyarrow.parquet as pq

        from leaf_spark.stream import _ARROW_SCHEMA

        w = pq.ParquetWriter(tmp, _ARROW_SCHEMA)
        for _, _, p in files:
            w.write_table(pq.read_table(p, schema=_ARROW_SCHEMA))
        w.close()
        with open(s._journal_path(), "w") as fh:
            json.dump(
                {"sources": [p for _, _, p in files], "tmp": tmp, "final": final}, fh
            )
        # crash here → reopen must finish the swap
        s3 = Stream(spark, str(tmp_path), "did:plc:compact")
        assert not os.path.exists(s3._journal_path())
        got = s3._log_files()
        assert len(got) == 1 and (got[0][0], got[0][1]) == (start, end)
        assert [(e.idx, e.payload) for e in s3.raw_get_events()] == before

        # and a crash mid-delete (journal + some sources gone) also recovers
        shutil.rmtree(s.events_dir)
        os.makedirs(s.events_dir)
        s4 = Stream(spark, str(tmp_path / "b"), "did:plc:c2")
        s4.provide_module(CHAT)
        for b in range(3):
            s4.add_events([msg("did:plc:u", f"x{b}", b)])
        before4 = [(e.idx, e.payload) for e in s4.raw_get_events()]
        f4 = s4._log_files()
        st, en = f4[0][0], f4[-1][1]
        tmp4 = os.path.join(s4.events_dir, f"_compacting-{st:012d}-{en:012d}.parquet")
        final4 = os.path.join(s4.events_dir, f"part-{st:012d}-{en:012d}.parquet")
        w = pq.ParquetWriter(tmp4, _ARROW_SCHEMA)
        for _, _, p in f4:
            w.write_table(pq.read_table(p, schema=_ARROW_SCHEMA))
        w.close()
        with open(s4._journal_path(), "w") as fh:
            json.dump(
                {"sources": [p for _, _, p in f4], "tmp": tmp4, "final": final4}, fh
            )
        os.unlink(f4[0][2])  # one source already deleted, then crash
        s5 = Stream(spark, str(tmp_path / "b"), "did:plc:c2")
        got5 = s5._log_files()
        assert len(got5) == 1
        assert [(e.idx, e.payload) for e in s5.raw_get_events()] == before4

    def test_stale_tmp_without_journal_is_dropped(self, spark, tmp_path):
        import os

        s = self._mk(spark, tmp_path, batches=2)
        stray = os.path.join(s.events_dir, "_compacting-000000000001-000000000002.parquet")
        with open(stray, "wb") as fh:
            fh.write(b"junk")
        before = [(e.idx, e.payload) for e in s.raw_get_events()]
        s2 = Stream(spark, str(tmp_path), "did:plc:compact")
        assert not os.path.exists(stray)
        assert [(e.idx, e.payload) for e in s2.raw_get_events()] == before

    def test_auto_compaction_cadence(self, spark, tmp_path):
        s = Stream(spark, str(tmp_path), "did:plc:autoc", compact_files=4)
        s.provide_module(CHAT)
        for b in range(6):
            s.add_events([msg("did:plc:u", f"a{b}", b)])
        # maintenance merged the log once it crossed 4 files; events intact
        assert len(s._log_files()) < 6
        evs = s.raw_get_events()
        assert [e.idx for e in evs] == list(range(1, 7))
        rows = s.query(None, LeafQuery("messages"))
        assert len(rows) == 6


class TestArrowLocalStaging:
    def test_staged_events_plan_is_jvm_local(self, spark, tmp_root):
        """The staged-event DataFrame must be a JVM LocalTableScan (Arrow
        path), never a pickled PythonRDD scan — every downstream commit
        action would otherwise pay a ~295 ms Python-worker round trip
        (measured; the r6 single-event-latency finding)."""
        s = Stream(spark, tmp_root, "did:plc:arrowstage")
        df = s._event_local_df([(1, "u", b"\xa1ax\x01", b"")])
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LocalTableScan" in plan and "ExistingRDD" not in plan
        # round-trips bytes + nulls exactly
        r = df.collect()[0]
        assert (r["idx"], r["user"], bytes(r["payload"])) == (1, "u", b"\xa1ax\x01")

    def test_reduced_arity_schema_supported(self, spark, tmp_root):
        """The per-event fold stages through the reduced (idx, user,
        payload) materialize view arity too."""
        from pyspark.sql import types as T

        sub = T.StructType(
            [
                T.StructField("idx", T.LongType(), False),
                T.StructField("user", T.StringType(), False),
                T.StructField("payload", T.BinaryType(), False),
            ]
        )
        s = Stream(spark, tmp_root, "did:plc:arrowstage2")
        df = s._event_local_df([(7, "v", b"zz")], sub)
        assert df.columns == ["idx", "user", "payload"]
        assert "LocalTableScan" in df._jdf.queryExecution().executedPlan().toString()
