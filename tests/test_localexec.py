"""Driver-side sqlite fast path (localexec.py) — the single-event commit
floor fix (VERDICT r7 "Next round #2"). The local path must be
value-identical to the Spark path it bypasses, refuse anything it cannot
prove event-only, and fall back (never error out) when mis-gated."""

import pytest

from leaf_spark import drisl, localexec
from leaf_spark.localexec import LocalAbort, LocalEval, eligible
from leaf_spark.module import BasicModuleDef, QueryDef
from leaf_spark.stream import BatchRejected, Stream
from leaf_spark.types import IncomingEvent, LeafQuery

from .fixtures import CHAT


def ev(user: str, **payload) -> IncomingEvent:
    return IncomingEvent(user, drisl.encode(payload))


class TestEligibility:
    KNOWN = {"messages", "bans", "state_read_markers"}

    def test_event_only_select_is_eligible(self):
        assert eligible(
            "select idx, user, drisl_extract(payload, '.c') from event",
            self.KNOWN, allow_abort=False,
        )

    def test_managed_table_reference_rejected(self):
        assert not eligible(
            "select 1 from event where exists"
            " (select 1 from bans where user = event.user)",
            self.KNOWN, allow_abort=False,
        )

    def test_raw_events_log_rejected(self):
        assert not eligible(
            "select count(*) from events", self.KNOWN, allow_abort=False
        )

    def test_state_qualifier_rejected(self):
        assert not eligible(
            "select 1 from event where user in (select user from state.m)",
            self.KNOWN, allow_abort=False,
        )

    def test_unknown_function_rejected(self):
        assert not eligible(
            "select my_mystery_fn(user) from event",
            self.KNOWN, allow_abort=False,
        )

    def test_nondeterministic_and_ordering_divergent_fns_rejected(self):
        for fn in ("random()", "group_concat(user)", "json_group_array(user)"):
            assert not eligible(
                f"select {fn} from event", self.KNOWN, allow_abort=False
            ), fn

    def test_abort_fns_gated_by_flag(self):
        s = "select iif(user = 'x', throw('no'), 1) from event"
        assert eligible(s, self.KNOWN, allow_abort=True)
        assert not eligible(s, self.KNOWN, allow_abort=False)

    def test_returning_rejected(self):
        assert not eligible(
            "select user from event returning user",
            self.KNOWN, allow_abort=False,
        )


class TestLocalEvalParity:
    """The sqlite evaluation must produce the same values the Spark
    translation produces for the same statement over the same rows —
    drisl conversions shared by construction, the rest spot-checked."""

    def test_drisl_convs_match_spark_udfs(self, spark):
        drisl.register_udfs(spark)
        le = LocalEval()
        rows = [
            (1, "u1", drisl.encode({"s": "txt", "i": 7, "f": 1.5,
                                    "b": True, "x": None})),
            (2, "u2", drisl.encode({"i": "not-an-int"})),
        ]
        sel = (
            "select drisl_extract(payload, '.s') as a,"
            " drisl_extract_int(payload, '.i') as b,"
            " drisl_extract_real(payload, '.f') as c,"
            " drisl_extract(payload, '.b') as d,"
            " drisl_exists(payload, '.x') as e,"
            " drisl_exists(payload, '.missing') as f"
            " from event"
        )
        names, local = le.run_select(sel, rows)
        import pyspark.sql.types as T

        schema = T.StructType([
            T.StructField("idx", T.LongType()),
            T.StructField("user", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ])
        import pandas as pd

        pdf = pd.DataFrame(rows, columns=["idx", "user", "payload"])
        spark.createDataFrame(pdf, schema).createOrReplaceTempView("event")
        got = [tuple(r) for r in spark.sql(sel).collect()]
        spark.catalog.dropTempView("event")
        assert [tuple(r) for r in local] == got
        le.close()

    def test_scalar_fn_surface_matches_spark(self, spark):
        le = LocalEval()
        rows = [(1, "Alice", drisl.encode({}))]
        sel = (
            "select upper(user) as a, length(user) as b,"
            " substr(user, 2, 3) as c, coalesce(nullif(user,'Alice'),'x') as d,"
            " abs(-3) as e, round(2.567, 1) as f, user || '!' as g,"
            " iif(length(user) > 3, 'long', 'short') as h"
            " from event"
        )
        _, local = le.run_select(sel, rows)
        from leaf_spark.sqlcompat import translate

        import pandas as pd
        import pyspark.sql.types as T

        schema = T.StructType([
            T.StructField("idx", T.LongType()),
            T.StructField("user", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ])
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["idx", "user", "payload"]), schema
        ).createOrReplaceTempView("event")
        got = [tuple(r) for r in spark.sql(translate(sel)).collect()]
        spark.catalog.dropTempView("event")

        # Spark types float literals as DECIMAL while SQLite (reference
        # AND local path) uses REAL — the differential suite normalizes
        # the same way (test_sqlite_differential._norm); values must
        # agree, the Decimal/float wrapper may differ
        def norm(v):
            from decimal import Decimal

            return float(v) if isinstance(v, Decimal) else v

        assert [tuple(norm(v) for v in r) for r in local] == [
            tuple(norm(v) for v in r) for r in got
        ]
        le.close()

    def test_abort_raises_localabort_with_message(self):
        le = LocalEval()
        with pytest.raises(LocalAbort, match="Unauthorized: banned u9"):
            le.authorize(
                ["select iif((select user from event) = 'u9',"
                 " unauthorized('banned', (select user from event)), 1)"],
                [("u1", b""), ("u9", b"")],
            )
        with pytest.raises(LocalAbort, match="nope"):
            le.authorize(
                ["select throw('nope')"], [("u1", b"")]
            )
        le.close()

    def test_iif_short_circuits_abort(self):
        """sqlite implements iif via CASE — the abort branch must not fire
        when the condition keeps it dead (same laziness as Spark's CASE
        WHEN raise_error)."""
        le = LocalEval()
        le.authorize(
            ["select iif(1 = 0, throw('dead branch'), 1)"], [("u", b"")]
        )  # no raise
        le.close()

    def test_authorize_event_table_has_no_idx(self):
        """authorize-context event carries ONLY (user, payload) — an idx
        reference must surface as LocalEvalError (caller then falls back
        to Spark, which enforces the same arity)."""
        le = LocalEval()
        with pytest.raises(localexec.LocalEvalError):
            le.authorize(["select idx from event"], [("u", b"")])
        le.close()


class TestStreamIntegration:
    def _mk(self, spark, tmp_path, mod, did):
        s = Stream(spark, str(tmp_path), did)
        s.provide_module(mod)
        return s

    def test_chat_commit_uses_local_paths_and_matches_spark(
        self, spark, tmp_path, monkeypatch
    ):
        """Same CHAT commits with the local path ON vs forced OFF must
        materialize identical rows (the fast path is an optimization,
        never a semantics change)."""
        msgs = [
            ev("a", content="hello", sentAt=100),
            ev("b", content="yo", sentAt=101),
        ]
        s1 = self._mk(spark, tmp_path / "on", CHAT, "did:plc:lon")
        for m in msgs:
            s1.add_events([m])
        on_rows = s1.query(None, LeafQuery("messages"))

        monkeypatch.setattr(localexec, "eligible",
                            lambda *a, **k: False)
        s2 = self._mk(spark, tmp_path / "off", CHAT, "did:plc:loff")
        for m in msgs:
            s2.add_events([m])
        off_rows = s2.query(None, LeafQuery("messages"))
        assert on_rows == off_rows

    def test_local_abort_rejects_batch_atomically(self, spark, tmp_path):
        s = self._mk(spark, tmp_path, CHAT, "did:plc:labort")
        s.add_events([ev("a", content="ok")])
        with pytest.raises(BatchRejected, match="missing content"):
            s.add_events([ev("a", content="fine"), ev("a", nope=1)])
        assert s.state.latest_idx == 1
        assert len(s.query(None, LeafQuery("messages"))) == 1

    def test_upsert_materializer_localized(self, spark, tmp_path):
        """ON CONFLICT upsert with the injected __ord__ column must keep
        last-event-wins through the localized source."""
        mod = BasicModuleDef(
            init_sql=(
                "create table if not exists kv"
                " (k text primary key, v integer not null)"
            ),
            materializer=(
                "insert into kv (k, v) select"
                " drisl_extract(payload, '.k'),"
                " drisl_extract_int(payload, '.v') from event where true"
                " on conflict(k) do update set v = excluded.v;"
            ),
            queries=(QueryDef("kv", "select k, v from kv order by k"),),
        )
        s = self._mk(spark, tmp_path, mod, "did:plc:lups")
        s.add_events([ev("u", k="a", v=1), ev("u", k="b", v=2),
                      ev("u", k="a", v=3)])
        assert s.query(None, LeafQuery("kv")) == [
            {"k": "a", "v": 3}, {"k": "b", "v": 2},
        ]

    def test_replay_path_skips_localization(self, spark, tmp_path):
        """catch_up folds from the parquet log (no driver rows) — reopen
        must replay correctly with local_rows=None."""
        s = self._mk(spark, tmp_path, CHAT, "did:plc:lreplay")
        s.add_events([ev("a", content="one", sentAt=1)])
        s.add_events([ev("b", content="two", sentAt=2)])
        s2 = Stream(spark, str(tmp_path), "did:plc:lreplay")
        s2.provide_module(CHAT)
        s2.catch_up()
        assert [r["content"] for r in s2.query(None, LeafQuery("messages"))] \
            == ["one", "two"]

    def test_empty_table_plan_is_jvm_local(self, spark):
        """Never-mutated tables (the bans shape) must not be Python-RDD
        backed — their evaluation is on the per-commit authorize path."""
        from leaf_spark.dml import DmlExecutor, TableStore

        store = TableStore(spark, "t_emptyjvm_")
        DmlExecutor(store).execute(
            "create table bans2 (user text primary key)"
        )
        plan = store.tables["bans2"]._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Scan ExistingRDD" not in plan
        assert store.tables["bans2"].count() == 0


class TestInferSchema:
    def test_basic_types(self):
        import pyspark.sql.types as T

        sch = localexec.infer_spark_schema(
            ["a", "b", "c", "d", "e"],
            [(1, 1.5, "x", b"\x00", None), (None, 2, "y", None, None)],
        )
        assert [f.dataType for f in sch.fields] == [
            T.LongType(), T.DoubleType(), T.StringType(), T.BinaryType(),
            T.StringType(),
        ]

    def test_mixed_incompatible_returns_none(self):
        assert localexec.infer_spark_schema(["a"], [(1,), ("x",)]) is None


class TestFuzzParity:
    """Hypothesis sweep: for random event payloads, every statement in a
    pool of eligible fold-source shapes must produce identical values on
    the local sqlite path and the translate()+Spark path. One Spark call
    per example (rows batched), so the sweep stays fast."""

    STATEMENTS = [
        "select idx, user, drisl_extract(payload, '.k') as v from event",
        "select drisl_extract_int(payload, '.n') as n,"
        " drisl_extract_real(payload, '.f') as f from event",
        "select coalesce(drisl_extract_int(payload, '.n'), -1) as n,"
        " length(user) as lu from event",
        "select count(*) as c, sum(drisl_extract_int(payload, '.n')) as s"
        " from event",
        "select upper(drisl_extract(payload, '.k')) as u from event"
        " where drisl_exists(payload, '.k')",
        "select iif(drisl_extract_int(payload, '.n') > 0, 'pos', 'neg')"
        " as sgn, idx % 3 as m from event",
        "select user || ':' || coalesce(drisl_extract(payload, '.k'), '-')"
        " as tag from event order by idx",
    ]

    def _spark_rows(self, spark, sel, rows):
        """The production Spark path: DmlExecutor.execute (translate +
        the FILTER_NOT_BOOLEAN truthiness retry), exactly what a
        non-localized fold/authorize statement runs through."""
        import pandas as pd
        import pyspark.sql.types as T

        from leaf_spark.dml import DmlExecutor, TableStore

        schema = T.StructType([
            T.StructField("idx", T.LongType()),
            T.StructField("user", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ])
        pdf = pd.DataFrame(rows, columns=["idx", "user", "payload"])
        spark.createDataFrame(pdf, schema).createOrReplaceTempView("event")
        try:
            ex = DmlExecutor(TableStore(spark, "t_lxfuzz_"))
            return [tuple(r) for r in ex.execute(sel).collect()]
        finally:
            spark.catalog.dropTempView("event")

    def test_fuzz_local_matches_spark(self, spark):
        from decimal import Decimal

        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        drisl.register_udfs(spark)
        le = LocalEval()
        payload = st.fixed_dictionaries(
            {},
            optional={
                "k": st.text(
                    st.characters(codec="utf-8",
                                  blacklist_categories=("Cs",)),
                    max_size=12,
                ),
                "n": st.integers(-2**40, 2**40),
                "f": st.floats(allow_nan=False, allow_infinity=False,
                               width=32),
            },
        )

        def norm(v):
            if isinstance(v, Decimal):
                return float(v)
            return v

        @settings(
            max_examples=8, deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(st.lists(payload, min_size=1, max_size=5))
        def run(payloads):
            rows = [
                (i + 1, f"u{i % 2}", drisl.encode(p))
                for i, p in enumerate(payloads)
            ]
            for sel in self.STATEMENTS:
                _, local = le.run_select(sel, rows)
                got = self._spark_rows(spark, sel, rows)
                assert [
                    tuple(norm(v) for v in r) for r in local
                ] == [tuple(norm(v) for v in r) for r in got], sel

        run()
        le.close()


class TestTableMirror:
    """Small managed tables mirror into the local evaluator so
    table-referencing authorizer statements skip the per-commit Spark
    job. The mirror is keyed on the TableStore registration version —
    staleness is the failure mode these tests pin."""

    BANS_MOD = None  # built lazily to reuse fixtures.CHAT

    def _stream(self, spark, tmp_path):
        s = Stream(spark, str(tmp_path), "did:plc:mirror")
        s.provide_module(CHAT)
        return s

    def test_ban_enforced_on_next_commit(self, spark, tmp_path):
        """The fold mutates bans -> version bump -> the next commit's
        authorize must see the fresh mirror, not a stale empty one."""
        from leaf_spark.dml import DmlExecutor

        s = self._stream(spark, tmp_path)
        s.add_events([ev("alice", content="hi")])
        # ban alice through the store (CHAT has no ban materializer —
        # mutate directly, which re-registers and bumps the version)
        DmlExecutor(s.store).execute("insert into bans values ('alice')")
        with pytest.raises(BatchRejected, match="banned"):
            s.add_events([ev("alice", content="should fail")])
        # and an unbanned user still passes
        s.add_events([ev("bob", content="fine")])
        assert [r["sender"] for r in s.query(None, LeafQuery("messages"))] \
            == ["alice", "bob"]

    def test_rollback_restores_mirror_view(self, spark, tmp_path):
        """A rejected batch restores the pre-batch bans table; the mirror
        must follow (restore re-registers -> version bump)."""
        mod = BasicModuleDef(
            init_sql=(
                "create table if not exists msgs (idx integer primary key,"
                " sender text not null); "
                "create table if not exists bans (user text primary key);"
            ),
            authorizer=(
                "select iif(exists(select 1 from bans where user = "
                "(select user from event)), unauthorized('banned'), 1);"
            ),
            materializer=(
                "insert into msgs (idx, sender) select idx, user from event"
                " where not drisl_exists(payload, '.ban'); "
                "insert into bans (user) select"
                " drisl_extract(payload, '.ban') from event where"
                " drisl_exists(payload, '.ban')"
                " on conflict(user) do nothing; "
                # .boom forces a NOT NULL violation AFTER bans mutated —
                # the whole batch (including the ban) must roll back
                "insert into msgs (idx, sender) select idx, null from event"
                " where drisl_exists(payload, '.boom');"
            ),
            queries=(
                QueryDef("bans", "select user from bans order by user"),
                QueryDef("msgs", "select idx, sender from msgs order by idx"),
            ),
        )
        s = Stream(spark, str(tmp_path), "did:plc:mirror2")
        s.provide_module(mod)
        s.add_events([ev("alice", content="ok")])
        # authorize sees the pre-batch bans (empty) -> mirror staged;
        # the fold bans bob, then the .boom statement fails -> rollback
        with pytest.raises(Exception, match="NOT NULL"):
            s.add_events([ev("carol", ban="bob"), ev("carol", boom=1)])
        # whatever failed, bans must NOT contain bob after rollback
        assert s.query(None, LeafQuery("bans")) == []
        # and bob can still commit (stale mirror would also reject here
        # only if it wrongly kept the rolled-back ban)
        s.add_events([ev("bob", content="alive")])
        assert {r["sender"] for r in s.query(None, LeafQuery("msgs"))} \
            >= {"alice", "bob"}

    def test_oversized_table_keeps_spark_path(self, spark, tmp_path):
        from leaf_spark.dml import DmlExecutor

        s = self._stream(spark, tmp_path)
        s.add_events([ev("alice", content="hi")])
        ex = DmlExecutor(s.store)
        vals = ", ".join(f"('u{i}')" for i in range(300))
        ex.execute(f"insert into bans values {vals}")
        assert not s._mirror_tables({"bans"})
        with pytest.raises(BatchRejected, match="banned"):
            s.add_events([ev("u7", content="nope")])
        s.add_events([ev("fresh", content="yes")])

    def test_dropped_table_mirror_purged_on_module_swap(
        self, spark, tmp_path
    ):
        """After a module swap drops a mirrored table, a statement still
        referencing it must NOT be answered by the lingering mirror —
        absence falls back to Spark, which errors like the reference."""
        s = self._stream(spark, tmp_path)
        s.add_events([ev("alice", content="hi")])  # mirrors bans
        assert "bans" in s._mirror_versions
        # simulate the swap's table drop
        s.store.drop("bans", if_exists=False)
        # the REAL flow: a statement referencing the dropped table has
        # empty known-refs, passes eligibility, and must NOT find the
        # stale mirror — _authorize purges before every local evaluation
        s._purge_stale_mirrors()
        assert "bans" not in s._mirror_versions
        with pytest.raises(localexec.LocalEvalError):
            s._local_eval.authorize(
                ["select 1 from bans"], [("alice", b"")]
            )
        # end-to-end: the broken module's authorizer now fails loudly on
        # BOTH paths instead of silently using rolled-back mirror data
        with pytest.raises(Exception):
            s.add_events([ev("alice", content="after drop")])


class TestReadPath:
    """r10: named queries (and therefore subscription re-queries, which
    go through Stream.query) are served from the driver-side sqlite
    mirrors when every statement is a SELECT over mirror-eligible
    tables — the reference's in-process query shape (lib.rs:842-862).
    The local answer must be value-identical to the Spark path, and
    every gate miss must fall back to Spark."""

    def _chat(self, spark, tmp_path):
        from .fixtures import msg, marker

        s = Stream(spark, str(tmp_path), "did:plc:readpath")
        s.provide_module(CHAT)
        s.add_events([msg("a", f"m{i}", i) for i in range(1, 6)])
        s.add_state_events([marker("a", 2)])
        return s

    def _spark_rows(self, s, user, q):
        """Force the Spark path for a parity reference."""
        import unittest.mock as mock

        with mock.patch.object(
            Stream, "_local_query", lambda self, sql, args: None
        ):
            return s.query(user, q)

    def test_all_chat_queries_parity_and_local(self, spark, tmp_path):
        from leaf_spark.types import SqlValue

        s = self._chat(spark, tmp_path)
        cases = [
            ("a", LeafQuery("messages")),
            ("a", LeafQuery("messages", start=3, limit=2)),
            ("a", LeafQuery("message_stats")),
            ("a", LeafQuery("my_unread")),  # state.-qualified table
            (
                "a",
                LeafQuery(
                    "messages_by_sender",
                    {"sender": SqlValue("text", "a")},
                ),
            ),
            (None, LeafQuery("my_unread")),  # null $requesting_user
        ]
        import unittest.mock as mock

        for user, q in cases:
            expect = self._spark_rows(s, user, q)
            # engagement proof: the local path must answer WITHOUT Spark
            with mock.patch.object(
                Stream,
                "query_df",
                side_effect=AssertionError("spark path used"),
            ):
                got = s.query(user, q)
            assert got == expect, q.name

    def test_mirror_tracks_commits(self, spark, tmp_path):
        from .fixtures import msg

        s = self._chat(spark, tmp_path)
        before = s.query("a", LeafQuery("messages"))
        s.add_events([msg("b", "m6", 6)])
        after = s.query("a", LeafQuery("messages"))
        assert len(after) == len(before) + 1
        assert after[-1]["content"] == "m6"
        assert after == self._spark_rows(s, "a", LeafQuery("messages"))

    def test_append_grown_mirror_keeps_serving(self, spark, tmp_path):
        """r11: a mirror staged under _MIRROR_CAP keeps serving while the
        table grows by provable pure appends — each commit advances the
        sqlite mirror by inserting only the delta rows (no Spark job,
        TableStore.mirror_deltas), up to _MIRROR_CAP_APPEND."""
        import unittest.mock as mock

        from .fixtures import msg

        s = self._chat(spark, tmp_path)
        cap = Stream._MIRROR_CAP
        s.add_events([msg("bulk", f"x{i}", 100 + i) for i in range(cap)])
        q = LeafQuery("message_stats", limit=1000)
        expect = self._spark_rows(s, "a", q)
        with mock.patch.object(
            Stream, "query_df", side_effect=AssertionError("spark path used")
        ):
            got = s.query("a", q)
        assert got == expect
        assert s._mirror_rows["messages"] > cap

    def test_oversized_initial_staging_falls_back(self, spark, tmp_path):
        """A table already over _MIRROR_CAP with NO staged mirror (fresh
        process / poisoned chain) stays on the Spark path — the raised
        append cap only applies to mirrors grown incrementally."""
        from .fixtures import msg

        s = self._chat(spark, tmp_path)
        s.add_events(
            [msg("bulk", f"x{i}", 100 + i) for i in range(Stream._MIRROR_CAP)]
        )
        # simulate a fresh driver: no staged mirror, no append history
        s._mirror_versions.pop("messages", None)
        s._mirror_rows.pop("messages", None)
        s._mirror_failed.pop("messages", None)
        s.store._mirror_chain["messages"] = None
        s._local_eval.drop_table("messages")
        assert s._local_query(
            s.module.query_def("message_stats").sql,
            {"start": 1, "limit": 1000, "requesting_user": "a"},
        ) is None
        q = LeafQuery("message_stats", limit=1000)
        assert s.query("a", q) == self._spark_rows(s, "a", q)

    def test_append_cap_drops_mirror(self, spark, tmp_path):
        """Growth past _MIRROR_CAP_APPEND drops the mirror (negative-cached
        by version) and the query falls back to Spark with identical rows."""
        import unittest.mock as mock

        from .fixtures import msg

        s = self._chat(spark, tmp_path)
        with mock.patch.object(Stream, "_MIRROR_CAP_APPEND", 300):
            s.add_events([msg("bulk", f"x{i}", 100 + i) for i in range(300)])
            q = LeafQuery("message_stats", limit=1000)
            assert s._local_query(
                s.module.query_def("message_stats").sql,
                {"start": 1, "limit": 1000, "requesting_user": "a"},
            ) is None
            assert "messages" not in s._mirror_versions
            assert s.query("a", q) == self._spark_rows(s, "a", q)

    def test_non_append_mutation_drops_grown_mirror(self, spark, tmp_path):
        """Any non-append registration poisons the chain; a grown mirror
        (> _MIRROR_CAP rows) cannot restage and falls back to Spark."""
        from .fixtures import msg

        s = self._chat(spark, tmp_path)
        s.add_events(
            [msg("bulk", f"x{i}", 100 + i) for i in range(Stream._MIRROR_CAP)]
        )
        s.query("a", LeafQuery("messages", limit=1000))  # stages the mirror
        assert s._mirror_rows["messages"] > Stream._MIRROR_CAP
        # a content-changing re-registration outside the append protocol
        s.store.mutated("messages", s.store.tables["messages"])
        assert s._local_query(
            s.module.query_def("message_stats").sql,
            {"start": 1, "limit": 1000, "requesting_user": "a"},
        ) is None
        q = LeafQuery("message_stats", limit=1000)
        assert s.query("a", q) == self._spark_rows(s, "a", q)

    def test_grown_mirror_survives_persist_and_checkpoint(self, spark, tmp_path):
        """persist_state and checkpoint_all re-register the SAME content
        (snapshot re-point / localCheckpoint): the chain records no-op
        entries, so the grown mirror advances without restaging."""
        import unittest.mock as mock

        from .fixtures import msg

        s = self._chat(spark, tmp_path)
        s.add_events(
            [msg("bulk", f"x{i}", 100 + i) for i in range(Stream._MIRROR_CAP)]
        )
        q = LeafQuery("message_stats", limit=1000)
        expect = self._spark_rows(s, "a", q)
        s.persist_state()
        s.store.checkpoint_all()
        with mock.patch.object(
            Stream, "query_df", side_effect=AssertionError("spark path used")
        ):
            got = s.query("a", q)
        assert got == expect

    @pytest.mark.slow
    def test_mirror_serves_ten_thousand_row_table(self, spark, tmp_path):
        """The VERDICT r10 ask: chat-message-sized live state (10k rows)
        served from the mirror, value-identical to Spark."""
        import unittest.mock as mock

        from .fixtures import msg

        s = self._chat(spark, tmp_path)
        at = 100
        for _ in range(5):
            s.add_events([msg("bulk", f"x{at + i}", at + i) for i in range(2000)])
            at += 2000
        q = LeafQuery("message_stats", limit=1000)
        expect = self._spark_rows(s, "a", q)
        assert expect[0]["n"] >= 10_000
        with mock.patch.object(
            Stream, "query_df", side_effect=AssertionError("spark path used")
        ):
            got = s.query("a", q)
        assert got == expect
        assert s._mirror_rows["messages"] >= 10_000

    def test_events_log_reference_not_served_locally(self, spark, tmp_path):
        s = self._chat(spark, tmp_path)
        assert s._local_query(
            "select count(*) as n from events",
            {"start": 1, "limit": 10, "requesting_user": None},
        ) is None

    def test_leftover_event_staging_never_answers(self, spark, tmp_path):
        """The LocalEval connection may hold a staged ``event`` table
        from the last authorize; a query referencing event must be
        refused by the gate, not answered by that leftover."""
        s = self._chat(spark, tmp_path)
        # the last add_events staged an event table on this connection
        assert s._local_query(
            "select user from event",
            {"start": 1, "limit": 10, "requesting_user": None},
        ) is None

    def test_unaliased_expressions_fall_back(self, spark, tmp_path):
        """SQLite names 'count(*)' what Spark names 'count(1)' — column
        names must match across paths, so unaliased expressions are
        refused."""
        s = self._chat(spark, tmp_path)
        assert s._local_query(
            "select count(*) from messages",
            {"start": 1, "limit": 10, "requesting_user": None},
        ) is None

    def test_boolean_results_normalized_to_int(self, spark, tmp_path):
        """Both paths return SQLite's 1/0 for boolean expressions (the
        wire codec maps bool→integer; the Python API now matches)."""
        mod = BasicModuleDef(
            init_sql=(
                "create table if not exists t (idx integer primary key)"
            ),
            materializer="insert into t (idx) select idx from event;",
            queries=(
                QueryDef(
                    "flags",
                    "select idx, idx > 1 as big from t order by idx",
                ),
            ),
        )
        s = Stream(spark, str(tmp_path), "did:plc:boolnorm")
        s.provide_module(mod)
        s.add_events([ev("u", v=1), ev("u", v=2)])
        local = s.query(None, LeafQuery("flags"))
        sparkr = self._spark_rows(s, None, LeafQuery("flags"))
        assert local == sparkr
        assert [r["big"] for r in local] == [0, 1]

    def test_view_reference_falls_back(self, spark, tmp_path):
        """Views are not DataFrames in the store — mirror staging must
        refuse them and the Spark path must answer."""
        mod = BasicModuleDef(
            init_sql=(
                "create table if not exists t (idx integer primary key); "
                "create view big as select idx from t where idx > 1;"
            ),
            materializer="insert into t (idx) select idx from event;",
            queries=(
                QueryDef("big", "select idx from big order by idx"),
            ),
        )
        s = Stream(spark, str(tmp_path), "did:plc:viewread")
        s.provide_module(mod)
        s.add_events([ev("u", v=1), ev("u", v=2)])
        assert s._local_query(
            "select idx from big order by idx",
            {"start": 1, "limit": 10, "requesting_user": None},
        ) is None
        assert [r["idx"] for r in s.query(None, LeafQuery("big"))] == [2]

    def test_subscription_requeries_use_local_path(self, spark, tmp_path):
        """Subscription re-queries go through Stream.query and must hit
        the mirror path for mirror-eligible modules."""
        import unittest.mock as mock

        from .fixtures import msg

        import queue as queue_mod

        s = self._chat(spark, tmp_path)
        from leaf_spark.streaming.subscribe import SubscriptionWorker

        w = SubscriptionWorker(s)
        try:
            sub = w.subscribe_events(
                "a", LeafQuery("messages", start=1, limit=100)
            )
            deadline = 50
            got = 0
            while got == 0 and deadline:
                try:
                    got += len(sub.channel.get(timeout=0.1).rows)
                except Exception:
                    pass
                deadline -= 1
            assert got == 5, "no backfill delivered"
            with mock.patch.object(
                Stream,
                "query_df",
                side_effect=AssertionError("spark path used"),
            ):
                s.add_events([msg("b", "live1", 99)])
                deadline = 50
                while deadline:
                    try:
                        resp = sub.channel.get(timeout=0.1)
                        if resp.error:
                            raise AssertionError(resp.error)
                        got += len(resp.rows)
                        if got > 5:
                            break
                    except queue_mod.Empty:
                        pass
                    deadline -= 1
            assert got == 6
        finally:
            w.close()


class TestReadPathHardening:
    """r10 review findings on the read path: authorizer enforcement,
    quoted-identifier event capture, decode-cache lifetime."""

    def _chat(self, spark, tmp_path):
        from .fixtures import msg

        s = Stream(spark, str(tmp_path), "did:plc:rph")
        s.provide_module(CHAT)
        s.add_events([msg("a", "m1", 1)])
        return s

    def test_enforced_authorizer_gates_local_reads(self, spark, tmp_path):
        """With enforce=True, a query using a function outside the
        query allowlist must raise on BOTH paths — the local path must
        not answer what the Spark path would refuse."""
        from leaf_spark.sqlcompat import AuthorizationError

        s = self._chat(spark, tmp_path)
        s.sql_authorizer.enforce = True
        try:
            allowed = s.query("a", LeafQuery("messages"))
            assert allowed  # allowlisted query still answers
            with pytest.raises(AuthorizationError):
                s._local_query(
                    "select hex(randomblob(4)) as h from messages",
                    {"start": 1, "limit": 10, "requesting_user": None},
                )
        finally:
            s.sql_authorizer.enforce = False

    def test_quoted_event_identifier_never_answers(self, spark, tmp_path):
        """A quoted '"event"' reference slips past the bare-word gate
        (quoted tokens fail _is_word) — the leftover authorize staging
        must still never answer: run_readonly drops it, sqlite errors,
        and the read falls back to Spark."""
        s = self._chat(spark, tmp_path)
        # the add_events above staged an `event` table on the local con
        got = s._local_query(
            'select m.content from messages m, "event" e',
            {"start": 1, "limit": 10, "requesting_user": None},
        )
        assert got is None  # fallback, not stale staging

    def test_decode_cache_resets_per_batch(self, spark, tmp_path):
        from .fixtures import msg

        s = self._chat(spark, tmp_path)
        first = dict(s._local_eval._dcache)
        s.add_events([msg("b", "m2", 2)])
        after = s._local_eval._dcache
        # the first batch's payloads were evicted at second-batch start
        assert all(k not in after for k in first), "cache not reset"


class TestMirrorChainLongevity:
    """r12 (VERDICT r11 #7): the append chain FOLDS past _MIRROR_CHAIN_CAP
    instead of dropping history — a long run of commits between reads must
    never force a restage (which a >_MIRROR_CAP mirror cannot do at all)."""

    def _chat(self, spark, tmp_path):
        from .fixtures import msg

        s = Stream(spark, str(tmp_path), "did:plc:chainfold")
        s.provide_module(CHAT)
        s.add_events([msg("a", "seed", 1)])
        return s

    def _spark_rows(self, s, user, q):
        import unittest.mock as mock

        with mock.patch.object(
            Stream, "_local_query", lambda self, sql, args: None
        ):
            return s.query(user, q)

    def test_100_commit_append_stream_never_leaves_mirror(
        self, spark, tmp_path
    ):
        import unittest.mock as mock

        from leaf_spark.dml import TableStore

        from .fixtures import msg

        s = self._chat(spark, tmp_path)
        q = LeafQuery("message_stats", limit=1000)
        s.query("a", q)  # stage the mirror at 1 row
        assert "messages" in s._mirror_versions
        cap = TableStore._MIRROR_CHAIN_CAP
        n = 100
        assert n > cap  # the scenario the old truncation broke
        for i in range(n):  # NO reads in between: the chain must fold
            s.add_events([msg("bulk", f"x{i}", 100 + i)])
        chain = s.store._mirror_chain["messages"]
        assert chain is not None and len(chain) <= cap
        # contiguous coverage survived the folds
        deltas = s.store.mirror_deltas(
            "messages", s._mirror_versions["messages"]
        )
        assert deltas is not None
        expect = self._spark_rows(s, "a", q)
        with mock.patch.object(
            Stream, "query_df", side_effect=AssertionError("spark path used")
        ):
            got = s.query("a", q)
        assert got == expect
        assert s._mirror_rows["messages"] == n + 1
        # consumed history is pruned; the NEXT commit+read stays local too
        assert s.store._mirror_chain["messages"] == []
        s.add_events([msg("bulk", "tail", 999)])
        with mock.patch.object(
            Stream, "query_df", side_effect=AssertionError("spark path used")
        ):
            got2 = s.query("a", q)
        assert got2 == self._spark_rows(s, "a", q)
        assert s._mirror_rows["messages"] == n + 2

    def test_interleaved_reads_prune_the_chain(self, spark, tmp_path):
        from leaf_spark.dml import TableStore

        from .fixtures import msg

        s = self._chat(spark, tmp_path)
        q = LeafQuery("message_stats", limit=1000)
        s.query("a", q)
        for i in range(3 * TableStore._MIRROR_CHAIN_CAP):
            s.add_events([msg("bulk", f"y{i}", 100 + i)])
            s.query("a", q)  # sync every commit → chain never accumulates
            chain = s.store._mirror_chain["messages"]
            assert chain is not None and len(chain) <= 2
        assert s._mirror_rows["messages"] == 3 * TableStore._MIRROR_CHAIN_CAP + 1

    def test_fold_span_bound_poisons_pathological_chains(
        self, spark, tmp_path
    ):
        import unittest.mock as mock

        from leaf_spark.dml import TableStore

        from .fixtures import msg

        s = self._chat(spark, tmp_path)
        s.query("a", LeafQuery("messages", limit=10))
        with mock.patch.object(TableStore, "_MIRROR_FOLD_SPAN", 8):
            for i in range(TableStore._MIRROR_CHAIN_CAP + 10):
                s.add_events([msg("bulk", f"z{i}", 100 + i)])
        # beyond the bound the chain poisons (restage fallback, not wrong
        # answers) and queries still serve with identical rows via Spark
        assert s.store._mirror_chain["messages"] is None
        q = LeafQuery("message_stats", limit=1000)
        assert s.query("a", q) == self._spark_rows(s, "a", q)
