"""SQLite connection-state functions: last_insert_rowid(), changes(),
total_changes() — evaluated against the per-(stream, module) TableStore's
statement history (SQLite scopes them per connection; the reference keeps
one SQLite db per (stream, module), leaf-server/src/streams.rs:108-115)."""

import pytest

from leaf_spark.dml import DmlExecutor, TableStore


@pytest.fixture()
def store(spark):
    st = TableStore(spark, "t_connfns_")
    ex = DmlExecutor(st)
    ex.execute("create table t (id integer primary key, v text)")
    ex.execute("create table audit (n integer)")
    return st


def _ex(store):
    return DmlExecutor(store)


class TestChanges:
    def test_insert_counts(self, store):
        ex = _ex(store)
        store.track_changes = True
        ex.execute("insert into t values (1, 'a'), (2, 'b'), (3, 'c')")
        assert ex.execute("select changes() as n").first()["n"] == 3
        assert ex.execute("select total_changes() as n").first()["n"] == 3

    def test_update_counts_matched_rows(self, store):
        ex = _ex(store)
        store.track_changes = True
        ex.execute("insert into t values (1, 'a'), (2, 'b'), (3, 'c')")
        ex.execute("update t set v = 'x' where id >= 2")
        assert ex.execute("select changes() as n").first()["n"] == 2
        assert ex.execute("select total_changes() as n").first()["n"] == 5

    def test_delete_counts(self, store):
        ex = _ex(store)
        store.track_changes = True
        ex.execute("insert into t values (1, 'a'), (2, 'b')")
        ex.execute("delete from t where id = 1")
        assert ex.execute("select changes() as n").first()["n"] == 1

    def test_upsert_do_nothing_counts_only_inserts(self, store):
        ex = _ex(store)
        store.track_changes = True
        ex.execute("insert into t values (1, 'a')")
        ex.execute(
            "insert into t values (1, 'dup'), (2, 'new') "
            "on conflict do nothing"
        )
        assert ex.execute("select changes() as n").first()["n"] == 1

    def test_upsert_do_update_counts_all(self, store):
        ex = _ex(store)
        store.track_changes = True
        ex.execute("insert into t values (1, 'a')")
        ex.execute(
            "insert into t values (1, 'u'), (2, 'n') "
            "on conflict do update set v = excluded.v"
        )
        assert ex.execute("select changes() as n").first()["n"] == 2

    def test_first_reference_flips_tracking(self, store):
        ex = _ex(store)
        assert store.track_changes is False
        assert ex.execute("select changes() as n").first()["n"] == 0
        assert store.track_changes is True


class TestLastInsertRowid:
    def test_tracks_integer_pk(self, store):
        ex = _ex(store)
        store.track_changes = True
        ex.execute("insert into t values (7, 'a')")
        assert ex.execute("select last_insert_rowid() as r").first()["r"] == 7
        ex.execute("insert into t values (9, 'b'), (8, 'c')")
        assert ex.execute("select last_insert_rowid() as r").first()["r"] == 9

    def test_usable_in_following_insert(self, store):
        ex = _ex(store)
        store.track_changes = True
        ex.execute("insert into t values (41, 'a')")
        ex.execute("insert into audit values (last_insert_rowid() + 1)")
        assert ex.execute("select n from audit").first()["n"] == 42

    def test_update_does_not_move_rowid(self, store):
        ex = _ex(store)
        store.track_changes = True
        ex.execute("insert into t values (5, 'a')")
        ex.execute("update t set v = 'z' where id = 5")
        assert ex.execute("select last_insert_rowid() as r").first()["r"] == 5


class TestStreamIntegration:
    def test_module_using_connection_fns(self, spark, tmp_path):
        from leaf_spark import drisl
        from leaf_spark.module import BasicModuleDef, QueryDef
        from leaf_spark.stream import Stream
        from leaf_spark.types import IncomingEvent, LeafQuery

        mod = BasicModuleDef(
            init_sql=(
                "create table if not exists msgs (id integer primary key, body text);"
                "create table if not exists meta (last_id integer);"
            ),
            materializer=(
                "insert into msgs (id, body) "
                "select idx, drisl_extract(payload, '.body') from event;"
                "delete from meta;"
                "insert into meta values (last_insert_rowid());"
            ),
            queries=(
                QueryDef("last", "select last_id from meta"),
                QueryDef("max_id", "select max(id) as m from msgs"),
            ),
        )
        s = Stream(spark, str(tmp_path), "did:plc:connfns")
        s.provide_module(mod)
        assert s.store.track_changes is True
        s.add_events(
            [
                IncomingEvent("did:plc:u", drisl.encode({"body": "hi"})),
                IncomingEvent("did:plc:u", drisl.encode({"body": "there"})),
            ]
        )
        last = s.query(None, LeafQuery("last"))[0]["last_id"]
        assert last == s.query(None, LeafQuery("max_id"))[0]["m"]


class TestReturning:
    def test_insert_returning(self, store):
        ex = _ex(store)
        rows = ex.execute(
            "insert into t values (1, 'a'), (2, 'b') returning id, upper(v) as vv"
        ).collect()
        assert sorted((r["id"], r["vv"]) for r in rows) == [(1, "A"), (2, "B")]

    def test_insert_returning_star(self, store):
        ex = _ex(store)
        rows = ex.execute("insert into t values (3, 'c') returning *").collect()
        assert [(r["id"], r["v"]) for r in rows] == [(3, "c")]

    def test_update_returning_post_image(self, store):
        ex = _ex(store)
        ex.execute("insert into t values (1, 'a'), (2, 'b')")
        rows = ex.execute(
            "update t set v = v || '!' where id = 2 returning v"
        ).collect()
        assert [r["v"] for r in rows] == ["b!"]

    def test_delete_returning_pre_image(self, store):
        ex = _ex(store)
        ex.execute("insert into t values (1, 'a'), (2, 'b')")
        rows = ex.execute("delete from t where id >= 1 returning id").collect()
        assert sorted(r["id"] for r in rows) == [1, 2]
        assert ex.execute("select count(*) as n from t").first()["n"] == 0

    def test_upsert_returning_processed_rows(self, store):
        ex = _ex(store)
        ex.execute("insert into t values (1, 'old')")
        rows = ex.execute(
            "insert into t values (1, 'upd'), (5, 'new') "
            "on conflict do update set v = excluded.v returning id, v"
        ).collect()
        assert sorted((r["id"], r["v"]) for r in rows) == [(1, "upd"), (5, "new")]

    def test_upsert_nothing_returns_only_inserted(self, store):
        ex = _ex(store)
        ex.execute("insert into t values (1, 'a')")
        rows = ex.execute(
            "insert into t values (1, 'dup'), (2, 'new') "
            "on conflict do nothing returning id"
        ).collect()
        assert [r["id"] for r in rows] == [2]


class TestMaintenanceNoOps:
    def test_accepted_as_noops(self, store):
        ex = _ex(store)
        assert ex.execute("analyze") is None
        assert ex.execute("reindex") is None
        assert ex.execute("vacuum") is None
        assert ex.execute("pragma journal_mode = WAL") is None


class TestSqliteErrorSemantics:
    """SQLite yields NULL where ANSI SQL raises: division by zero, invalid
    casts. DmlExecutor forces non-ANSI evaluation on any session."""

    def test_division_by_zero_is_null(self, store):
        ex = _ex(store)
        ex.execute("insert into t values (1, 'a')")
        row = ex.execute("select v, 1 / 0 as dz, 1 % 0 as mz from t").first()
        assert row["dz"] is None and row["mz"] is None

    def test_invalid_cast_is_zero(self, store):
        # SQLite CAST never fails: a TEXT value with no numeric prefix
        # casts to 0 (proven against sqlite3 in test_sqlite_differential);
        # the point here is that Spark's ANSI cast-error is never raised
        ex = _ex(store)
        row = ex.execute("select cast('nope' as integer) as x").first()
        assert row["x"] == 0


class TestUpdateFrom:
    @pytest.fixture()
    def stores(self, spark):
        st = TableStore(spark, "t_updfrom_")
        ex = DmlExecutor(st)
        ex.execute("create table acct (id integer primary key, bal integer)")
        ex.execute("create table adj (id integer primary key, delta integer)")
        ex.execute("insert into acct values (1, 100), (2, 200), (3, 300)")
        ex.execute("insert into adj values (1, 10), (3, -30)")
        return st

    def _rows(self, st, t="acct"):
        return sorted(
            ((r["id"], r["bal"]) for r in st.tables[t].collect())
        )

    def test_join_update(self, stores):
        ex = _ex(stores)
        ex.execute(
            "update acct set bal = bal + adj.delta from adj where acct.id = adj.id"
        )
        assert self._rows(stores) == [(1, 110), (2, 200), (3, 270)]

    def test_from_subquery(self, stores):
        ex = _ex(stores)
        ex.execute(
            "update acct set bal = s.m from "
            "(select max(delta) as m from adj) as s where acct.id = 2"
        )
        assert self._rows(stores) == [(1, 100), (2, 10), (3, 300)]

    def test_returning_and_changes(self, stores):
        ex = _ex(stores)
        stores.track_changes = True
        rows = ex.execute(
            "update acct set bal = 0 from adj where acct.id = adj.id "
            "returning acct.id"
        ).collect()
        assert sorted(r["id"] for r in rows) == [1, 3]
        assert ex.execute("select changes() as n").first()["n"] == 2


class TestDefaultsAndAutoPk:
    @pytest.fixture()
    def dstore(self, spark):
        st = TableStore(spark, "t_defpk_")
        ex = DmlExecutor(st)
        ex.execute(
            "create table t (id integer primary key, n integer default 7, "
            "s text, flag integer default (1 + 1))"
        )
        return st

    def _rows(self, st):
        return sorted(
            (r.asDict() for r in st.tables["t"].collect()),
            key=lambda r: r["id"],
        )

    def test_omitted_columns_take_defaults(self, dstore):
        ex = _ex(dstore)
        ex.execute("insert into t (id, s) values (1, 'a')")
        assert self._rows(dstore) == [{"id": 1, "n": 7, "s": "a", "flag": 2}]

    def test_auto_pk_when_omitted(self, dstore):
        ex = _ex(dstore)
        ex.execute("insert into t (s) values ('a'), ('b')")
        ex.execute("insert into t (s) values ('c')")
        assert [r["id"] for r in self._rows(dstore)] == [1, 2, 3]

    def test_auto_pk_on_literal_null(self, dstore):
        ex = _ex(dstore)
        ex.execute("insert into t values (null, 1, 'a', 0), (9, 2, 'b', 0), (null, 3, 'c', 0)")
        # r11: auto ids follow SQLite's sequential interleave EXACTLY
        # (the closed-form assignment in dml.py replaced the old
        # past-batch-max divergence): null → 1, explicit 9, null → 10
        assert [r["id"] for r in self._rows(dstore)] == [1, 9, 10]
        assert [r["n"] for r in self._rows(dstore)] == [1, 2, 3]

    def test_auto_pk_continues_from_max(self, dstore):
        ex = _ex(dstore)
        ex.execute("insert into t (id, s) values (41, 'a')")
        ex.execute("insert into t (s) values ('b')")
        assert [r["id"] for r in self._rows(dstore)] == [41, 42]

    def test_alter_add_column_default_recorded(self, dstore):
        ex = _ex(dstore)
        ex.execute("insert into t (id, s) values (1, 'a')")
        ex.execute("alter table t add column lvl integer default 5")
        ex.execute("insert into t (id, s) values (2, 'b')")
        assert all(r["lvl"] == 5 for r in self._rows(dstore))


class TestNotNullEnforcement:
    @pytest.fixture()
    def nstore(self, spark):
        st = TableStore(spark, "t_nn_")
        ex = DmlExecutor(st)
        ex.execute("create table t (id integer primary key, s text not null)")
        return st

    def test_null_insert_raises(self, nstore):
        from leaf_spark.sqlcompat import SqlTranslationError

        ex = _ex(nstore)
        with pytest.raises(SqlTranslationError, match="NOT NULL constraint failed: t.s"):
            ex.execute("insert into t values (1, null)")
        assert nstore.tables["t"].count() == 0

    def test_valid_insert_passes(self, nstore):
        ex = _ex(nstore)
        ex.execute("insert into t values (1, 'ok')")
        assert nstore.tables["t"].count() == 1

    def test_violating_event_batch_rolls_back(self, spark, tmp_path):
        from leaf_spark import drisl
        from leaf_spark.module import BasicModuleDef, QueryDef
        from leaf_spark.stream import Stream, StreamError
        from leaf_spark.types import IncomingEvent, LeafQuery

        mod = BasicModuleDef(
            init_sql=(
                "create table if not exists m "
                "(idx integer primary key, body text not null)"
            ),
            materializer=(
                "insert into m select idx, drisl_extract(payload, '.body') from event;"
            ),
            queries=(QueryDef("n", "select count(*) as n from m"),),
        )
        s = Stream(spark, str(tmp_path), "did:plc:nn")
        s.provide_module(mod)
        s.add_events([IncomingEvent("did:plc:u", drisl.encode({"body": "ok"}))])
        with pytest.raises(Exception):
            s.add_events(
                [IncomingEvent("did:plc:u", drisl.encode({"nobody": 1}))]
            )
        assert s.query(None, LeafQuery("n"))[0]["n"] == 1
