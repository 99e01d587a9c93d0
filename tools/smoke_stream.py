"""Quick end-to-end drive of the Stream engine with the chat fixture
(FIXTURES.md F2): authorize → materialize → query → state events → replay."""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from leaf_spark import drisl
from leaf_spark.module import BasicModuleDef, QueryDef
from leaf_spark.session import get_spark
from leaf_spark.stream import BatchRejected, Stream
from leaf_spark.types import IncomingEvent, LeafQuery, QueryParamDef, SqlValue

CHAT = BasicModuleDef(
    init_sql=(
        "create table if not exists messages (idx integer primary key, sender text not null, "
        "content text not null, sent_at integer not null); "
        "create table if not exists bans (user text primary key);"
    ),
    authorizer=(
        "select iif(exists(select 1 from bans where user = (select user from event)), "
        "unauthorized('banned user'), 1); "
        "select iif(drisl_exists((select payload from event), '.content'), 1, "
        "throw('missing content'));"
    ),
    materializer=(
        "insert into messages (idx, sender, content, sent_at) "
        "select idx, user, drisl_extract(payload, '.content'), "
        "coalesce(drisl_extract_int(payload, '.sentAt'), unixepoch()) from event;"
    ),
    state_init_sql=(
        "create table if not exists state.read_markers "
        "(user text primary key, last_read integer not null);"
    ),
    state_materializer=(
        "insert into state.read_markers (user, last_read) "
        "select user, drisl_extract_int(payload, '.lastRead') from event where true "
        "on conflict(user) do update set last_read = excluded.last_read;"
    ),
    queries=(
        QueryDef(
            "messages",
            "select idx, sender, content, sent_at from messages where idx >= $start "
            "order by idx limit $limit",
        ),
        QueryDef(
            "messages_by_sender",
            "select idx, content from messages where sender = $sender and idx >= $start "
            "order by idx limit $limit",
            (QueryParamDef("sender", "text"),),
        ),
        QueryDef(
            "message_stats",
            "select sender, count(*) as n, min(sent_at) as first_at, max(sent_at) as last_at "
            "from messages group by sender order by n desc",
        ),
        QueryDef(
            "my_unread",
            "select count(*) as unread from messages where idx > "
            "coalesce((select last_read from state.read_markers "
            "where user = $requesting_user), 0)",
        ),
    ),
)


def msg(user: str, content: str, at: int) -> IncomingEvent:
    return IncomingEvent(user, drisl.encode({"content": content, "sentAt": at}))


def main() -> None:
    spark = get_spark("stream-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="leafsmoke_")
    try:
        s = Stream(spark, root, "did:plc:smoketest")
        s.provide_module(CHAT)

        latest = s.add_events(
            [msg("did:plc:alice", "hello", 100), msg("did:plc:bob", "hi alice", 105),
             msg("did:plc:alice", "how goes", 110)]
        )
        print("latest after batch1:", latest)
        rows = s.query("did:plc:alice", LeafQuery("messages"))
        print("messages:", rows)
        assert [r["idx"] for r in rows] == [1, 2, 3], rows

        # rejection: missing content → whole batch rolls back
        try:
            s.add_events([msg("did:plc:bob", "ok", 120),
                          IncomingEvent("did:plc:bob", drisl.encode({"nope": 1}))])
            raise AssertionError("batch should have been rejected")
        except BatchRejected as ex:
            print("rejected as expected:", ex)
        assert s.state.latest_idx == 3
        assert len(s.query(None, LeafQuery("messages"))) == 3, "rollback failed"

        # param-typed query
        rows = s.query(None, LeafQuery("messages_by_sender",
                                       {"sender": SqlValue.of("did:plc:alice")}))
        print("by sender:", rows)
        assert len(rows) == 2

        # state events + per-user query
        s.add_state_events([IncomingEvent("did:plc:alice", drisl.encode({"lastRead": 2}))])
        unread_alice = s.query("did:plc:alice", LeafQuery("my_unread"))[0]["unread"]
        unread_bob = s.query("did:plc:bob", LeafQuery("my_unread"))[0]["unread"]
        print("unread alice/bob:", unread_alice, unread_bob)
        assert (unread_alice, unread_bob) == (1, 3)

        # pagination concat == full range
        p1 = s.query(None, LeafQuery("messages", start=1, limit=2))
        p2 = s.query(None, LeafQuery("messages", start=3, limit=2))
        assert [r["idx"] for r in p1 + p2] == [1, 2, 3]

        # replay determinism: fresh Stream over same dir rebuilds identical state
        s2 = Stream(spark, root, "did:plc:smoketest")
        s2.provide_module(CHAT)
        rows2 = s2.query(None, LeafQuery("messages"))
        assert rows2 == s.query(None, LeafQuery("messages")), "replay mismatch"
        print("replay identical:", len(rows2), "rows")

        # banned-user path: materialize a ban then reject
        s.add_events([])  # no-op
        stats = s.query(None, LeafQuery("message_stats"))
        print("stats:", stats)
        print("SMOKE OK")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
