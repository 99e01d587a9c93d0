"""tools/reshard.py — offline shard-count changes over a supervisor root.

The VERDICT r11 closure: ingest on N=2, reshard to N=4, and every moved
stream must replay its query AND serve a live subscription on its new
owner with identical rows. Also covers shrink (4→2), idempotency, the
in-progress lock, and meta/stream.json consistency verification.
"""

from __future__ import annotations

import json
import os
import threading
import time

import pytest

from leaf_spark import drisl
from leaf_spark.server import Connection
from leaf_spark.sharding import LeafShardSupervisor, shard_of
from leaf_spark.socketio import LeafSocketIOClient

from tools.reshard import ReshardError, plan, reshard

from .fixtures import CHAT

TOKENS = {"alice-token": Connection(user="did:plc:alice")}


def _sup(spark, root, n):
    return LeafShardSupervisor(root, n_shards=n, tokens=TOKENS, spark=spark).start()


def _cli(sup):
    return LeafSocketIOClient(sup.host, sup.port, token="alice-token")


def _ingest(spark, root, n_shards, dids):
    sup = _sup(spark, root, n_shards)
    cli = _cli(sup)
    rows_by_did = {}
    try:
        cid = cli.call("module/upload", {"module": CHAT.to_codec()})["Ok"]["cid"]
        for k, did in enumerate(dids):
            assert "Ok" in cli.call(
                "stream/create", {"streamDid": did, "moduleCid": cid}
            )
            payloads = [
                drisl.encode({"content": f"{did} msg{j}", "sentAt": j + 1})
                for j in range(k + 1)
            ]
            out = cli.call(
                "stream/event_batch", {"streamDid": did, "payloads": payloads}
            )
            assert out["Ok"]["latestEvent"] == k + 1
            rows_by_did[did] = cli.call(
                "stream/query", {"streamDid": did, "query": {"name": "messages"}}
            )["Ok"]["rows"]
        cli.call(
            "stream/set_handle", {"streamDid": dids[0], "handle": "kept.example"}
        )
    finally:
        cli.close()
        sup.close()
    return rows_by_did


def test_reshard_grow_replays_queries_and_subscriptions(spark, tmp_path):
    root = str(tmp_path / "fleet")
    dids = [f"did:plc:reshard{i}" for i in range(8)]
    rows_by_did = _ingest(spark, root, 2, dids)

    moves = plan(root, 4)
    assert moves, "grow plan should relocate at least one stream"
    summary = reshard(root, 4, verbose=False)
    assert summary["streams"] == len(dids)
    assert summary["moved"] == len(moves)
    assert summary["new_shards"] == 4

    sup = _sup(spark, root, 4)
    cli = _cli(sup)
    try:
        # every stream (moved or not) serves identical rows on its new owner
        for did in dids:
            got = cli.call(
                "stream/query", {"streamDid": did, "query": {"name": "messages"}}
            )["Ok"]["rows"]
            assert got == rows_by_did[did], did
        # physically placed on the hash shard, meta intact (incl. handle)
        for i, w in enumerate(sup._workers):
            for info in w.catalog.list_streams():
                assert shard_of(info.stream_did, 4) == i
        infos = {
            i.stream_did: i
            for w in sup._workers
            for i in w.catalog.list_streams()
        }
        assert set(infos) == set(dids)
        assert infos[dids[0]].handle == "kept.example"
        # a MOVED stream still serves live subscriptions end-to-end
        moved_did = moves[0][0]
        sub_id = cli.call(
            "stream/subscribe_events",
            {"streamDid": moved_did, "query": {"name": "messages"}},
        )["Ok"]["subscriptionId"]
        cli.call(
            "stream/event_batch",
            {
                "streamDid": moved_did,
                "payloads": [drisl.encode({"content": "post-move", "sentAt": 99})],
            },
        )
        for _ in range(10):
            kind, payload = cli.next_event(timeout=60)
            if kind == "stream/subscription_response":
                break
        else:
            pytest.fail("no push after reshard")
        assert payload["subscriptionId"] == sub_id
        assert [
            r["content"]["value"] for r in payload["response"]["Ok"]["rows"]
        ] == ["post-move"]
    finally:
        cli.close()
        sup.close()


def test_reshard_shrink_and_idempotency(spark, tmp_path):
    root = str(tmp_path / "fleet")
    dids = [f"did:plc:shrink{i}" for i in range(6)]
    rows_by_did = _ingest(spark, root, 4, dids)

    summary = reshard(root, 2, verbose=False)
    assert summary["removed_shards"] == [2, 3]
    assert not os.path.isdir(os.path.join(root, "shard2"))
    # idempotent: second run is a no-op
    again = reshard(root, 2, verbose=False)
    assert again["moved"] == 0 and again["streams"] == len(dids)

    sup = _sup(spark, root, 2)
    cli = _cli(sup)
    try:
        for did in dids:
            got = cli.call(
                "stream/query", {"streamDid": did, "query": {"name": "messages"}}
            )["Ok"]["rows"]
            assert got == rows_by_did[did], did
    finally:
        cli.close()
        sup.close()


def test_reshard_refuses_concurrent_lock(spark, tmp_path):
    root = str(tmp_path / "fleet")
    _ingest(spark, root, 2, ["did:plc:lock0"])
    lock = os.path.join(root, ".reshard.lock")
    open(lock, "w").close()
    with pytest.raises(ReshardError, match="in progress"):
        reshard(root, 4, verbose=False)
    os.unlink(lock)
    assert reshard(root, 2, verbose=False)["streams"] == 1


def test_reshard_verify_catches_tampered_meta(spark, tmp_path):
    root = str(tmp_path / "fleet")
    _ingest(spark, root, 2, ["did:plc:tamper0", "did:plc:tamper1"])
    # corrupt one shard's latest_event; verification must flag it
    for i in (0, 1):
        mp = os.path.join(root, f"shard{i}", "streams_meta.json")
        meta = json.load(open(mp))
        if meta:
            did = next(iter(meta))
            meta[did]["latest_event"] = 999
            json.dump(meta, open(mp, "w"))
            break
    with pytest.raises(ReshardError, match="latest_idx"):
        reshard(root, 2, verbose=False)
