"""Structured Streaming integration over the event log."""

import pytest

from leaf_spark.streaming.source import idx_window_counts, run_available_now
from leaf_spark.stream import Stream

from .fixtures import CHAT, msg


@pytest.fixture(scope="module")
def populated(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sstream"))
    s = Stream(spark, root, "did:plc:ss")
    s.provide_module(CHAT)
    # three commits → three parquet files → three streaming inputs
    for batch in range(3):
        s.add_events([msg("did:plc:u", f"m{batch}-{i}", batch * 10 + i) for i in range(5)])
    return s


def test_readstream_drains_log(spark, populated, tmp_path):
    run_available_now(
        populated,
        lambda src: idx_window_counts(src, window_size=10),
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_table="ss_counts",
    )
    rows = {r["idx_bucket"]: r for r in spark.table("ss_counts").collect()}
    assert rows[0]["n_events"] == 9  # idx 1..9
    assert rows[1]["n_events"] == 6  # idx 10..15
    assert rows[0]["first_idx"] == 1
    assert rows[1]["last_idx"] == 15
    total = sum(r["n_events"] for r in rows.values())
    assert total == populated.state.latest_idx
