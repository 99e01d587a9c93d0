"""Property-based tests (SURVEY §5 plan items 3-4, hypothesis-driven):

- fold determinism: the same event sequence applied in ANY batch split
  yields the same materialized state, and a fresh replay from the log
  (the recovery path) reproduces it exactly;
- subscription pagination completeness: the concatenation of `$start`/
  `$limit` pages equals the contiguous range query for every page size.

Examples are few (Spark jobs per example) but each is a full engine pass.
"""

from hypothesis import HealthCheck, given, settings, strategies as st

from leaf_spark import drisl
from leaf_spark.stream import Stream
from leaf_spark.types import IncomingEvent, LeafQuery

from .fixtures import CHAT, COUNTER, bump, msg

_names = st.sampled_from(["a", "b", "c"])
_bumps = st.lists(
    st.tuples(_names, st.integers(min_value=-5, max_value=5)), min_size=1, max_size=8
)


def _split(items, cuts):
    """Partition items at the (sorted, deduped) cut points."""
    idxs = sorted({c % (len(items) + 1) for c in cuts})
    out, prev = [], 0
    for i in idxs:
        if i > prev:
            out.append(items[prev:i])
            prev = i
    if prev < len(items):
        out.append(items[prev:])
    return out


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(bumps=_bumps, cuts=st.lists(st.integers(0, 7), max_size=3))
def test_fold_deterministic_across_batch_splits_and_replay(
    spark, tmp_path_factory, bumps, cuts
):
    events = [bump("did:plc:u", name, delta) for name, delta in bumps]

    # apply in the generated batch split
    root_a = str(tmp_path_factory.mktemp("prop_a"))
    sa = Stream(spark, root_a, "did:plc:prop")
    sa.provide_module(COUNTER)
    for batch in _split(events, cuts):
        sa.add_events(batch)

    # apply in one batch
    root_b = str(tmp_path_factory.mktemp("prop_b"))
    sb = Stream(spark, root_b, "did:plc:prop")
    sb.provide_module(COUNTER)
    sb.add_events(events)

    qa = sa.query(None, LeafQuery("counters"))
    qb = sb.query(None, LeafQuery("counters"))
    assert qa == qb

    # expected final state, computed independently
    expect: dict[str, int] = {}
    for name, delta in bumps:
        expect[name] = expect.get(name, 0) + delta
    assert {r["name"]: r["value"] for r in qa} == expect

    # fresh-process replay from the log reproduces it
    sr = Stream(spark, root_a, "did:plc:prop")
    sr.provide_module(COUNTER)
    assert sr.query(None, LeafQuery("counters")) == qa


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(page=st.integers(min_value=1, max_value=15), start=st.integers(1, 12))
def test_pagination_concat_equals_range(paged_stream, page, start):
    s, total = paged_stream
    full = s.query(None, LeafQuery("messages", start=start, limit=total))
    pages, cursor = [], start
    while True:
        rows = s.query(None, LeafQuery("messages", start=cursor, limit=page))
        pages.extend(rows)
        if len(rows) < page:
            break
        cursor = rows[-1]["idx"] + 1
    assert pages == full
    assert [r["idx"] for r in pages] == list(range(start, total + 1))


import pytest  # noqa: E402


@pytest.fixture(scope="module")
def paged_stream(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("paged"))
    s = Stream(spark, root, "did:plc:paged")
    s.provide_module(CHAT)
    n = 12
    s.add_events([msg("did:plc:u", f"m{i}", 100 + i) for i in range(n)])
    return s, n
