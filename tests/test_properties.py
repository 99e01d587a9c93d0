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


# --- round-3 operator properties --------------------------------------------

_texts = st.lists(
    st.text(
        alphabet="ab c",  # tiny alphabet → frequent duplicates after normalize
        min_size=0,
        max_size=12,
    ),
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus_texts=_texts, batch_texts=_texts)
def test_incremental_dedup_invariants(spark, corpus_texts, batch_texts):
    """Output never collides with the corpus (normalized), is internally
    duplicate-free, and keeps the smallest id per surviving content."""
    import re

    from leaf_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(batch_texts)], ["doc_id", "text"]
    )
    out = incremental_dedup(batch, corpus).collect()

    def norm(t):
        return re.sub(r"\s+", " ", t.lower()).strip()

    corpus_norms = {norm(t) for t in corpus_texts}
    out_norms = [norm(r["text"]) for r in out]
    assert not (set(out_norms) & corpus_norms)          # nothing already known
    assert len(out_norms) == len(set(out_norms))        # no intra-batch dups
    # first-occurrence-wins: each surviving norm carries the smallest doc_id
    firsts = {}
    for i, t in enumerate(batch_texts):
        firsts.setdefault(norm(t), 100 + i)
    for r in out:
        assert r["doc_id"] == firsts[norm(r["text"])]


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_texts)
def test_gopher_filter_total_and_deterministic(spark, texts):
    """The gate is total (one verdict per input row, no drops/dups) and
    keep == AND of the individual rules."""
    from leaf_spark.operators.text import gopher_filter

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    rows = gopher_filter(df).collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(len(texts)))
    for r in rows:
        rules = [
            r["r_len"], r["r_avg_len"], r["r_symbol"],
            r["r_bullet"], r["r_alpha_word"], r["r_stopword"],
        ]
        assert r["keep"] == all(rules)
