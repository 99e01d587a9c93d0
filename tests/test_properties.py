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


# ---------------------------------------------------------------------------
# round-4 curation/sampling operators: the md5-derived math is engine-
# portable by design, so a pure-Python oracle can recompute every result
# EXACTLY (no tolerance) — the strongest determinism property available.
# ---------------------------------------------------------------------------

import hashlib
import math


def _md5_u32_py(*parts) -> int:
    return int(hashlib.md5(":".join(str(p) for p in parts).encode()).hexdigest()[:8], 16)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=5, max_value=60),
    k=st.integers(min_value=2, max_value=9),
)
def test_rendezvous_shard_matches_python_recompute(spark, n, k):
    from pyspark.sql import functions as F

    from leaf_spark.operators.sampling import rendezvous_shard

    docs = spark.range(0, n).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r["shard"] for r in rendezvous_shard(docs, k).collect()}
    for d in range(n):
        # argmax weight, ties to the lowest shard id
        exp = max(range(k), key=lambda s: (_md5_u32_py(d, s), -s))
        assert got[d] == exp


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    weights=st.lists(st.integers(min_value=1, max_value=500), min_size=4, max_size=40),
    kk=st.integers(min_value=1, max_value=10),
)
def test_weighted_sample_matches_python_recompute(spark, weights, kk):
    from pyspark.sql import functions as F

    from leaf_spark.operators.sampling import weighted_sample

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id bigint, tok bigint")
    k = min(kk, len(rows))
    got = [(r["doc_id"], r["priority"]) for r in weighted_sample(df, k, "tok").collect()]

    pri = []
    for i, w in rows:
        u = (_md5_u32_py("ws", i) + 1.0) / 4294967297.0
        pri.append((round(-math.log(u) / float(w), 6), i, w))
    exp = [(i, p) for p, i, _ in sorted(pri)[:k]]
    assert got == exp


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    weights=st.lists(st.integers(min_value=1, max_value=200), min_size=3, max_size=40),
    target=st.integers(min_value=1, max_value=30),
)
def test_systematic_sample_matches_python_recompute(spark, weights, target):
    from leaf_spark.operators.sampling import systematic_sample

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id bigint, tok bigint")
    got = {(r["doc_id"], r["cum"], r["bucket"])
           for r in systematic_sample(df, target, "tok").collect()}

    total, cum, exp = sum(weights), 0, set()
    for i, w in rows:
        prev = cum
        cum += w
        if (cum * target) // total > (prev * target) // total:
            exp.add((i, cum, (cum * target) // total))
    assert got == exp
    # ≤ target picks always; exactly target when no weight spans 2 buckets
    assert len(got) <= target


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    tr=st.lists(st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=6),
                min_size=1, max_size=8),
    ho=st.lists(st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=6),
                min_size=1, max_size=4),
)
def test_doc_contamination_matches_bruteforce(spark, tr, ho):
    from leaf_spark.operators.curation import doc_contamination

    train = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(tr)], "doc_id bigint, text string"
    )
    hold = spark.createDataFrame(
        [(100 + i, " ".join(ws)) for i, ws in enumerate(ho)], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: (r["holdout_id"], r["jaccard"])
           for r in doc_contamination(train, hold, threshold=0.0).collect()}

    exp = {}
    for i, ws in enumerate(tr):
        a = set(ws)
        best = None
        for j, hs in enumerate(ho):
            b = set(hs)
            inter = len(a & b)
            if inter == 0:
                continue  # the inverted index only surfaces word-sharing pairs
            jac = round(inter / len(a | b), 6)
            cand = (jac, -(100 + j))
            if best is None or cand > best:
                best = cand
        if best is not None:
            exp[i] = (-best[1], best[0])
    assert got == exp


# ---------------------------------------------------------------------------
# BPE: the Spark dataflow must reproduce the canonical sequential algorithm
# ---------------------------------------------------------------------------


def _bpe_python(words: list[str], k: int):
    """Reference implementation — straight from the Sennrich pseudocode:
    sequential greedy merge application, argmax by (count, lexicographic)."""
    from collections import Counter

    vocab = {}
    for w in words:
        vocab[w] = vocab.get(w, 0) + 1
    seqs = {w: [*w, "</w>"] for w in vocab}
    merges = []
    for _ in range(k):
        counts = Counter()
        for w, f in vocab.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        # argmax: count desc, then lexicographically smallest (l, r)
        top = max(counts.values())
        cand = sorted([p for p, c in counts.items() if c == top])
        l, r = cand[0]
        merges.append((l, r, top))
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    total = sum(f * len(seqs[w]) for w, f in vocab.items())
    return merges, total


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=5), min_size=2, max_size=25
    ),
    k=st.integers(min_value=1, max_value=3),
)
def test_bpe_matches_sequential_reference(spark, words, k):
    from leaf_spark.operators.bpe import bpe_merges

    docs = spark.createDataFrame([(1, " ".join(words))], "id int, text string")
    got = bpe_merges(docs, num_merges=k).collect()
    exp_merges, exp_total = _bpe_python(words, k)
    assert [(r["left"], r["right"], r["pair_count"]) for r in got] == [
        (l, r, c) for l, r, c in exp_merges
    ]
    if got:
        assert got[-1]["corpus_syms_after"] == exp_total


@given(
    counts=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=60)
)
@settings(max_examples=200, deadline=None)
def test_gini_mean_difference_equals_rank_form(counts):
    """The q118/q122 histogram mean-difference Gini is ALGEBRAICALLY the
    classic rank form 2Σi·x_(i)/(nΣx) − (n+1)/n — checked exactly in
    rationals (fractions), so the SQL rewrite can never drift."""
    from fractions import Fraction

    n = len(counts)
    total = sum(counts)
    xs = sorted(counts)
    rank_form = (
        Fraction(2 * sum((i + 1) * x for i, x in enumerate(xs)), n * total)
        - Fraction(n + 1, n)
    )
    mean_diff = Fraction(
        sum(abs(a - b) for a in counts for b in counts), 2 * n * total
    )
    assert rank_form == mean_diff


@given(u=st.floats(min_value=1e-12, max_value=1.0, exclude_max=True))
@settings(max_examples=300, deadline=None)
def test_discrete_laplace_closed_form_cdf_matches_direct_sum(u):
    """q127's closed-form CDF over powers of two must pick the same k as a
    direct probability-mass summation of the α=1/2 two-sided geometric."""
    # closed form (the SQL expression)
    def W(k: int) -> float:
        if k < 0:
            return 1.0 / (1 << (-k - 1)) - 1.0 / 1048576.0
        return 3.0 - 1.0 / 1048576.0 - 1.0 / (1 << k)

    target = 3.0 * u
    k_closed = next((k for k in range(-20, 21) if W(k) >= target), 20)

    # direct sum of 3·P(j) = 2^{-|j|} truncated to [-20, 20]
    acc = 0.0
    k_direct = 20
    for k in range(-20, 21):
        acc += 2.0 ** (-abs(k))
        if acc >= target:
            k_direct = k
            break
    assert k_closed == k_direct


@given(
    xs=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=2, max_size=40
    )
)
@settings(max_examples=200, deadline=None)
def test_znorm_integer_algebra_matches_statistics(xs):
    """q135's integer mean/variance algebra (n·Σx² − (Σx)²)/n² equals the
    population variance — exact in rationals."""
    from fractions import Fraction

    n = len(xs)
    s1, s2 = sum(xs), sum(x * x for x in xs)
    algebra = Fraction(n * s2 - s1 * s1, n * n)
    mean = Fraction(s1, n)
    direct = sum((Fraction(x) - mean) ** 2 for x in xs) / n
    assert algebra == direct


# ---------------------------------------------------------------------------
# SQLite-dialect shim properties: json_each rewrite, TEXT date()/datetime()
# ---------------------------------------------------------------------------

_json_scalars = st.one_of(
    st.integers(min_value=-10**6, max_value=10**6),
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x7F
        ),
        max_size=8,
    ),
)
_json_keys = st.text(
    alphabet=st.characters(whitelist_categories=("Ll",), max_codepoint=0x7F),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    doc=st.one_of(
        st.lists(_json_scalars, min_size=1, max_size=6),
        st.dictionaries(_json_keys, _json_scalars, min_size=1, max_size=6),
    )
)
def test_json_each_enumerates_any_flat_document(spark, doc):
    """For ANY flat JSON array/object, json_each must yield exactly the
    Python-side items: arrays keyed by stringified index, objects by key,
    values as text — the reference's (SQLite json1) flat contract."""
    import json

    from leaf_spark.sqlcompat import translate

    payload = json.dumps(doc).replace("'", "''")
    sql = translate(f"select key, value from json_each('{payload}')")
    got = {(r["key"], r["value"]) for r in spark.sql(sql).collect()}
    if isinstance(doc, list):
        want = {(str(i), str(v)) for i, v in enumerate(doc)}
    else:
        want = {(k, str(v)) for k, v in doc.items()}
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    epoch=st.integers(min_value=0, max_value=2**31 - 1),
    days=st.integers(min_value=-400, max_value=400),
)
def test_date_and_datetime_return_sqlite_text(spark, epoch, days):
    """date()/datetime() must return TEXT in SQLite's exact rendering
    ('YYYY-MM-DD' / 'YYYY-MM-DD HH:MM:SS') for any epoch base and day
    modifier — checked against Python's datetime as the independent
    reference implementation."""
    import datetime as dt

    from leaf_spark.sqlcompat import translate

    sql = translate(
        f"select datetime({epoch}, 'unixepoch', '{days:+d} days') as d8, "
        f"date({epoch}, 'unixepoch', '{days:+d} days') as d"
    )
    r = spark.sql(sql).collect()[0]
    base = dt.datetime(1970, 1, 1) + dt.timedelta(seconds=epoch, days=days)
    assert isinstance(r["d8"], str) and isinstance(r["d"], str)
    assert r["d8"] == base.strftime("%Y-%m-%d %H:%M:%S")
    assert r["d"] == base.strftime("%Y-%m-%d")


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-4.0, max_value=4.0,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=8, max_size=8,
        ),
        min_size=2, max_size=12,
    )
)
def test_embedding_covariance_matches_python_recompute(spark, vecs):
    """q141's exact covariance numerators equal a pure-Python integer
    recompute for ANY float32 input — the quantization boundary is the
    only place float semantics could leak in."""
    import math

    from leaf_spark.queries_curation import _cov_sql

    rows = [
        (i, list(v) + [0.0] * 56, 0) for i, v in enumerate(vecs)
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).createOrReplaceTempView("embeddings")
    out = {
        (r["i"], r["j"]): (r["n"], r["cov_num"])
        for r in spark.sql(_cov_sql("element_at(embedding, {k})")).collect()
    }
    import struct

    def f32(x):  # what the engine sees after the float32 column round-trip
        return struct.unpack("f", struct.pack("f", x))[0]

    q = [[math.floor(f32(v[k]) * 1024) for k in range(8)] for v in vecs]
    n = len(vecs)
    for i in range(8):
        for j in range(i, 8):
            si = sum(r[i] for r in q)
            sj = sum(r[j] for r in q)
            pij = sum(r[i] * r[j] for r in q)
            assert out[(i + 1, j + 1)] == (n, n * pij - si * sj)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    la=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=15),
    lb=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=15),
)
def test_ks_statistic_matches_python_recompute(spark, la, lb):
    """q144's integer KS numerator equals the brute-force two-sample KS
    over any pair of length multisets (source 'a' padded to stay the
    largest so the top-2 selection is deterministic)."""
    from leaf_spark.queries_curation import _Q144_BODY

    # make sizes differ so (order by n desc, source) picks a then b
    la = la + [1] * (len(lb) + 1)
    rows, did = [], 0
    for n in la:
        rows.append((did, "x" * n, "en", "a", n)); did += 1
    for n in lb:
        rows.append((did, "x" * n, "en", "b", n)); did += 1
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).createOrReplaceTempView("documents")
    r = spark.sql(_Q144_BODY).collect()[0]
    na, nb = len(la), len(lb)
    support = sorted(set(la) | set(lb))
    d_num = max(
        abs(sum(1 for v in la if v <= s) * nb - sum(1 for v in lb if v <= s) * na)
        for s in support
    )
    assert (r["source_a"], r["source_b"]) == ("a", "b")
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert r["d_num"] == d_num
