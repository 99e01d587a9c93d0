"""Planted-data semantics tests for q188-q195 (queries_eval.py) — the
test_stats_semantics discipline: run each entry's Spark-dialect SQL over
tiny hand-built views and compare against FIRST-PRINCIPLES Python
recomputes (never DuckDB — the differential gate already does that on
the real tables)."""

from __future__ import annotations

import hashlib
import math
from datetime import datetime, timezone
from fractions import Fraction

import pytest


def _mk(spark, name, schema, rows):
    spark.createDataFrame(rows, schema).createOrReplaceTempView(name)


def _nib(salt: str, vec_id: int) -> int:
    return int(hashlib.md5(f"{salt}:{vec_id}".encode()).hexdigest()[0], 16)


def _rate(salt: str, vec_id: int, label: int, k: int) -> int:
    return (label + k) % 10 if _nib(salt, vec_id) < 3 else label


# ---------------------------------------------------------------------------
# q188 ECE
# ---------------------------------------------------------------------------


def test_ece_matches_exact_fraction(spark):
    rows = [(i, [((i * 7) % 21 - 10) / 10.0] + [0.0] * 3, i % 10) for i in range(60)]
    _mk(spark, "embeddings", "vec_id bigint, embedding array<float>, label int", rows)
    from leaf_spark.queries_eval import _Q188_BODY

    r = spark.sql(_Q188_BODY.replace("{E1}", "element_at(embedding, 1)")).collect()[0]
    # Python recompute from first principles
    bins: dict = {}
    for _, emb, lab in rows:
        # float32 storage: quantize through float32 like the engine does
        import struct

        e1 = struct.unpack("f", struct.pack("f", emb[0]))[0]
        sm = min(max(int(math.floor((e1 + 1.0) * 500)), 0), 999)
        b = sm // 100
        n, p, s = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, p + (1 if lab >= 5 else 0), s + sm)
    num = sum(abs(1000 * p - s) for _, p, s in bins.values())
    den = 1000 * sum(n for n, _, _ in bins.values())
    assert (r["n_bins"], r["n_docs"]) == (len(bins), 60)
    assert (r["ece_num"], r["ece_den"]) == (num, den)
    assert r["ece"] == pytest.approx(num / den, abs=1e-6)


def test_ece_zero_for_perfectly_calibrated_bins(spark):
    # score mass == 1000*positives in every bin -> ECE exactly 0:
    # score 0.25 (milli 625... pick scores that are exact) — use pairs
    # (score_milli 500 pos 1, score_milli 500 pos 0) -> per-bin mass
    # 1000 = 1000*1positives over 2 docs in one bin
    rows = [(0, [0.0] * 4, 9), (1, [0.0] * 4, 0)]  # e1=0 -> sm=500, pos 1+0
    _mk(spark, "embeddings", "vec_id bigint, embedding array<float>, label int", rows)
    from leaf_spark.queries_eval import _Q188_BODY

    r = spark.sql(_Q188_BODY.replace("{E1}", "element_at(embedding, 1)")).collect()[0]
    assert r["ece_num"] == 0 and r["ece"] == 0.0


# ---------------------------------------------------------------------------
# q189 MRR / q190 P-R@10 — controlled tf: doc i repeats 'spark' i times
# ---------------------------------------------------------------------------


def _plant_retrieval_docs(spark):
    docs = []
    # doc i contains the term 'spark' i times padded to length 20 with
    # unique fillers -> sys_score strictly increases with i
    for i in range(1, 13):
        words = ["spark"] * i + [f"w{i}x{j}" for j in range(20 - i)]
        docs.append((i, " ".join(words), "en", "s", len(" ".join(words))))
    # one doc for 'join' with tf 1 only (no relevant doc under tf>=2)
    docs.append((100, "join alone here", "en", "s", 15))
    _mk(
        spark,
        "documents",
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
        docs,
    )


def test_mrr_first_relevant_rank(spark):
    _plant_retrieval_docs(spark)
    from leaf_spark.queries_eval import _Q189_FINAL
    from leaf_spark.queries_retrieval import _q165_sql

    rows = {
        r["term"]: r
        for r in spark.sql(
            _Q189_FINAL.replace("{SCORED}", "(" + _q165_sql("spark") + ")")
        ).collect()
    }
    # 'spark': every doc has tf>=1; ranked by tf/dl descending -> doc 12
    # first with tf 12 >= 2 -> first_rel_rank 1, rr 1.0
    assert rows["spark"]["first_rel_rank"] == 1
    assert float(rows["spark"]["rr_at_10"]) == 1.0
    # 'join': only tf=1 doc -> no relevant in topk -> NULL rank, rr 0
    assert rows["join"]["first_rel_rank"] is None
    assert float(rows["join"]["rr_at_10"]) == 0.0


def test_precision_recall_counts(spark):
    _plant_retrieval_docs(spark)
    from leaf_spark.queries_eval import _Q190_FINAL
    from leaf_spark.queries_retrieval import _q165_sql

    scored = spark.sql(_q165_sql("spark")).localCheckpoint()
    scored.createOrReplaceTempView("__t190__")
    rows = {
        r["term"]: r
        for r in spark.sql(_Q190_FINAL.replace("{SCORED}", "__t190__")).collect()
    }
    # 'spark': 12 candidates, 11 relevant (tf>=2: docs 2..12); top-10 by
    # score holds the 10 highest-tf docs (3..12), all relevant
    r = rows["spark"]
    assert (r["rel_in_k"], r["k_eff"], r["n_rel"]) == (10, 10, 11)
    assert float(r["precision_at_10"]) == 1.0
    assert float(r["recall_at_10"]) == pytest.approx(10 / 11, abs=1e-6)
    # 'join': no relevant docs -> recall NULL (0/0), precision 0
    r = rows["join"]
    assert (r["rel_in_k"], r["n_rel"]) == (0, None)
    assert float(r["precision_at_10"]) == 0.0
    assert r["recall_at_10"] is None


# ---------------------------------------------------------------------------
# q191 Fleiss kappa
# ---------------------------------------------------------------------------


def _fleiss_py(items):
    """Exact-fraction Fleiss kappa from (vec_id, label) items with the
    q191 rater model."""
    n = len(items)
    m = 3
    s = 0
    cols: dict = {}
    for vid, lab in items:
        rs = [_rate(f"f{k}", vid, lab, k) for k in (1, 2, 3)]
        counts: dict = {}
        for r in rs:
            counts[r] = counts.get(r, 0) + 1
            cols[r] = cols.get(r, 0) + 1
        s += sum(c * c for c in counts.values())
    c_sq = sum(c * c for c in cols.values())
    num = (s - n * m) * (n * m) ** 2 - n * m * (m - 1) * c_sq
    den = n * m * (m - 1) * ((n * m) ** 2 - c_sq)
    return s, c_sq, num, den


def test_fleiss_kappa_matches_exact_python(spark):
    items = [(i, (i * 3) % 10) for i in range(120)]
    rows = [(vid, [0.0] * 4, lab) for vid, lab in items]
    _mk(spark, "embeddings", "vec_id bigint, embedding array<float>, label int", rows)
    from leaf_spark.queries_eval import _q191_sql

    r = spark.sql(_q191_sql("spark")).collect()[0]
    s, c_sq, num, den = _fleiss_py(items)
    assert (r["n_items"], r["s_sum"]) == (120, s)
    assert int(r["c_sq"]) == c_sq
    assert Fraction(int(r["kappa_num"]), int(r["kappa_den"])) == Fraction(num, den)


def test_fleiss_kappa_perfect_agreement_is_one(spark):
    # vec_ids whose md5 nibble >= 3 for all three salts -> all raters
    # return the stored label -> kappa == 1 exactly (num == den)
    clean = [
        v
        for v in range(600)
        if all(_nib(f"f{k}", v) >= 3 for k in (1, 2, 3))
    ][:40]
    assert len(clean) == 40
    rows = [(v, [0.0] * 4, v % 10) for v in clean]
    _mk(spark, "embeddings", "vec_id bigint, embedding array<float>, label int", rows)
    from leaf_spark.queries_eval import _q191_sql

    r = spark.sql(_q191_sql("spark")).collect()[0]
    assert int(r["kappa_num"]) == int(r["kappa_den"]) != 0


# ---------------------------------------------------------------------------
# q192 RFM
# ---------------------------------------------------------------------------


def test_rfm_quintiles_match_python(spark):
    ts0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = []
    eid = 0
    # user u has u+1 events, last on day u (distinct recency/freq ranks)
    for u in range(10):
        for j in range(u + 1):
            eid += 1
            rows.append(
                (
                    eid,
                    datetime(2024, 1, 1 + u, 12, j, tzinfo=timezone.utc),
                    u,
                    "click",
                    10.0 * (u + 1),
                    "{}",
                )
            )
    _mk(
        spark,
        "events",
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
        rows,
    )
    from leaf_spark.queries_eval import _q192_sql

    got = [r.asDict() for r in spark.sql(_q192_sql("spark")).collect()]

    # python recompute
    users: dict = {}
    for eid_, ts, u, _t, v, _p in rows:
        d = ts.timestamp() * 1_000_000 // 86400000000
        last, freq, m = users.get(u, (-1, 0, 0))
        users[u] = (max(last, d), freq + 1, m + int(math.floor(v * 1000 + 0.5)))
    maxd = max(l for l, _, _ in users.values())
    nu = len(users)
    recs = sorted(maxd - l for l, _, _ in users.values())
    freqs = sorted(f for _, f, _ in users.values())

    def quint(sorted_vals, v):
        cum = sum(1 for x in sorted_vals if x <= v)
        return (5 * cum + nu - 1) // nu

    segs: dict = {}
    for l, f, m in users.values():
        rq = quint(recs, maxd - l)
        fq = quint(freqs, f)
        mb = 0 if m <= 0 else m.bit_length()
        n, sm = segs.get((rq, fq, mb), (0, 0))
        segs[(rq, fq, mb)] = (n + 1, sm + m)
    expect = {
        k: v for k, v in segs.items()
    }
    got_map = {
        (r["r_quintile"], r["f_quintile"], r["m_band"]): (
            r["n_users"],
            r["sum_m_milli"],
        )
        for r in got
    }
    assert got_map == expect


# ---------------------------------------------------------------------------
# q193 burstiness
# ---------------------------------------------------------------------------


def test_burstiness_periodic_is_minus_one_and_matches_moments(spark):
    ts0 = datetime(2024, 3, 1, tzinfo=timezone.utc)

    def at(sec):
        return datetime.fromtimestamp(ts0.timestamp() + sec, tz=timezone.utc)

    rows = []
    # periodic stream: constant 60s gaps -> sigma 0 -> B = -1
    for j in range(6):
        rows.append((j, at(60 * j), 1, "tick", 1.0, "{}"))
    # bursty stream: gaps 1,1,1,597 -> known moments
    for j, sec in enumerate([0, 1, 2, 3, 600]):
        rows.append((100 + j, at(sec), 2, "burst", 1.0, "{}"))
    _mk(
        spark,
        "events",
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
        rows,
    )
    from leaf_spark.queries_eval import _Q193_BODY, _EPOCHUS_SPARK

    got = {
        r["event_type"]: r
        for r in spark.sql(_Q193_BODY.replace("{EPOCHUS}", _EPOCHUS_SPARK)).collect()
    }
    t = got["tick"]
    assert t["n_gaps"] == 5 and int(t["sum_gap_us"]) == 5 * 60_000_000
    assert float(t["burstiness"]) == -1.0
    b = got["burst"]
    gaps = [1_000_000, 1_000_000, 1_000_000, 597_000_000]
    sx, sxx, n = sum(gaps), sum(g * g for g in gaps), len(gaps)
    assert (b["n_gaps"], int(b["sum_gap_us"]), int(b["sum_gap_sq"])) == (n, sx, sxx)
    sig = math.sqrt(n * sxx - sx * sx)
    assert float(b["burstiness"]) == pytest.approx((sig - sx) / (sig + sx), abs=1e-6)


# ---------------------------------------------------------------------------
# q194 Heaps
# ---------------------------------------------------------------------------


def test_heaps_curve_matches_python(spark):
    # 40 docs, doc i = 10 words drawn from a growing vocabulary so new
    # shingle types keep appearing
    docs = []
    for i in range(40):
        words = [f"w{(i * 10 + j) % (5 + i)}" for j in range(10)]
        docs.append((i, " ".join(words), "en", "s", 0))
    _mk(
        spark,
        "documents",
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
        docs,
    )
    from leaf_spark.queries_eval import _q194_sql

    got = [r.asDict() for r in spark.sql(_q194_sql("spark")).collect()]

    wd = max((39 + 1) // 20, 1)
    first: dict = {}
    toks: dict = {}
    for i, text, *_ in docs:
        ws = text.split()
        b = i // wd
        for k in range(len(ws) - 2):
            sh = " ".join(ws[k : k + 3])
            toks[b] = toks.get(b, 0) + 1
            if sh not in first or first[sh] > b:
                first[sh] = min(first.get(sh, b), b)
    buckets = sorted(toks)
    cum_t, cum_v = {}, {}
    rt = rv = 0
    newv: dict = {}
    for sh, b in first.items():
        newv[b] = newv.get(b, 0) + 1
    for b in buckets:
        rt += toks[b]
        rv += newv.get(b, 0)
        cum_t[b], cum_v[b] = rt, rv
    for r in got:
        assert (r["cum_tokens"], r["cum_vocab"]) == (
            cum_t[r["bucket"]],
            cum_v[r["bucket"]],
        )
    # OLS beta on (ln cum_t, ln cum_v)
    xs = [math.log(cum_t[b]) for b in buckets]
    ys = [math.log(cum_v[b]) for b in buckets]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert float(got[0]["heaps_beta"]) == pytest.approx(beta, abs=1e-5)


# ---------------------------------------------------------------------------
# q195 Mann-Kendall
# ---------------------------------------------------------------------------


def _plant_daily_counts(spark, counts):
    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for j in range(c):
            eid += 1
            rows.append(
                (
                    eid,
                    datetime(2024, 5, 1 + d, 10, j % 60, tzinfo=timezone.utc),
                    j,
                    "click",
                    1.0,
                    "{}",
                )
            )
    _mk(
        spark,
        "events",
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
        rows,
    )


def test_mann_kendall_strict_trend(spark):
    counts = [1, 2, 3, 4, 5, 6, 7]
    _plant_daily_counts(spark, counts)
    from leaf_spark.queries_eval import _q195_sql

    r = spark.sql(_q195_sql("spark")).collect()[0]
    n = len(counts)
    assert r["n_days"] == n
    assert r["s_stat"] == n * (n - 1) // 2  # every pair increasing
    var_num = n * (n - 1) * (2 * n + 5)  # no ties
    assert r["var_num"] == var_num
    z = (r["s_stat"] - 1.0) / math.sqrt(var_num / 18.0)
    assert float(r["z"]) == pytest.approx(z, abs=1e-6)


def test_mann_kendall_all_tied_is_null(spark):
    counts = [3, 3, 3, 3]
    _plant_daily_counts(spark, counts)
    from leaf_spark.queries_eval import _q195_sql

    r = spark.sql(_q195_sql("spark")).collect()[0]
    assert r["s_stat"] == 0
    assert r["var_num"] == 0  # n(n-1)(2n+5) fully cancelled by the tie term
    assert r["z"] is None


def test_mann_kendall_matches_python_random(spark):
    import random

    rng = random.Random(7)
    counts = [rng.randint(1, 6) for _ in range(12)]
    _plant_daily_counts(spark, counts)
    from leaf_spark.queries_eval import _q195_sql

    r = spark.sql(_q195_sql("spark")).collect()[0]
    n = len(counts)
    s = sum(
        (counts[j] > counts[i]) - (counts[j] < counts[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = Counter(counts)
    var_num = n * (n - 1) * (2 * n + 5) - sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1
    )
    assert (r["s_stat"], r["var_num"]) == (s, var_num)
    if var_num > 0:
        cc = -1.0 if s > 0 else (1.0 if s < 0 else 0.0)
        z = 0.0 if s == 0 else (s + cc) / math.sqrt(var_num / 18.0)
        assert float(r["z"]) == pytest.approx(z, abs=1e-6)


# ---------------------------------------------------------------------------
# q196 Wilson interval (SHARED-BODY — this is its named semantics test)
# ---------------------------------------------------------------------------


def _plant_conversions(spark, spec):
    """spec: {event_type: (n, x)} — x rows convert (value 150), rest 50."""
    rows = []
    eid = 0
    for et, (n, x) in spec.items():
        for j in range(n):
            eid += 1
            rows.append(
                (
                    eid,
                    datetime(2024, 6, 1, (eid * 7) % 24, 0, tzinfo=timezone.utc),
                    j,
                    et,
                    150.0 if j < x else 50.0,
                    "{}",
                )
            )
    _mk(
        spark,
        "events",
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
        rows,
    )
    return rows


def test_wilson_interval_matches_closed_form(spark):
    spec = {"click": (40, 10), "view": (7, 7), "purchase": (5, 0)}
    _plant_conversions(spark, spec)
    from leaf_spark.queries_eval import _Q196_BODY

    got = {r["event_type"]: r for r in spark.sql(_Q196_BODY).collect()}
    z = 1.959964
    for et, (n, x) in spec.items():
        r = got[et]
        assert (r["n"], r["x"]) == (n, x)
        center = (x + z * z / 2) / (n + z * z)
        half = z * math.sqrt(x * (n - x) / n + z * z / 4) / (n + z * z)
        assert float(r["wilson_lo"]) == pytest.approx(center - half, abs=2e-6)
        assert float(r["wilson_hi"]) == pytest.approx(center + half, abs=2e-6)
        # the reason Wilson over Wald: bounds stay inside [0, 1] even at
        # p-hat = 0 or 1
        assert 0.0 <= float(r["wilson_lo"]) <= float(r["wilson_hi"]) <= 1.0
        if x in (0, n):
            assert float(r["wilson_hi"]) < 1.0 or x == n
            assert float(r["wilson_lo"]) > 0.0 or x == 0


# ---------------------------------------------------------------------------
# q197 Cochran-Armitage (SHARED-BODY — this is its named semantics test)
# ---------------------------------------------------------------------------


def _plant_dose_groups(spark, et_spec):
    """et_spec: {event_type: [(dose, n, x), ...]} with dose in 0..2 ->
    hour = dose*8 (+1 for variety, stays in band)."""
    rows = []
    eid = 0
    for et, groups in et_spec.items():
        for dose, n, x in groups:
            for j in range(n):
                eid += 1
                rows.append(
                    (
                        eid,
                        datetime(
                            2024, 6, 2, dose * 8 + (j % 8), 5, tzinfo=timezone.utc
                        ),
                        j,
                        et,
                        150.0 if j < x else 50.0,
                        "{}",
                    )
                )
    _mk(
        spark,
        "events",
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
        rows,
    )


def _ca_py(groups):
    n = sum(g[1] for g in groups)
    x = sum(g[2] for g in groups)
    sx = sum(s * xi for s, _, xi in groups)
    sn = sum(s * ni for s, ni, _ in groups)
    nss = sum(ni * s * s for s, ni, _ in groups)
    p = x / n
    var = p * (1 - p) * (nss - sn * sn / n)
    t = sx - p * sn
    return (n, x, sx, sn, nss, None if var <= 0 else t / math.sqrt(var))


def test_cochran_armitage_matches_closed_form(spark):
    spec = {
        # monotone increasing conversion with dose -> strongly positive z
        "click": [(0, 30, 3), (1, 30, 12), (2, 30, 24)],
        # flat conversion -> z near 0 (but exact per closed form)
        "view": [(0, 20, 5), (1, 20, 5), (2, 20, 5)],
        # zero variance (all convert) -> NULL z
        "purchase": [(0, 4, 4), (1, 4, 4), (2, 4, 4)],
    }
    _plant_dose_groups(spark, spec)
    from leaf_spark.queries_eval import _Q197_BODY

    got = {r["event_type"]: r for r in spark.sql(_Q197_BODY).collect()}
    for et, groups in spec.items():
        n, x, sx, sn, nss, z = _ca_py(groups)
        r = got[et]
        assert (r["n"], r["x"], r["sum_sx"], r["sum_sn"], r["sum_nss"]) == (
            n,
            x,
            sx,
            sn,
            nss,
        )
        if z is None:
            assert r["ca_z"] is None
        else:
            assert float(r["ca_z"]) == pytest.approx(z, abs=1e-6)
    assert float(got["click"]["ca_z"]) > 3.0  # the planted trend is real
    assert abs(float(got["view"]["ca_z"])) < 1e-9


# ---------------------------------------------------------------------------
# q198 trigram paths (SHARED-BODY — this is its named semantics test)
# ---------------------------------------------------------------------------


def test_trigram_paths_planted_sequences(spark):
    rows = []
    eid = 0
    # user 1: v,c,p,v,c,p -> trigrams vcp, cpv, pvc, vcp (vcp x2)
    seq1 = ["view", "click", "purchase", "view", "click", "purchase"]
    for j, et in enumerate(seq1):
        eid += 1
        rows.append((eid, datetime(2024, 7, 1, 10, j, tzinfo=timezone.utc), 1, et, 1.0, "{}"))
    # user 2: v,v,v -> one vvv
    for j in range(3):
        eid += 1
        rows.append((eid, datetime(2024, 7, 1, 11, j, tzinfo=timezone.utc), 2, "view", 1.0, "{}"))
    # user 3: only 2 events -> no trigram
    for j in range(2):
        eid += 1
        rows.append((eid, datetime(2024, 7, 1, 12, j, tzinfo=timezone.utc), 3, "click", 1.0, "{}"))
    _mk(
        spark,
        "events",
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
        rows,
    )
    from leaf_spark.queries_eval import _Q198_BODY

    got = {
        (r["step1"], r["step2"], r["step3"]): r["n"]
        for r in spark.sql(_Q198_BODY).collect()
    }
    assert got == {
        ("view", "click", "purchase"): 2,
        ("click", "purchase", "view"): 1,
        ("purchase", "view", "click"): 1,
        ("view", "view", "view"): 1,
    }


# ---------------------------------------------------------------------------
# q199 dow seasonality
# ---------------------------------------------------------------------------


def test_dow_seasonality_planted_weekend_spike(spark):
    """2024-07-01 is a Monday; plant 2 full weeks with weekends 3x the
    weekday volume and verify the exact index rationals."""
    rows = []
    eid = 0
    for d in range(14):
        dow = d % 7  # 0 = Monday
        n = 30 if dow >= 5 else 10
        for j in range(n):
            eid += 1
            rows.append(
                (
                    eid,
                    datetime(2024, 7, 1 + d, 9, j % 60, tzinfo=timezone.utc),
                    j,
                    "click",
                    1.0,
                    "{}",
                )
            )
    _mk(
        spark,
        "events",
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
        rows,
    )
    from leaf_spark.queries_eval import _q199_sql

    got = {r["dow"]: r for r in spark.sql(_q199_sql("spark")).collect()}
    # 2 weeks x (5 weekdays x 10 + 2 weekend days x 30)
    total_events = (5 * 10 + 2 * 30) * 2
    assert set(got) == set(range(1, 8))
    for dow in range(1, 8):
        r = got[dow]
        n_events = (30 if dow >= 6 else 10) * 2
        assert (r["n_days"], r["n_events"]) == (2, n_events)
        assert (r["idx_num"], r["idx_den"]) == (
            n_events * 14,
            2 * total_events,
        )
        assert float(r["seasonality"]) == pytest.approx(
            (n_events * 14) / (2 * total_events), abs=1e-6
        )


# ---------------------------------------------------------------------------
# q200 Fisher ratio
# ---------------------------------------------------------------------------


def test_fisher_ratio_matches_python(spark):
    import struct

    rows = []
    # two separated clusters + noise: label 0 around -0.5, label 1 at +0.5
    for i in range(30):
        lab = i % 2
        base = -0.5 if lab == 0 else 0.5
        rows.append((i, [base + ((i * 13) % 7 - 3) / 100.0, 0.0], lab))
    _mk(spark, "embeddings", "vec_id bigint, embedding array<float>, label int", rows)
    from leaf_spark.queries_eval import _Q200_BODY

    r = spark.sql(_Q200_BODY.replace("{E1}", "element_at(embedding, 1)")).collect()[0]
    vals: dict = {}
    for _, emb, lab in rows:
        f32 = struct.unpack("f", struct.pack("f", emb[0]))[0]
        v = math.floor(f32 * 1000.0 + 0.5)
        vals.setdefault(lab, []).append(v)
    n = sum(len(v) for v in vals.values())
    s1 = sum(sum(v) for v in vals.values())
    s2 = sum(x * x for v in vals.values() for x in v)
    sb_raw = sum(sum(v) ** 2 / len(v) for v in vals.values())
    between = sb_raw - s1 * s1 / n
    within = s2 - sb_raw
    assert (r["n_rows"], r["n_labels"]) == (n, 2)
    assert (int(r["sum_v"]), int(r["sum_v_sq"])) == (s1, s2)
    assert float(r["fisher_ratio"]) == pytest.approx(between / within, abs=1e-6)
    assert float(r["fisher_ratio"]) > 50  # planted separation is strong


def test_fisher_ratio_null_on_zero_within_variance(spark):
    rows = [(0, [1.0, 0.0], 0), (1, [1.0, 0.0], 0), (2, [-1.0, 0.0], 1)]
    _mk(spark, "embeddings", "vec_id bigint, embedding array<float>, label int", rows)
    from leaf_spark.queries_eval import _Q200_BODY

    r = spark.sql(_Q200_BODY.replace("{E1}", "element_at(embedding, 1)")).collect()[0]
    assert r["fisher_ratio"] is None  # within-class SS is exactly 0


# ---------------------------------------------------------------------------
# hypothesis fuzz: random planted data vs exact Python recomputes
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    labels=st.lists(st.integers(0, 9), min_size=5, max_size=60),
    offset=st.integers(0, 500),
)
def test_fleiss_kappa_fuzz_exact_rationals(spark, labels, offset):
    """Random item labels and vec_id offsets: the engine's exact
    decimal(38,0) rationals must equal the exact-fraction Python Fleiss
    computation under the same md5 rater model."""
    items = [(offset + i, lab) for i, lab in enumerate(labels)]
    rows = [(vid, [0.0] * 4, lab) for vid, lab in items]
    _mk(spark, "embeddings", "vec_id bigint, embedding array<float>, label int", rows)
    from leaf_spark.queries_eval import _q191_sql

    r = spark.sql(_q191_sql("spark")).collect()[0]
    s, c_sq, num, den = _fleiss_py(items)
    assert (r["n_items"], r["s_sum"], int(r["c_sq"])) == (len(items), s, c_sq)
    if den == 0:
        assert int(r["kappa_den"]) == 0
    else:
        assert Fraction(int(r["kappa_num"]), int(r["kappa_den"])) == Fraction(
            num, den
        )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(counts=st.lists(st.integers(1, 8), min_size=2, max_size=16))
def test_mann_kendall_fuzz_exact_s_and_variance(spark, counts):
    """Random daily-count series: exact S and the tie-corrected variance
    numerator must match the pairwise Python recompute."""
    _plant_daily_counts(spark, counts)
    from collections import Counter

    from leaf_spark.queries_eval import _q195_sql

    r = spark.sql(_q195_sql("spark")).collect()[0]
    n = len(counts)
    s = sum(
        (counts[j] > counts[i]) - (counts[j] < counts[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(counts)
    var_num = n * (n - 1) * (2 * n + 5) - sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1
    )
    assert (r["n_days"], r["s_stat"], r["var_num"]) == (n, s, var_num)
