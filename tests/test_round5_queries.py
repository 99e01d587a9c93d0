"""Planted-data semantics tests for the round-5 catalog entries.

The differential gate proves Spark ≡ DuckDB on the driver testdata; these
tests prove the STATISTICS themselves behave — extremes, bounds,
symmetries, and degenerate cases a same-wrong-answer-on-both-engines bug
would sail through.
"""

from __future__ import annotations

import datetime as dt

import pytest


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string",
    )


def _mk_docs(spark, rows):
    """rows: (doc_id, source, text)"""
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string")


def test_grouped_gini_uniform_vs_skewed(spark):
    from leaf_spark.queries_quality import _Q122_BODY

    base = dt.datetime(2026, 1, 1)
    rows = []
    # type "flat": 4 users x 5 events each → gini 0
    eid = 0
    for u in range(4):
        for _ in range(5):
            rows.append((eid, base, u, "flat", 1.0, "{}"))
            eid += 1
    # type "skew": one user with 97, three with 1
    for _ in range(97):
        rows.append((eid, base, 100, "skew", 1.0, "{}"))
        eid += 1
    for u in (101, 102, 103):
        rows.append((eid, base, u, "skew", 1.0, "{}"))
        eid += 1
    _mk_events(spark, rows).createOrReplaceTempView("events")
    out = {r["event_type"]: r for r in spark.sql(_Q122_BODY).collect()}
    assert abs(out["flat"]["gini"]) < 1e-9
    assert out["skew"]["gini"] > 0.7
    assert out["flat"]["n_users"] == 4 and out["skew"]["n_events"] == 100


def test_dp_noise_bounded_zero_centered_geometric(spark):
    """Across many group names the discrete-Laplace noise must stay in
    [-20, 20], put ≈1/3 of its mass on 0 (α=1/2 → P(0)=1/3), and be
    near-symmetric — the distributional sanity a seeded mechanism allows."""
    from leaf_spark.queries_quality import _SPARK_Q127

    base = dt.datetime(2026, 1, 1)
    rows = [(i, base, i, f"type_{i % 200}", 1.0, "{}") for i in range(1000)]
    _mk_events(spark, rows).createOrReplaceTempView("events")
    out = spark.sql(_SPARK_Q127).collect()
    assert len(out) == 200
    noises = [r["noise"] for r in out]
    assert all(-20 <= n <= 20 for n in noises)
    zero_frac = sum(1 for n in noises if n == 0) / len(noises)
    assert 0.2 < zero_frac < 0.5  # expect ~1/3
    assert abs(sum(noises)) < 150  # mean well inside the noise scale
    for r in out:
        assert r["released_count"] == r["true_count"] + r["noise"]


def test_bootstrap_ci_degenerate_constant_values(spark):
    """All purchase values identical → every resample mean equals the
    value; the CI must collapse onto it exactly."""
    from leaf_spark.queries_quality import _SPARK_Q128

    base = dt.datetime(2026, 1, 1)
    rows = [(i, base, i, "purchase", 42.5, "{}") for i in range(50)]
    _mk_events(spark, rows).createOrReplaceTempView("events")
    r = spark.sql(_SPARK_Q128).collect()[0]
    assert r["n"] == 50
    assert r["mean_x"] == pytest.approx(42.5)
    assert r["ci_lo"] == pytest.approx(42.5)
    assert r["ci_hi"] == pytest.approx(42.5)


def test_out_of_order_rate_planted_inversion(spark):
    from leaf_spark.queries_quality import _Q130_BODY

    t0 = dt.datetime(2026, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        # user 1: strictly increasing → 0 inversions
        (0, t0, 1, "a", 1.0, "{}"),
        (1, t0 + s, 1, "a", 1.0, "{}"),
        (2, t0 + 2 * s, 1, "a", 1.0, "{}"),
        # user 2: one backward step at event 4
        (3, t0 + 9 * s, 2, "b", 1.0, "{}"),
        (4, t0 + 5 * s, 2, "b", 1.0, "{}"),
        (5, t0 + 6 * s, 2, "b", 1.0, "{}"),
    ]
    _mk_events(spark, rows).createOrReplaceTempView("events")
    out = {r["event_type"]: r for r in spark.sql(_Q130_BODY).collect()}
    assert out["a"]["n_out_of_order"] == 0
    assert out["b"]["n_out_of_order"] == 1
    assert out["b"]["out_of_order_rate"] == pytest.approx(1 / 3, abs=1e-6)


def test_minhash_error_zero_for_identical_docs(spark):
    from leaf_spark.queries_curation import _SPARK_Q133

    docs = [(0, "s", "alpha beta gamma delta"), (1, "s", "alpha beta gamma delta"),
            (2, "s", "totally different words here")]
    _mk_docs(spark, docs).createOrReplaceTempView("documents")
    rows = {(r["doc_a"], r["doc_b"]): r for r in spark.sql(_SPARK_Q133).collect()}
    ident = rows[(0, 1)]
    assert ident["exact_j"] == pytest.approx(1.0)
    assert ident["est_j"] == pytest.approx(1.0)
    assert ident["abs_err"] == pytest.approx(0.0)
    # disjoint-vocab pairs fall under the exact_j >= 0.1 emission floor
    assert (0, 2) not in rows and (1, 2) not in rows


def test_triangle_count_on_planted_clique(spark):
    """Four identical docs form K4 (6 edges, 4 triangles, clustering 1);
    unrelated docs stay outside the graph."""
    from leaf_spark.queries_mining import _SPARK_Q138

    docs = [(i, "s", "same words every time") for i in range(4)]
    docs += [(10, "s", "unrelated content one"), (11, "s", "something else entirely")]
    _mk_docs(spark, docs).createOrReplaceTempView("documents")
    r = spark.sql(_SPARK_Q138).collect()[0]
    assert r["n_edges"] == 6
    assert r["n_triangles"] == 4
    assert r["n_connected"] == 4
    assert r["max_degree"] == 3
    assert r["global_clustering"] == pytest.approx(1.0)


def test_source_jsd_identical_zero_disjoint_ln2(spark):
    from math import log

    from leaf_spark.queries_curation import _SPARK_Q140

    docs = [
        (0, "a", "wolf bear lynx"), (1, "b", "wolf bear lynx"),
        (2, "c", "quark gluon meson"),
    ]
    _mk_docs(spark, docs).createOrReplaceTempView("documents")
    rows = {(r["source_a"], r["source_b"]): r["jsd_nats"]
            for r in spark.sql(_SPARK_Q140).collect()}
    assert rows[("a", "b")] == pytest.approx(0.0, abs=1e-9)
    assert rows[("a", "c")] == pytest.approx(log(2), abs=1e-4)
    assert rows[("b", "c")] == pytest.approx(log(2), abs=1e-4)


def test_vocab_coverage_monotone_and_bounded(spark):
    from leaf_spark.queries_curation import sql_case  # noqa: F401  (module import)
    from leaf_spark.queries import all_cases

    df = all_cases()["q137_vocab_coverage_curve"].spark_fn(
        spark, "/root/testdata/sf0.001"
    )
    rows = sorted((r["k"], r["coverage"]) for r in df.collect())
    covs = [c for _, c in rows]
    assert covs == sorted(covs)  # more vocab never covers less
    assert all(0 < c <= 1.0 for c in covs)


def test_png_synth_assets_decode_in_full(spark):
    """Every synthesized PNG (all filter types in play) must decode with
    the exact closed-form pixel sum."""
    from leaf_spark.operators.multimodal import (
        extract_pixel_stats,
        synthesize_png_assets,
    )

    docs = _mk_docs(spark, [(d, "s", "x") for d in range(25)])
    out = extract_pixel_stats(synthesize_png_assets(docs)).collect()
    assert len(out) == 25
    for r in out:
        d = r["asset_id"]
        w, h = 4 + d % 5, 3 + d % 4
        assert r["decoded"]
        assert (r["width"], r["height"]) == (w, h)
        assert r["px_sum"] == sum((d * 7 + i * 13) % 256 for i in range(w * h))


# ---------------------------------------------------------------------------
# q141-q145 (round-5b) planted-data semantics
# ---------------------------------------------------------------------------


def _mk_embeddings(spark, rows):
    """rows: (vec_id, [floats x 64], label)"""
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )


def _mk_documents(spark, rows):
    """rows: (doc_id, text, lang, source, n_chars) — full documents schema"""
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )


def test_embedding_covariance_exact_numerators(spark):
    """Plant dim1 == dim2 exactly: the (1,1), (1,2), (2,2) covariance
    numerators must be IDENTICAL integers, and match a hand computation."""
    from leaf_spark.queries_curation import _cov_sql

    vals = [0.5, -0.25, 0.75, 0.0]
    rows = []
    for i, v in enumerate(vals):
        vec = [0.0] * 64
        vec[0] = v
        vec[1] = v
        rows.append((i, vec, 0))
    _mk_embeddings(spark, rows).createOrReplaceTempView("embeddings")
    out = {
        (r["i"], r["j"]): r["cov_num"]
        for r in spark.sql(_cov_sql("element_at(embedding, {k})")).collect()
    }
    q = [int(__import__("math").floor(v * 1024)) for v in vals]
    n, s, p = len(q), sum(q), sum(x * x for x in q)
    expected = n * p - s * s
    assert out[(1, 1)] == out[(1, 2)] == out[(2, 2)] == expected
    # untouched dims: zero variance, zero cross terms
    assert out[(3, 3)] == 0 and out[(1, 3)] == 0
    assert len(out) == 36  # 8 dims -> upper triangle


def test_random_projection_is_the_sign_matrix_on_basis_vectors(spark):
    """Projecting the i-th scaled basis vector must read back column i of
    the Rademacher matrix times 1024 — linearity makes this a complete
    characterization of the operator."""
    from leaf_spark.queries_curation import _JL_SIGNS, _jl_sql

    rows = []
    for i in (1, 17, 64):
        vec = [0.0] * 64
        vec[i - 1] = 1.0
        rows.append((i, vec, 0))
    _mk_embeddings(spark, rows).createOrReplaceTempView("embeddings")
    out = {r["vec_id"]: r for r in spark.sql(_jl_sql("spark")).collect()}
    for i in (1, 17, 64):
        for j in range(1, 9):
            assert out[i][f"p{j}"] == _JL_SIGNS[j - 1][i - 1] * 1024


def test_calibration_bins_perfect_and_inverted(spark):
    """Scores planted at bin centers with labels matching the score give
    abs_gap == |frac_pos - mean_score| per bin, and bins partition N."""
    from leaf_spark.queries_curation import _Q143_BODY

    rows = []
    vid = 0
    # 10 rows at score ~0.95 (e1 = 0.9), all positive (label 9)
    for _ in range(10):
        rows.append((vid, [0.9] + [0.0] * 63, 9)); vid += 1
    # 10 rows at score ~0.05 (e1 = -0.9), all negative (label 0)
    for _ in range(10):
        rows.append((vid, [-0.9] + [0.0] * 63, 0)); vid += 1
    _mk_embeddings(spark, rows).createOrReplaceTempView("embeddings")
    sql = _Q143_BODY.replace("{E1}", "element_at(embedding, 1)")
    out = {r["bin"]: r for r in spark.sql(sql).collect()}
    assert sum(r["n"] for r in out.values()) == 20
    hi, lo = out[9], out[0]
    assert hi["frac_pos"] == 1.0 and lo["frac_pos"] == 0.0
    # float32 0.9 widens to 0.899999..., so floor((e+1)*500) = 949
    assert hi["sum_score_milli"] == 9490
    assert abs(hi["abs_gap"] - abs(1.0 - hi["mean_score"])) < 1e-9
    assert abs(lo["abs_gap"] - lo["mean_score"]) < 1e-9


def test_ks_statistic_extremes(spark):
    """Identical length distributions -> D = 0; disjoint supports -> the
    max gap hits n_a * n_b exactly (KS = 1)."""
    from leaf_spark.queries_curation import _Q144_BODY

    # identical: both sources have lengths {10, 20, 30}
    rows = []
    did = 0
    for src in ("a", "b"):
        for n in (10, 20, 30):
            rows.append((did, "x" * n, "en", src, n)); did += 1
    _mk_documents(spark, rows).createOrReplaceTempView("documents")
    r = spark.sql(_Q144_BODY).collect()[0]
    assert r["d_num"] == 0 and r["ks_stat"] == 0.0

    # disjoint: a in {1,2,3}, b in {100,200,300}
    rows = []
    did = 0
    for n in (1, 2, 3):
        rows.append((did, "x" * n, "en", "a", n)); did += 1
    for n in (100, 200, 300):
        rows.append((did, "x" * n, "en", "b", n)); did += 1
    _mk_documents(spark, rows).createOrReplaceTempView("documents")
    r = spark.sql(_Q144_BODY).collect()[0]
    assert r["d_num"] == 9 and r["ks_stat"] == 1.0


def test_survivor_selection_keeps_longest_then_smallest_id(spark):
    from leaf_spark.queries_curation import _Q145_BODY

    prefix = "the same first twenty-four chars "  # >24 chars, shared
    rows = [
        (1, prefix + "short", "en", "s", len(prefix + "short")),
        (2, prefix + "much much longer tail text", "en", "s",
         len(prefix) + 26),
        (3, prefix + "equally long tail text....", "en", "s",
         len(prefix) + 26),
        (9, "completely unrelated singleton", "en", "s", 30),
    ]
    _mk_documents(spark, rows).createOrReplaceTempView("documents")
    sql = _Q145_BODY.replace("{WS}", "'\\\\s+'").replace("{G}", "")
    out = spark.sql(sql).collect()
    assert len(out) == 1  # singleton family excluded
    r = out[0]
    # docs 2 and 3 tie on length -> smallest id (2) survives
    assert r["survivor_id"] == 2 and r["n_copies"] == 3
    assert r["discarded_chars"] == rows[0][4] + rows[2][4]


def _cm_pred_py(vec_id, label):
    import hashlib

    nib = int(hashlib.md5(f"cm:{vec_id}".encode()).hexdigest()[0], 16)
    return (label + 1) % 10 if nib < 3 else label


def test_confusion_matrix_matches_md5_recompute(spark):
    from leaf_spark.queries_curation import _NIB_SPARK, _Q146_BODY

    rows = [(i, [0.0] * 64, i % 10) for i in range(60)]
    _mk_embeddings(spark, rows).createOrReplaceTempView("embeddings")
    got = {
        (r["label"], r["pred"]): r["n"]
        for r in spark.sql(_Q146_BODY.replace("{NIB}", _NIB_SPARK)).collect()
    }
    want = {}
    for vid, _, lab in rows:
        k = (lab, _cm_pred_py(vid, lab))
        want[k] = want.get(k, 0) + 1
    assert got == want


def test_cohens_kappa_exact_rational(spark):
    """kappa_num/kappa_den must equal the textbook computation from the
    Python-recomputed matrix, and the perfect-agreement case gives
    kappa == 1 exactly."""
    from fractions import Fraction

    def run(rows):
        _mk_embeddings(spark, rows).createOrReplaceTempView("embeddings")
        from leaf_spark.queries_curation import _NIB_SPARK, _Q147_CM, _Q147_FINAL_BODY

        cm = spark.sql(_Q147_CM.replace("{NIB}", _NIB_SPARK)).localCheckpoint()
        cm.createOrReplaceTempView("__q147_cm__")
        return spark.sql(_Q147_FINAL_BODY.replace("{CM}", "__q147_cm__"))

    rows = [(i, [0.0] * 64, (i * 3) % 10) for i in range(80)]
    r = run(rows).collect()[0]
    preds = [(lab, _cm_pred_py(vid, lab)) for vid, _, lab in rows]
    n = len(preds)
    agree = sum(1 for a, b in preds if a == b)
    pe = sum(
        sum(1 for a, _ in preds if a == k) * sum(1 for _, b in preds if b == k)
        for k in range(10)
    )
    # decimal(38,0) outputs (overflow-safe at extreme N) convert exactly
    assert (r["n"], r["n_agree"], int(r["pe_num"])) == (n, agree, pe)
    assert Fraction(int(r["kappa_num"]), int(r["kappa_den"])) == Fraction(
        n * agree - pe, n * n - pe
    )

    # perfect agreement: pick vec_ids whose md5 nibble never flips.
    # kappa == 1 exactly <=> kappa_num == kappa_den (the rounded double
    # was dropped from the projection after the r5 hash red — the exact
    # rationals are the statistic now).
    clean = [vid for vid in range(400) if _cm_pred_py(vid, 0) == 0][:40]
    rows = [(vid, [0.0] * 64, vid % 10) for vid in clean]
    r = run(rows).collect()[0]
    assert r["n_agree"] == len(clean)
    assert int(r["kappa_num"]) == int(r["kappa_den"]) != 0


def test_langid_agreement_planted_profiles(spark):
    """Stopword-laden texts must resolve to their language, empty text to
    'und', and an en/de tie to 'en' (profile priority) — then the audit
    aggregates agreement per source."""
    from leaf_spark.queries_curation import _langid_sql

    rows = [
        (1, "the cat and the dog of it", "en", "s1", 25),   # en hits -> agree
        (2, "der hund und die katze ist", "de", "s1", 26),  # de hits -> agree
        (3, "", "en", "s1", 0),                             # no hits -> und
        (4, "the und", "de", "s2", 7),                      # 1-1 tie -> en
    ]
    _mk_documents(spark, rows).createOrReplaceTempView("documents")
    out = {r["source"]: r for r in spark.sql(_langid_sql("spark")).collect()}
    s1, s2 = out["s1"], out["s2"]
    assert (s1["n"], s1["n_agree"], s1["n_und"]) == (3, 2, 1)
    assert (s2["n"], s2["n_agree"], s2["n_und"]) == (1, 0, 0)  # tie -> en != de


def test_cross_source_dups_planted_families(spark):
    """One family spanning s1/s2 (with 2+1 docs), one family entirely
    inside s1, and a singleton: only the spanning family pairs up, and
    n_docs_involved counts both sides' members."""
    from leaf_spark.queries_curation import _Q149_BODY

    p1 = "shared family prefix shared family "  # >= 24 normalized chars
    p2 = "intra source family prefix only here "
    rows = [
        (1, p1 + "alpha", "en", "s1", 30),
        (2, p1 + "beta", "en", "s1", 30),
        (3, p1 + "gamma", "en", "s2", 30),
        (4, p2 + "one", "en", "s1", 30),
        (5, p2 + "two", "en", "s1", 30),
        (6, "unique document text entirely", "en", "s3", 29),
    ]
    _mk_documents(spark, rows).createOrReplaceTempView("documents")
    sql = _Q149_BODY.replace("{WS}", "'\\\\s+'").replace("{G}", "")
    out = spark.sql(sql).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"]) == ("s1", "s2")
    assert r["n_shared_families"] == 1 and r["n_docs_involved"] == 3


def test_shrunk_quality_pulls_small_sources_to_global_mean(spark):
    """A 1-doc source with an extreme mean lands near the global mean
    (weight 1/11); a large source barely moves; the exact rational
    matches a Fraction recompute."""
    from fractions import Fraction

    from leaf_spark.queries_curation import _Q150_BODY

    rows = [(i, "x", "en", "big", 100) for i in range(50)]
    rows.append((99, "x", "en", "tiny", 1000))
    _mk_documents(spark, rows).createOrReplaceTempView("documents")
    out = {r["source"]: r for r in spark.sql(_Q150_BODY).collect()}
    nn, ss = 51, 50 * 100 + 1000
    for src, n, sm in (("big", 50, 5000), ("tiny", 1, 1000)):
        r = out[src]
        assert Fraction(int(r["shrunk_num"]), int(r["shrunk_den"])) == Fraction(
            nn * sm + 10 * ss, nn * (n + 10)
        )
    g_mean = ss / nn
    assert abs(out["tiny"]["shrunk_mean"] - g_mean) < abs(1000 - g_mean) * 0.2
    assert abs(out["big"]["shrunk_mean"] - 100) < 5


def _run_q92(spark):
    from leaf_spark.queries_mining import _Q92_DECOMP, _Q92_SPARK_FEATS

    feats = spark.sql(f"select * from ({_Q92_SPARK_FEATS})").localCheckpoint()
    feats.createOrReplaceTempView("__q92_f__")
    return spark.sql(_Q92_DECOMP)


def test_q92_ntile_decomposition_uneven_n_and_ties(spark):
    """The histogram-offset + partitioned-rank decomposition must equal a
    literal ntile(10) when N % 10 != 0 (first r buckets get one extra row)
    AND when score ties span a bucket boundary."""
    # 23 docs: 13 share one text (one tie group), 10 distinct lengths
    rows = []
    for i in range(13):
        rows.append((i, "same tied text body here", "en", "s", 24))
    for i in range(10):
        rows.append((100 + i, "x " * (i + 2), "en", "s", 2 * (i + 2)))
    _mk_documents(spark, rows).createOrReplaceTempView("documents")
    got = {r["decile"]: r["n_docs"] for r in _run_q92(spark).collect()}
    # literal ntile over the SAME checkpointed features as the reference
    ref = {
        r["decile"]: r["n"]
        for r in spark.sql(
            """select decile, count(*) as n from (
                 select ntile(10) over (order by score desc, doc_id)
                   as decile from __q92_f__
               ) group by decile"""
        ).collect()
    }
    assert got == ref
    # N=23 -> buckets 1-3 hold 3 rows, buckets 4-10 hold 2
    assert [got[k] for k in sorted(got)] == [3, 3, 3, 2, 2, 2, 2, 2, 2, 2]


def test_q92_null_text_lands_in_last_bucket_not_dropped(spark):
    """A NULL-text row has a NULL score; the null-safe join + desc NULLS
    LAST ordering must keep it (in the final bucket), exactly like the
    oracle's literal ntile — not silently drop it."""
    rows = [(i, "word " * (i + 2), "en", "s", 5 * (i + 2)) for i in range(20)]
    rows.append((99, None, "en", "s", 0))
    _mk_documents(spark, rows).createOrReplaceTempView("documents")
    out = {r["decile"]: r["n_docs"] for r in _run_q92(spark).collect()}
    assert sum(out.values()) == 21  # nothing dropped
    # 21 rows -> bucket 1 has 3; NULL score sorts last -> bucket 10
    assert out[1] == 3 and out[10] == 2




def test_pmi_ranks_true_collocation_first(spark):
    """A pair that ALWAYS co-occurs ("alpha beta") must out-rank a pair of
    independently frequent words, and its PMI must equal the hand
    computation ln(c12*N / (c1*c2))."""
    import math

    from leaf_spark.queries_curation import _q151_sql

    # 6 docs "alpha beta", 6 docs "x y" with x,y also frequent elsewhere
    rows = []
    for i in range(6):
        rows.append((i, "alpha beta", "en", "s", 10))
    for i in range(6):
        rows.append((10 + i, "x y", "en", "s", 3))
    for i in range(12):
        rows.append((20 + i, "x q", "en", "s", 3))
        rows.append((40 + i, "p y", "en", "s", 3))
    _mk_documents(spark, rows).createOrReplaceTempView("documents")
    out = spark.sql(_q151_sql("spark")).collect()
    assert out[0]["bigram"] == "alpha beta"
    n_tok = 2 * 6 + 2 * 6 + 2 * 12 + 2 * 12
    expect = round(math.log(6 * n_tok / (6 * 6)), 6)
    assert abs(out[0]["pmi"] - expect) < 1e-9


def test_burstiness_flat_vs_bursty(spark):
    """One occurrence in every doc -> VMR 0 (sub-Poisson, no variance);
    all occurrences in one doc -> VMR = (D*S2 - S1^2)/(D*S1) exactly."""
    from leaf_spark.queries_curation import _q152_sql

    rows = []
    for i in range(10):
        text = "flat " + ("burst " * 10 if i == 0 else "") + "flat2"
        rows.append((i, text.strip(), "en", "s", len(text)))
    _mk_documents(spark, rows).createOrReplaceTempView("documents")
    out = {r["tok"]: r for r in spark.sql(_q152_sql("spark")).collect()}
    assert out["flat"]["vmr_num"] == 0 and out["flat"]["vmr"] == 0.0
    b = out["burst"]  # s1=10, s2=100, D=10
    assert (b["vmr_num"], b["vmr_den"]) == (10 * 100 - 100, 10 * 10)
    assert b["vmr"] == 9.0


def test_conditional_entropy_separable_vs_mixed(spark):
    """Labels perfectly determined by the bucket -> H = 0; two labels
    uniformly mixed inside one bucket -> H = ln 2."""
    import math

    from leaf_spark.queries_curation import _q153_sql

    v1 = [1.0] + [0.0] * 63   # bucket = sign pattern of JL column 1
    v2 = [0.0] * 16 + [1.0] + [0.0] * 47  # a different sign pattern
    # separable: vector determines label
    rows = [(i, v1, 0) for i in range(8)] + [(100 + i, v2, 1) for i in range(8)]
    _mk_embeddings(spark, rows).createOrReplaceTempView("embeddings")
    r = spark.sql(_q153_sql("spark")).collect()[0]
    assert r["n_buckets"] == 2 and r["h_label_given_bucket"] == 0.0
    # mixed: same vector, two labels half/half
    rows = [(i, v1, i % 2) for i in range(8)]
    _mk_embeddings(spark, rows).createOrReplaceTempView("embeddings")
    r = spark.sql(_q153_sql("spark")).collect()[0]
    assert r["n_buckets"] == 1
    # per-term rounding before the sum shifts the last digit
    assert abs(r["h_label_given_bucket"] - math.log(2)) < 5e-6
