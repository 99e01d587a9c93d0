"""Data-quality diagnostics (q112-q114): drift detection flags a real
shift, label-noise voting flags a planted mislabel, profile counts are
exact."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_psi_flags_planted_drift(spark):
    """First half N(10), second half N(50)-ish via deterministic values —
    PSI must exceed the 0.1 alarm for the shifted type and stay quiet for
    the stable type."""
    import datetime as dt

    rows = []
    base = dt.datetime(2026, 1, 1)
    for i in range(400):
        ts = base + dt.timedelta(minutes=i)
        shifted = 10.0 + (i % 97) / 10.0 if i < 200 else 60.0 + (i % 97) / 10.0
        stable = 10.0 + (i % 97) / 10.0
        rows.append((3 * i, ts, 1, "shifty", shifted, "{}"))
        rows.append((3 * i + 1, ts, 1, "steady", stable, "{}"))
        if i >= 300:  # a type that did not exist in the reference half
            rows.append((3 * i + 2, ts, 1, "newborn", 5.0 + i, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, "
        "value double, props string",
    )
    df.createOrReplaceTempView("events")
    from leaf_spark.queries_quality import _SPARK_Q112

    out = {r["event_type"]: r for r in spark.sql(_SPARK_Q112).collect()}
    assert out["shifty"]["drift_flag"] is True
    assert out["steady"]["drift_flag"] is False
    assert out["shifty"]["psi"] > out["steady"]["psi"]
    # a type born after the midpoint is the most extreme shift: it must be
    # flagged (psi undefined — no reference distribution), not dropped
    assert out["newborn"]["drift_flag"] is True
    assert out["newborn"]["psi"] is None


def test_label_noise_votes_flag_planted_mislabel(spark):
    """Two tight clusters; one vector carries the wrong label — all its
    neighbors disagree, so it must be the (only) suspect."""
    rows = []
    for i in range(6):
        rows.append((i, [1.0 + i * 0.01, 0.0], 0))
    for i in range(6, 12):
        rows.append((i, [0.0, 1.0 + i * 0.01], 1))
    rows.append((12, [1.0, 0.002], 1))  # geometrically label-0, tagged 1
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    df.createOrReplaceTempView("embeddings")

    from pyspark.sql import Window

    from leaf_spark.operators.similarity import _to_double, cosine_expr

    v = df.select(F.col("vec_id").alias("id"), "label",
                  _to_double(F.col("embedding")).alias("v"))
    b = v.select(F.col("id").alias("nid"), F.col("label").alias("nlabel"),
                 F.col("v").alias("nv"))
    scored = v.join(F.broadcast(b), F.col("id") != F.col("nid")).select(
        "id", "label", "nid", "nlabel",
        F.round(cosine_expr(F.col("v"), F.col("nv")), 5).alias("sim"))
    w = Window.partitionBy("id").orderBy(F.desc("sim"), "nid")
    top = scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 5)
    votes = top.groupBy("id", "label").agg(
        F.sum((F.col("nlabel") != F.col("label")).cast("int")).alias("dis"))
    suspects = {r["id"] for r in votes.where(F.col("dis") >= 4).collect()}
    assert suspects == {12}


def test_column_profile_exact_counts(spark):
    import datetime as dt

    rows = [
        (1, dt.datetime(2026, 1, 1), 5, "a", 1.5, "{}"),
        (2, dt.datetime(2026, 1, 2), 5, None, 2.5, "{}"),
        (3, dt.datetime(2026, 1, 3), 7, "b", None, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, "
        "value double, props string",
    ).createOrReplaceTempView("events")
    from leaf_spark.queries_quality import _Q114_BODY

    out = {r["column_name"]: r for r in spark.sql(_Q114_BODY).collect()}
    assert out["value"]["n_null"] == 1 and out["value"]["n_distinct"] == 2
    assert out["event_type"]["n_null"] == 1
    assert out["event_type"]["min_s"] == "a" and out["event_type"]["max_s"] == "b"
    assert out["user_id"]["n_distinct"] == 2 and out["user_id"]["max_d"] == 7.0


def test_mmr_selects_diverse_over_redundant(spark):
    """Query along +x. Candidates: two near-duplicates of the best hit and
    one orthogonal-ish item — MMR must pick the best hit first, then the
    diverse item over the redundant twin."""
    rows = [
        (0, [1.0, 0.0]),        # query
        (1, [0.99, 0.14]),      # best hit (~8 deg off the query)
        (2, [0.99, 0.14]),      # exact duplicate of 1 (penalty = 1)
        (3, [0.866, 0.5]),      # ~30 deg: diverse, decent relevance
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    from leaf_spark.operators.selection import mmr_select

    # lam > 1 makes redundancy dominate: the exact twin (pen 1.0) must lose
    # to the diverse item even though its relevance is higher
    out = mmr_select(df, query_id=0, k=2, lam=2.0, pool=3).collect()
    assert [r["id"] for r in out] == [1, 3]
    assert out[0]["penalty"] == 0.0
    assert out[1]["penalty"] < 0.95   # cos(22 deg) vs the twin's 1.0


def test_mmr_is_deterministic_across_runs(spark):
    import random

    rnd = random.Random(3)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(0, 30)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    from leaf_spark.operators.selection import mmr_select

    a = [tuple(r) for r in mmr_select(df, k=4, pool=29).collect()]
    b = [tuple(r) for r in mmr_select(df, k=4, pool=29).collect()]
    assert a == b


def test_entropy_kl_hand_computed(spark):
    """Uniform-vocab source has higher entropy than a single-word source;
    the degenerate source's KL vs the corpus is strictly positive."""
    import math

    docs = spark.createDataFrame(
        [(1, "a b c d", "varied"), (2, "x x x x", "flat")],
        "doc_id bigint, text string, source string",
    )
    docs.createOrReplaceTempView("documents")
    from leaf_spark.queries_quality import _Q117_BODY

    body = _Q117_BODY.replace(
        "{TOKENS}",
        "select source, explode(split(trim(regexp_replace(lower(text), "
        "'\\\\s+', ' ')), ' ')) as tok from documents",
    )
    out = {r["source"]: r for r in spark.sql(body).collect()}
    assert out["varied"]["vocab_size"] == 4 and out["flat"]["vocab_size"] == 1
    assert abs(out["varied"]["entropy"] - math.log(4)) < 1e-4
    assert out["flat"]["entropy"] == 0.0
    # flat: p(x)=1 in-source vs 4/8 corpus-wide → KL = ln(2)
    assert abs(out["flat"]["kl_vs_corpus"] - math.log(2)) < 1e-4
    assert out["varied"]["kl_vs_corpus"] > 0


def test_gini_extremes(spark):
    import datetime as dt

    def mk(rows):
        return spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp_ntz, user_id bigint, "
            "event_type string, value double, props string",
        )

    base = dt.datetime(2026, 1, 1)
    # perfectly equal: 4 users x 5 events → gini ≈ 0
    eq = [(i, base, i % 4, "t", 1.0, "{}") for i in range(20)]
    mk(eq).createOrReplaceTempView("events")
    from leaf_spark.queries_quality import _Q118_BODY

    g_eq = spark.sql(_Q118_BODY).collect()[0]
    assert g_eq["n_users"] == 4 and abs(g_eq["gini"]) < 1e-6

    # extreme skew: one user has 97 events, three have 1 each
    sk = [(i, base, 0, "t", 1.0, "{}") for i in range(97)] + [
        (100 + u, base, u, "t", 1.0, "{}") for u in (1, 2, 3)
    ]
    mk(sk).createOrReplaceTempView("events")
    g_sk = spark.sql(_Q118_BODY).collect()[0]
    assert g_sk["gini"] > 0.7


def test_cohort_retention_hand_computed(spark):
    import datetime as dt

    # user 1: weeks 0 and 1; user 2: week 0 only; user 3: week 1 only
    w0, w1 = dt.datetime(1970, 1, 1), dt.datetime(1970, 1, 8)
    rows = [
        (1, w0, 1, "t", 1.0, "{}"), (2, w1, 1, "t", 1.0, "{}"),
        (3, w0, 2, "t", 1.0, "{}"),
        (4, w1, 3, "t", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, "
        "value double, props string",
    ).createOrReplaceTempView("events")
    from leaf_spark.queries_quality import _Q119_BODY

    body = _Q119_BODY.replace(
        "{WEEK}",
        "cast(datediff(cast(ts as date), date'1970-01-01') as bigint) div 7",
    )
    out = {(r["cohort_week"], r["k"]): r for r in spark.sql(body).collect()}
    assert out[(0, 0)]["n_users"] == 2 and out[(0, 0)]["retention"] == 1.0
    assert out[(0, 1)]["n_active"] == 1 and out[(0, 1)]["retention"] == 0.5
    assert out[(1, 0)]["n_users"] == 1


def test_funnel_step_ordering_enforced(spark):
    import datetime as dt

    t = lambda m: dt.datetime(2026, 1, 1, 10, m)  # noqa: E731
    rows = [
        # session A (user 1): view → click → purchase in order: full funnel
        (1, t(0), 1, "view", 1.0, "{}"),
        (2, t(1), 1, "click", 1.0, "{}"),
        (3, t(2), 1, "purchase", 1.0, "{}"),
        # session B (user 2): purchase BEFORE view — must not count as s3
        (4, t(0), 2, "purchase", 1.0, "{}"),
        (5, t(1), 2, "view", 1.0, "{}"),
        (6, t(2), 2, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, "
        "value double, props string",
    ).createOrReplaceTempView("events")
    from leaf_spark.queries_quality import _Q120_BODY

    from leaf_spark.queries_events import sessionize_cte

    r = spark.sql(_Q120_BODY.replace("{SESS}", sessionize_cte("spark"))).collect()[0]
    assert r["n_sessions"] == 2
    assert r["viewed"] == 2
    assert r["clicked_after"] == 2       # both sessions click after view
    assert r["purchased_after"] == 1     # only session A purchases in order
    assert r["view_to_purchase"] == 0.5


def test_q113_lsh_candidates_recover_brute_force_vote(spark):
    """The LSH-candidate path (the 100 TB plan) must produce the identical
    per-vector neighbor vote as the all-pairs brute force on the gate
    corpus — deterministic recall-1 at b=4/L=12/hamming-1."""
    from pyspark.sql import Window

    from leaf_spark.queries import all_cases
    from leaf_spark.operators.similarity import _to_double, cosine_expr
    from leaf_spark.session import load_tables

    sf = "/root/testdata/sf0.001"
    lsh = all_cases()["q113_label_noise"].spark_fn(spark, sf)

    t = load_tables(spark, sf, names=("embeddings",))
    v = t["embeddings"].where(F.col("vec_id") < 200).select(
        F.col("vec_id").alias("id"), "label",
        _to_double(F.col("embedding")).alias("v"),
    )
    b = v.select(
        F.col("id").alias("nid"), F.col("label").alias("nlabel"),
        F.col("v").alias("nv"),
    )
    scored = v.join(F.broadcast(b), F.col("id") != F.col("nid")).select(
        "id", "label", "nid", "nlabel",
        F.round(cosine_expr(F.col("v"), F.col("nv")), 5).alias("sim"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("sim"), "nid")
    brute = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .groupBy(F.col("id").alias("vec_id"), "label")
        .agg(
            F.sum((F.col("nlabel") != F.col("label")).cast("bigint"))
            .cast("bigint")
            .alias("n_disagree"),
            (F.sum((F.col("nlabel") != F.col("label")).cast("bigint")) >= 4)
            .alias("suspect"),
        )
    )
    assert sorted(map(tuple, lsh.collect())) == sorted(map(tuple, brute.collect()))
