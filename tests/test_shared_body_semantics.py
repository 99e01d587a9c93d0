"""Shared-body oracle-gap register (VERDICT r5 "Next round #8").

38 catalog entries use the SAME SQL text on Spark and DuckDB
(``QueryCase.shared_body``). The differential gate cannot falsify them BY
CONSTRUCTION — a wrong formula produces the same wrong hash on both
engines. Every such entry therefore needs a named planted-data /
Python-recompute semantics test, and ``test_every_shared_body_entry_has_
named_semantics_test`` machine-enforces the mapping: adding a shared-body
entry without registering its test here fails CI.

The planted tests in this file run the entry's shared SQL text on Spark
over tiny hand-built views and compare against FIRST-PRINCIPLES Python
recomputes (not DuckDB — that would reintroduce the same gap). Entries
already covered by planted tests elsewhere (the q171-q187 statistics
suite, the gini/KS/out-of-order round-5 tests) reference those by name.
"""

from __future__ import annotations

import hashlib
import importlib
import math
from datetime import datetime
from decimal import Decimal

import pytest

from leaf_spark.queries import all_cases

# entry -> "tests.module::test_name" (the named semantics test that pins
# the formula with planted data + an independent recompute)
SHARED_BODY_SEMANTICS = {
    # relational surface — planted TPC-H micro-fixture, this file
    "q01_pricing_summary": "tests.test_shared_body_semantics::test_q01_pricing_summary_planted",
    "q02_filter_project": "tests.test_shared_body_semantics::test_q02_filter_project_planted",
    "q04_left_join": "tests.test_shared_body_semantics::test_q04_left_join_planted",
    "q05_semi_join": "tests.test_shared_body_semantics::test_q05_q06_semi_anti_partition_planted",
    "q06_anti_join": "tests.test_shared_body_semantics::test_q05_q06_semi_anti_partition_planted",
    "q07_distinct": "tests.test_shared_body_semantics::test_q07_distinct_planted",
    "q08_set_ops": "tests.test_shared_body_semantics::test_q08_set_ops_precedence_planted",
    "q09_order_limit_offset": "tests.test_shared_body_semantics::test_q09_order_limit_offset_planted",
    "q10_having": "tests.test_shared_body_semantics::test_q10_having_planted",
    "q11_window_topk": "tests.test_shared_body_semantics::test_q11_window_topk_planted",
    "q12_window_running": "tests.test_shared_body_semantics::test_q12_window_running_planted",
    "q13_cte": "tests.test_shared_body_semantics::test_q13_cte_planted",
    "q14_scalar_subquery": "tests.test_shared_body_semantics::test_q14_scalar_subquery_planted",
    "q16_cross_join": "tests.test_shared_body_semantics::test_q16_cross_join_planted",
    "q18_ineq_join": "tests.test_shared_body_semantics::test_q18_ineq_join_planted",
    "q19_agg_of_agg": "tests.test_shared_body_semantics::test_q19_agg_of_agg_planted",
    "q22_math": "tests.test_shared_body_semantics::test_q22_math_planted",
    # events surface — planted events fixture, this file
    "q30_events_page": "tests.test_shared_body_semantics::test_q30_events_page_planted",
    "q31_events_range_scan": "tests.test_shared_body_semantics::test_q31_events_range_scan_planted",
    "q32_events_type_stats": "tests.test_shared_body_semantics::test_q32_events_type_stats_planted",
    "q35_events_topk_users": "tests.test_shared_body_semantics::test_q35_events_topk_users_planted",
    "q36_events_two_pages": "tests.test_shared_body_semantics::test_q36_events_two_pages_planted",
    # documents/embeddings pipeline entries — this file
    "q40_dedup_exact": "tests.test_shared_body_semantics::test_q40_dedup_exact_planted",
    "q43_lang_stats": "tests.test_shared_body_semantics::test_q43_lang_stats_planted",
    "q95_label_balance": "tests.test_shared_body_semantics::test_q95_label_balance_planted",
    "q101_zscore_outliers": "tests.test_shared_body_semantics::test_q101_zscore_outliers_planted",
    "q126_label_balance": "tests.test_shared_body_semantics::test_q126_label_entropy_planted",
    "q131_quota_dedup_rank": "tests.test_shared_body_semantics::test_q131_quota_dedup_rank_planted",
    # round-6 shared-body additions (q196/q197 keep one text for both
    # engines — no dialect-specific expression exists in them)
    "q196_wilson_interval": "tests.test_eval_queries::test_wilson_interval_matches_closed_form",
    "q197_cochran_armitage": "tests.test_eval_queries::test_cochran_armitage_matches_closed_form",
    "q198_top_trigram_paths": "tests.test_eval_queries::test_trigram_paths_planted_sequences",
    # covered by existing planted/fuzz suites (referenced by name)
    "q118_activity_gini": "tests.test_quality::test_gini_extremes",
    "q122_grouped_gini": "tests.test_round5_queries::test_grouped_gini_uniform_vs_skewed",
    "q130_out_of_order_rate": "tests.test_round5_queries::test_out_of_order_rate_planted_inversion",
    "q144_ks_statistic": "tests.test_round5_queries::test_ks_statistic_extremes",
    "q150_shrunk_quality": "tests.test_round5_queries::test_shrunk_quality_pulls_small_sources_to_global_mean",
    "q171_mann_whitney_u": "tests.test_stats_semantics::test_mann_whitney_matches_exact_python",
    "q173_assoc_rules": "tests.test_stats_semantics::test_assoc_rules_known_baskets",
    "q177_chi2_independence": "tests.test_stats_semantics::test_chi2_matches_python_on_random_tables",
    "q178_permutation_entropy": "tests.test_stats_semantics::test_permutation_entropy_all_six_patterns",
}


def test_every_shared_body_entry_has_named_semantics_test():
    """The machine-checked coverage invariant: shared-body entries (whose
    hash the differential gate cannot falsify) <=> registered semantics
    tests, and every referenced test function actually exists."""
    shared = sorted(n for n, c in all_cases().items() if c.shared_body)
    assert shared == sorted(SHARED_BODY_SEMANTICS), (
        "shared-body entries and SHARED_BODY_SEMANTICS diverge — a new "
        "sql_case with identical Spark/DuckDB text needs a planted-data "
        "semantics test registered here"
    )
    for name, ref in SHARED_BODY_SEMANTICS.items():
        mod_name, fn_name = ref.split("::")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, fn_name, None)), (
            f"{name}: semantics test {ref} does not exist"
        )


# ---------------------------------------------------------------------------
# planted fixtures — tiny hand-built tables with known answers
# ---------------------------------------------------------------------------

_TS = datetime  # brevity

LINEITEM_SCHEMA = (
    "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
    "l_linenumber int, l_quantity double, l_extendedprice double, "
    "l_discount double, l_tax double, l_returnflag string, "
    "l_linestatus string, l_shipdate timestamp"
)
LINEITEM = [
    # order 100: quantities 1,1,10 -> avg 4, only qty 10 > 2*avg (q15)
    (100, 1, 1, 1, 1.0, 1000.0, 0.05, 0.01, "A", "F", _TS(1997, 1, 1)),
    (100, 2, 1, 2, 1.0, 2000.0, 0.10, 0.02, "A", "F", _TS(1997, 2, 1)),
    (100, 3, 2, 3, 10.0, 500.0, 0.00, 0.00, "A", "F", _TS(1997, 3, 1)),
    # order 200: post-cutoff row excluded from q01 (shipdate > 1998-09-02)
    (200, 4, 2, 1, 7.0, 700.25, 0.08, 0.05, "N", "O", _TS(1999, 1, 1)),
    (200, 5, 3, 2, 2.5, 1250.75, 0.02, 0.03, "N", "O", _TS(1998, 9, 2)),
    # order 450: beyond q22's l_orderkey < 400 filter
    (450, 6, 3, 1, 3.4, 333.33, 0.07, 0.01, "R", "F", _TS(1998, 1, 1)),
    # a second (A, F) group row
    (300, 7, 4, 1, 4.0, 4000.5, 0.05, 0.04, "A", "F", _TS(1996, 6, 15)),
]

ORDERS_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
ORDERS = [
    # customer 1: five orders (q10 HAVING >= 5), one > 250000 (q05)
    (1, 1, "O", 50000.0, _TS(1995, 1, 1), "1-URGENT"),
    (2, 1, "O", 150000.0, _TS(1995, 2, 1), "1-URGENT"),
    (3, 1, "F", 260000.0, _TS(1995, 3, 1), "3-MEDIUM"),
    (4, 1, "F", 120000.5, _TS(1995, 4, 1), "5-LOW"),
    (5, 1, "P", 199999.99, _TS(1995, 5, 1), "2-URGENT EXTRA"),
    # customer 2: two orders, none urgent
    (6, 2, "O", 100000.0, _TS(1996, 1, 1), "3-MEDIUM"),
    (7, 2, "F", 80000.0, _TS(1996, 2, 1), "4-NOT SPECIFIED"),
    # customer 3 (BUILDING, no orders counted for q06 via customer 4)
    (8, 3, "O", 300000.0, _TS(1997, 1, 1), "1-URGENT"),
]

CUSTOMER_SCHEMA = (
    "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, "
    "c_mktsegment string"
)
CUSTOMER = [
    (1, "Customer#1", 0, 100.0, "AUTOMOBILE"),
    (2, "Customer#2", 1, 200.0, "BUILDING"),
    (3, "Customer#3", 2, 300.0, "AUTOMOBILE"),
    (4, "Customer#4", 3, 400.0, "BUILDING"),  # no orders (q06)
    (5, "Customer#5", 4, 500.0, "MACHINERY"),  # no orders (q06)
]

PART_SCHEMA = (
    "p_partkey bigint, p_name string, p_brand string, p_type string, "
    "p_size int, p_retailprice double"
)
# 70 parts: deterministic sizes/prices so ORDER BY ... LIMIT 50 OFFSET 10
# has a well-defined hand-computable answer
PART = [
    (
        k,
        f"part {'azure' if k % 9 == 0 else 'plain'} {k}",
        f"Brand#{k % 5}",
        "TYPE",
        (k * 7) % 55 + 1,  # sizes 1..55
        100.0 + ((k * 37) % 70) * 25.0,  # prices 100..1825, distinct mod 70
    )
    for k in range(1, 71)
]

SUPPLIER_SCHEMA = (
    "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double"
)
SUPPLIER = [(k, f"Supplier#{k}", k % 5, 1000.0 * k) for k in range(1, 6)]

REGION_SCHEMA = "r_regionkey int, r_name string"
REGION = [(0, "AFRICA"), (1, "AMERICA"), (2, "ASIA")]

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)
EVENTS = (
    # ids 995..1030 straddle q30's >= 1001 cut
    [
        (
            i,
            _TS(2024, 1, 1 + (i % 20)),
            i % 7,
            ["click", "view", "purchase"][i % 3],
            float(i % 10) + 0.5,
            "{}",
        )
        for i in range(995, 1031)
    ]
    # ids inside q31's [2500, 3500] range and just outside it
    + [
        (
            i,
            _TS(2024, 2, 1),
            i % 4,
            "view",
            1.0,
            "{}",
        )
        for i in (2499, 2500, 2777, 3500, 3501)
    ]
)

DOCUMENTS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)
DOCUMENTS = (
    # exact duplicates: three copies of one text, two of another (q40)
    [
        (1, "the quick brown fox", "en", "web", 19),
        (2, "the quick brown fox", "en", "web", 19),
        (3, "the quick brown fox", "en", "books", 19),
        (4, "hello world", "en", "web", 11),
        (5, "hello world", "de", "web", 11),
        (6, "einzigartig", "de", "books", 11),
    ]
    # source 'web' gets a length outlier for q101; 'bulk' gets 7 docs with
    # tied lengths for q131's top-5 rank
    + [(10 + i, "x" * (40 + i), "en", "bulk", 40 + i) for i in range(5)]
    + [(20 + i, "y" * 50, "fr", "bulk", 50) for i in range(2)]
    + [(30, "z" * 400, "en", "web", 400)]  # the q101 outlier
)

EMBEDDINGS_SCHEMA = "vec_id bigint, embedding array<float>, label int"
EMBEDDINGS = [(i, [0.0, 1.0], 0) for i in range(6)] + [
    (6, [0.0, 1.0], 1),
    (7, [0.0, 1.0], 1),
    (8, [0.0, 1.0], 1),
    (9, [0.0, 1.0], 2),
]


@pytest.fixture()
def planted(spark):
    """Register every planted view; load_tables re-registers the real ones
    on the next catalog call, so nothing leaks across tests."""
    for name, schema, rows in [
        ("lineitem", LINEITEM_SCHEMA, LINEITEM),
        ("orders", ORDERS_SCHEMA, ORDERS),
        ("customer", CUSTOMER_SCHEMA, CUSTOMER),
        ("part", PART_SCHEMA, PART),
        ("supplier", SUPPLIER_SCHEMA, SUPPLIER),
        ("region", REGION_SCHEMA, REGION),
        ("events", EVENTS_SCHEMA, EVENTS),
        ("documents", DOCUMENTS_SCHEMA, DOCUMENTS),
        ("embeddings", EMBEDDINGS_SCHEMA, EMBEDDINGS),
    ]:
        spark.createDataFrame(rows, schema).createOrReplaceTempView(name)
    # the planted views must win over any load_tables fingerprint cache
    if hasattr(spark, "_leaf_table_cache"):
        spark._leaf_table_cache = {}
    return spark


def _run(spark, name):
    """Execute the entry's shared SQL text on Spark over the planted views
    (the production Spark path for sql_case entries, minus load_tables)."""
    case = all_cases()[name]
    assert case.shared_body, f"{name} is not shared-body"
    return [r.asDict() for r in spark.sql(case.oracle).collect()]


# ---------------------------------------------------------------------------
# relational surface
# ---------------------------------------------------------------------------


def test_q01_pricing_summary_planted(planted):
    rows = _run(planted, "q01_pricing_summary")
    cutoff = _TS(1998, 9, 2)
    groups: dict = {}
    for r in LINEITEM:
        if r[10] <= cutoff:
            groups.setdefault((r[8], r[9]), []).append(r)
    assert len(rows) == len(groups)
    for out in rows:
        g = groups[(out["l_returnflag"], out["l_linestatus"])]
        d = lambda f: sum(Decimal(str(f(r))) for r in g)  # noqa: E731
        n = len(g)
        assert out["count_order"] == n
        assert out["sum_qty"] == pytest.approx(float(d(lambda r: r[4])), abs=0)
        assert out["sum_base_price"] == pytest.approx(
            float(d(lambda r: r[5])), abs=0
        )
        assert out["sum_disc_price"] == pytest.approx(
            float(sum(Decimal(str(r[5])) * (1 - Decimal(str(r[6]))) for r in g)),
            rel=1e-12,
        )
        assert out["sum_charge"] == pytest.approx(
            float(
                sum(
                    Decimal(str(r[5]))
                    * (1 - Decimal(str(r[6])))
                    * (1 + Decimal(str(r[7])))
                    for r in g
                )
            ),
            rel=1e-12,
        )
        assert out["avg_qty"] == pytest.approx(
            float(d(lambda r: r[4])) / n, rel=1e-12
        )
        assert out["avg_disc"] == pytest.approx(
            float(d(lambda r: r[6])) / n, rel=1e-12
        )


def test_q02_filter_project_planted(planted):
    rows = _run(planted, "q02_filter_project")
    expect = {
        (r[0], r[2].upper(), r[3], r[5])
        for r in ORDERS
        if 100000 <= r[3] <= 200000 and "URGENT" in r[5] and r[2] in ("O", "F")
    }
    got = {
        (r["o_orderkey"], r["status_u"], r["o_totalprice"], r["o_orderpriority"])
        for r in rows
    }
    assert got == expect and expect  # non-vacuous


def test_q04_left_join_planted(planted):
    rows = {r["c_mktsegment"]: r for r in _run(planted, "q04_left_join")}
    by_cust: dict = {}
    for o in ORDERS:
        by_cust[o[1]] = by_cust.get(o[1], 0) + 1
    for seg in {c[4] for c in CUSTOMER}:
        custs = [c for c in CUSTOMER if c[4] == seg]
        # LEFT JOIN row algebra: a customer with k orders contributes k
        # rows, an orderless one contributes 1 row with NULL o_orderkey
        n_rows = sum(max(by_cust.get(c[0], 0), 1) for c in custs)
        n_orders = sum(by_cust.get(c[0], 0) for c in custs)
        assert rows[seg]["n_customers"] == n_rows
        assert rows[seg]["n_orders"] == n_orders
    # the fixture plants orderless customers, so count(*) != count(col)
    assert any(r["n_customers"] != r["n_orders"] for r in rows.values())


def test_q05_q06_semi_anti_partition_planted(planted):
    semi = {r["c_mktsegment"]: r["n_big_spenders"] for r in _run(planted, "q05_semi_join")}
    anti = {r["c_mktsegment"]: r["n_no_orders"] for r in _run(planted, "q06_anti_join")}
    big = {o[1] for o in ORDERS if o[3] > 250000}
    with_orders = {o[1] for o in ORDERS}
    exp_semi: dict = {}
    exp_anti: dict = {}
    for c in CUSTOMER:
        if c[0] in big:
            exp_semi[c[4]] = exp_semi.get(c[4], 0) + 1
        if c[0] not in with_orders:
            exp_anti[c[4]] = exp_anti.get(c[4], 0) + 1
    assert semi == exp_semi and exp_semi
    assert anti == exp_anti and exp_anti


def test_q07_distinct_planted(planted):
    got = {(r["o_orderstatus"], r["o_orderpriority"]) for r in _run(planted, "q07_distinct")}
    assert got == {(o[2], o[5]) for o in ORDERS}
    assert len(got) < len(ORDERS)  # the fixture plants duplicates


def test_q08_set_ops_precedence_planted(planted):
    """INTERSECT binds tighter than UNION/EXCEPT: ((A ∪ (B ∩ C)) − D)."""
    a = {p[2] for p in PART if p[4] > 40}
    b = {p[2] for p in PART if p[5] > 1800}
    c = {p[2] for p in PART if p[4] <= 50}
    d = {p[2] for p in PART if "azure" in p[1] and p[4] == 1 and p[5] < 0}
    expect = (a | (b & c)) - d
    got = {r["brand"] for r in _run(planted, "q08_set_ops")}
    assert got == expect and expect


def test_q09_order_limit_offset_planted(planted):
    ordered = sorted(PART, key=lambda p: (-p[5], p[0]))
    expect = [(p[0], p[1], p[5]) for p in ordered[10:60]]
    got = [
        (r["p_partkey"], r["p_name"], r["p_retailprice"])
        for r in _run(planted, "q09_order_limit_offset")
    ]
    assert got == expect and len(got) == 50


def test_q10_having_planted(planted):
    rows = _run(planted, "q10_having")
    per_cust: dict = {}
    for o in ORDERS:
        per_cust.setdefault(o[1], []).append(o[3])
    expect = {k: v for k, v in per_cust.items() if len(v) >= 5}
    assert {r["o_custkey"] for r in rows} == set(expect)
    for r in rows:
        assert r["n_orders"] == len(expect[r["o_custkey"]])
        assert r["spend"] == pytest.approx(
            float(sum(Decimal(str(x)) for x in expect[r["o_custkey"]])), abs=0
        )


def test_q11_window_topk_planted(planted):
    rows = _run(planted, "q11_window_topk")
    per_cust: dict = {}
    for o in ORDERS:
        per_cust.setdefault(o[1], []).append(o)
    expect = set()
    for ck, os_ in per_cust.items():
        for rk, o in enumerate(
            sorted(os_, key=lambda o: (-o[3], o[0]))[:3], start=1
        ):
            expect.add((ck, o[0], o[3], rk))
    got = {
        (r["o_custkey"], r["o_orderkey"], r["o_totalprice"], r["rk"])
        for r in rows
    }
    assert got == expect


def test_q12_window_running_planted(planted):
    rows = _run(planted, "q12_window_running")
    per_cust: dict = {}
    for o in sorted(ORDERS, key=lambda o: (o[4], o[0])):
        if o[1] < 100:
            per_cust.setdefault(o[1], []).append(o)
    expect = {}
    for ck, os_ in per_cust.items():
        run = Decimal(0)
        for o in os_:
            run += Decimal(str(o[3]))
            expect[(ck, o[0])] = float(run)
    got = {(r["o_custkey"], r["o_orderkey"]): r["running_spend"] for r in rows}
    assert got == expect


def test_q13_cte_planted(planted):
    rows = {r["c_mktsegment"]: r for r in _run(planted, "q13_cte")}
    spend: dict = {}
    for o in ORDERS:
        spend[o[1]] = spend.get(o[1], Decimal(0)) + Decimal(str(o[3]))
    seg_n: dict = {}
    seg_s: dict = {}
    for c in CUSTOMER:
        if c[0] in spend:
            seg_n[c[4]] = seg_n.get(c[4], 0) + 1
            seg_s[c[4]] = seg_s.get(c[4], Decimal(0)) + Decimal(
                str(float(spend[c[0]]))
            )
    assert set(rows) == set(seg_n)
    for seg, r in rows.items():
        assert r["n"] == seg_n[seg]
        assert r["segment_spend"] == pytest.approx(float(seg_s[seg]), rel=1e-12)


def test_q14_scalar_subquery_planted(planted):
    rows = _run(planted, "q14_scalar_subquery")
    avg = float(sum(Decimal(str(o[3])) for o in ORDERS)) / len(ORDERS)
    expect = sum(1 for o in ORDERS if o[3] > avg)
    assert rows == [{"n_above_avg": expect}] and expect > 0


def test_q15_correlated_subquery_planted(planted):
    """q15 stopped being shared-body in r12 (Spark side = single-pass
    window form; oracle keeps the correlated subquery), so BOTH texts are
    run on the planted views and checked against the Python recompute —
    the differential gate now also falsifies the pair for real."""
    from leaf_spark.queries_relational import _Q15, _Q15_SPARK

    spark_rows = [r.asDict() for r in planted.sql(_Q15_SPARK).collect()]
    oracle_rows = [r.asDict() for r in planted.sql(_Q15).collect()]
    for rows in (spark_rows, oracle_rows):
        _check_q15(rows)


def _check_q15(rows):
    per_order: dict = {}
    for li in LINEITEM:
        per_order.setdefault(li[0], []).append(li)
    expect = set()
    for ok, lis in per_order.items():
        avg = float(sum(Decimal(str(li[4])) for li in lis)) / len(lis)
        for li in lis:
            if li[4] > 2 * avg:
                expect.add((li[0], li[3], li[4]))
    got = {(r["l_orderkey"], r["l_linenumber"], r["l_quantity"]) for r in rows}
    assert got == expect == {(100, 3, 10.0)}  # exactly the planted outlier


def test_q16_cross_join_planted(planted):
    got = {(r["region_a"], r["region_b"]) for r in _run(planted, "q16_cross_join")}
    names = dict(REGION)
    expect = {
        (names[a], names[b])
        for a in names
        for b in names
        if a < b
    }
    assert got == expect and len(expect) == 3


def test_q18_ineq_join_planted(planted):
    rows = {r["s_name"]: r["n_cheap_parts"] for r in _run(planted, "q18_ineq_join")}
    expect: dict = {}
    for s in SUPPLIER:
        n = sum(
            1 for p in PART if p[4] < 10 and p[0] % 100 == s[0] % 100
        )
        if n > 0:
            expect[s[1]] = n
    assert rows == expect and expect


def test_q19_agg_of_agg_planted(planted):
    rows = {r["n_orders"]: r["n_customers"] for r in _run(planted, "q19_agg_of_agg")}
    per_cust: dict = {}
    for o in ORDERS:
        per_cust[o[1]] = per_cust.get(o[1], 0) + 1
    expect: dict = {}
    for n in per_cust.values():
        expect[n] = expect.get(n, 0) + 1
    assert rows == expect and len(expect) >= 2


def test_q22_math_planted(planted):
    rows = _run(planted, "q22_math")
    by_key = {(r["l_orderkey"], r["l_linenumber"]): r for r in rows}
    expect_keys = {(li[0], li[3]) for li in LINEITEM if li[0] < 400}
    assert set(by_key) == expect_keys
    for li in LINEITEM:
        if li[0] >= 400:
            continue
        r = by_key[(li[0], li[3])]
        assert r["disc_dev"] == pytest.approx(abs(li[6] - 0.05), rel=1e-12)
        # SQL round() is half-away-from-zero; planted values sit off the
        # .5 boundaries so floor(x+0.5) is unambiguous
        assert r["qty_r"] == math.floor(li[4] + 0.5)
        assert r["disc_pct"] == math.floor(li[6] * 100 + 0.5)
        assert r["price_r"] == math.floor(li[5] + 0.5)


# ---------------------------------------------------------------------------
# events surface
# ---------------------------------------------------------------------------


def test_q30_events_page_planted(planted):
    rows = _run(planted, "q30_events_page")
    expect = sorted(e[0] for e in EVENTS if e[0] >= 1001)[:1000]
    assert [r["event_id"] for r in rows] == expect
    ev = {e[0]: e for e in EVENTS}
    for r in rows:
        e = ev[r["event_id"]]
        assert (r["user_id"], r["event_type"], r["value"]) == (e[2], e[3], e[4])


def test_q31_events_range_scan_planted(planted):
    got = {r["event_id"] for r in _run(planted, "q31_events_range_scan")}
    expect = {e[0] for e in EVENTS if 2500 <= e[0] <= 3500}
    assert got == expect == {2500, 2777, 3500}  # boundary-inclusive


def test_q32_events_type_stats_planted(planted):
    rows = {r["event_type"]: r for r in _run(planted, "q32_events_type_stats")}
    by_type: dict = {}
    for e in EVENTS:
        by_type.setdefault(e[3], []).append(e)
    assert set(rows) == set(by_type)
    for t, es in by_type.items():
        r = rows[t]
        assert r["n"] == len(es)
        assert r["value_sum"] == pytest.approx(
            float(sum(Decimal(str(e[4])) for e in es)), abs=0
        )
        assert r["value_min"] == min(e[4] for e in es)
        assert r["value_max"] == max(e[4] for e in es)
        assert r["n_users"] == len({e[2] for e in es})


def test_q35_events_topk_users_planted(planted):
    rows = _run(planted, "q35_events_topk_users")
    counts: dict = {}
    for e in EVENTS:
        counts[e[2]] = counts.get(e[2], 0) + 1
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["user_id"], r["n"]) for r in rows] == expect


def test_q36_events_two_pages_planted(planted):
    rows = _run(planted, "q36_events_two_pages")
    ids = sorted(e[0] for e in EVENTS)
    p1 = [i for i in ids if i >= 1][:500]
    p2 = [i for i in ids if i >= 501][:500]
    got = sorted(r["event_id"] for r in rows)
    assert got == sorted(p1 + p2)  # UNION ALL keeps the page overlap


# ---------------------------------------------------------------------------
# documents / embeddings pipeline entries
# ---------------------------------------------------------------------------


def test_q40_dedup_exact_planted(planted):
    rows = _run(planted, "q40_dedup_exact")
    n = len(DOCUMENTS)
    uniq = len({hashlib.md5(d[1].encode()).hexdigest() for d in DOCUMENTS})
    assert rows == [{"n_docs": n, "n_unique": uniq, "n_dups": n - uniq}]
    # planted duplicate families: fox x3, hello x2, y*50 x2 -> 4 extras
    assert n - uniq == 4


def test_q43_lang_stats_planted(planted):
    rows = {r["lang"]: r for r in _run(planted, "q43_lang_stats")}
    by_lang: dict = {}
    for d in DOCUMENTS:
        by_lang.setdefault(d[2], []).append(d[4])
    assert set(rows) == set(by_lang)
    for lang, chars in by_lang.items():
        r = rows[lang]
        assert r["n_docs"] == len(chars)
        assert r["total_chars"] == sum(chars)
        assert r["avg_chars"] == pytest.approx(
            sum(chars) / len(chars), rel=1e-12
        )


def test_q95_label_balance_planted(planted):
    rows = {r["label"]: r for r in _run(planted, "q95_label_balance")}
    counts: dict = {}
    for e in EMBEDDINGS:
        counts[e[2]] = counts.get(e[2], 0) + 1
    total, k = len(EMBEDDINGS), len(counts)
    assert set(rows) == set(counts)
    for lab, n in counts.items():
        r = rows[lab]
        assert r["n"] == n
        # inverse-frequency weight: total / (k * n)
        assert r["weight"] == pytest.approx(total / (k * n), rel=1e-12)
        # resampling with that weight equalizes every class share to 1/k
        assert r["resampled_share"] == pytest.approx(1.0 / k, rel=1e-12)


def test_q101_zscore_outliers_planted(planted):
    rows = _run(planted, "q101_zscore_outliers")
    by_source: dict = {}
    for d in DOCUMENTS:
        by_source.setdefault(d[3], []).append(d)
    expect = {}
    for src, ds in by_source.items():
        n = len(ds)
        mean = sum(d[4] for d in ds) / n
        var = max(sum(d[4] * d[4] for d in ds) / n - mean * mean, 1e-12)
        for d in ds:
            z = (d[4] - mean) / math.sqrt(var)
            if abs(z) >= 1.5:
                expect[d[0]] = z
    assert {r["doc_id"] for r in rows} == set(expect)
    assert 30 in expect  # the planted 400-char outlier is flagged
    for r in rows:
        assert r["z"] == pytest.approx(expect[r["doc_id"]], abs=2e-4)


def test_q126_label_entropy_planted(planted):
    rows = {r["label"]: r for r in _run(planted, "q126_label_balance")}
    counts: dict = {}
    for e in EMBEDDINGS:
        counts[e[2]] = counts.get(e[2], 0) + 1
    total, k = len(EMBEDDINGS), len(counts)
    h = sum(-(n / total) * math.log(n / total) for n in counts.values())
    assert set(rows) == set(counts)
    for lab, n in counts.items():
        r = rows[lab]
        assert r["n"] == n and r["n_classes"] == k
        assert r["share"] == pytest.approx(n / total, abs=1e-6)
        # eff_classes = exp(H); per-term 1e-6 rounding -> ~1e-3 slack
        assert r["eff_classes"] == pytest.approx(math.exp(h), abs=1e-3)


def test_q131_quota_dedup_rank_planted(planted):
    rows = _run(planted, "q131_quota_dedup_rank")
    by_source: dict = {}
    for d in DOCUMENTS:
        by_source.setdefault(d[3], []).append(d)
    expect = set()
    for src, ds in by_source.items():
        ranked = sorted(ds, key=lambda d: (-len(d[1]), d[0]))[:5]
        for rk, d in enumerate(ranked, start=1):
            expect.add((src, d[0], rk, len(d[1])))
    got = {(r["source"], r["doc_id"], r["rank"], r["len"]) for r in rows}
    assert got == expect
    # 'bulk' plants 7 docs including a length tie — the quota really cuts
    assert sum(1 for s, *_ in expect if s == "bulk") == 5
