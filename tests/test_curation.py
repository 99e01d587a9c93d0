"""Round-4 curation operators: triplet mining, int8 quantization audit,
doc-level contamination — functional checks against hand-computed
expectations plus plan-shape (100 TB contract) assertions."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def plan_of(df, mode: str = "simple") -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


# ---------------------------------------------------------------------------
# triplet mining
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def labeled_vecs(spark):
    # label 0 along +x with slight spreads, label 1 along +y.
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 0),   # closest same-label to 0
        (2, [0.7, 0.3], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.3, 0.7], 1),   # closest other-label to 0
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")


def test_triplet_mining_picks_hardest_pos_and_neg(spark, labeled_vecs):
    from leaf_spark.operators.curation import triplet_mining

    out = {
        r["anchor_id"]: r
        for r in triplet_mining(labeled_vecs, F.col("vec_id") == 0).collect()
    }
    assert set(out) == {0}
    r = out[0]
    assert r["anchor_label"] == 0
    assert r["pos_id"] == 1        # cos(0,1) > cos(0,2)
    assert r["neg_id"] == 4        # cos(0,4) > cos(0,3)
    assert r["pos_cos"] > r["neg_cos"] > 0.0


def test_triplet_mining_tiebreaks_to_lowest_id(spark):
    from leaf_spark.operators.curation import triplet_mining

    # ids 2 and 3 are identical vectors — both tie as hardest positive;
    # the lower id must win deterministically.
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.0], 0),
        (3, [1.0, 0.0], 0),
        (9, [0.0, 1.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    r = triplet_mining(df, F.col("vec_id") == 1).collect()[0]
    assert r["pos_id"] == 2
    assert r["neg_id"] == 9


def test_triplet_mining_plan_broadcasts_anchors(spark, labeled_vecs):
    from leaf_spark.operators.curation import triplet_mining

    plan = plan_of(triplet_mining(labeled_vecs, F.col("vec_id") < 2))
    # dense-scoring pass: anchors broadcast, corpus never shuffles pre-agg
    assert "BroadcastNestedLoopJoin" in plan
    # one aggregation keyed on the anchor — no window, no second scan join
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# int8 quantization audit
# ---------------------------------------------------------------------------


def test_int8_quant_stats_hand_computed(spark):
    from leaf_spark.operators.curation import int8_quant_stats

    # dim 0: values ±2.0 → amax 2.0; x=2.0 quantizes to floor(127.0)=127
    # (saturated); x=-2.0 → floor(-127.0)=-127 (saturated).
    # dim 1: 0.5 & 1.0 → amax 1.0; 0.5 → floor(63.5)=63.
    rows = [(1, [2.0, 0.5]), (2, [-2.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {r["dim"]: r for r in int8_quant_stats(df).collect()}

    assert out[0]["amax"] == 2.0
    assert out[0]["n_saturated"] == 2
    assert out[0]["mean_abs_err"] == 0.0

    assert out[1]["amax"] == 1.0
    assert out[1]["n_saturated"] == 1   # x=1.0 → qv=127
    # x=0.5: dequant = 63*1/127 ≈ 0.496063 → err ≈ 0.003937; mean over 2 rows
    expected = round(round(abs(0.5 - 63.0 / 127.0), 9) / 2, 8)
    assert math.isclose(out[1]["mean_abs_err"], expected, abs_tol=1e-9)


def test_int8_quant_error_bounded_by_one_step(spark):
    from leaf_spark.operators.curation import int8_quant_stats

    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(4)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    for r in int8_quant_stats(df).collect():
        # floor quantizer error < 1 LSB = amax/127
        assert r["mean_abs_err"] <= r["amax"] / 127.0 + 1e-9
        assert r["n"] == 50


# ---------------------------------------------------------------------------
# doc contamination
# ---------------------------------------------------------------------------


def test_doc_contamination_flags_paraphrase_level_overlap(spark):
    from leaf_spark.operators.curation import doc_contamination

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words entirely here now"),
        ],
        "doc_id bigint, text string",
    )
    holdout = spark.createDataFrame(
        [
            (100, "quick brown fox jumps over lazy dog"),      # ⊂ doc 1 vocab
            (101, "unrelated benchmark prompt material"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in doc_contamination(train, holdout, 0.5).collect()}
    assert set(out) == {1}
    assert out[1]["holdout_id"] == 100
    # train doc 1 has 8 distinct words, holdout 100 has 7, all shared → 7/8
    assert out[1]["jaccard"] == 0.875


def test_doc_contamination_no_false_hits_below_threshold(spark):
    from leaf_spark.operators.curation import doc_contamination

    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id bigint, text string"
    )
    holdout = spark.createDataFrame(
        [(9, "alpha epsilon zeta eta")], "doc_id bigint, text string"
    )
    # jaccard = 1/7 < 0.5
    assert doc_contamination(train, holdout, 0.5).count() == 0


def test_doc_contamination_plan_broadcasts_holdout_index(spark):
    from leaf_spark.operators.curation import doc_contamination

    train = spark.createDataFrame(
        [(1, "a b c"), (2, "c d e")], "doc_id bigint, text string"
    )
    holdout = spark.createDataFrame([(9, "a b d")], "doc_id bigint, text string")
    plan = plan_of(doc_contamination(train, holdout, 0.1))
    # the holdout word index joins in as a broadcast: the training corpus is
    # scanned once without shuffling for candidate generation
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# sampling additions: rendezvous shards / systematic / weighted
# ---------------------------------------------------------------------------


def test_rendezvous_minimal_movement_on_shard_add(spark):
    from leaf_spark.operators.sampling import rendezvous_shard

    docs = spark.range(0, 400).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["shard"] for r in rendezvous_shard(docs, 16).collect()}
    b = {r["doc_id"]: r["shard"] for r in rendezvous_shard(docs, 17).collect()}
    moved = [d for d in a if a[d] != b[d]]
    # the rendezvous property: ONLY rows whose new-shard weight wins move,
    # E[moved] = n/17 ≈ 23.5 — and every moved row moves TO the new shard
    assert len(moved) < 400 * 2 / 17
    assert all(b[d] == 16 for d in moved)


def test_rendezvous_balance(spark):
    from leaf_spark.operators.sampling import rendezvous_shard

    docs = spark.range(0, 1600).withColumnRenamed("id", "doc_id")
    sizes = [
        r["n"]
        for r in rendezvous_shard(docs, 16)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(sizes) == 16
    # uniform hashing: every shard within ±60% of the mean (loose, det. seed)
    assert min(sizes) > 100 * 0.4 and max(sizes) < 100 * 1.6


def test_systematic_sample_count_and_coverage(spark):
    from leaf_spark.operators.sampling import systematic_sample

    docs = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("tok")
    )
    out = systematic_sample(docs, target=25, weight_col="tok").collect()
    # one pick per crossed threshold: exactly `target` picks when every
    # weight < step (no double-crossings), distinct buckets
    assert len(out) == 25
    assert len({r["bucket"] for r in out}) == 25
    # proportional coverage: picks spread over the whole id range
    ids = sorted(r["doc_id"] for r in out)
    assert ids[0] < 50 and ids[-1] > 450


def test_weighted_sample_favors_heavy_rows_and_is_deterministic(spark):
    from leaf_spark.operators.sampling import weighted_sample

    # 100 heavy rows (w=1000) + 400 light rows (w=1)
    docs = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, 1000).otherwise(1).alias("tok"),
    )
    s1 = [r["doc_id"] for r in weighted_sample(docs, 50, "tok").collect()]
    s2 = [r["doc_id"] for r in weighted_sample(docs, 50, "tok").collect()]
    assert s1 == s2  # content-hash priorities: identical across runs
    heavy = sum(1 for d in s1 if d < 100)
    # heavy rows hold ~99.6% of total weight → expect nearly all picks
    assert heavy >= 45


def test_weighted_sample_plan_is_topk_not_global_sort(spark):
    from leaf_spark.operators.sampling import weighted_sample

    docs = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit(5).alias("tok")
    )
    plan = plan_of(weighted_sample(docs, 10, "tok"))
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# feature hashing
# ---------------------------------------------------------------------------


def test_feature_hash_matches_python_recompute(spark):
    import hashlib

    from leaf_spark.operators.curation import feature_hash_vectors

    texts = [(0, "alpha beta alpha gamma"), (1, "beta beta delta"), (2, "zz")]
    df = spark.createDataFrame(texts, "doc_id bigint, text string")
    got = {r["id"]: (list(r["vector"]), r["n_tokens"])
           for r in feature_hash_vectors(df, dims=8).collect()}

    for i, text in texts:
        vec = [0] * 8
        toks = text.split(" ")
        for t in toks:
            h = hashlib.md5(t.encode()).hexdigest()
            b = int(h[:8], 16) % 8
            s = 1 if int(h[8], 16) % 2 == 0 else -1
            vec[b] += s
        assert got[i] == (vec, len(toks)), f"doc {i}"


def test_feature_hash_plan_has_no_shuffle(spark):
    from leaf_spark.operators.curation import feature_hash_vectors

    df = spark.createDataFrame([(0, "a b c")], "doc_id bigint, text string")
    plan = plan_of(feature_hash_vectors(df, dims=8))
    assert "Exchange" not in plan  # pure projection — the 100 TB contract


# ---------------------------------------------------------------------------
# BPE merge learning
# ---------------------------------------------------------------------------


def test_bpe_apply_merge_simple_and_run_parity(spark):
    from pyspark.sql import functions as F

    from leaf_spark.operators.bpe import apply_merge

    rows = [
        (1, ["a", "b", "c", "a", "b"]),   # two non-overlapping (a,b) matches
        (2, ["a", "a", "a"]),             # run of 3 'a': greedy → [aa, a]
        (3, ["a", "a", "a", "a"]),        # run of 4: → [aa, aa]
        (4, ["x", "y"]),                  # no match → unchanged
    ]
    df = spark.createDataFrame(rows, "id int, syms array<string>")
    ab = {r["id"]: list(r["m"]) for r in df.select(
        "id", apply_merge(F.col("syms"), F.lit("a"), F.lit("b")).alias("m")).collect()}
    assert ab[1] == ["ab", "c", "ab"]
    assert ab[4] == ["x", "y"]
    aa = {r["id"]: list(r["m"]) for r in df.select(
        "id", apply_merge(F.col("syms"), F.lit("a"), F.lit("a")).alias("m")).collect()}
    assert aa[2] == ["aa", "a"]
    assert aa[3] == ["aa", "aa"]
    assert aa[1] == ["a", "b", "c", "a", "b"]  # no adjacent equal 'a's


def test_bpe_merges_hand_computed(spark):
    from leaf_spark.operators.bpe import bpe_merges

    # corpus: "low low low lower" → vocab {low:3, lower:1}
    # symbols: l,o,w,</w> ×3 and l,o,w,e,r,</w> ×1
    # pair counts: (l,o)=4, (o,w)=4, (w,</w>)=3, (w,e)=1, (e,r)=1, (r,</w>)=1
    # tie (l,o) vs (o,w) → lexicographic: 'l' < 'o' → merge 1 = (l,o)
    # then (lo,w)=4 wins → merge 2 = (lo,w)
    docs = spark.createDataFrame([(1, "low low low lower")], "id int, text string")
    out = {r["rank"]: r for r in bpe_merges(docs, num_merges=2).collect()}
    assert (out[1]["left"], out[1]["right"], out[1]["pair_count"]) == ("l", "o", 4)
    assert (out[2]["left"], out[2]["right"], out[2]["pair_count"]) == ("lo", "w", 4)
    # after merge 2: low→[low,</w>] (2 syms ×3 words? no: freq-weighted)
    # vocab after m2: {low: [low,</w>] f3, lower: [low,e,r,</w>] f1}
    assert out[2]["corpus_syms_after"] == 3 * 2 + 1 * 4


def test_bpe_encode_stats_hand_computed(spark):
    from leaf_spark.operators.bpe import bpe_encode_stats

    # sources: s1 = "low low", s2 = "lower"
    # merges over joint corpus {low:2, lower:1}: (l,o)=3 then (lo,w)=3
    # after 2 merges: low → [low, </w>] (2), lower → [low, e, r, </w>] (4)
    docs = spark.createDataFrame(
        [(1, "low low", "s1"), (2, "lower", "s2")], "id int, text string, source string"
    )
    out = {r["source"]: r for r in bpe_encode_stats(docs, num_merges=2).collect()}
    assert (out["s1"]["n_words"], out["s1"]["subword_tokens"]) == (2, 4)
    assert (out["s2"]["n_words"], out["s2"]["subword_tokens"]) == (1, 4)
    assert out["s1"]["toks_per_word"] == 2.0
    assert out["s2"]["toks_per_word"] == 4.0


def test_bpe_stops_when_vocab_fully_merged(spark):
    from leaf_spark.operators.bpe import bpe_merges

    # one word "a" → [a, </w>]: merge 1 = (a, </w>); then no pairs remain.
    docs = spark.createDataFrame([(1, "a a")], "id int, text string")
    out = bpe_merges(docs, num_merges=5).collect()
    assert len(out) == 1
    assert (out[0]["left"], out[0]["right"]) == ("a", "</w>")
    assert out[0]["corpus_syms_after"] == 2  # "a</w>" ×2 words → 1 sym ×2
