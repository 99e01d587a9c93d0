"""Scale-growth curve for the heavy operators: sf0.1 vs synthesized sf1.0.

VERDICT r5 "Next round #3": run q90/q49/q109/q96/q61 at both scales,
report wall-time ratios (docs grow 10x, so ≲ linear means ratio ≲ ~10
with generous slack for fixed job overhead amortizing the other way),
and ASSERT plan identity — the same exchange/shuffle count at both
scales, i.e. the plan does not degrade (e.g. a broadcast flipping to a
shuffle join, or an extra exchange appearing) when the data grows 10x.

Usage: python tools/scale_curve.py   (run tools/gen_scale.py first)
Prints one JSON line per query plus a summary table.
"""

from __future__ import annotations

import json
import re
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from leaf_spark.session import get_spark  # noqa: E402

HEAVIES = [
    "q90_containment_dedup",
    "q49_minhash_lsh",
    "q109_bpe_merges",
    "q96_pagerank",
    "q61_decontaminate",
    # round-6 event/profile entries (gen_scale synthesizes events too)
    "q192_rfm_segments",
    "q193_interevent_burstiness",
    "q194_heaps_law",
    "q195_mann_kendall",
    # round-8 additions (VERDICT r7 "Next round #3"): the lag-window and
    # day-pair-solve shapes the curve never covered — q159 per-user gap
    # quantiles, q166 Theil-Sen over day pairs, q167 daily-volume ACF,
    # q169 mean-shift changepoint, q178 (user,type)-window permutation
    # entropy (the q178/q193 family representative)
    "q159_gap_quantiles",
    "q166_theil_sen_trend",
    "q167_volume_acf",
    "q169_mean_shift_changepoint",
    "q178_permutation_entropy",
]
SF01 = "/root/testdata/sf0.1"
SF10 = "/root/repo/.scale/sf1.0"


def plan_counts(df) -> dict[str, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "broadcasts": len(re.findall(r"BroadcastExchange", plan)),
        "sorts": len(re.findall(r"\bSort\b", plan)),
    }


def main() -> None:
    spark = get_spark("scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs = e.queries()
    rows = []
    for name in HEAVIES:
        rec: dict = {"query": name}
        for label, sf_dir in (("sf0.1", SF01), ("sf1.0", SF10)):
            fn = qs[name]
            fn(spark, sf_dir).count()  # warm (plan + codegen + caches)
            times = []
            for _ in range(3):
                t0 = time.monotonic()
                n = fn(spark, sf_dir).count()
                times.append(time.monotonic() - t0)
            rec[label] = round(statistics.median(times), 2)
            rec[f"{label}_rows"] = n
            rec[f"{label}_plan"] = plan_counts(fn(spark, sf_dir))
        rec["time_ratio"] = round(rec["sf1.0"] / max(rec["sf0.1"], 1e-9), 2)
        rec["plan_identical"] = rec["sf0.1_plan"] == rec["sf1.0_plan"]
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    bad_plan = [r["query"] for r in rows if not r["plan_identical"]]
    # 10x data: ≲ linear growth with slack for fixed overhead amortization
    # on the small side and one AQE re-plan on the big side
    superlinear = [r["query"] for r in rows if r["time_ratio"] > 15.0]
    print(
        json.dumps(
            {
                "summary": {
                    r["query"]: {
                        "sf0.1_s": r["sf0.1"],
                        "sf1.0_s": r["sf1.0"],
                        "ratio": r["time_ratio"],
                        "plan_identical": r["plan_identical"],
                    }
                    for r in rows
                },
                "plan_divergence": bad_plan,
                "superlinear": superlinear,
            }
        )
    )
    if bad_plan or superlinear:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
