"""Round-13 optimization profiler (guide §1): per-query timings via the
noop sink + formatted-plan capture.

For each named query (default: bench.py HEADLINE+HEAVY) at $SPARK_GRAFT_SF_DIR:
  - runs a warm-up pass at sf0.001 (codegen compile, same as bench.py),
  - times N noop-sink runs (df.write.format("noop") — computes every column
    of every row, guide §1.4) and N .count() runs (the bench's historical
    timed action, kept for comparability),
  - writes .explain("formatted") to plans/r13/<query>_<tag>.txt,
  - prints one JSON line per query with medians + plan stats (Exchange
    count, join strategies, Python-eval nodes, PushedFilters presence).

Usage: python tools/profile_r13.py [--tag before|after] [--queries a,b]
       [--runs 5] [--no-plans]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from leaf_spark.session import get_spark  # noqa: E402


def plan_stats(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan))
        - len(re.findall(r"BroadcastExchange", plan)),
        "broadcast_exchanges": len(re.findall(r"BroadcastExchange", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        "py_eval": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas", plan)
        ),
        "sorts": len(re.findall(r"^\s*[+:]?-? ?\*?\(?\d*\)? ?Sort ", plan, re.M)),
        "window": len(re.findall(r"\bWindow\b", plan)),
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--no-count", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, "/root/repo")
    import bench

    names = (
        args.queries.split(",")
        if args.queries
        else bench.HEADLINE + bench.HEAVY
    )

    from leaf_spark.queries import all_cases

    spark = get_spark("leaf-profile-r13")
    spark.sparkContext.setLogLevel("ERROR")
    cases = all_cases()
    names = [n if n in cases else next(k for k in cases if k.startswith(n)) for n in names]

    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    plans_dir = "/root/repo/plans/r13"
    os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        cases[name].spark_fn(spark, warm_dir).count()

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        df = cases[name].spark_fn(spark, sf_dir)
        if not args.no_plans:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
            stats = plan_stats(plan)
        else:
            stats = {}

        noop, cnt = [], []
        for _ in range(args.runs):
            df = cases[name].spark_fn(spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            noop.append(time.time() - t0)
        if not args.no_count:
            for _ in range(args.runs):
                df = cases[name].spark_fn(spark, sf_dir)
                t0 = time.time()
                df.count()
                cnt.append(time.time() - t0)
        rec = {
            "noop_med": round(statistics.median(noop), 3),
            "noop_min": round(min(noop), 3),
            "count_med": round(statistics.median(cnt), 3) if cnt else None,
            **stats,
        }
        out[name] = rec
        print(json.dumps({"query": name, **rec}), flush=True)
        spark.sparkContext.setJobDescription(None)

    total = round(sum(r["noop_med"] for r in out.values()), 3)
    print(json.dumps({"tag": args.tag, "sf_dir": sf_dir, "total_noop_med": total}))


if __name__ == "__main__":
    main()
