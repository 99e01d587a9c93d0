"""Interleaved A/B for q109's loop-checkpoint mode (VERDICT r12 #5).

The r12 change made the per-merge vocab checkpoints lazy (one fewer
Spark job per merge); the driver's bench then measured q109 at 0.82x
with overlapping spreads. This runs N interleaved pairs under driver
conditions (same timed action: .count() after a sf0.001 warm-up, same
session) flipping leaf_spark.operators.bpe._EAGER_LOOP_CKPT per run,
and prints medians for both arms.

Usage: python tools/ab_q109.py [runs-per-arm (default 9)] [query ...]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from leaf_spark.session import get_spark  # noqa: E402


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    names = sys.argv[2:] or ["q109_bpe_merges"]
    sf_dir = "/root/testdata/sf0.1"

    from leaf_spark.operators import bpe
    from leaf_spark.queries import all_cases

    spark = get_spark("ab-q109")
    spark.sparkContext.setLogLevel("ERROR")
    cases = all_cases()

    for name in names:
        for eager in (False, True):
            bpe._EAGER_LOOP_CKPT = eager
            cases[name].spark_fn(spark, "/root/testdata/sf0.001").count()

        samples: dict[bool, list[float]] = {False: [], True: []}
        for i in range(runs):
            # alternate which arm goes first so slow host drift cancels
            order = (False, True) if i % 2 == 0 else (True, False)
            for eager in order:
                bpe._EAGER_LOOP_CKPT = eager
                t0 = time.time()
                cases[name].spark_fn(spark, sf_dir).count()
                samples[eager].append(time.time() - t0)
        bpe._EAGER_LOOP_CKPT = False
        for eager in (False, True):
            s = sorted(samples[eager])
            print(
                f"{name} eager={eager}: med {statistics.median(s):.3f} "
                f"min {s[0]:.3f} max {s[-1]:.3f} n={len(s)}",
                flush=True,
            )


if __name__ == "__main__":
    main()
