"""A/B: generated-class cache size vs the bench's interleaved pass (r13).

Hypothesis (guide §1 empirical loop; prior-session observation that
interleaved counts ran ~3x slower than back-to-back runs of the same
query): the 26 bench queries produce more whole-stage-codegen units than
`spark.sql.codegen.cache.maxEntries` (default 100), so by the time an
interleaved pass loops back to a query, its generated classes have been
evicted and every sample pays janino recompilation + fresh JIT. Raising
the cap is a session-level fix that removes per-sample compile cost
without touching any query.

The conf is STATIC (read once at JVM start), so each arm runs in its own
subprocess. Each arm: warm every query once at sf0.001 (exactly like
bench.py), then time N interleaved passes at $SPARK_GRAFT_SF_DIR and
print per-pass totals + per-query medians, plus the JVM's codegen
compile-time counter before/after the measured passes
(CodegenMetrics.METRIC_COMPILATION_TIME) so eviction-driven recompiles
are observable directly, not inferred.

Usage: python tools/ab_codegen_cache.py <maxEntries> [passes=3]
       (run once with 100, once with e.g. 5000; compare)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    max_entries = sys.argv[1] if len(sys.argv) > 1 else "100"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from leaf_spark.queries import all_cases
    from leaf_spark.session import get_spark

    spark = get_spark(
        f"ab-codegen-{max_entries}",
        extra_conf={"spark.sql.codegen.cache.maxEntries": max_entries},
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(
        "effective maxEntries:",
        spark.conf.get("spark.sql.codegen.cache.maxEntries"),
        flush=True,
    )
    cases = all_cases()
    names = bench.HEADLINE + bench.HEAVY

    def codegen_compile_ms() -> float:
        # CodegenMetrics is a codahale registry on the driver JVM;
        # sourceCodeSize/compilationTime histograms only grow when janino
        # actually compiles (a cache hit adds nothing).
        jvm = spark.sparkContext._jvm
        m = jvm.org.apache.spark.metrics.source.CodegenMetrics
        return (
            m.METRIC_COMPILATION_TIME().getSnapshot().size(),
            m.METRIC_COMPILATION_TIME().getCount(),
        )

    warm = "/root/testdata/sf0.001"
    for n in names:
        cases[n].spark_fn(spark, warm).count()

    def steal_jiffies() -> int:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])

    before = codegen_compile_ms()
    samples: dict[str, list[float]] = {n: [] for n in names}
    pass_totals = []
    for p in range(passes):
        t0 = time.time()
        s0 = steal_jiffies()
        for n in names:
            t1 = time.time()
            cases[n].spark_fn(spark, sf_dir).count()
            samples[n].append(time.time() - t1)
        pass_totals.append(time.time() - t0)
        # steal jiffies are summed over all 32 cpus; /100/32 ≈ seconds of
        # whole-machine freeze during the pass — flags hypervisor pauses
        print(
            f"pass {p}: {pass_totals[-1]:.2f}s "
            f"steal={(steal_jiffies() - s0) / 100 / 32:.2f}s",
            flush=True,
        )
    after = codegen_compile_ms()

    med = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    mins = {n: round(min(s), 3) for n, s in samples.items()}
    print("per-query medians:", med)
    print("per-query mins:", mins)
    print(
        f"maxEntries={max_entries} passes={passes} "
        f"total_med={round(statistics.median(pass_totals), 2)} "
        f"total_min={round(min(pass_totals), 2)} "
        f"min_sum={round(sum(mins.values()), 2)} "
        f"compiles_during_passes={after[1] - before[1]}"
    )


if __name__ == "__main__":
    main()
