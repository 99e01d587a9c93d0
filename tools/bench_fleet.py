"""Multi-stream ingest scaling — substantiates the SCALE.md claim that
throughput scales with stream count (per-stream single-writer lock, no
global lock): N streams ingest concurrently from N threads on one
SparkSession; aggregate events/sec should grow with N until executor
slots saturate.

Usage: python tools/bench_fleet.py [streams] [events_per_stream] [batch]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, "/root/repo")

from leaf_spark.session import get_spark
from leaf_spark.stream import Stream

from tests.fixtures import CHAT, msg


def main() -> None:
    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    per_stream = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    # FAIR must be set at context creation — scheduler mode is immutable
    # after the TaskScheduler initializes (a setLocalProperty would be a
    # silent no-op; only spark.scheduler.pool is read per-thread)
    spark = get_spark(
        "leaf-fleet-bench", extra_conf={"spark.scheduler.mode": "FAIR"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.conf.get("spark.scheduler.mode") == "FAIR"

    root = tempfile.mkdtemp(prefix="fleet_bench_")
    streams = []
    for i in range(n_streams):
        s = Stream(spark, f"{root}/s{i}", f"did:plc:fleet{i}")
        s.provide_module(CHAT)
        streams.append(s)

    def ingest(s: Stream) -> None:
        # FAIR mode schedules BETWEEN pools; jobs inside one pool are FIFO,
        # so each ingest thread needs its own pool for fair interleaving
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", f"ingest-{id(s)}"
        )
        i = 0
        while i < per_stream:
            n = min(batch, per_stream - i)
            s.add_events([msg("did:plc:u", f"m{i + j}", i + j) for j in range(n)])
            i += n

    # Warm the session first (codegen/JIT/first-job setup would otherwise
    # land entirely on the single-stream baseline and inflate the scaling
    # factor): one throwaway batch through a scratch stream.
    warm = Stream(spark, f"{root}/warm", "did:plc:fleetwarm")
    warm.provide_module(CHAT)
    warm.add_events([msg("did:plc:u", f"w{j}", j) for j in range(batch)])

    # single-stream reference on the warmed session
    t0 = time.time()
    ingest(streams[0])
    single = per_stream / (time.time() - t0)

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=n_streams - 1) as ex:
        list(ex.map(ingest, streams[1:]))
    fleet = (n_streams - 1) * per_stream / (time.time() - t0)

    print(
        json.dumps(
            {
                "n_streams_concurrent": n_streams - 1,
                "events_per_stream": per_stream,
                "batch_size": batch,
                "single_stream_events_per_sec": round(single, 1),
                "fleet_aggregate_events_per_sec": round(fleet, 1),
                "scaling_factor": round(fleet / single, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
