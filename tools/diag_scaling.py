"""Diagnose the 8->32-core scaling gap with stage-level task metrics.

Runs the same fixed-superstep PageRank as tools/bench_scaling.py at one
parallelism level (fresh JVM) with the UI REST API enabled, then sums
executor run/CPU/GC time and shuffle volume over all completed stages.
Comparing levels answers WHICH resource eats the missing speedup:

- executorRunTime grows with cores        -> contention (memory/locks)
- cpuTime ~ constant, runTime grows       -> stalls (bandwidth, GC, IO)
- both ~ constant but wall doesn't drop   -> scheduling gaps / stragglers
  (tasks can't fill cores: too few partitions per stage or driver floor)

Usage: python tools/diag_scaling.py [cores] [measured_supersteps]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from giraph_spark.algorithms.pagerank import pagerank  # noqa: E402
from giraph_spark.session import get_spark  # noqa: E402

EDGES_PATH = "/tmp/giraph_scaling_edges.parquet"
SHUFFLE_PARTITIONS = 64
WARMUP = 2


def _rest(url: str):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read().decode())


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    measured = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(
        app_name=f"diag-{cores}",
        cores=cores,
        shuffle_partitions=SHUFFLE_PARTITIONS,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "64g"),
            "spark.ui.enabled": "true",
            # experiment hook: SPARK_DRIVER_JAVA_OPTS="-XX:+UseG1GC" compares
            # collectors (engine default is ParallelGC, session.py)
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.read.parquet(EDGES_PATH)
    t0 = time.time()
    run = pagerank(
        spark, edges, damping=0.85, max_supersteps=WARMUP + measured,
        tolerance=None, num_partitions=SHUFFLE_PARTITIONS,
    )
    wall = time.time() - t0
    samples = [round(h["seconds"], 2) for h in run.history[WARMUP:]]

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    stages = _rest(f"{ui}/api/v1/applications/{app_id}/stages?status=COMPLETE")
    agg = {
        "executorRunTime_s": 0.0,
        "executorCpuTime_s": 0.0,
        "jvmGcTime_s": 0.0,
        "shuffleReadBytes_gb": 0.0,
        "shuffleWriteBytes_gb": 0.0,
        "inputBytes_gb": 0.0,
        "num_tasks": 0,
        "num_stages": len(stages),
    }
    for s in stages:
        agg["executorRunTime_s"] += s.get("executorRunTime", 0) / 1e3
        agg["executorCpuTime_s"] += s.get("executorCpuTime", 0) / 1e9
        agg["jvmGcTime_s"] += s.get("jvmGcTime", 0) / 1e3
        agg["shuffleReadBytes_gb"] += s.get("shuffleReadBytes", 0) / 1e9
        agg["shuffleWriteBytes_gb"] += s.get("shuffleWriteBytes", 0) / 1e9
        agg["inputBytes_gb"] += s.get("inputBytes", 0) / 1e9
        agg["num_tasks"] += s.get("numCompleteTasks", 0)
    agg = {k: (round(v, 2) if isinstance(v, float) else v) for k, v in agg.items()}
    out = {
        "cores": cores,
        "wall_sec": round(wall, 2),
        "steady_superstep_sec": samples,
        "core_seconds_available_steady": round(sum(samples) * cores, 1),
        **agg,
        # occupancy: fraction of available core-time actually running tasks
        "occupancy": round(
            agg["executorRunTime_s"] / max(wall * cores, 1e-9), 3
        ),
        "cpu_over_run": round(
            agg["executorCpuTime_s"] / max(agg["executorRunTime_s"], 1e-9), 3
        ),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
