"""Decompose per-superstep wall time: executor stage time vs driver gaps.

Runs the scaling-protocol PageRank at one level and, per superstep,
reports the union-of-stage-intervals (time tasks were actually running)
vs the superstep wall — the difference is serial driver work (Catalyst
analysis, codegen, py4j, job scheduling), the constant that caps scaling
efficiency at small per-core workloads.

Usage: python tools/diag_superstep.py [cores] [measured]
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
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    measured = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(
        app_name=f"diag-superstep-{cores}",
        cores=cores,
        shuffle_partitions=SHUFFLE_PARTITIONS,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "64g"),
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.read.parquet(EDGES_PATH)

    bounds: list[tuple[float, float]] = []  # (t_start, t_end) per superstep

    real_time = time.time

    t0 = real_time()
    run = pagerank(
        spark, edges, damping=0.85, max_supersteps=WARMUP + measured,
        tolerance=None, num_partitions=SHUFFLE_PARTITIONS,
        verbose=False,
    )
    wall = real_time() - t0

    # reconstruct superstep boundaries from history seconds (contiguous)
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    stages = _rest(f"{ui}/api/v1/applications/{app_id}/stages?status=COMPLETE")

    # per-stage (submission, completion) in epoch ms
    def ts(s, k):
        # format: 2026-08-17T12:00:00.000GMT
        import datetime as dt

        v = s.get(k)
        if not v:
            return None
        v = v.replace("GMT", "+0000")
        return dt.datetime.strptime(v, "%Y-%m-%dT%H:%M:%S.%f%z").timestamp()

    ivals = []
    for s in stages:
        a, b = ts(s, "firstTaskLaunchedTime"), ts(s, "completionTime")
        if a and b and b > a:
            ivals.append((a, b, s.get("stageId"), s.get("numTasks"),
                          round(s.get("executorRunTime", 0) / 1e3, 1),
                          round(s.get("jvmGcTime", 0) / 1e3, 1)))
    ivals.sort()

    def busy_between(lo: float, hi: float) -> float:
        """Union length of stage intervals clipped to [lo, hi]."""
        segs = [(max(a, lo), min(b, hi)) for a, b, *_ in ivals if b > lo and a < hi]
        segs.sort()
        total, cur_a, cur_b = 0.0, None, None
        for a, b in segs:
            if cur_b is None or a > cur_b:
                if cur_b is not None:
                    total += cur_b - cur_a
                cur_a, cur_b = a, b
            else:
                cur_b = max(cur_b, b)
        if cur_b is not None:
            total += cur_b - cur_a
        return total

    # superstep wall boundaries: walk history relative to job end
    # history seconds exclude the lineage cut; recover real bounds from
    # wall-clock stamps the engine stores
    hist = run.history
    out_rows = []
    # approximate: superstep i spans [end_{i-1}, end_i] using cumulative
    # seconds from t0 (+ cut time unaccounted -> shows up as driver gap)
    cum = t0
    for h in hist:
        s0, s1 = cum, cum + h["seconds"]
        cum = s1
        busy = busy_between(s0, s1)
        in_step = [
            {"stage": sid, "tasks": nt, "wall_s": round(b - a, 1),
             "runtime_s": rt, "gc_s": gc}
            for a, b, sid, nt, rt, gc in ivals if a >= s0 and a < s1
        ]
        out_rows.append({
            "superstep": h["superstep"],
            "wall_s": round(h["seconds"], 2),
            "stage_busy_s": round(busy, 2),
            "driver_gap_s": round(h["seconds"] - busy, 2),
            "stages": in_step,
        })
    print(json.dumps({
        "cores": cores, "total_wall_s": round(wall, 1),
        "sum_superstep_s": round(sum(h["seconds"] for h in hist), 1),
        "unaccounted_s": round(wall - sum(h["seconds"] for h in hist), 1),
        "supersteps": out_rows,
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
