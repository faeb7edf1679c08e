"""Hub-skew salting evidence on the mega-hub link graph.

The north rule names "explicit salting for high-degree hub skew". This
tool runs the SAME fixed-superstep PageRank on the same materialized
mega-hub edge table (10 hubs receive ~1/8 of all edges) twice — gather
unsalted vs salted (two-level aggregation) — in separate JVMs, and
records:

- wall time + per-superstep times for both,
- the gather-stage straggler profile from the Spark REST API: max vs
  median task executorRunTime of the heaviest shuffle-read stage (the
  ``groupBy(dst)`` whose hot keys the salt splits),
- an order-independent exact result hash (bit_xor of per-row
  xxhash64(id, round(rank, 6))) proving the two runs are value-identical.

Appends a section to BENCH/BASELINE.md and prints one JSON line.
Usage: python tools/bench_salting.py [n_vertices] [supersteps] [salt]
(reuses /tmp/giraph_scaling_edges.parquet when GIRAPH_SCALING_REUSE=1).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from giraph_spark.algorithms.pagerank import pagerank  # noqa: E402
from giraph_spark.session import get_spark  # noqa: E402

EDGES_PATH = "/tmp/giraph_scaling_edges.parquet"
SHUFFLE_PARTITIONS = 64
DRIVER_MEM = "64g"
CORES = 32


def _rest(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read().decode())


def _heaviest_stage_summary(ui: str, app_id: str) -> dict:
    """Task-time distribution of the stage with the largest shuffle read
    (the gather); quantiles of executorRunTime in ms."""
    stages = _rest(f"{ui}/api/v1/applications/{app_id}/stages?status=COMPLETE")
    heaviest = max(stages, key=lambda s: s.get("shuffleReadBytes", 0))
    sid, att = heaviest["stageId"], heaviest["attemptId"]
    q = "0.0,0.5,0.95,1.0"
    summ = _rest(
        f"{ui}/api/v1/applications/{app_id}/stages/{sid}/{att}/taskSummary?quantiles={q}"
    )
    run_ms = summ["executorRunTime"]
    return {
        "stage_id": sid,
        "shuffle_read_mb": round(heaviest["shuffleReadBytes"] / 1e6, 1),
        "num_tasks": heaviest["numCompleteTasks"],
        "task_run_ms_min": run_ms[0],
        "task_run_ms_p50": run_ms[1],
        "task_run_ms_p95": run_ms[2],
        "task_run_ms_max": run_ms[3],
        "skew_max_over_p50": round(run_ms[3] / max(run_ms[1], 1.0), 2),
    }


def run_job(salt: int | None, supersteps: int) -> dict:
    spark = get_spark(
        app_name=f"salting-{salt}", cores=CORES,
        shuffle_partitions=SHUFFLE_PARTITIONS,
        extra_conf={
            "spark.driver.memory": DRIVER_MEM,
            "spark.ui.enabled": "true",  # REST API for task metrics
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.read.parquet(EDGES_PATH)
    t0 = time.time()
    run = pagerank(
        spark, edges, damping=0.85, max_supersteps=supersteps,
        tolerance=None, num_partitions=SHUFFLE_PARTITIONS, salt=salt,
    )
    row = run.vertices.agg(
        F.bit_xor(F.xxhash64(F.col("id"), F.round("rank", 6))).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    wall = time.time() - t0
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    gather = _heaviest_stage_summary(ui, app_id)
    out = {
        "salt": salt,
        "wall_sec": round(wall, 2),
        "superstep_sec": [round(h["seconds"], 2) for h in run.history],
        "result_hash": int(row["h"]),
        "n_vertices": int(row["n"]),
        "gather_stage": gather,
    }
    spark.stop()
    return out


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--job":
        salt = None if sys.argv[2] == "none" else int(sys.argv[2])
        print(json.dumps(run_job(salt, int(sys.argv[3]))))
        return

    n_vertices = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    supersteps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    salt = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    if not (os.environ.get("GIRAPH_SCALING_REUSE") == "1" and os.path.exists(EDGES_PATH)):
        from giraph_spark.datasets import synthetic_edges

        spark = get_spark(app_name="salting-gen", cores=CORES,
                          shuffle_partitions=SHUFFLE_PARTITIONS,
                          extra_conf={"spark.driver.memory": DRIVER_MEM})
        spark.sparkContext.setLogLevel("ERROR")
        synthetic_edges(spark, n_vertices, avg_degree=16, seed=42).write.mode(
            "overwrite"
        ).parquet(EDGES_PATH)
        spark.stop()

    def isolated(tag: str) -> dict:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--job", tag, str(supersteps)],
            capture_output=True, text=True, check=True,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])

    unsalted = isolated("none")
    salted = isolated(str(salt))
    identical = unsalted["result_hash"] == salted["result_hash"] and (
        unsalted["n_vertices"] == salted["n_vertices"]
    )
    out = {
        "n_vertices": n_vertices,
        "supersteps": supersteps,
        "salt": salt,
        "results_hash_identical": identical,
        "unsalted": unsalted,
        "salted": salted,
    }
    print(json.dumps(out))

    g_u, g_s = unsalted["gather_stage"], salted["gather_stage"]
    lines = [
        "",
        "## Hub-skew salting (tools/bench_salting.py)",
        "",
        f"Same mega-hub graph ({n_vertices:,} vertices, 10 hubs receive ~1/8",
        f"of all edges), same {supersteps}-superstep PageRank at local[{CORES}],",
        f"{SHUFFLE_PARTITIONS} partitions; gather unsalted vs two-level salt={salt}.",
        f"Results bit-identical at 6dp rounding: **{identical}**",
        f"(order-independent xor hash {unsalted['result_hash']}).",
        "",
        "| gather | wall (s) | supersteps (s) | heaviest-stage max task (ms) | p50 task (ms) | max/p50 skew |",
        "|---|---|---|---|---|---|",
        f"| unsalted | {unsalted['wall_sec']} | {unsalted['superstep_sec']} | "
        f"{g_u['task_run_ms_max']} | {g_u['task_run_ms_p50']} | {g_u['skew_max_over_p50']} |",
        f"| salt={salt} | {salted['wall_sec']} | {salted['superstep_sec']} | "
        f"{g_s['task_run_ms_max']} | {g_s['task_run_ms_p50']} | {g_s['skew_max_over_p50']} |",
        "",
    ]
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
