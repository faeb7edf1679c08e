"""10x-scale stress probe: ~1B-edge graph, working set > heap, spill-not-OOM.

The missing evidence class the round-2 verdict named: behavior when the
working set exceeds executor memory — Giraph's out-of-core analog
(``giraph-core/.../ooc/OutOfCoreEngine.java:54``: partitions/messages
spill to disk under pressure). Spark's equivalent is UnsafeExternalSorter
/ ShuffleExternalSorter spill inside aggregation and sort, plus
MEMORY_AND_DISK persistence; this probe makes that path *happen* and
records the per-stage metrics that prove the job degraded to disk
instead of dying.

Protocol (one JVM, local[32], heap deliberately capped by
``STRESS_DRIVER_MEM``, default 40g, ~0.5x the probe's working set):

1. generate ~1B deterministic edges (64M vertices, avg degree 16, 10
   mega-hubs receiving ~1/8 of all edges — the north rule's skew class)
   and persist them as the bucketed-by-src CSR-like table the engine's
   ``pre_partitioned`` path reads (storage.write_bucketed_edges)
2. run 3 supersteps of bucketed PageRank (exchange-free edge side)
3. run one SALTED grouped top-k gather over the same edges (the
   non-algebraic hub gather — per-reducer fan-in bounded by the
   two-level merge even at a 100M-message hub)
4. scrape per-stage memoryBytesSpilled / diskBytesSpilled /
   peakExecutionMemory / shuffle sizes from the Spark REST API

Output: one JSON line + BENCH/runs/stress_1b.json. "Pass" = all phases
complete, zero OOM, spill recorded (at this heap cap a spill-free run
would mean the probe didn't actually exceed memory — the JSON records
either way).

Usage: python tools/bench_stress_1b.py [n_vertices] (default 64_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from giraph_spark.algorithms.pagerank import pagerank  # noqa: E402
from giraph_spark.pregel import gather_topk_messages  # noqa: E402
from giraph_spark.session import get_spark  # noqa: E402
from giraph_spark.storage import read_bucketed_edges, write_bucketed_edges  # noqa: E402

BUCKETS = 128
TABLE = "stress_edges_1b"
WAREHOUSE = "/tmp/giraph_stress_warehouse"
DRIVER_MEM = os.environ.get("STRESS_DRIVER_MEM", "40g")
TOPK = 8
SALT = 8


def _rest(url: str):
    with urllib.request.urlopen(url, timeout=60) as r:
        return json.loads(r.read().decode())


def _stage_metrics(spark) -> list[dict]:
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    stages = _rest(f"{ui}/api/v1/applications/{app_id}/stages?status=COMPLETE")
    out = []
    for s in stages:
        out.append(
            {
                "stage": s.get("stageId"),
                "name": (s.get("name") or "")[:60],
                "tasks": s.get("numTasks"),
                "run_s": round(s.get("executorRunTime", 0) / 1e3, 1),
                "gc_s": round(s.get("jvmGcTime", 0) / 1e3, 1),
                "mem_spill_gb": round(s.get("memoryBytesSpilled", 0) / 2**30, 2),
                "disk_spill_gb": round(s.get("diskBytesSpilled", 0) / 2**30, 2),
                "peak_exec_mem_gb": round(s.get("peakExecutionMemory", 0) / 2**30, 2),
                "shuffle_write_gb": round(s.get("shuffleWriteBytes", 0) / 2**30, 2),
                "shuffle_read_gb": round(s.get("shuffleReadBytes", 0) / 2**30, 2),
            }
        )
    return out


def main() -> None:
    n_vertices = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000_000
    spark = get_spark(
        app_name="stress-1b",
        cores=32,
        shuffle_partitions=BUCKETS,
        extra_conf={
            "spark.driver.memory": DRIVER_MEM,
            "spark.ui.enabled": "true",
            "spark.sql.warehouse.dir": WAREHOUSE,
            # fewer, bigger in-flight blocks: the probe is ABOUT spill
            "spark.sql.autoBroadcastJoinThreshold": str(32 << 20),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {"metric": "stress_1b", "driver_mem": DRIVER_MEM,
                    "n_vertices_target": n_vertices}

    # --- phase 1: generate + persist the bucketed CSR-like table ----------
    # inline generator (vs datasets.synthetic_edges): skips dropDuplicates
    # — at 10^9 edges the dedup shuffle doubles the load cost and a
    # pseudo-random multigraph duplicate rate (~1e-2) changes nothing the
    # probe measures; production loads dedup once at ingest (build_edges)
    t0 = time.time()
    base = spark.range(0, n_vertices, numPartitions=256).select(
        F.col("id").alias("src")
    )
    deg = F.pmod(F.xxhash64(F.col("src"), F.lit(42), F.lit("deg")), F.lit(31)) + 1
    exploded = base.select(
        "src", F.posexplode(F.sequence(F.lit(1), deg)).alias("k", "_")
    ).drop("_")
    h = F.xxhash64(F.col("src"), F.col("k"), F.lit(42))
    is_hub = F.pmod(h, F.lit(8)) == 0
    dst = F.when(is_hub, F.pmod(F.shiftrightunsigned(h, 8), F.lit(10))).otherwise(
        F.pmod(F.shiftrightunsigned(h, 8), F.lit(n_vertices))
    )
    edges_gen = exploded.select("src", dst.cast("long").alias("dst")).where(
        F.col("src") != F.col("dst")
    )
    write_bucketed_edges(edges_gen, TABLE, buckets=BUCKETS, location=WAREHOUSE)
    edges = read_bucketed_edges(spark, TABLE)
    n_edges = edges.count()
    report["phase1_load"] = {
        "n_edges": n_edges,
        "secs": round(time.time() - t0, 1),
        "buckets": BUCKETS,
    }
    print(f"[stress] loaded {n_edges:,} edges in {report['phase1_load']['secs']}s",
          file=sys.stderr)

    # --- phase 2: 3 supersteps of bucketed PageRank ------------------------
    t0 = time.time()
    run = pagerank(
        spark, edges, damping=0.85, max_supersteps=3, tolerance=None,
        num_partitions=BUCKETS, pre_partitioned=True,
    )
    pr_secs = time.time() - t0
    report["phase2_pagerank"] = {
        "supersteps": run.supersteps,
        "secs": round(pr_secs, 1),
        "superstep_secs": [round(h_["seconds"], 1) for h_ in run.history],
        "edges_per_sec": round(run.supersteps * n_edges / pr_secs),
        "all_sum_final": run.last_stats.get("all_sum"),
    }
    print(f"[stress] pagerank 3 supersteps in {pr_secs:.0f}s", file=sys.stderr)

    # --- phase 3: salted grouped top-k on the mega-hub gather --------------
    t0 = time.time()
    msgs = edges.select(
        "dst", F.pmod(F.xxhash64("src", "dst"), F.lit(1_000_000)).alias("msg")
    )
    topk = gather_topk_messages(msgs, k=TOPK, key="dst", salt=SALT)
    n_topk = topk.count()
    report["phase3_salted_topk"] = {
        "rows": n_topk,
        "k": TOPK,
        "salt": SALT,
        "secs": round(time.time() - t0, 1),
    }
    print(f"[stress] salted topk {n_topk:,} rows in "
          f"{report['phase3_salted_topk']['secs']}s", file=sys.stderr)

    # --- metrics ------------------------------------------------------------
    stages = _stage_metrics(spark)
    spilled = [s for s in stages if s["disk_spill_gb"] > 0 or s["mem_spill_gb"] > 0]
    report["total_disk_spill_gb"] = round(sum(s["disk_spill_gb"] for s in stages), 2)
    report["total_mem_spill_gb"] = round(sum(s["mem_spill_gb"] for s in stages), 2)
    report["peak_exec_mem_gb"] = max((s["peak_exec_mem_gb"] for s in stages), default=0)
    report["n_stages"] = len(stages)
    report["n_spilled_stages"] = len(spilled)
    report["top_stages_by_spill"] = sorted(
        stages, key=lambda s: -(s["disk_spill_gb"] + s["mem_spill_gb"])
    )[:8]
    report["oom"] = False  # reaching this line means no executor/driver OOM
    spark.stop()

    os.makedirs("BENCH/runs", exist_ok=True)
    with open("BENCH/runs/stress_1b.json", "w", encoding="utf-8") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "top_stages_by_spill"}))


if __name__ == "__main__":
    main()
