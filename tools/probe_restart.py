"""Induced-failure restart parity with the reference's auto-checkpoint
test (``giraph-examples/src/test/.../TestAutoCheckpoint.java`` +
``TestCheckpointing.java:99-147``): kill a live executor JVM on a real
localhost STANDALONE cluster mid-PageRank between reliable snapshots,
auto-restart from the newest snapshot with ``resume=True``, and assert
the final ranks match an uninterrupted run.

Why this matters at 100 TB: between reliable snapshots the superstep
state lives in executor-local ``localCheckpoint`` blocks, which are NOT
fault-tolerant by design — losing an executor aborts the in-flight job
(``pregel.run_supersteps`` docstring documents the contract). The
recovery story the engine claims is checkpoint-restart: catch the
failure, re-enter the loop with ``resume=True``, and continue from the
newest ``checkpoint_dir`` snapshot on the surviving executors. This
probe exercises exactly that path with a REAL SIGKILL of a
``CoarseGrainedExecutorBackend`` process, not a simulation.

Protocol (reuses the bench_cluster_scaling standalone-cluster infra):
  1. reference ranks: uninterrupted fixed-superstep PageRank, local mode
  2. start master + 2 workers (2 cores each); driver subprocess runs the
     same PageRank with checkpoint_interval=4, wrapped in the
     catch-and-resume loop below
  3. the harness watches the checkpoint dir; once snapshot superstep=4
     is committed and the run has moved past it, SIGKILL one executor
  4. the driver's in-flight job fails (lost localCheckpoint blocks), the
     wrapper re-invokes pagerank with resume=True, the run completes
  5. compare final ranks to the reference: max |delta| must be < 1e-9
     (three orders below the north rule's 1e-6)

Usage: python tools/probe_restart.py [n_vertices] [supersteps]
Writes BENCH/runs/restart_probe_r5.json. Internal: --driver runs phase 2
inside the cluster.
"""

from __future__ import annotations

import glob
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_cluster_scaling import (  # noqa: E402
    MASTER_URL,
    start_master,
    start_workers,
    stop,
)

EDGES_PATH = "/tmp/giraph_restart_edges.parquet"
REF_PATH = "/tmp/giraph_restart_ref.parquet"
GOT_PATH = "/tmp/giraph_restart_got.parquet"
CK_DIR = "/tmp/giraph_restart_ck"
STATUS_PATH = "/tmp/giraph_restart_status.json"
NP = 16
INTERVAL = 4


def driver_main(supersteps: int) -> None:
    """Cluster driver: PageRank with reliable snapshots and the
    catch-and-resume wrapper — the engine-level analog of Giraph's
    automatic application restart after a worker loss."""
    from pyspark.sql import SparkSession

    from giraph_spark.algorithms.pagerank import pagerank

    spark = (
        SparkSession.builder.master(MASTER_URL)
        .appName("restart-probe")
        .config("spark.executor.cores", "2")
        .config("spark.executor.memory", "8g")
        .config("spark.cores.max", "4")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", str(NP))
        .config("spark.ui.enabled", "false")
        # surface the executor loss as a JOB failure immediately instead
        # of retrying the unrecoverable stage (checkpoint blocks are gone)
        .config("spark.task.maxFailures", "2")
        .config("spark.stage.maxConsecutiveAttempts", "2")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.read.parquet(EDGES_PATH)
    status: dict = {"attempts": 0, "failed_once": False}
    run = None
    for attempt in range(3):
        status["attempts"] = attempt + 1
        try:
            run = pagerank(
                spark,
                edges,
                damping=0.85,
                max_supersteps=supersteps,
                tolerance=None,
                num_partitions=NP,
                checkpoint_dir=CK_DIR,
                checkpoint_interval=INTERVAL,
                resume=attempt > 0,
            )
            break
        except Exception as exc:  # noqa: BLE001 — any executor-loss shape
            status["failed_once"] = True
            status[f"failure_{attempt}"] = repr(exc)[:400]
            # give the standalone master a moment to relaunch the executor
            time.sleep(8)
    if run is None:
        status["completed"] = False
    else:
        status["completed"] = True
        status["supersteps_total"] = run.supersteps
        run.vertices.write.mode("overwrite").parquet(GOT_PATH)
    with open(STATUS_PATH, "w", encoding="utf-8") as f:
        json.dump(status, f)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--driver":
        driver_main(int(sys.argv[2]))
        return
    n_vertices = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    supersteps = int(sys.argv[2]) if len(sys.argv) > 2 else 14

    import shutil

    for p in (CK_DIR,):
        shutil.rmtree(p, ignore_errors=True)
    for p in (STATUS_PATH,):
        if os.path.exists(p):
            os.remove(p)

    # phase 1: data + uninterrupted reference (local mode)
    from giraph_spark.algorithms.pagerank import pagerank
    from giraph_spark.datasets import synthetic_edges
    from giraph_spark.session import get_spark

    spark = get_spark(app_name="restart-ref", cores=8, shuffle_partitions=NP)
    spark.sparkContext.setLogLevel("ERROR")
    synthetic_edges(spark, n_vertices, avg_degree=8, seed=42).write.mode(
        "overwrite"
    ).parquet(EDGES_PATH)
    edges = spark.read.parquet(EDGES_PATH)
    ref = pagerank(
        spark, edges, damping=0.85, max_supersteps=supersteps,
        tolerance=None, num_partitions=NP,
    )
    ref.vertices.write.mode("overwrite").parquet(REF_PATH)
    spark.stop()

    # phase 2: cluster run with an induced executor kill
    start_master()
    workers = start_workers(2)
    killed: dict = {}
    try:
        drv = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--driver", str(supersteps)],
            stdout=open("/tmp/giraph_restart_driver.log", "w"),
            stderr=subprocess.STDOUT,
        )
        # wait for the first reliable snapshot to commit, then kill one
        # executor while later supersteps are in flight
        snap = os.path.join(CK_DIR, f"superstep={INTERVAL:05d}", "data.parquet", "_SUCCESS")
        t0 = time.time()
        while not os.path.exists(snap):
            if drv.poll() is not None:
                raise RuntimeError("driver exited before the first snapshot")
            if time.time() - t0 > 600:
                raise RuntimeError("timed out waiting for the first snapshot")
            time.sleep(0.5)
        time.sleep(2)  # let the run move past the snapshot
        pids = subprocess.run(
            ["pgrep", "-f", "CoarseGrainedExecutorBackend"],
            capture_output=True, text=True,
        ).stdout.split()
        if not pids:
            raise RuntimeError("no executor process found to kill")
        victim = int(pids[0])
        os.kill(victim, signal.SIGKILL)
        killed = {"victim_pid": victim, "killed_at_wall": round(time.time() - t0, 1),
                  "n_executors_before": len(pids)}
        drv.wait(timeout=900)
    finally:
        stop(workers)

    with open(STATUS_PATH, encoding="utf-8") as f:
        status = json.load(f)

    # phase 3: compare (local mode)
    spark = get_spark(app_name="restart-cmp", cores=8, shuffle_partitions=NP)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    ref_df = spark.read.parquet(REF_PATH).withColumnRenamed("rank", "r_ref")
    got_df = spark.read.parquet(GOT_PATH).withColumnRenamed("rank", "r_got")
    j = ref_df.join(got_df, "id", "full")
    row = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("r_ref").isNull() | F.col("r_got").isNull(), 1).otherwise(0)).alias("missing"),
        F.max(F.abs(F.col("r_ref") - F.col("r_got"))).alias("max_abs_diff"),
    ).collect()[0]
    snaps = sorted(
        os.path.basename(d) for d in glob.glob(os.path.join(CK_DIR, "superstep=*"))
    )
    spark.stop()

    out = {
        "n_vertices": n_vertices,
        "supersteps": supersteps,
        "checkpoint_interval": INTERVAL,
        "kill": killed,
        "driver_status": status,
        "snapshots": snaps,
        "vertices_compared": int(row["n"]),
        "missing_rows": int(row["missing"]),
        "max_abs_diff_vs_uninterrupted": float(row["max_abs_diff"]),
        "pass": bool(
            status.get("completed")
            and status.get("failed_once")
            and status.get("attempts", 0) >= 2
            and int(row["missing"]) == 0
            and float(row["max_abs_diff"]) < 1e-9
        ),
    }
    print(json.dumps(out, indent=1))
    os.makedirs("BENCH/runs", exist_ok=True)
    with open("BENCH/runs/restart_probe_r5.json", "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
