"""Multi-executor scaling evidence on a LOCAL STANDALONE CLUSTER.

The north rule's criterion is throughput scaling efficiency >= 0.8
between cluster sizes N and 4N *executors*. ``bench_scaling.py`` models
this with local[N] vs local[4N] — one JVM whose shared heap makes the
4N level burn ~1.26x the CPU-seconds of N for identical work (measured;
see BENCH/BASELINE.md), an artifact a real cluster does not have
because it scales *JVMs*, keeping per-JVM thread count constant.

This harness removes that artifact while staying inside the sandbox: a
real Spark STANDALONE cluster on localhost —

    master (JVM)  +  W workers (one JVM each, --cores 2, pinned via
    taskset to its own CPU pair; the executor it forks inherits the
    affinity mask)  +  a driver JVM per run (pinned to reserved cores)

N = 1 worker (2 cores), 4N = 4 workers (8 cores across 4 isolated
heaps). Same materialized 126M-edge table, same 64-partition plan,
same fixed-superstep PageRank, steady-state medians with JIT warm-up
excluded, median across repeats, fresh worker+driver JVMs per repeat —
the bench_scaling.py protocol with executors instead of threads.
Inter-executor shuffle crosses real Netty sockets, so the 4N level
also pays genuine message transport, as a cluster would.

Usage:
    python tools/bench_cluster_scaling.py [n_vertices] [measured] [workers_levels] [repeats]
    (defaults: 8_000_000, 5, "1,4", 3; GIRAPH_SCALING_REUSE=1 reuses the
    materialized table; requires no other Spark jobs on the box)
Internal: --driver <workers> <measured> runs one measured job against
the already-started cluster and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EDGES_PATH = "/tmp/giraph_scaling_edges.parquet"
SHUFFLE_PARTITIONS = 64
# JIT warm-up is per-EXECUTOR: with W workers each executor sees 1/W of
# the partition invocations per superstep, so C2 compilation takes ~W x
# more supersteps than single-JVM local mode — warm-up must cover the
# LARGEST level (8 supersteps for 4 workers; local-mode harness uses 4)
WARMUP = int(os.environ.get("GIRAPH_CLUSTER_WARMUP", "8"))
MASTER_URL = "spark://127.0.0.1:7077"
SPARK_HOME = os.path.join(
    os.path.dirname(os.path.abspath(__import__("pyspark").__file__))
)
LOG_DIR = "/tmp/spark-cluster/logs"
CORES_PER_WORKER = 2
EXECUTOR_MEM = "20g"  # constant per-JVM shape at every level (real nodes)
DRIVER_CORES = "24-31"  # reserved so the driver never steals worker CPUs


def _spark_class(*args: str) -> list[str]:
    return [os.path.join(SPARK_HOME, "bin", "spark-class"), *args]


def start_master() -> subprocess.Popen | None:
    # reuse a live master (idempotent across invocations)
    probe = subprocess.run(
        ["bash", "-c", "exec 3<>/dev/tcp/127.0.0.1/7077"], capture_output=True
    )
    if probe.returncode == 0:
        return None
    os.makedirs(LOG_DIR, exist_ok=True)
    p = subprocess.Popen(
        _spark_class(
            "org.apache.spark.deploy.master.Master",
            "--host", "127.0.0.1", "--port", "7077", "--webui-port", "8089",
        ),
        stdout=open(f"{LOG_DIR}/master.log", "w"),
        stderr=subprocess.STDOUT,
    )
    time.sleep(10)
    return p


def start_workers(n: int) -> list[subprocess.Popen]:
    os.makedirs(LOG_DIR, exist_ok=True)
    procs = []
    for i in range(n):
        cpus = f"{CORES_PER_WORKER * i}-{CORES_PER_WORKER * (i + 1) - 1}"
        cmd = ["taskset", "-c", cpus] + _spark_class(
            "org.apache.spark.deploy.worker.Worker", MASTER_URL,
            "--cores", str(CORES_PER_WORKER), "--memory", EXECUTOR_MEM,
            "--host", "127.0.0.1", "--webui-port", str(8100 + i),
            "--work-dir", f"/tmp/spark-cluster/work{i}",
        )
        procs.append(
            subprocess.Popen(
                cmd,
                stdout=open(f"{LOG_DIR}/worker{i}.log", "w"),
                stderr=subprocess.STDOUT,
            )
        )
    time.sleep(12)  # registration
    return procs


def stop(procs: list[subprocess.Popen]) -> None:
    for p in procs:
        p.terminate()
    for p in procs:
        try:
            p.wait(timeout=20)
        except subprocess.TimeoutExpired:
            p.kill()
    time.sleep(3)


def run_driver(workers: int, measured: int) -> dict:
    """One measured job in a fresh pinned driver JVM (subprocess)."""
    cmd = ["taskset", "-c", DRIVER_CORES, sys.executable,
           os.path.abspath(__file__), "--driver", str(workers), str(measured)]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def driver_main(workers: int, measured: int) -> None:
    from pyspark.sql import SparkSession

    from giraph_spark.algorithms.pagerank import pagerank

    spark = (
        SparkSession.builder.master(MASTER_URL)
        .appName(f"cluster-scaling-{workers}w")
        .config("spark.executor.cores", str(CORES_PER_WORKER))
        .config("spark.executor.memory", EXECUTOR_MEM)
        .config("spark.cores.max", str(CORES_PER_WORKER * workers))
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", str(SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.read.parquet(EDGES_PATH)
    t0 = time.time()
    run = pagerank(spark, edges, damping=0.85,
                   max_supersteps=WARMUP + measured, tolerance=None,
                   num_partitions=SHUFFLE_PARTITIONS)
    total = time.time() - t0
    assert run.supersteps == WARMUP + measured
    samples = [h["seconds"] for h in run.history[WARMUP:]]
    n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1
    spark.stop()
    print(json.dumps({
        "workers": workers,
        "executors_seen": n_exec,
        "superstep_samples_sec": [round(t, 2) for t in samples],
        "superstep_median_sec": round(statistics.median(samples), 2),
        "total_sec": round(total, 2),
    }))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--driver":
        driver_main(int(sys.argv[2]), int(sys.argv[3]))
        return
    n_vertices = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    measured = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    levels = tuple(
        int(x) for x in (sys.argv[3] if len(sys.argv) > 3 else "1,4").split(",")
    )
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    if not (os.environ.get("GIRAPH_SCALING_REUSE") == "1"
            and os.path.exists(EDGES_PATH)):
        from giraph_spark.datasets import synthetic_edges
        from giraph_spark.session import get_spark

        spark = get_spark(app_name="scaling-gen", cores=32,
                          shuffle_partitions=SHUFFLE_PARTITIONS,
                          extra_conf={"spark.driver.memory": "64g"})
        spark.sparkContext.setLogLevel("ERROR")
        synthetic_edges(spark, n_vertices, avg_degree=16, seed=42).write.mode(
            "overwrite"
        ).parquet(EDGES_PATH)
        spark.stop()

    start_master()
    results: dict[int, list[dict]] = {lvl: [] for lvl in levels}
    # interleave levels across repeats (fresh worker JVMs per repeat) so a
    # slow drift in box state hits both levels equally
    for r in range(repeats):
        for lvl in levels:
            workers = start_workers(lvl)
            try:
                res = run_driver(lvl, measured)
            finally:
                stop(workers)
            res["repeat"] = r
            results[lvl].append(res)
            print(f"[repeat {r}] workers={lvl}: {res}", file=sys.stderr)

    summary = {}
    for lvl in levels:
        meds = [x["superstep_median_sec"] for x in results[lvl]]
        summary[lvl] = {
            "workers": lvl,
            "cores": lvl * CORES_PER_WORKER,
            "per_repeat_medians_sec": meds,
            "median_superstep_sec": round(statistics.median(meds), 2),
            "totals_sec": [x["total_sec"] for x in results[lvl]],
        }
    pairs = {}
    lv = sorted(levels)
    for a in lv:
        if a * 4 in results:
            ta = summary[a]["median_superstep_sec"]
            tb = summary[a * 4]["median_superstep_sec"]
            pairs[f"{a}w->{a * 4}w"] = round(ta / tb / 4.0, 3)
    print(json.dumps({"levels": summary, "efficiency": pairs}))


if __name__ == "__main__":
    main()
