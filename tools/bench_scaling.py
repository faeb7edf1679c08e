"""Two-parallelism scaling evidence (sandbox analog of N vs 4N executors).

The north rule requires superstep-throughput scaling efficiency >= 0.8
between cluster sizes N and 4N. No real cluster exists here, so per the
driver protocol we run the SAME job (fixed-superstep PageRank) on the
SAME materialized edge table at ``local[8]`` and ``local[32]`` and report
throughput at both plus efficiency = (T_8 / T_32) / 4.

Protocol (BASELINE.md §3):
- input generated once (deterministic synthetic link graph with mega-hub
  skew, ``datasets.synthetic_edges``) and written to parquet;
- identical 64-partition physical plan at both levels — only the core
  count varies (the local analog of the same partitioned job on a
  4x-larger cluster);
- **steady-state** superstep throughput: the first 2 supersteps are JIT/
  codegen warm-up (C2 compilation of the generated superstep pipeline)
  and are excluded, exactly as a long-running production job amortizes
  them; total wall including warm-up is also reported;
- >= 2 runs per level, median reported.

Usage: python tools/bench_scaling.py [n_vertices] [measured_supersteps]
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from giraph_spark.algorithms.pagerank import pagerank  # noqa: E402
from giraph_spark.datasets import synthetic_edges  # noqa: E402
from giraph_spark.session import get_spark  # noqa: E402

EDGES_PATH = "/tmp/giraph_scaling_edges.parquet"
SHUFFLE_PARTITIONS = 64
LEVELS = (8, 32)
RUNS = 2
WARMUP = 2


def materialize(n_vertices: int) -> tuple[int, float]:
    spark = get_spark(app_name="scaling-gen", cores=32,
                      shuffle_partitions=SHUFFLE_PARTITIONS)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    edges = synthetic_edges(spark, n_vertices, avg_degree=16, seed=42)
    edges.write.mode("overwrite").parquet(EDGES_PATH)
    n_edges = spark.read.parquet(EDGES_PATH).count()
    gen_secs = time.time() - t0
    spark.stop()
    return n_edges, gen_secs


def run_level(cores: int, measured: int) -> dict:
    spark = get_spark(app_name=f"scaling-{cores}", cores=cores,
                      shuffle_partitions=SHUFFLE_PARTITIONS)
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.read.parquet(EDGES_PATH)
    steady, totals = [], []
    for _ in range(RUNS):
        t0 = time.time()
        run = pagerank(spark, edges, damping=0.85,
                       max_supersteps=WARMUP + measured, tolerance=None,
                       num_partitions=SHUFFLE_PARTITIONS)
        totals.append(time.time() - t0)
        assert run.supersteps == WARMUP + measured
        steady.append(sum(h["seconds"] for h in run.history[WARMUP:]))
    spark.stop()
    return {
        "cores": cores,
        "steady_runs_sec": [round(t, 2) for t in steady],
        "steady_median_sec": round(statistics.median(steady), 2),
        "total_runs_sec": [round(t, 2) for t in totals],
    }


def main() -> None:
    n_vertices = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    measured = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    n_edges, gen_secs = materialize(n_vertices)
    results = [run_level(c, measured) for c in LEVELS]

    t_n = results[0]["steady_median_sec"]
    t_4n = results[1]["steady_median_sec"]
    eff = round(t_n / t_4n / (LEVELS[1] / LEVELS[0]), 3)
    out = {
        "n_vertices": n_vertices,
        "n_edges": n_edges,
        "measured_supersteps": measured,
        "warmup_supersteps": WARMUP,
        "gen_sec": round(gen_secs, 1),
        "levels": results,
        "throughput_supersteps_per_hour": {
            str(r["cores"]): round(measured / r["steady_median_sec"] * 3600, 1)
            for r in results
        },
        "throughput_edges_per_sec": {
            str(r["cores"]): round(measured * n_edges / r["steady_median_sec"], 1)
            for r in results
        },
        "scaling_efficiency": eff,
    }
    print(json.dumps(out))

    os.makedirs("BENCH", exist_ok=True)
    su = out["throughput_supersteps_per_hour"]
    ed = out["throughput_edges_per_sec"]
    lines = [
        "# BENCH/BASELINE.md — measured scaling evidence",
        "",
        "Protocol: same fixed-superstep PageRank job, same materialized",
        f"edge table ({n_vertices:,} vertices, {n_edges:,} edges, mega-hub",
        f"skew), identical {SHUFFLE_PARTITIONS}-partition physical plan; only",
        "the core count varies (local[8] vs local[32] = the sandbox analog",
        f"of N vs 4N executors). {RUNS} runs per level, median of",
        f"steady-state superstep time (first {WARMUP} supersteps = JIT",
        "warm-up, excluded; totals including warm-up shown for reference).",
        "",
        "| cores | steady runs (s) | median (s) | total runs (s) | supersteps/hour | edges/sec |",
        "|---|---|---|---|---|---|",
    ]
    for r in results:
        c = str(r["cores"])
        lines.append(
            f"| local[{c}] | {r['steady_runs_sec']} | {r['steady_median_sec']} | "
            f"{r['total_runs_sec']} | {su[c]} | {ed[c]} |"
        )
    lines += [
        "",
        f"**Scaling efficiency (T_8 / T_32) / 4 = {eff}** "
        f"(target >= 0.8 per north rule).",
        "",
        f"Input generation (one-time, excluded): {gen_secs:.0f}s on local[32].",
    ]
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
