"""Two-parallelism scaling evidence (sandbox analog of N vs 4N executors).

The north rule requires superstep-throughput scaling efficiency >= 0.8
between cluster sizes N and 4N. No real cluster exists here, so per the
driver protocol we run the SAME job (fixed-superstep PageRank) on the
SAME materialized edge table at ``local[8]`` and ``local[32]`` and report
throughput at both plus efficiency = (T_8 / T_32) / 4.

Protocol (BASELINE.md §3): input generated once and written to parquet;
per level >= 2 runs, median reported; shuffle partitioning identical at
both levels (64 partitions) so the physical plan is the same and only
the core count varies — the local analog of the same partitioned job on
a 4x-larger cluster.

Usage: python tools/bench_scaling.py [n_pages] [supersteps]
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
from giraph_spark.corpus import build_edges, synth_corpus  # noqa: E402
from giraph_spark.session import get_spark  # noqa: E402

EDGES_PATH = "/tmp/giraph_scaling_edges.parquet"
SHUFFLE_PARTITIONS = 64
LEVELS = (8, 32)
RUNS = 2


def materialize(n_pages: int) -> tuple[int, float]:
    spark = get_spark(app_name="scaling-gen", cores=32,
                      shuffle_partitions=SHUFFLE_PARTITIONS)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    pages = synth_corpus(spark, n_pages=n_pages, seed=42)
    edges = build_edges(pages)
    edges.write.mode("overwrite").parquet(EDGES_PATH)
    n_edges = spark.read.parquet(EDGES_PATH).count()
    gen_secs = time.time() - t0
    spark.stop()
    return n_edges, gen_secs


def run_level(cores: int, supersteps: int) -> dict:
    spark = get_spark(app_name=f"scaling-{cores}", cores=cores,
                      shuffle_partitions=SHUFFLE_PARTITIONS)
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.read.parquet(EDGES_PATH)
    times = []
    for _ in range(RUNS):
        t0 = time.time()
        run = pagerank(spark, edges, damping=0.85, max_supersteps=supersteps,
                       tolerance=None, num_partitions=SHUFFLE_PARTITIONS)
        assert run.supersteps == supersteps
        times.append(time.time() - t0)
    spark.stop()
    return {"cores": cores, "runs_sec": [round(t, 2) for t in times],
            "median_sec": round(statistics.median(times), 2)}


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    supersteps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    n_edges, gen_secs = materialize(n_pages)
    results = [run_level(c, supersteps) for c in LEVELS]

    t_n, t_4n = results[0]["median_sec"], results[1]["median_sec"]
    eff = round(t_n / t_4n / (LEVELS[1] / LEVELS[0]), 3)
    out = {
        "n_pages": n_pages,
        "n_edges": n_edges,
        "supersteps": supersteps,
        "gen_sec": round(gen_secs, 1),
        "levels": results,
        "throughput_supersteps_per_hour": {
            str(r["cores"]): round(supersteps / r["median_sec"] * 3600, 1)
            for r in results
        },
        "throughput_edges_per_sec": {
            str(r["cores"]): round(supersteps * n_edges / r["median_sec"], 1)
            for r in results
        },
        "scaling_efficiency": eff,
    }
    print(json.dumps(out))

    os.makedirs("BENCH", exist_ok=True)
    lines = [
        "# BENCH/BASELINE.md — measured scaling evidence",
        "",
        "Protocol: same fixed-superstep PageRank job, same materialized",
        f"edge table ({n_pages:,} pages -> {n_edges:,} edges), identical",
        f"{SHUFFLE_PARTITIONS}-partition physical plan; only the core count",
        "varies (local[8] vs local[32] = the sandbox analog of N vs 4N",
        f"executors). {RUNS} runs per level, median reported.",
        "",
        "| cores | runs (s) | median (s) | supersteps/hour | edges/sec |",
        "|---|---|---|---|---|",
    ]
    for r in results:
        c = str(r["cores"])
        lines.append(
            f"| local[{c}] | {r['runs_sec']} | {r['median_sec']} | "
            f"{out['throughput_supersteps_per_hour'][c]} | "
            f"{out['throughput_edges_per_sec'][c]} |"
        )
    lines += [
        "",
        f"**Scaling efficiency (T_8 / T_32) / 4 = {eff}** "
        f"(target >= 0.8 per north rule).",
        "",
        f"Input generation (one-time, excluded from the measured job): "
        f"{gen_secs:.0f}s on local[32].",
    ]
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
