"""A/B the trussness wedge-probe orientation on a HUB-SKEWED graph.

SURVEY §7.3 rejected degree-oriented probing after measuring it on the
dense UNSKEWED demo graph (168 -> 186 s at sf0.1) while predicting an
inversion on power-law graphs; the r4 verdict asked for the skewed
measurement. This probe uses the mega-hub generator
(``datasets.synthetic_edges``: 10 hubs receive ~1/8 of all edges — the
north rule's skew class) so removed edges incident to a hub are the
common case, and A/Bs ``orient_frontier`` (static per-edge pivot on the
lower-degree endpoint, see ``kcore._trussness_peel``) against the
unoriented probe on identical inputs, interleaved reps.

Usage: python tools/probe_truss_orientation.py [n_vertices] [avg_degree] [reps]
Writes BENCH/runs/truss_orientation_probe_r5.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from giraph_spark.algorithms.kcore import trussness  # noqa: E402
from giraph_spark.datasets import synthetic_edges  # noqa: E402
from giraph_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_vertices = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    avg_degree = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    spark = get_spark(app_name="truss-orient-probe", cores=cpus,
                      shuffle_partitions=32,
                      extra_conf={"spark.driver.memory": "48g"})
    spark.sparkContext.setLogLevel("ERROR")
    edges = synthetic_edges(spark, n_vertices, avg_degree=avg_degree,
                            seed=42).persist()
    n_edges = edges.count()
    from pyspark.sql import functions as F

    hub_in = (
        edges.groupBy("dst").count().orderBy(F.desc("count")).limit(3).collect()
    )

    # warm-up (JIT + python path) on a slice, not timed
    trussness(spark, edges.limit(50_000), num_partitions=32).count()

    runs: dict[str, list[float]] = {"unoriented": [], "oriented": []}
    checksums = set()
    for rep in range(reps):
        for label, flag in (("unoriented", False), ("oriented", True)):
            t0 = time.time()
            out = trussness(spark, edges, num_partitions=32,
                            orient_frontier=flag)
            row = out.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("trussness") * (F.col("u") + F.lit(7) * F.col("v"))).alias("chk"),
            ).collect()[0]
            secs = time.time() - t0
            runs[label].append(round(secs, 2))
            checksums.add((int(row["n"]), int(row["chk"])))
            print(json.dumps({"rep": rep, "variant": label,
                              "secs": round(secs, 2), "edges_out": int(row["n"])}),
                  flush=True)
    assert len(checksums) == 1, f"variants disagree: {checksums}"

    med_u = statistics.median(runs["unoriented"])
    med_o = statistics.median(runs["oriented"])
    out = {
        "n_vertices": n_vertices,
        "avg_degree": avg_degree,
        "n_edges": n_edges,
        "top_in_degrees": [int(r["count"]) for r in hub_in],
        "reps": reps,
        "unoriented_secs": runs["unoriented"],
        "oriented_secs": runs["oriented"],
        "median_unoriented": med_u,
        "median_oriented": med_o,
        "oriented_speedup": round(med_u / med_o, 3),
        "winner": "oriented" if med_o < med_u else "unoriented",
        "result_checksum_identical": True,
    }
    print(json.dumps(out, indent=1))
    os.makedirs("BENCH/runs", exist_ok=True)
    with open("BENCH/runs/truss_orientation_probe_r5.json", "w",
              encoding="utf-8") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
