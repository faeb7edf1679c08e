"""Break one PageRank run into Spark jobs: count + duration by job group.

Runs bench-shaped PageRank once with the UI enabled, then dumps every
job's duration and stage breakdown from the REST API.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from giraph_spark.algorithms.pagerank import pagerank  # noqa: E402
from giraph_spark.corpus import build_edges, synth_corpus  # noqa: E402
from giraph_spark.session import get_spark, suggest_num_partitions  # noqa: E402


def _rest(url):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read().decode())


def main() -> None:
    spark = get_spark(app_name="diag-pr-jobs", cores=32, shuffle_partitions=32,
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    pages = synth_corpus(spark, n_pages=100_000, seed=42)
    edges = build_edges(pages).persist()
    n_edges = edges.count()
    nparts = suggest_num_partitions(n_edges, 32)
    spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
    pagerank(spark, edges.limit(20_000), max_supersteps=6, tolerance=None,
             num_partitions=nparts)
    ui = spark.sparkContext.uiWebUrl
    app = _rest(f"{ui}/api/v1/applications")[0]["id"]
    jobs_before = {j["jobId"] for j in _rest(f"{ui}/api/v1/applications/{app}/jobs")}
    t0 = time.time()
    pr = pagerank(spark, edges, damping=0.85, max_supersteps=120,
                  tolerance=1e-6, convergence="l1_mean",
                  num_partitions=nparts)
    wall = time.time() - t0
    jobs = [j for j in _rest(f"{ui}/api/v1/applications/{app}/jobs")
            if j["jobId"] not in jobs_before]
    from datetime import datetime

    def ts(s):
        return datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%f%Z").timestamp()

    total_job = 0.0
    by_kind: dict[str, list[float]] = {}
    for j in jobs:
        dur = ts(j["completionTime"]) - ts(j["submissionTime"])
        total_job += dur
        name = j.get("name", "?").split(" ")[0]
        by_kind.setdefault(name, []).append(dur)
    print(json.dumps({
        "wall": round(wall, 2), "supersteps": pr.supersteps,
        "ms_per_superstep": round(wall / pr.supersteps * 1000, 1),
        "n_jobs": len(jobs),
        "jobs_per_superstep": round(len(jobs) / pr.supersteps, 2),
        "sum_job_secs": round(total_job, 2),
        "driver_gap_secs": round(wall - total_job, 2),
        "by_kind": {k: {"n": len(v), "sum_s": round(sum(v), 2)}
                    for k, v in sorted(by_kind.items())},
    }, indent=1), flush=True)


if __name__ == "__main__":
    main()
