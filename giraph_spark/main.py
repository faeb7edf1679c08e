"""spark-submit entry point.

The north rule requires the engine to run via ``spark-submit --py-files``
on a multi-executor cluster. Package and launch::

    cd /root/repo && zip -r /tmp/giraph_spark.zip giraph_spark
    spark-submit --py-files /tmp/giraph_spark.zip \\
        giraph_spark/main.py pagerank \\
        --edges hdfs://.../edges.parquet --output hdfs://.../ranks \\
        --tolerance 1e-6 --checkpoint-dir hdfs://.../ck --resume

On a cluster the session comes from spark-submit's conf (master, executor
count); locally it falls back to ``local[$SPARK_GRAFT_CPUS]``. Plays the
role of the reference's ``GiraphRunner``
(``giraph-core/src/main/java/org/apache/giraph/GiraphRunner.java:43,69-94``)
with the algorithm name replacing the Computation class argument.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="giraph_spark", description=__doc__)
    p.add_argument("algorithm", choices=[
        "pagerank", "ppr", "wcc", "lpa", "maxlabel", "sssp", "bfs",
        "triangles", "scc", "mis", "deadlock", "extract-edges",
    ])
    p.add_argument("--edges", help="parquet edge table (src,dst[,weight])")
    p.add_argument("--pages", help="parquet page table (url,warc_ts,html,text,lang) for extract-edges")
    p.add_argument("--output", required=True, help="output parquet path")
    p.add_argument("--max-supersteps", type=int, default=30)
    p.add_argument("--tolerance", type=float, default=None)
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--teleport", type=float, default=0.15)
    p.add_argument("--weighted", action="store_true")
    p.add_argument("--source", type=int, action="append", default=None,
                   help="source vertex (repeatable) for sssp/bfs/ppr")
    p.add_argument("--salt", type=int, default=None,
                   help="two-level gather salt for hub skew")
    p.add_argument("--num-partitions", type=int, default=None)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-interval", type=int, default=5)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--metrics-out", default=None, help="write run metrics JSON here")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        from giraph_spark.session import get_spark

        spark = get_spark(app_name=f"giraph-spark-{args.algorithm}")

    t0 = time.time()
    if args.algorithm == "extract-edges":
        from giraph_spark.corpus import build_edges

        pages = spark.read.parquet(args.pages)
        build_edges(pages).write.mode("overwrite").parquet(args.output)
        print(json.dumps({"algorithm": "extract-edges",
                          "seconds": round(time.time() - t0, 2)}))
        return 0

    edges = spark.read.parquet(args.edges)
    common = dict(num_partitions=args.num_partitions)
    pregel_common = dict(
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_interval=args.checkpoint_interval,
        resume=args.resume,
        **common,
    )

    if args.algorithm == "pagerank":
        from giraph_spark.algorithms.pagerank import pagerank

        run = pagerank(spark, edges, damping=args.damping,
                       max_supersteps=args.max_supersteps,
                       tolerance=args.tolerance, weighted=args.weighted,
                       salt=args.salt, **pregel_common)
    elif args.algorithm == "ppr":
        from giraph_spark.algorithms.ppr import personalized_pagerank

        run = personalized_pagerank(
            spark, edges, sources=args.source or [0], teleport=args.teleport,
            max_supersteps=args.max_supersteps, tolerance=args.tolerance,
            salt=args.salt, **common)
    elif args.algorithm == "wcc":
        from giraph_spark.algorithms.wcc import connected_components

        run = connected_components(spark, edges,
                                   max_supersteps=args.max_supersteps,
                                   salt=args.salt, **pregel_common)
    elif args.algorithm == "lpa":
        from giraph_spark.algorithms.lpa import label_propagation

        run = label_propagation(spark, edges,
                                max_supersteps=args.max_supersteps,
                                **pregel_common)
    elif args.algorithm == "maxlabel":
        from giraph_spark.algorithms.lpa import max_label_propagation

        run = max_label_propagation(spark, edges,
                                    max_supersteps=args.max_supersteps, **common)
    elif args.algorithm == "sssp":
        from giraph_spark.algorithms.paths import sssp

        run = sssp(spark, edges, args.source or [0],
                   weight_col="weight" if args.weighted else None,
                   max_supersteps=args.max_supersteps, **common)
    elif args.algorithm == "bfs":
        from giraph_spark.algorithms.paths import bfs

        run = bfs(spark, edges, args.source or [0],
                  max_supersteps=args.max_supersteps, **common)
    elif args.algorithm == "triangles":
        from giraph_spark.algorithms.triangles import triangles_per_vertex

        triangles_per_vertex(edges).write.mode("overwrite").parquet(args.output)
        print(json.dumps({"algorithm": "triangles",
                          "seconds": round(time.time() - t0, 2)}))
        return 0
    elif args.algorithm == "scc":
        from giraph_spark.algorithms.scc import strongly_connected_components

        strongly_connected_components(spark, edges).write.mode(
            "overwrite").parquet(args.output)
        print(json.dumps({"algorithm": "scc",
                          "seconds": round(time.time() - t0, 2)}))
        return 0
    elif args.algorithm == "deadlock":
        from giraph_spark.algorithms.deadlock import bracha_toueg_free

        # edge table doubles as the wait-for graph (src,dst[,tag]);
        # --source = the detection initiator (default: lowest vertex id)
        initiator = (args.source or [None])[0]
        if initiator is None:
            from pyspark.sql import functions as F

            initiator = int(
                edges.agg(F.least(F.min("src"), F.min("dst"))).collect()[0][0]
            )
        run = bracha_toueg_free(
            spark, edges, initiator,
            max_supersteps=args.max_supersteps, **common,
        )
    elif args.algorithm == "mis":
        from giraph_spark.algorithms.mis import maximal_independent_set

        maximal_independent_set(spark, edges).write.mode(
            "overwrite").parquet(args.output)
        print(json.dumps({"algorithm": "mis",
                          "seconds": round(time.time() - t0, 2)}))
        return 0
    else:  # pragma: no cover
        raise AssertionError(args.algorithm)

    run.vertices.write.mode("overwrite").parquet(args.output)
    metrics = {
        "algorithm": args.algorithm,
        "supersteps": run.supersteps,
        "converged": run.converged,
        "seconds": round(time.time() - t0, 2),
        "history": run.history,
    }
    print(json.dumps({k: v for k, v in metrics.items() if k != "history"}))
    if args.metrics_out:
        with open(args.metrics_out, "w") as f:
            json.dump(metrics, f, indent=1, default=repr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
