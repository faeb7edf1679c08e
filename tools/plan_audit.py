"""Physical-plan audit for the headline operators.

Captures .explain("formatted") for the hot plans and asserts the
scale-critical properties the docs claim:

- parquet scans carry PushedFilters / pruned ReadSchema where expected
- no CartesianProduct / BroadcastNestedLoopJoin anywhere in the hot set
- the PageRank superstep joins are ShuffledHashJoin (static edge side
  never re-sorted), and the gather aggregate has a partial_ (map-side
  combine) phase
- the triangle wedge join is degeneracy-oriented (no raw sym self-join)

Writes the full explains + a PASS/FAIL summary to stdout; run as
    python tools/plan_audit.py > BENCH/runs/plan_audit_rN.txt
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from giraph_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark(app_name="plan-audit", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    checks: list[tuple[str, bool, str]] = []

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # 1. filter + projection pushdown reach the parquet scan
    q = docs.where(F.col("n_chars") >= 200).select("doc_id", "lang")
    p = explain_str(q)
    checks.append(("pushdown: PushedFilters has the n_chars predicate",
                   "GreaterThanOrEqual(n_chars,200" in p, p))
    checks.append(("pushdown: ReadSchema pruned to 3 cols (no text/html)",
                   "text" not in p.split("ReadSchema")[1][:200], p))

    # 2. PageRank superstep plan: shuffle-hash joins + partial aggregate
    from giraph_spark.graph import out_degrees
    edges = spark.createDataFrame(
        [(i, (i * 7 + 1) % 500) for i in range(2000)], "src long, dst long")
    deg = out_degrees(edges)
    e = (edges.join(deg, "src")
         .withColumn("weight", F.lit(1.0) / F.col("out_degree"))
         .drop("out_degree").repartition(8, "src").persist())
    e.count()
    ranks = spark.createDataFrame(
        [(i, 1.0) for i in range(2000)], "id long, rank double")
    msgs = e.join(ranks.select(F.col("id").alias("src"), "rank")
                  .hint("shuffle_hash"), "src") \
            .select("dst", (F.col("rank") * F.col("weight")).alias("msg"))
    gathered = msgs.groupBy("dst").agg(F.sum("msg").alias("msg"))
    p = explain_str(gathered)
    # the per-superstep scatter join must be ShuffledHashJoin (the
    # static edge table is streamed, never re-sorted); the one-time
    # weight-prep join in the cached lineage may be anything
    checks.append(("pagerank scatter: ShuffledHashJoin (edges never re-sorted)",
                   "ShuffledHashJoin" in p, p))
    checks.append(("pagerank gather: map-side partial aggregate",
                   "partial_sum" in p or "HashAggregate" in p.split("Exchange")[0], p))
    checks.append(("pagerank: no nested-loop/cartesian",
                   "NestedLoop" not in p and "Cartesian" not in p, p))

    # 2b. the LIVE SQL-text superstep (round 5: pagerank/wcc/lpa ship
    # each superstep as one spark.sql string) — same plan properties
    # must hold: both joins ShuffledHashJoin, map-side partial sum,
    # no nested-loop/cartesian
    e.createOrReplaceTempView("audit_edges")
    state = ranks.withColumn("is_sink", F.lit(False))
    state.createOrReplaceTempView("audit_state")
    step = spark.sql("""
      WITH g AS (
        SELECT /*+ SHUFFLE_HASH(v) */ e.dst AS dst, sum(v.rank * e.weight) AS msg
        FROM audit_edges e JOIN audit_state v ON e.src = v.id
        GROUP BY e.dst
      )
      SELECT /*+ SHUFFLE_HASH(g) */ v.id,
             0.85 * coalesce(g.msg, 0.0) + 0.15 AS rank,
             v.is_sink,
             0.85 * coalesce(g.msg, 0.0) + 0.15 - v.rank AS _delta
      FROM audit_state v LEFT JOIN g ON v.id = g.dst""")
    p = explain_str(step)
    checks.append(("sql-text superstep: BOTH joins ShuffledHashJoin",
                   p.count("ShuffledHashJoin") >= 2, p))
    checks.append(("sql-text superstep: map-side partial aggregate",
                   "partial_sum" in p, p))
    checks.append(("sql-text superstep: no nested-loop/cartesian",
                   "NestedLoop" not in p and "Cartesian" not in p, p))

    # 3. triangles: oriented wedge join, no cartesian
    from giraph_spark.algorithms.triangles import _oriented, _triangle_list_from
    o = _oriented(edges, symmetrize_input=True)
    tris = _triangle_list_from(o)
    p = explain_str(tris)
    checks.append(("triangles: no nested-loop/cartesian in wedge join",
                   "NestedLoop" not in p and "Cartesian" not in p, p))

    # 4. LSH shingles: single scan shape, codegen transform (no Python UDF)
    from giraph_spark.text import shingles
    sh = shingles(docs, 3)
    p = explain_str(sh)
    checks.append(("shingles: no Python UDF (pure codegen)",
                   "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p))

    # 5. broadcast where expected: small dim join
    small = spark.createDataFrame([(i,) for i in range(10)], "src long")
    j = edges.join(F.broadcast(small), "src")
    p = explain_str(j)
    checks.append(("broadcast hint honored for small dim",
                   "BroadcastHashJoin" in p, p))

    print(f"# Plan audit @ {SF_DIR}\n")
    fails = 0
    for name, ok, _ in checks:
        print(("PASS  " if ok else "FAIL  ") + name)
        fails += 0 if ok else 1
    print(f"\n{len(checks) - fails}/{len(checks)} checks pass\n")
    print("=" * 72)
    for name, ok, p in checks:
        print(f"\n### {name} [{'PASS' if ok else 'FAIL'}]\n{p}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
