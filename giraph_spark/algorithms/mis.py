"""Distributed maximal independent set — deterministic Luby rounds.

Reference semantics (``giraph-block-app-8/.../algo/
DistributedIndependentSet.java:53,82,118``): greedy MIS coloring — per
round, vertices that locally win against all undecided neighbors join
the set; their neighbors leave; repeat until every vertex is decided.

Determinism: the reference uses vertex ids as priorities; we use a
per-round hash ``xxhash64(id, round)`` (classic Luby) which converges in
O(log n) expected rounds on any graph and is reproducible across runs
and parallelism levels (pure function of id+round). Ties cannot occur
within a round modulo hash collisions, which the id tiebreak resolves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from giraph_spark.graph import symmetrize, vertices_from_edges


def maximal_independent_set(
    spark: SparkSession,
    edges: DataFrame,
    symmetrize_input: bool = True,
    max_rounds: int = 60,
) -> DataFrame:
    """(id, in_set: boolean) — a maximal independent set of the
    undirected graph: no two set members are adjacent, every non-member
    has a set neighbor."""
    e = symmetrize(edges) if symmetrize_input else edges.select("src", "dst")
    e = e.localCheckpoint(eager=True)
    undecided = vertices_from_edges(e).localCheckpoint(eager=True)
    in_set: DataFrame | None = None

    exhausted = True
    for rnd in range(max_rounds):
        if undecided.isEmpty():
            exhausted = False
            break
        prio = undecided.select(
            "id",
            F.xxhash64(F.col("id"), F.lit(rnd)).alias("p"),
        )
        # active edges among undecided vertices, with both priorities
        ea = (
            e.join(prio.select(F.col("id").alias("src"), F.col("p").alias("psrc")), "src")
            .join(prio.select(F.col("id").alias("dst"), F.col("p").alias("pdst")), "dst")
        )
        # a vertex loses if some neighbor beats it (smaller priority, id tiebreak)
        beaten = (
            ea.where(
                (F.col("pdst") < F.col("psrc"))
                | ((F.col("pdst") == F.col("psrc")) & (F.col("dst") < F.col("src")))
            )
            .select(F.col("src").alias("id"))
            .distinct()
        )
        winners = undecided.join(beaten, "id", "left_anti").localCheckpoint(eager=True)
        part = winners.select("id")
        in_set = part if in_set is None else in_set.union(part)
        # winners and their neighbors become decided
        nbrs = (
            e.join(winners.withColumnRenamed("id", "src"), "src", "left_semi")
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        undecided = (
            undecided.join(winners, "id", "left_anti")
            .join(nbrs, "id", "left_anti")
            .localCheckpoint(eager=True)
        )

    if exhausted and not undecided.isEmpty():
        raise RuntimeError(
            "maximal_independent_set: round budget exhausted with "
            f"{undecided.count()} vertices still undecided — result would "
            "violate maximality; raise max_rounds"
        )
    verts = vertices_from_edges(e)
    assert in_set is not None
    return verts.join(
        in_set.withColumn("in_set", F.lit(True)), "id", "left"
    ).select("id", F.coalesce("in_set", F.lit(False)).alias("in_set"))
