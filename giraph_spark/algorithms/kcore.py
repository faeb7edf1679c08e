"""k-core decomposition — iterative peeling to fixpoint.

Not in the reference (beyond-reference graph metric, SURVEY §2.8): the
k-core is the maximal subgraph in which every vertex has degree >= k in
the symmetric graph — the standard hub/periphery split for web graphs
(periphery pages peel away round by round; the core is where link
authority concentrates).

Shape: each round is ONE degree aggregate over the shrinking edge set
plus two semi-joins (both shuffle-hash against the small keep set); the
edge count that materializes the new cut doubles as the halt probe, so a
round costs exactly one action. Rounds needed = peeling depth (typically
a handful); the edge set only shrinks, so late rounds are cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from giraph_spark.graph import symmetrize, vertices_from_edges
from giraph_spark.pregel import LineageCuts


def k_core(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    symmetrize_input: bool = True,
    num_partitions: int | None = None,
    max_rounds: int = 200,
) -> DataFrame:
    """(id, in_core: long 0/1) over the input graph's vertices.

    ``in_core=1`` iff the vertex survives peeling: repeatedly drop
    vertices whose degree in the current symmetric subgraph is < k.
    """
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cuts = LineageCuts()
    e0 = symmetrize(edges) if symmetrize_input else edges.select("src", "dst")
    e = cuts.cut(e0.repartition(num_partitions, "src"), "edges")
    verts = cuts.cut(vertices_from_edges(e), "verts")
    n_edges = e.count()

    for _ in range(max_rounds):
        if n_edges == 0:
            break
        keep = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= k)
            .select("src")
        )
        new_e = (
            e.join(keep.hint("shuffle_hash"), "src", "left_semi")
            .join(
                keep.withColumnRenamed("src", "dst").hint("shuffle_hash"),
                "dst",
                "left_semi",
            )
            .select("src", "dst")
        )
        new_e = cuts.cut(new_e, "edges")  # materializes BEFORE releasing prev
        n_new = new_e.count()
        e = new_e
        if n_new == n_edges:
            break
        n_edges = n_new
    else:
        raise RuntimeError(f"k_core: no fixpoint within {max_rounds} rounds")

    core = e.select(F.col("src").alias("id")).distinct()
    out = verts.join(
        core.withColumn("in_core", F.lit(1)), "id", "left"
    ).select("id", F.coalesce("in_core", F.lit(0)).cast("long").alias("in_core"))
    out = out.localCheckpoint(eager=True)  # outlives the cuts released below
    for slot in ("edges", "verts"):
        cuts.release(slot)
    return out
