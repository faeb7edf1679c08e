"""Strongly-connected components — coloring + backward reach (FW-BW-Color).

Reference semantics (``giraph-examples/.../scc/SccComputation.java:41-95``
with the master-driven phase machine ``SccPhaseMasterCompute.java:54-98``:
TRANSPOSE → TRIMMING → FORWARD_TRAVERSAL → BACKWARD_TRAVERSAL loop): the
reference finds SCCs by repeated forward/backward reachability. We use
the equivalent coloring formulation (same fixpoint, better suited to
whole-graph DataFrame supersteps than per-phase vertex state machines):

repeat until no active vertices:
  1. trim: vertices with no in- or out-edges within the active subgraph
     form singleton SCCs (the reference's TRIMMING phase)
  2. color: forward max-label propagation — every active vertex learns
     the max id that reaches it (FORWARD_TRAVERSAL)
  3. backward: from each color root (id == color), propagate "member"
     backwards along edges restricted to the same color
     (BACKWARD_TRAVERSAL); members form one SCC labeled by the root
  4. remove settled vertices and repeat on the remainder

Result: (id, scc) with scc = the max vertex id inside the component
(deterministic; the reference labels by traversal root the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from giraph_spark.graph import vertices_from_edges


def _propagate(
    edges: DataFrame, seeds: DataFrame, max_iters: int = 50
) -> DataFrame:
    """Max-label frontier propagation along ``edges`` from ``seeds``
    (id, lab); returns the fixpoint (id, lab) over reached vertices.

    One action per iteration (the frontier count doubles as the halt
    check); lineage cut every few iterations instead of per-step
    checkpoints — the inner loops dominate SCC wall time, so job count
    is the budget here."""
    neg_inf = -(1 << 62)
    state = seeds
    frontier = seeds
    prev = None
    for it in range(max_iters):
        msgs = (
            edges.join(frontier.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.max("lab").alias("m"))
        )
        joined = state.withColumnRenamed("lab", "old").join(msgs, "id", "full")
        combined = joined.select(
            "id",
            F.greatest(
                F.coalesce("old", F.lit(neg_inf)), F.coalesce("m", F.lit(neg_inf))
            ).alias("lab"),
            (
                F.col("old").isNull()
                | (F.coalesce("m", F.lit(neg_inf)) > F.col("old"))
            ).alias("_grew"),
        ).persist()
        if it % 3 == 2:
            cut = combined.localCheckpoint(eager=True)
            combined.unpersist()
            combined = cut
        grew = combined.where("_grew").count()
        if prev is not None:  # the count above consumed prev's cache
            prev.unpersist()
        prev = combined
        state = combined.select("id", "lab")
        frontier = combined.where("_grew").select("id", "lab")
        if grew == 0:
            break
    return state


def strongly_connected_components(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 20,
    max_iters: int = 50,
) -> DataFrame:
    """(id, scc) over the directed edge table; exact for any digraph
    reachable within ``max_iters`` propagation steps per round."""
    active_edges = edges.select("src", "dst").localCheckpoint(eager=True)
    active = vertices_from_edges(active_edges).localCheckpoint(eager=True)
    settled: DataFrame | None = None

    for _ in range(max_rounds):
        if active.isEmpty():
            break
        # 1. trim singletons: no out-edges or no in-edges in active subgraph
        has_out = active_edges.select(F.col("src").alias("id")).distinct()
        has_in = active_edges.select(F.col("dst").alias("id")).distinct()
        trivial = active.join(has_out, "id", "left_anti").union(
            active.join(has_in, "id", "left_anti")
        ).distinct()
        part = trivial.select("id", F.col("id").alias("scc"))
        settled = part if settled is None else settled.union(part)
        active = active.join(trivial, "id", "left_anti").localCheckpoint(eager=True)
        if active.isEmpty():
            break
        active_edges = (
            active_edges.join(active.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(active.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )

        # 2. forward coloring: max id reaching each vertex
        seeds = active.select("id", F.col("id").alias("lab"))
        colors = _propagate(active_edges, seeds, max_iters=max_iters)

        # 3. backward membership within equal color: reverse edges whose two
        # endpoints share a color; propagate from roots (id == color)
        ec = (
            active_edges.join(colors.select(F.col("id").alias("src"), F.col("lab").alias("csrc")), "src")
            .join(colors.select(F.col("id").alias("dst"), F.col("lab").alias("cdst")), "dst")
            .where(F.col("csrc") == F.col("cdst"))
            .select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        roots = colors.where(F.col("id") == F.col("lab")).select("id", "lab")
        members = _propagate(ec, roots, max_iters=max_iters)
        scc = (
            members.join(colors.withColumnRenamed("lab", "color"), "id")
            .where(F.col("lab") == F.col("color"))
            .select("id", F.col("color").alias("scc"))
            .localCheckpoint(eager=True)
        )
        settled = settled.union(scc)

        # 4. peel
        active = active.join(scc, "id", "left_anti").localCheckpoint(eager=True)
        active_edges = (
            active_edges.join(active.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(active.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )

    assert settled is not None
    return settled
