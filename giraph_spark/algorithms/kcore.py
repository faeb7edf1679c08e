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


def k_truss(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    symmetrize_input: bool = True,
    num_partitions: int | None = None,
    max_rounds: int = 100,
) -> DataFrame:
    """The k-truss: maximal subgraph whose every edge closes >= k-2
    triangles *within the subgraph* — (u, v, support) rows with u < v,
    support = that edge's final-round triangle count.

    Not in the reference (beyond-reference cohesion metric, SURVEY §2.8):
    trusses are the standard community-core refinement of k-cores for
    link graphs (every k-truss is inside the (k-1)-core but not vice
    versa).

    Shape: each round enumerates the shrinking subgraph's triangles with
    the same degeneracy-ordered wedge join as ``triangles_per_vertex``
    (hub fan-out bounded by orientation), distributes each triangle to
    its three undirected edges with one map-side-combined count, drops
    light edges, and re-checks the edge count — one triangle pass + one
    action per round, edge set monotonically shrinking. The dominant
    cost is the first round's full triangle join, identical to a plain
    triangle count at 100 TB.
    """
    from giraph_spark.algorithms.triangles import _oriented, _triangle_list_from

    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cuts = LineageCuts()
    if symmetrize_input:
        from giraph_spark.graph import clean_symmetric

        sym0 = clean_symmetric(edges)
    else:
        sym0 = edges.select("src", "dst")
    sym = cuts.cut(sym0.repartition(num_partitions, "src"), "sym")
    n_edges = sym.count()  # symmetric rows = 2x undirected edges
    min_support = k - 2

    sup = None
    converged = n_edges == 0
    for _ in range(max_rounds):
        if n_edges == 0:
            converged = True
            break
        o = _oriented(sym, symmetrize_input=False)
        tris = _triangle_list_from(o)
        tri_edges = (
            tris.select(
                F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
            )
            .union(
                tris.select(
                    F.least("a", "c").alias("u"), F.greatest("a", "c").alias("v")
                )
            )
            .union(
                tris.select(
                    F.least("b", "c").alias("u"), F.greatest("b", "c").alias("v")
                )
            )
        )
        sup = cuts.cut(
            sym.where(F.col("src") < F.col("dst"))
            .select(F.col("src").alias("u"), F.col("dst").alias("v"))
            .join(
                tri_edges.groupBy("u", "v").agg(
                    F.count(F.lit(1)).alias("support")
                ),
                ["u", "v"],
                "left",
            )
            .select(
                "u", "v", F.coalesce("support", F.lit(0)).alias("support")
            ),
            "support",
        )
        kept = sup.where(F.col("support") >= min_support)
        sym = cuts.cut(
            kept.select(F.col("u").alias("src"), F.col("v").alias("dst"))
            .union(kept.select(F.col("v").alias("src"), F.col("u").alias("dst")))
            .repartition(num_partitions, "src"),
            "sym",
        )
        n_kept = sym.count()
        if n_kept == n_edges:
            converged = True
            break
        n_edges = n_kept

    if not converged:
        raise RuntimeError(
            "k_truss: round budget exhausted before the edge set reached "
            "a fixpoint; raise max_rounds"
        )
    if sup is None or n_edges == 0:
        cuts.release("sym")
        cuts.release("support")
        schema = "u long, v long, support long"
        return spark.createDataFrame([], schema)
    out = cuts.cut(
        sup.where(F.col("support") >= min_support), "result"
    )
    cuts.release("sym")
    cuts.release("support")
    cuts.forget("result")  # backs the returned DataFrame
    return out


def coreness(
    spark: SparkSession,
    edges: DataFrame,
    symmetrize_input: bool = True,
    num_partitions: int | None = None,
    max_rounds: int = 500,
) -> DataFrame:
    """Full k-core decomposition: (id, coreness) where coreness(v) is the
    largest k such that v survives k-core peeling (0 for vertices that
    start isolated — impossible here since vertices come from edges, so
    the minimum emitted value is 1).

    Shape: ascending-k sequential peeling, each k starting from the
    (k-1)-core's edge set (monotone containment), so total work is the
    peel cascade itself — the standard distributed decomposition. Each
    round costs one degree aggregate + two semi-joins + one count, and
    for all k below the graph's minimum degree the round is a verified
    no-op (one round each).
    """
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cuts = LineageCuts()
    e0 = symmetrize(edges) if symmetrize_input else edges.select("src", "dst")
    e = cuts.cut(e0.repartition(num_partitions, "src"), "edges")
    prev_verts = cuts.cut(vertices_from_edges(e), "prev_verts")
    n_edges = e.count()
    result: DataFrame | None = None
    # the whole graph IS the k-core for every k up to its minimum
    # symmetric degree (coreness >= d_min for all vertices), so those
    # peels are verified no-ops — start above them
    if n_edges > 0:
        d_min = int(
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .agg(F.min("d"))
            .collect()[0][0]
        )
        k = max(d_min - 1, 0)
    else:
        k = 0
    rounds_left = max_rounds

    while n_edges > 0:
        k += 1
        # peel e down to its k-core fixpoint
        while True:
            rounds_left -= 1
            if rounds_left < 0:
                raise RuntimeError(
                    "coreness: round budget exhausted; raise max_rounds"
                )
            keep = (
                e.groupBy("src")
                .agg(F.count(F.lit(1)).alias("d"))
                .where(F.col("d") >= k)
                .select("src")
            )
            e2 = cuts.cut(
                e.join(keep, "src", "left_semi").join(
                    keep.withColumnRenamed("src", "dst"), "dst", "left_semi"
                ).select("src", "dst"),
                "edges",
            )
            n2 = e2.count()
            e = e2
            if n2 == n_edges:
                break
            n_edges = n2
        # survivors of the k-core; the symmetric edge set guarantees
        # every member appears as a src
        cur_verts = cuts.cut(e.select(F.col("src").alias("id")).distinct(), "cur_verts")
        dropped = prev_verts.join(cur_verts, "id", "left_anti").select(
            "id", F.lit(k - 1).cast("long").alias("coreness")
        )
        result = cuts.cut(
            dropped
            if result is None
            else result.union(dropped).coalesce(num_partitions),
            "result",
        )
        prev_verts = cuts.cut(cur_verts, "prev_verts")
        cuts.release("cur_verts")

    # the loop ends when the k-core is empty: remaining prev_verts peaked
    # at k-1 (they survived the (k-1)-core but not the k-core)
    tail = prev_verts.select("id", F.lit(max(k - 1, 0)).cast("long").alias("coreness"))
    out = (tail if result is None else result.union(tail)).localCheckpoint(eager=True)
    cuts.release("edges")
    cuts.release("prev_verts")
    cuts.release("result")
    return out


def trussness(
    spark: SparkSession,
    edges: DataFrame,
    symmetrize_input: bool = True,
    num_partitions: int | None = None,
    max_rounds: int = 4000,
    deep_cut_interval: int = 25,
) -> DataFrame:
    """Full truss decomposition: (u, v, trussness) per undirected edge,
    where trussness(e) is the largest k such that e survives k-truss
    peeling (triangle-free edges get the conventional 2, since the
    2-truss requires zero triangles).

    The edge analog of ``coreness`` and the same ascending-k incremental
    shape: each k peels from the (k-1)-truss's edge set, each round one
    degeneracy-oriented triangle pass + one count action.

    ``deep_cut_interval``: every N rounds the surviving edge set and the
    accumulated result are round-tripped through parquet and re-read as
    fresh file-backed leaves. A dense graph's deep k-ladder runs
    hundreds of plan-build/localCheckpoint cycles in one driver; the
    parquet deep cut resets ALL driver-side per-plan state (Catalyst
    stats, codegen caches, checkpoint block bookkeeping) — a long sf0.1
    decomposition run died with a driver OOM inside Catalyst statistics
    estimation (BigInteger products in SizeInBytesOnlyStatsPlanVisitor
    during a localCheckpoint's planning) before this existed; the file
    round-trip costs ~1-2 s per interval and bounds that accumulation.
    """
    import shutil
    import tempfile

    from giraph_spark.algorithms.triangles import _oriented, _triangle_list_from

    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cuts = LineageCuts()
    deep_dir = tempfile.mkdtemp(prefix="giraph_truss_deepcut_")
    if symmetrize_input:
        from giraph_spark.graph import clean_symmetric

        sym0 = clean_symmetric(edges)
    else:
        sym0 = edges.select("src", "dst")
    sym = cuts.cut(sym0.repartition(num_partitions, "src"), "sym")
    half = cuts.cut(
        sym.where(F.col("src") < F.col("dst")).select(
            F.col("src").alias("u"), F.col("dst").alias("v")
        ),
        "half",
    )
    n = half.count()
    result: DataFrame | None = None
    k = 2
    rounds_left = max_rounds
    next_deep_cut = deep_cut_interval if deep_cut_interval else None

    while n > 0:
        if (
            next_deep_cut is not None
            and max_rounds - rounds_left >= next_deep_cut
        ):
            next_deep_cut += deep_cut_interval
            import os

            p_half = os.path.join(deep_dir, f"half_{max_rounds - rounds_left}")
            half.write.mode("overwrite").parquet(p_half)
            cuts.release("half")
            cuts.release("sym")
            half = spark.read.parquet(p_half)
            sym = cuts.cut(
                half.select(F.col("u").alias("src"), F.col("v").alias("dst"))
                .union(
                    half.select(F.col("v").alias("src"), F.col("u").alias("dst"))
                )
                .repartition(num_partitions, "src"),
                "sym",
            )
            if result is not None:
                p_res = os.path.join(
                    deep_dir, f"result_{max_rounds - rounds_left}"
                )
                result.write.mode("overwrite").parquet(p_res)
                cuts.release("result")
                result = spark.read.parquet(p_res)
        k += 1
        before = cuts.cut(half, "before")
        while True:
            rounds_left -= 1
            if rounds_left < 0:
                raise RuntimeError(
                    "trussness: round budget exhausted; raise max_rounds"
                )
            o = _oriented(sym, symmetrize_input=False)
            tris = _triangle_list_from(o)
            tri_edges = (
                tris.select(
                    F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
                )
                .union(
                    tris.select(
                        F.least("a", "c").alias("u"),
                        F.greatest("a", "c").alias("v"),
                    )
                )
                .union(
                    tris.select(
                        F.least("b", "c").alias("u"),
                        F.greatest("b", "c").alias("v"),
                    )
                )
            )
            sup = tri_edges.groupBy("u", "v").agg(
                F.count(F.lit(1)).alias("support")
            )
            kept = half.join(sup, ["u", "v"], "left").where(
                F.coalesce("support", F.lit(0)) >= k - 2
            ).select("u", "v")
            half = cuts.cut(kept, "half")
            sym = cuts.cut(
                half.select(F.col("u").alias("src"), F.col("v").alias("dst"))
                .union(
                    half.select(F.col("v").alias("src"), F.col("u").alias("dst"))
                )
                .repartition(num_partitions, "src"),
                "sym",
            )
            n_kept = half.count()
            if n_kept == n:
                break
            n = n_kept
            if n == 0:
                break
        dropped = before.join(half, ["u", "v"], "left_anti").select(
            "u", "v", F.lit(k - 1).cast("long").alias("trussness")
        )
        result = cuts.cut(
            dropped
            if result is None
            else result.union(dropped).coalesce(num_partitions),
            "result",
        )

    if result is None:
        out = spark.createDataFrame([], "u long, v long, trussness long")
    else:
        out = result.localCheckpoint(eager=True)  # before deep_dir removal
    for slot in ("sym", "half", "before", "result"):
        cuts.release(slot)
    shutil.rmtree(deep_dir, ignore_errors=True)
    return out
