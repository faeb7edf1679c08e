"""Graph-preparation operators — edge-table ETL.

Re-expresses the reference's graph-prep pieces
(``giraph-block-app-8/src/main/java/org/apache/giraph/block_app/library/
prepare_graph/PrepareGraphPieces.java``) as declarative DataFrame
transformations; each op cites the piece it mirrors. All ops are pure
(no driver-side collection) and Catalyst-optimizable, so they inherit
predicate pushdown / partial aggregation for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def drop_self_loops(edges: DataFrame) -> DataFrame:
    """Part of cleanSymmetricUnweightedGraph (PrepareGraphPieces.java:87-104)."""
    return edges.where(F.col("src") != F.col("dst"))


def dedup_edges(edges: DataFrame) -> DataFrame:
    """removeDuplicateEdges (PrepareGraphPieces.java:139)."""
    return edges.dropDuplicates(["src", "dst"])


def reverse_edges(edges: DataFrame) -> DataFrame:
    """Reverse every edge, keeping any extra columns (io/ReverseEdgeDuplicator.java)."""
    others = [c for c in edges.columns if c not in ("src", "dst")]
    return edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), *[F.col(c) for c in others]
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """makeSymmetricUnweighted (PrepareGraphPieces.java:166): union with the
    reversed edge set and dedup — the relational form of 'receiver adds the
    reverse edge if missing'."""
    base = edges.select("src", "dst")
    return dedup_edges(base.union(reverse_edges(base)))


def symmetrize_weighted(edges: DataFrame, weight_col: str = "weight") -> DataFrame:
    """makeSymmetricWeighted (PrepareGraphPieces.java:202-277): symmetric
    closure keeping the max weight per (src, dst) pair."""
    base = edges.select("src", "dst", weight_col)
    both = base.union(reverse_edges(base))
    return both.groupBy("src", "dst").agg(F.max(weight_col).alias(weight_col))


def remove_asym_edges(edges: DataFrame) -> DataFrame:
    """removeAsymEdges (PrepareGraphPieces.java:107): keep only edges whose
    reverse is also present — a self semi-join on the flipped key."""
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return edges.join(rev, ["src", "dst"], "left_semi")


def clean_symmetric(edges: DataFrame) -> DataFrame:
    """cleanSymmetricUnweightedGraph (PrepareGraphPieces.java:87-104):
    drop self-loops + dedup + symmetrize."""
    return symmetrize(drop_self_loops(edges))


def out_degrees(edges: DataFrame) -> DataFrame:
    """Out-degree per src (Vertex.getNumEdges, graph/Vertex.java:92) —
    map-side-combined groupBy count."""
    return edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_degree"))


def in_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy("dst").agg(F.count(F.lit(1)).alias("in_degree"))


def vertices_from_edges(edges: DataFrame) -> DataFrame:
    """All vertex ids touched by any edge — includes message-target-only
    ids, mirroring vertex-creation-on-message
    (graph/DefaultVertexResolver.java:126-130) resolved once at init, the
    way PageRankInitializeAndNormalizeEdgesPiece.java:81 materializes
    message-target-only vertices."""
    return (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def remove_standalone_vertices(vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """removeStandAloneVertices (PrepareGraphPieces.java:279): keep vertices
    referenced by at least one edge endpoint."""
    return vertices.join(vertices_from_edges(edges), "id", "left_semi")


def normalize_edge_weights(edges: DataFrame, weight_col: str = "weight") -> DataFrame:
    """normalizeDoubleEdges (PrepareGraphPieces.java:285,328): scale each
    vertex's out-weights to sum 1 — a window aggregate, no shuffle beyond
    the partition-by-src exchange."""
    w = Window.partitionBy("src")
    total = F.sum(F.col(weight_col)).over(w)
    return edges.withColumn(
        weight_col,
        F.when(total != F.lit(0.0), F.col(weight_col) / total).otherwise(F.lit(0.0)),
    )


def is_symmetric(edges: DataFrame) -> bool:
    """Exact symmetry check (reference does a probabilistic hash check,
    PrepareGraphPieces.java:412-428; `except` is exact and still
    distributed)."""
    base = edges.select("src", "dst")
    return base.exceptAll(reverse_edges(base).select("src", "dst")).isEmpty()


def coarsen_graph(
    vertices: DataFrame,
    edges: DataFrame,
    mapping: DataFrame,
    value_col: str | None = "value",
    weight_col: str | None = None,
    vertex_agg: str = "sum",
    edge_agg: str = "sum",
    keep_self_loops: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Graph coarsening (``giraph-block-app-8/.../coarsening/
    CoarseningUtils.java:66-96`` with the semantics pinned by
    ``TestCoarseningUtils.java:83-124``): collapse each cluster of
    original vertices into one coarsened vertex.

    ``mapping`` is (id, cluster). Coarsened vertex value = ``vertex_agg``
    over member values (the vertexInfoCombiner); coarsened edge value =
    ``edge_agg`` over original edges between the two clusters (the
    edgeCoarseningCombiner; with ``weight_col=None`` each edge counts 1).
    Cluster-internal edges become self-loops (kept by the reference —
    drop with ``keep_self_loops=False``). The original graph is NOT
    consumed, matching "old graph is not deleted".

    Returns ``(cvertices(cluster[, value]), cedges(src, dst[, weight]))``.
    """
    from giraph_spark.reducers import reducer

    m = mapping.select("id", "cluster")
    if value_col is not None:
        cverts = (
            vertices.join(m, "id")
            .groupBy("cluster")
            .agg(reducer(vertex_agg, value_col).alias(value_col))
        )
    else:
        cverts = vertices.join(m, "id").select("cluster").distinct()

    e = edges.join(m.withColumnRenamed("id", "src"), "src").withColumnRenamed(
        "cluster", "_csrc"
    )
    e = e.join(
        m.select(F.col("id").alias("dst"), F.col("cluster").alias("_cdst")), "dst"
    )
    if not keep_self_loops:
        e = e.where(F.col("_csrc") != F.col("_cdst"))
    val = (
        reducer(edge_agg, weight_col)
        if weight_col is not None
        else F.count(F.lit(1)).cast("long")
    )
    out_col = weight_col or "weight"
    cedges = (
        e.groupBy(F.col("_csrc").alias("src"), F.col("_cdst").alias("dst"))
        .agg(val.alias(out_col))
    )
    return cverts, cedges


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Newman's degree assortativity coefficient — Pearson correlation of
    endpoint degrees over the (clean symmetric) edge set, one scalar row
    ``(assortativity)``. Negative on web graphs (hubs link to leaves).

    Scale shape: two broadcast-sized degree joins against the edge scan
    would still shuffle; instead the degree table joins by key (sort-merge
    or SHJ via AQE) and the correlation is ONE map-side-combinable
    aggregate — no driver-side math beyond the final row.
    """
    sym = clean_symmetric(edges)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    pairs = (
        sym.join(deg, "src")
        .withColumnRenamed("deg", "sdeg")
        .join(
            deg.select(F.col("src").alias("dst"), F.col("deg").alias("ddeg")),
            "dst",
        )
    )
    # not F.corr: under ANSI mode (Spark 4 default) corr raises
    # DIVIDE_BY_ZERO on a regular graph (zero degree variance); the
    # covar/stddev form with try_divide yields NULL there, matching the
    # SQL-standard corr() of other engines
    x = F.col("sdeg").cast("double")
    y = F.col("ddeg").cast("double")
    return pairs.agg(
        F.try_divide(
            F.covar_pop(x, y), F.stddev_pop(x) * F.stddev_pop(y)
        ).alias("assortativity")
    )


def modularity(edges: DataFrame, labels: DataFrame,
               id_col: str = "id", label_col: str = "label") -> DataFrame:
    """Newman modularity Q of a vertex partition over the clean symmetric
    graph: Q = (intra-community edge fraction) − Σ_c (d_c / 2m)², one
    scalar row ``(modularity)``. The standard quality score for LPA/WCC/
    Louvain output (reference has no analog; beyond-reference SURVEY §2.8).

    Scale shape: 2m and the intra count are map-side-combinable aggregates
    over the edge scan with two label joins keyed on the endpoints (the
    label table is |V|-sized — sort-merge/SHJ, never driver-side); the
    per-community degree mass d_c is one groupBy(label). No step is
    quadratic in community size, so a 10^12-edge graph pays exactly three
    shuffles (two label joins + one label groupBy).
    """
    lab = labels.select(F.col(id_col).alias("id"), F.col(label_col).alias("lab"))
    sym = clean_symmetric(edges)
    joined = (
        sym.join(lab.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("lab", "slab")
        .join(
            lab.select(F.col("id").alias("dst"), F.col("lab").alias("dlab")),
            "dst",
        )
    )
    # one pass: 2m = row count of sym, intra = same-label rows
    totals = joined.agg(
        F.count(F.lit(1)).cast("double").alias("two_m"),
        F.sum((F.col("slab") == F.col("dlab")).cast("double")).alias("intra"),
    )
    deg_mass = (
        joined.groupBy("slab")
        .agg(F.count(F.lit(1)).cast("double").alias("dc"))
        .agg(F.sum(F.col("dc") * F.col("dc")).alias("sum_dc2"))
    )
    return totals.crossJoin(deg_mass).select(
        (
            F.col("intra") / F.col("two_m")
            - F.col("sum_dc2") / (F.col("two_m") * F.col("two_m"))
        ).alias("modularity")
    )


def reciprocity(edges: DataFrame) -> DataFrame:
    """Fraction of directed edges whose reverse also exists (self-loops
    and duplicates dropped first) — one scalar row ``(reciprocity)``,
    NULL on an edgeless graph. The standard 'is this web/social graph
    mutual?' statistic (beyond-reference, SURVEY §2.8).

    Scale shape: one dedup, one self-join on the flipped key, one
    map-side-combined average — no driver-side math.
    """
    e = dedup_edges(drop_self_loops(edges.select("src", "dst")))
    rev = reverse_edges(e).withColumn("_mutual", F.lit(1))
    return (
        e.join(rev, ["src", "dst"], "left")
        .agg(F.avg(F.col("_mutual").isNotNull().cast("double")).alias("reciprocity"))
    )


def transitivity(edges: DataFrame) -> DataFrame:
    """Global clustering coefficient 3T / W — closed wedges over all
    wedges on the clean symmetric graph, one scalar row
    ``(transitivity)``, NULL when the graph has no wedge.

    Scale shape: the triangle term reuses the degeneracy-oriented wedge
    join (hub-safe); the wedge denominator is one degree aggregate —
    both map-side combined.
    """
    from giraph_spark.algorithms.triangles import _oriented, _triangle_list_from

    # no persist: a scalar stat reads the oriented table a bounded number
    # of times, and an un-released cache would outlive the lazy result
    tris = _triangle_list_from(_oriented(edges, symmetrize_input=True))
    t = tris.agg(F.count(F.lit(1)).cast("double").alias("t"))
    wedges = (
        clean_symmetric(edges)
        .groupBy("src")
        .agg(F.count(F.lit(1)).cast("double").alias("deg"))
        .agg((F.sum(F.col("deg") * (F.col("deg") - 1.0)) / 2.0).alias("w"))
    )
    return t.crossJoin(wedges).select(
        F.try_divide(3.0 * F.col("t"), F.col("w")).alias("transitivity")
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """Log2-binned degree distribution — the first diagnostic anyone
    runs on a web graph (power-law check, hub census, partitioner
    sizing). Returns (kind, bucket, n_vertices, min_degree, max_degree)
    with kind ∈ {'in', 'out'} and bucket = floor(log2(degree)), computed
    INTEGER-exactly as length(binary(degree)) - 1 (float log2 rounds
    wrong at exact powers of two in some engines).

    Scale shape: two map-side-combined degree aggregations + one tiny
    (≤ ~64 rows per kind) re-aggregation; no joins.
    """
    out_d = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    ).select(F.lit("out").alias("kind"), "degree")
    in_d = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    ).select(F.lit("in").alias("kind"), "degree")
    both = out_d.unionByName(in_d)
    bucket = (F.length(F.bin(F.col("degree"))) - 1).cast("long")
    return (
        both.select("kind", bucket.alias("bucket"), "degree")
        .groupBy("kind", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.min("degree").alias("min_degree"),
            F.max("degree").alias("max_degree"),
        )
    )


def edge_delta(
    old: DataFrame, new: DataFrame, keys: tuple[str, ...] = ("src", "dst")
) -> DataFrame:
    """Snapshot diff between two edge tables: one row per distinct key
    tuple with ``status`` in {'added', 'removed', 'kept'} — the crawl-
    over-crawl link-graph change feed (which links appeared, vanished,
    persisted between two snapshots of the same web).

    Scale shape: two dedups + ONE full-outer shuffle join on the key —
    both sides hash-partition on the same key so the join is co-located;
    no driver-side set math."""
    ks = list(keys)
    o = old.select(*ks).dropDuplicates(ks).withColumn("_o", F.lit(1))
    n = new.select(*ks).dropDuplicates(ks).withColumn("_n", F.lit(1))
    j = o.join(n, ks, "full_outer")
    status = (
        F.when(F.col("_o").isNotNull() & F.col("_n").isNotNull(), F.lit("kept"))
        .when(F.col("_o").isNotNull(), F.lit("removed"))
        .otherwise(F.lit("added"))
    )
    return j.select(*ks, status.alias("status"))


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    k: int,
    rank_col: str = "rk",
    salt: int | None = 8,
    salt_on: str | None = None,
) -> DataFrame:
    """Skew-safe per-group top-k: rank rows within each group by
    ``order_cols`` and keep the first ``k``, adding ``rank_col``.

    A plain `row_number over (partition by group)` puts every row of a
    hot group through ONE window task — fatal on power-law groups (a
    mega-host's millions of URLs). With ``salt``, the window runs TWICE:
    first per (group, pmod(xxhash64(salt_on), salt)) shard, keeping each
    shard's top-k, then over the <= salt*k survivors per group. The salt
    is a deterministic content hash (retry-safe); ``salt_on`` defaults
    to the first order column's underlying column name when it is a
    plain column, else pass it explicitly. ``order_cols`` must be a
    TOTAL order (include a unique tie-break) for determinism.
    """
    if salt and salt > 1:
        if salt_on is None:
            raise ValueError("grouped_topk with salt needs salt_on")
        shard = F.pmod(F.xxhash64(salt_on), F.lit(salt))
        w1 = Window.partitionBy(*group_cols, shard).orderBy(*order_cols)
        df = (
            df.withColumn("_rk1", F.row_number().over(w1))
            .where(F.col("_rk1") <= k)
            .drop("_rk1")
        )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w2)).where(
        F.col(rank_col) <= k
    )


def crawl_frontier(
    edges: DataFrame,
    crawled: DataFrame,
    host_col,
    per_host_k: int = 3,
    salt: int = 8,
) -> DataFrame:
    """Crawl-frontier prioritization (OPIC-style scheduling): rank the
    UNCRAWLED link targets by how many already-crawled pages link to
    them, then keep the top ``per_host_k`` per host — the politeness cap
    a frontier scheduler enforces so one mega-host cannot monopolize the
    fetch budget. Giraph has no frontier op; the discover-and-rank shape
    is its message-creates-vertex pattern
    (``graph/DefaultVertexResolver.java:126-130``) re-expressed as joins.

    ``crawled`` is a one-column (``id``) table of fetched page ids;
    ``host_col`` is a Column mapping a target id to its host bucket.

    Scale shape: a LEFT SEMI join (links whose source was crawled) and a
    LEFT ANTI join (targets not yet crawled) — both plain hash joins on
    id, no data widening — then ONE groupBy(dst) count. The per-host
    top-k runs TWICE: first per (host, salt-of-dst) shard, then on the
    <= salt*k survivors per host, so a host with millions of frontier
    URLs never lands in a single window partition (same two-level bound
    as the salted gather in pregel.py; salt is deterministic content
    hash, retry-safe). Returns (url_id, host, inlinks, rk).
    """
    cand = (
        edges.join(crawled, edges["src"] == crawled["id"], "left_semi")
        .join(crawled, edges["dst"] == crawled["id"], "left_anti")
        .groupBy("dst")
        .agg(F.count(F.lit(1)).alias("inlinks"))
        .select(F.col("dst").alias("url_id"), "inlinks")
        .withColumn("host", host_col)
    )
    return grouped_topk(
        cand,
        ["host"],
        [F.desc("inlinks"), F.asc("url_id")],
        per_host_k,
        salt=salt,
        salt_on="url_id",
    ).select("url_id", "host", "inlinks", "rk")
