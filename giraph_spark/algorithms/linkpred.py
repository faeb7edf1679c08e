"""Link prediction scores over the symmetric graph.

Beyond-reference operators (SURVEY.md §2.8): common-neighbor counting
and Adamic-Adar — the standard similarity features a link-graph serves
to ranking / recommendation / graph-ML training pipelines.

Scale shape: candidate pairs are enumerated by a wedge join pivoting on
the COMMON neighbor z, whose fan-out is deg(z)² — the same super-node
blow-up every all-pairs neighborhood op has. ``max_degree`` caps the
pivot degree (the standard mitigation; statistically benign for
Adamic-Adar because a mega-hub's contribution 1/ln(deg) is already
negligible — dropping it changes scores by O(1/ln(cap)) only for pairs
whose ONLY witness is the hub). With the cap, per-pivot fan-out is
bounded by cap², and the groupBy is map-side combined. At 100 TB, pick
``max_degree`` so cap² × |V(deg≤cap)| fits the shuffle budget; the
skipped super-node pivots are exactly enumerable (count is logged by
the caller if needed via ``skipped_pivots``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from giraph_spark.graph import clean_symmetric


def _adj_with_degree(edges: DataFrame) -> DataFrame:
    sym = clean_symmetric(edges)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    return sym.join(deg, "src").select(
        F.col("src").alias("z"), F.col("dst").alias("nbr"), "deg"
    )


def adamic_adar(
    edges: DataFrame,
    max_degree: int | None = None,
    include_existing: bool = False,
) -> DataFrame:
    """(u, v, common_neighbors, aa) for every unordered pair u<v sharing
    ≥1 common neighbor (of degree ≤ ``max_degree`` when set);
    ``aa = Σ_z 1/ln(deg(z))``. Pairs already linked are dropped unless
    ``include_existing`` (link prediction scores candidate edges)."""
    adj = _adj_with_degree(edges)
    if max_degree is not None:
        adj = adj.where(F.col("deg") <= max_degree)
    # wedges need deg(z) >= 2, so ln(deg) > 0
    a, b = adj.alias("a"), adj.alias("b")
    pairs = a.join(
        b,
        (F.col("a.z") == F.col("b.z")) & (F.col("a.nbr") < F.col("b.nbr")),
    ).select(
        F.col("a.nbr").alias("u"),
        F.col("b.nbr").alias("v"),
        (F.lit(1.0) / F.log(F.col("a.deg").cast("double"))).alias("w"),
    )
    scores = pairs.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.sum("w").alias("aa"),
    )
    if not include_existing:
        sym = clean_symmetric(edges)
        scores = scores.join(
            sym.select(F.col("src").alias("u"), F.col("dst").alias("v")),
            ["u", "v"],
            "left_anti",
        )
    return scores


def skipped_pivots(edges: DataFrame, max_degree: int) -> DataFrame:
    """The super-node pivots a capped run excluded — (z, deg) rows; log
    or audit these so the cap is a disclosed drop, not a silent one."""
    sym = clean_symmetric(edges)
    return (
        sym.groupBy(F.col("src").alias("z"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .where(F.col("deg") > max_degree)
    )


def neighborhood_mean(
    edges: DataFrame,
    features: DataFrame,
    hops: int = 2,
    id_col: str = "id",
    feature_col: str = "f",
) -> DataFrame:
    """GNN-style mean aggregation: h0 = feature, h_{k+1}(v) = mean of
    h_k over v's in-neighbors (null when v has none) — the message-
    passing layer a GraphSAGE/GCN training pipeline materializes per
    epoch. Returns (id, h1, ..., h<hops>).

    Scale shape: per hop ONE scatter join (edges × current layer, edge
    side static) and one map-side-combined avg gather — identical plan
    to a PageRank superstep, so the bucketed-edge-table path applies
    unchanged.
    """
    e = edges.select("src", "dst")
    out = features.select(F.col(id_col).alias("id"), F.col(feature_col).alias("h0"))
    for k in range(1, hops + 1):
        prev = f"h{k - 1}"
        msgs = e.join(
            out.select(F.col("id").alias("src"), F.col(prev).alias("m")), "src"
        )
        agg = msgs.groupBy(F.col("dst").alias("id")).agg(F.avg("m").alias(f"h{k}"))
        out = out.join(agg, "id", "left")
    return out.drop("h0")


def neighborhood_jaccard(
    edges: DataFrame,
    max_degree: int | None = None,
    include_existing: bool = False,
) -> DataFrame:
    """Vertex-similarity link prediction: Jaccard of neighborhoods.

    (u, v, common_neighbors, jaccard) for every unordered pair u<v with
    ≥1 common neighbor, ``jaccard = |N(u)∩N(v)| / |N(u)∪N(v)|`` with
    ``|union| = deg(u) + deg(v) - common`` (degrees over the FULL
    symmetric graph, so the score is exact even when ``max_degree``
    caps which pivots may WITNESS a pair).

    Same wedge-join scale shape as :func:`adamic_adar` (fan-out bounded
    by cap² per pivot); the two degree lookups are joins against the
    small (|V|-row) degree table — broadcastable at any corpus scale
    where |V| ≪ |E|.
    """
    sym = clean_symmetric(edges)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    adj = sym.join(deg, "src").select(
        F.col("src").alias("z"), F.col("dst").alias("nbr"), "deg"
    )
    if max_degree is not None:
        adj = adj.where(F.col("deg") <= max_degree)
    a, b = adj.alias("a"), adj.alias("b")
    pairs = a.join(
        b,
        (F.col("a.z") == F.col("b.z")) & (F.col("a.nbr") < F.col("b.nbr")),
    ).select(F.col("a.nbr").alias("u"), F.col("b.nbr").alias("v"))
    common = pairs.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("common_neighbors")
    )
    du = deg.select(F.col("src").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("src").alias("v"), F.col("deg").alias("deg_v"))
    scored = (
        common.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "common_neighbors",
            (
                F.col("common_neighbors").cast("double")
                / (F.col("deg_u") + F.col("deg_v") - F.col("common_neighbors"))
            ).alias("jaccard"),
        )
    )
    if not include_existing:
        scored = scored.join(
            sym.select(F.col("src").alias("u"), F.col("dst").alias("v")),
            ["u", "v"],
            "left_anti",
        )
    return scored


def _directed_pairs(
    edges: DataFrame,
    pivot: str,
    item: str,
    max_pivot_degree: int | None,
    min_count: int,
) -> DataFrame:
    """Shared body of co-citation / bibliographic coupling: distinct
    directed edges, pivot-degree cap, wedge self-join on the pivot, and
    the (a < b) canonical pair aggregation."""
    e = edges.select("src", "dst").dropDuplicates(["src", "dst"])
    if max_pivot_degree is not None:
        pd = e.groupBy(pivot).agg(F.count(F.lit(1)).alias("_pd"))
        e = (
            e.join(pd.where(F.col("_pd") <= max_pivot_degree), pivot)
            .drop("_pd")
        )
    left = e.select(F.col(pivot).alias("p"), F.col(item).alias("a"))
    right = e.select(F.col(pivot).alias("p"), F.col(item).alias("b"))
    pairs = left.join(right, "p").where(F.col("a") < F.col("b"))
    return (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= min_count)
    )


def cocitation(
    edges: DataFrame,
    min_count: int = 2,
    max_out_degree: int | None = 256,
) -> DataFrame:
    """Co-citation similarity: (a, b, n_common) where ``n_common`` =
    number of pages that link to BOTH a and b (a < b).

    The classic citation-graph sibling of bibliographic coupling
    (Small 1973); on a web graph, pages co-cited by many sources are
    topically related — a standard related-page / recommendation
    feature the reference's Pregel model would compute with a
    neighbor-list broadcast.

    Scale shape: fan-out is out_deg(src)² per linking page, so the
    pivot is capped at ``max_out_degree`` (a directory page linking to
    50k URLs asserts almost nothing about any pair; the cap is the
    same posting-list bound as ``dedup.jaccard_pairs`` ``max_df``).
    With the cap, the wedge join is bounded by cap² rows per pivot and
    the pair count is map-side combined. Pass ``None`` to disable
    (exact, but quadratic in hub out-degree).
    """
    return _directed_pairs(edges, "src", "dst", max_out_degree, min_count)


def bibliographic_coupling(
    edges: DataFrame,
    min_count: int = 2,
    max_in_degree: int | None = 256,
) -> DataFrame:
    """Bibliographic coupling: (a, b, n_common) where ``n_common`` =
    number of pages that BOTH a and b link to (a < b) — the out-link
    mirror of :func:`cocitation` (Kessler 1963). The pivot here is the
    shared *target*, so the cap bounds in-degree (a page cited by 50k
    sources couples every pair of them)."""
    return _directed_pairs(edges, "dst", "src", max_in_degree, min_count)


def two_hop_counts(
    edges: DataFrame,
    max_degree: int | None = None,
) -> DataFrame:
    """Per-vertex 2-hop neighborhood size over the symmetric graph:
    (id, n1, n2) with n1 = direct neighbors and n2 = distinct vertices
    at distance EXACTLY 2 (neither self nor a direct neighbor). The
    friends-of-friends reach feature (audience estimation, influence
    features for ranking models).

    Same wedge-join bound as :func:`adamic_adar`: the 2-hop candidates
    are enumerated by pivoting on the middle vertex z with fan-out
    deg(z)^2, capped by ``max_degree`` on the PIVOT degree (a mega-hub
    middleman is dropped — at web scale a hub makes everything
    2-reachable, so the capped count is the useful signal; the dropped
    pivots are exactly :func:`skipped_pivots`). Distinct-ification and
    both counts are map-side-combined groupBys.
    """
    adj = _adj_with_degree(edges)
    sym = adj.select(F.col("z").alias("src"), F.col("nbr").alias("dst"))
    piv = adj if max_degree is None else adj.where(F.col("deg") <= max_degree)
    n1 = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("n1")
    )
    a = piv.select("z", F.col("nbr").alias("u"))
    b = piv.select("z", F.col("nbr").alias("v"))
    cand = (
        a.join(b, "z")
        .where(F.col("u") != F.col("v"))
        .select(F.col("u").alias("id"), F.col("v").alias("w"))
        .distinct()
        .join(
            sym.select(F.col("src").alias("id"), F.col("dst").alias("w")),
            ["id", "w"],
            "left_anti",
        )
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n2"))
    )
    return (
        n1.join(cand, "id", "left")
        .select("id", "n1", F.coalesce("n2", F.lit(0)).alias("n2"))
    )
