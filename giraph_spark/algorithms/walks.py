"""Deterministic random-walk sampling over the edge table.

The walk-corpus generator of an embedding pipeline (DeepWalk/node2vec
sampling stage): one walk starts at every vertex and advances
``length`` steps; at each step the next hop is chosen among the current
vertex's out-neighbors by a *portable integer hash* of
(current, step, neighbor, seed) — fully deterministic, reproducible
across engines (the same choice is expressible in ANSI SQL, which is
what the DuckDB oracle replays), and uniform-ish across neighbors.

Beyond-reference operator (SURVEY.md §2.8); the reference's closest
analog is the RandomWalk computation family
(``giraph-examples/.../RandomWalkComputation.java``), which iterates
probability mass rather than materializing walks.

Scale shape:

- the edge table is hash-partitioned by ``src`` once and cached; each
  step joins the (one-row-per-walk) frontier against it — only the
  frontier reshuffles;
- the argmin over a walk's candidate hops is ``groupBy(walk).agg(min(
  struct(priority, dst)))`` — an algebraic min, map-side combined, NOT
  a window sort (a window over every candidate would shuffle + sort the
  full candidate set; min(struct) keeps one pair per walk per map task);
- each step's frontier is cached so the final union of per-step rows
  materializes every step exactly once (at petabyte walk volume you
  would sink each step's rows instead of unioning — the loop is the
  same).

A walk that reaches a sink (no out-edges) simply ends — later steps
emit no row for it.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from giraph_spark.graph import dedup_edges, vertices_from_edges

_M = 2_147_483_647  # 2^31 - 1

#: portable priority: identical text is valid Spark SQL and DuckDB SQL,
#: and all intermediates stay < 2^63 (operands are wrapped into [0, M)
#: before the 31-bit multiplies; inner < M = 2^31-1 so inner² < 2^62).
#: The outer SQUARING round is what makes cur/step/seed actually change
#: the per-group ordering: inside one argmin group they are additive
#: constants, and any affine transform of an additive constant preserves
#: the ordering — x² mod M does not.
_INNER_SQL = (
    "(((((({cur}) % {m} + {m}) % {m}) * 2654435761) % {m}"
    " + (((({dst}) % {m} + {m}) % {m}) * 2246822519) % {m}"
    " + ({step}) * 40503 + ({seed}) * 97) % {m})"
)


def _priority(cur: str, dst: str, step: int, seed: int) -> str:
    inner = _INNER_SQL.format(cur=cur, dst=dst, step=step, seed=seed, m=_M)
    return f"({inner} * {inner} + {inner}) % {_M}"


def random_walks(
    spark: SparkSession,
    edges: DataFrame,
    length: int = 8,
    seed: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """One deterministic walk per vertex; returns (walk, step, vertex)
    rows with ``step`` in [0, length] and ``walk`` = the start vertex id.
    """
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        dedup_edges(edges.select("src", "dst"))
        .repartition(num_partitions, "src")
        .persist()
    )
    frontier = (
        vertices_from_edges(e)
        .select(F.col("id").alias("walk"), F.col("id").alias("cur"))
        .repartition(num_partitions, "walk")
        .persist()
    )
    steps = [
        frontier.select("walk", F.lit(0).cast("long").alias("step"),
                        F.col("cur").alias("vertex"))
    ]
    cached = [frontier]
    for t in range(1, length + 1):
        cand = frontier.join(e, frontier["cur"] == e["src"]).select(
            "walk",
            "dst",
            F.expr(_priority("cur", "dst", t, seed)).alias("p"),
        )
        # algebraic argmin with deterministic (p, dst) tie-break
        frontier = (
            cand.groupBy("walk")
            .agg(F.min(F.struct("p", "dst")).alias("best"))
            .select("walk", F.col("best.dst").alias("cur"))
            .persist()
        )
        cached.append(frontier)
        steps.append(
            frontier.select("walk", F.lit(t).cast("long").alias("step"),
                            F.col("cur").alias("vertex"))
        )
    out = reduce(DataFrame.unionByName, steps).coalesce(num_partitions)
    # materialize every cached step exactly once, then drop the edge cache
    out = out.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    e.unpersist()
    return out


def walks_sql(edges_cte: str, length: int, seed: int = 0) -> str:
    """ANSI-SQL twin of :func:`random_walks` (DuckDB-runnable): unrolled
    per-step CTEs choosing each hop by the same portable priority with
    ``row_number() ... ORDER BY p, dst`` (= min(struct(p, dst)))."""
    parts = [
        edges_cte,
        "verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges)",
        "w0 AS MATERIALIZED (SELECT id AS walk, id AS cur FROM verts)",
    ]
    for t in range(1, length + 1):
        prio = _priority("w.cur", "e.dst", t, seed)
        parts.append(
            f"""w{t} AS MATERIALIZED (
  SELECT walk, dst AS cur FROM (
    SELECT w.walk, e.dst,
           row_number() OVER (PARTITION BY w.walk ORDER BY {prio}, e.dst) AS rn
    FROM w{t - 1} w JOIN edges e ON e.src = w.cur
  ) WHERE rn = 1
)"""
        )
    selects = " UNION ALL ".join(
        f"SELECT walk, {t}::BIGINT AS step, cur AS vertex FROM w{t}"
        for t in range(length + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + selects


def sample_neighbors(
    edges: DataFrame,
    fanout: int,
    seed: int = 0,
    salt: int | None = None,
) -> DataFrame:
    """GraphSAGE-style neighbor sampling: for every src keep at most
    ``fanout`` out-neighbors, chosen by the portable deterministic hash
    (so resampling with the same seed is reproducible across runs,
    engines, and cluster sizes). Returns (src, dst) rows.

    Scale shape: the per-src top-k runs through the salted bounded-merge
    gather (``gather_topk_messages``) — a mega-hub's candidate list never
    lands on one reducer; pass ``salt`` on power-law graphs.
    """
    from giraph_spark.pregel import gather_topk_messages

    e = dedup_edges(edges.select("src", "dst"))
    msgs = e.select(
        "src",
        F.struct(
            F.expr(_priority("src", "dst", 0, seed)).alias("p"),
            F.col("dst").alias("dst"),
        ).alias("m"),
    )
    topk = gather_topk_messages(
        msgs, fanout, key="src", msg_col="m", ascending=True, salt=salt
    )
    return topk.select("src", F.explode(F.col("topk"))).select(
        "src", F.col("col.dst").alias("dst")
    )


def sample_neighbors_sql(edges_cte: str, fanout: int, seed: int = 0) -> str:
    """ANSI twin of :func:`sample_neighbors`."""
    prio = _priority("src", "dst", 0, seed)
    return f"""WITH {edges_cte},
r AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src ORDER BY {prio}, dst) AS rn
  FROM edges)
SELECT src, dst FROM r WHERE rn <= {fanout}"""


def node2vec_walks(
    spark: SparkSession,
    edges: DataFrame,
    length: int = 8,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Second-order (node2vec-style) biased walks, deterministic variant.

    node2vec (Grover & Leskovec, KDD 2016) samples the next hop d from
    cur with weight 1/p when d == prev (return), 1 when d is a neighbor
    of prev (BFS-like), 1/q otherwise (DFS-like). The deterministic
    analog here scores every candidate ``hash(cur, step, d, seed) ×
    class_penalty`` with integer penalties (1000·p, 1000, 1000·q) and
    takes the argmin — biased toward low-penalty classes in the same
    direction as the sampling weights, exactly reproducible, and
    replayable in ANSI SQL (``node2vec_sql``). With p = q = 1 the choice
    reduces to :func:`random_walks`'s uniform-hash pick.

    Scale shape: per step TWO joins against the cached edge table — the
    scatter (cur → candidates) and the prev-adjacency membership probe
    (a semi-join shaped left join on (prev, dst)) — then the same
    map-side-combined min(struct) argmin as random_walks. Second-order
    state is just one extra carried column (prev); no adjacency lists
    are ever collected.

    Returns (walk, step, vertex) rows; walks end at sinks.
    """
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cp, ck, cq = int(round(1000 * p)), 1000, int(round(1000 * q))
    e = (
        dedup_edges(edges.select("src", "dst"))
        .repartition(num_partitions, "src")
        .persist()
    )
    # membership probe table keyed by the wedge midpoint
    e_prev = e.select(
        F.col("src").alias("prev"), F.col("dst").alias("dst"),
        F.lit(True).alias("_is_d1"),
    ).repartition(num_partitions, "prev").persist()

    frontier = (
        vertices_from_edges(e)
        .select(
            F.col("id").alias("walk"),
            F.lit(None).cast("long").alias("prev"),
            F.col("id").alias("cur"),
        )
        .repartition(num_partitions, "walk")
        .persist()
    )
    steps = [
        frontier.select("walk", F.lit(0).cast("long").alias("step"),
                        F.col("cur").alias("vertex"))
    ]
    cached = [frontier]
    for t in range(1, length + 1):
        cand = frontier.join(e, frontier["cur"] == e["src"]).select(
            "walk", "prev", "cur", "dst",
            F.expr(_priority("cur", "dst", t, seed)).alias("h"),
        )
        cand = cand.join(e_prev, ["prev", "dst"], "left")
        penalty = (
            F.when(F.col("dst") == F.col("prev"), F.lit(cp))
            .when(F.col("_is_d1"), F.lit(ck))
            .otherwise(F.lit(cq))
        )
        # step 1 has no prev: all candidates are first hops (penalty 1 ==
        # uniform hash choice, matching random_walks)
        scored = cand.select(
            "walk", "cur", "dst",
            (F.col("h") * F.when(F.col("prev").isNull(), F.lit(1)).otherwise(penalty)
             ).alias("score"),
        )
        frontier = (
            scored.groupBy("walk")
            .agg(F.min(F.struct("score", "dst", "cur")).alias("best"))
            .select(
                "walk",
                F.col("best.cur").alias("prev"),
                F.col("best.dst").alias("cur"),
            )
            .persist()
        )
        cached.append(frontier)
        steps.append(
            frontier.select("walk", F.lit(t).cast("long").alias("step"),
                            F.col("cur").alias("vertex"))
        )
    out = reduce(DataFrame.unionByName, steps).coalesce(num_partitions)
    out = out.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    e_prev.unpersist()
    e.unpersist()
    return out


def node2vec_sql(
    edges_cte: str, length: int, p: float = 1.0, q: float = 1.0, seed: int = 0
) -> str:
    """ANSI twin of :func:`node2vec_walks`."""
    cp, ck, cq = int(round(1000 * p)), 1000, int(round(1000 * q))
    parts = [
        edges_cte,
        "verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges)",
        "w0 AS MATERIALIZED (SELECT id AS walk, NULL::BIGINT AS prev, id AS cur FROM verts)",
    ]
    for t in range(1, length + 1):
        prio = _priority("w.cur", "e.dst", t, seed)
        parts.append(
            f"""w{t} AS MATERIALIZED (
  SELECT walk, prev, cur FROM (
    SELECT w.walk, w.cur AS prev, e.dst AS cur,
           row_number() OVER (PARTITION BY w.walk ORDER BY
             ({prio}) * (CASE WHEN w.prev IS NULL THEN 1
                              WHEN e.dst = w.prev THEN {cp}
                              WHEN e2.dst IS NOT NULL THEN {ck}
                              ELSE {cq} END),
             e.dst) AS rn
    FROM w{t - 1} w
    JOIN edges e ON e.src = w.cur
    LEFT JOIN edges e2 ON e2.src = w.prev AND e2.dst = e.dst
  ) WHERE rn = 1
)"""
        )
    selects = " UNION ALL ".join(
        f"SELECT walk, {t}::BIGINT AS step, cur AS vertex FROM w{t}"
        for t in range(length + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + selects
