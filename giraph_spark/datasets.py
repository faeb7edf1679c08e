"""Deterministic relational demo graph over the driver's TPC-H-ish tables.

The engine's native input is the web-page corpus (``corpus.py``); this
module additionally derives a deterministic edge table from the shared
``lineitem`` parquet so every graph operator has a DuckDB-checkable
oracle: the derivation is pure integer arithmetic (no engine-specific
hash functions), so Spark and any ANSI-SQL engine produce the identical
edge set.

Plays the role of the reference's pluggable edge-input formats
(``giraph-core/.../io/formats/IntNullTextEdgeInputFormat.java:36-46``):
an edge list from an external table, graph-prep'd (self-loop drop +
dedup, ``prepare_graph/PrepareGraphPieces.java:87-139``) before the
algorithms run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# vertex-id space of the demo graph; keeps density sane from sf0.001 to sf0.1
V_DEMO = 4096

# SQL fragment shared verbatim with the DuckDB oracles (__spark_entry__.py)
DEMO_EDGES_SQL = f"""
SELECT DISTINCT (l_orderkey % {V_DEMO}) AS src,
                ((l_partkey * 131 + l_suppkey * 7) % {V_DEMO}) AS dst
FROM lineitem
WHERE (l_orderkey % {V_DEMO}) <> ((l_partkey * 131 + l_suppkey * 7) % {V_DEMO})
""".strip()

# SCC oracle graph: the same 4096 vertices partitioned into 64 disjoint
# 64-vertex blocks with edges kept block-local, so a recursive-CTE
# transitive closure stays bounded (sum of 64^2 per block) while the
# Spark side still runs one 4096-vertex digraph end-to-end
SCC_BLOCK = 64

SCC_EDGES_SQL = f"""
SELECT DISTINCT src, (src - src % {SCC_BLOCK}) + dmod AS dst FROM (
  SELECT (l_orderkey % {V_DEMO}) AS src,
         ((l_partkey * 131 + l_suppkey * 7) % {SCC_BLOCK}) AS dmod
  FROM lineitem
) WHERE src <> (src - src % {SCC_BLOCK}) + dmod
""".strip()


def scc_demo_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-local digraph (matches SCC_EDGES_SQL verbatim)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    src = (F.col("l_orderkey") % V_DEMO).cast("long")
    dmod = ((F.col("l_partkey") * 131 + F.col("l_suppkey") * 7) % SCC_BLOCK).cast(
        "long"
    )
    dst = src - src % SCC_BLOCK + dmod
    return (
        li.select(src.alias("src"), dst.alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


# redirect-chain demo: a functional graph (one out-edge per src) with
# strictly decreasing targets, so chains of up to ~R/49 hops terminate at
# sinks — drives pointer_jump and its recursive-CTE oracle
R_DEMO = 6000

REDIRECT_EDGES_SQL = f"""
SELECT DISTINCT src::BIGINT AS src,
       greatest(src - (1 + src % 97), 0)::BIGINT AS dst FROM (
  SELECT (o_orderkey % {R_DEMO}) AS src FROM orders
) WHERE src > 0
""".strip()


def redirect_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional redirect map (matches REDIRECT_EDGES_SQL verbatim)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    src = (F.col("o_orderkey") % R_DEMO).cast("long")
    return (
        o.select(src.alias("src"))
        .where(F.col("src") > 0)
        .select(
            "src",
            F.greatest(
                F.col("src") - (F.lit(1) + F.col("src") % 97), F.lit(0)
            ).cast("long").alias("dst"),
        )
        .dropDuplicates(["src"])
    )


# messy-URL generator shared VERBATIM between Spark (F.expr) and the
# DuckDB oracle: mixed-case scheme/host, explicit default ports, tracking
# params, unsorted queries, trailing slashes, fragments — every case the
# canonicalizer must handle
MESSY_URL_EXPR = """
'HTTP://Site' || CAST(l_orderkey % 97 AS STRING) ||
CASE WHEN l_orderkey % 2 = 0 THEN '.Example.com' ELSE '.example.com' END ||
CASE WHEN l_orderkey % 3 = 0 THEN ':80' ELSE '' END ||
'/Path/' || CAST(l_partkey % 1000 AS STRING) ||
CASE l_suppkey % 4 WHEN 0 THEN '' WHEN 1 THEN '/'
     WHEN 2 THEN '?utm_source=feed&z=9&a=1'
     ELSE '?b=2&utm_campaign=x&a=1' END ||
CASE WHEN l_orderkey % 5 = 0 THEN '#Section-2' ELSE '' END
""".strip().replace("\n", " ")


MESSY_HOST_EXPR = """
CASE WHEN l_orderkey % 7 = 0 THEN 'WWW.' ELSE '' END ||
'h' || CAST(l_orderkey % 50 AS STRING) ||
CASE l_partkey % 5 WHEN 0 THEN '.Example.com'
     WHEN 1 THEN '.shop.example.CO.UK'
     WHEN 2 THEN '.example.org:8080'
     WHEN 3 THEN '.example.com.au'
     ELSE '.example.net' END
""".strip().replace("\n", " ")


def rmat_edges(
    spark: SparkSession,
    scale: int,
    n_edges: int,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic R-MAT / Kronecker power-law generator (Chakrabarti,
    Zhan & Faloutsos, SDM 2004 — the Graph500 edge distribution): each of
    ``n_edges`` indices walks ``scale`` recursion levels, picking one of
    four quadrants with probabilities (a, b, c, 1-a-b-c); the quadrant's
    (row, col) bits build the (src, dst) ids. Skewed a > b,c,d yields the
    hub-heavy web-like degree law the north rule's skew handling targets.

    Determinism + cross-engine replay: the per-(edge, level) draw is the
    portable 31-bit mix of ``algorithms.mis.luby_priority`` mod 10^4
    against integer thresholds (no floating point, no engine RNG), so an
    ANSI-SQL oracle regenerates every edge bit-identically.

    Scale shape: ``spark.range`` + 2·scale codegen'd integer
    expressions per row — zero shuffles until the final dedup; a 10^10
    -edge generate runs at scan speed on any executor count.
    """
    from giraph_spark.algorithms.mis import luby_priority

    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism * 2
    ta = int(round(a * 10_000))
    tb = int(round((a + b) * 10_000))
    tc = int(round((a + b + c) * 10_000))
    base = spark.range(0, n_edges, numPartitions=partitions).select(
        F.col("id").alias("i")
    )
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for lvl in range(scale):
        q = F.pmod(
            luby_priority(F.col("i") * F.lit(64) + F.lit(lvl), seed),
            F.lit(10_000),
        )
        sbit = F.when(q < tb, F.lit(0)).otherwise(F.lit(1)).cast("long")
        dbit = (
            F.when(q < ta, F.lit(0))
            .when(q < tb, F.lit(1))
            .when(q < tc, F.lit(0))
            .otherwise(F.lit(1))
            .cast("long")
        )
        src = src + F.shiftleft(sbit, lvl)
        dst = dst + F.shiftleft(dbit, lvl)
    return (
        base.select(src.alias("src"), dst.alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def rmat_sql(
    scale: int,
    n_edges: int,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
) -> str:
    """ANSI-SQL replay of :func:`rmat_edges` (same mix, same thresholds)."""
    from giraph_spark.algorithms.mis import luby_priority_sql

    ta = int(round(a * 10_000))
    tb = int(round((a + b) * 10_000))
    tc = int(round((a + b + c) * 10_000))
    qs = ", ".join(
        f"({luby_priority_sql(f'(i * 64 + {lvl})', seed)}) % 10000 AS q{lvl}"
        for lvl in range(scale)
    )
    src = " + ".join(
        f"(CASE WHEN q{lvl} < {tb} THEN 0 ELSE 1 END) * {1 << lvl}"
        for lvl in range(scale)
    )
    dst = " + ".join(
        f"(CASE WHEN q{lvl} < {ta} THEN 0 WHEN q{lvl} < {tb} THEN 1 "
        f"WHEN q{lvl} < {tc} THEN 0 ELSE 1 END) * {1 << lvl}"
        for lvl in range(scale)
    )
    return f"""SELECT DISTINCT src::BIGINT AS src, dst::BIGINT AS dst FROM (
  SELECT ({src}) AS src, ({dst}) AS dst FROM (
    SELECT i, {qs} FROM range(0, {n_edges}) t(i))
) WHERE src <> dst"""


# deterministic per-edge weight in [1, 3] — a pure function of (src, dst);
# the small range bounds the edge count of weighted shortest paths, which
# keeps the Bellman-Ford oracle's unroll depth small
WEIGHT_SQL = "CAST((src * 7 + dst * 13) % 3 + 1 AS DOUBLE)"


def demo_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduped, self-loop-free edge table (src: long, dst: long)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    src = (F.col("l_orderkey") % V_DEMO).cast("long").alias("src")
    dst = ((F.col("l_partkey") * 131 + F.col("l_suppkey") * 7) % V_DEMO).cast(
        "long"
    ).alias("dst")
    return (
        li.select(src, dst)
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def synthetic_edges(
    spark: SparkSession,
    n_vertices: int,
    avg_degree: int = 16,
    n_hubs: int = 10,
    hub_prob_1_in: int = 8,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Large-scale deterministic edge generator — pure JVM expressions.

    Same statistical shape as the corpus-derived link graph (uniform
    targets plus a mega-hub share for gather skew) but generated with
    ``spark.range`` + ``posexplode`` + ``xxhash64`` so a 10^8-edge input
    materializes in seconds: the scaling-protocol input when the
    Arrow-path corpus generator would dominate wall time. Mirrors the
    reference's PseudoRandomEdgeInputFormat
    (``io/formats/PseudoRandomEdgeInputFormat.java``, knobs
    ``PseudoRandomInputFormatConstants.java:26-35``).
    """
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism * 2
    base = spark.range(0, n_vertices, numPartitions=partitions).select(
        F.col("id").alias("src")
    )
    # per-source degree in [1, 2*avg_degree): deterministic hash
    deg = (
        F.pmod(F.xxhash64(F.col("src"), F.lit(seed), F.lit("deg")), F.lit(2 * avg_degree - 1))
        + 1
    )
    exploded = base.select(
        "src", F.posexplode(F.sequence(F.lit(1), deg)).alias("k", "_")
    ).drop("_")
    h = F.xxhash64(F.col("src"), F.col("k"), F.lit(seed))
    is_hub = F.pmod(h, F.lit(hub_prob_1_in)) == 0
    dst = F.when(is_hub, F.pmod(F.shiftrightunsigned(h, 8), F.lit(n_hubs))).otherwise(
        F.pmod(F.shiftrightunsigned(h, 8), F.lit(n_vertices))
    )
    return (
        exploded.select("src", dst.cast("long").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def with_weight(edges: DataFrame) -> DataFrame:
    """Attach the deterministic weight column (matches WEIGHT_SQL)."""
    return edges.withColumn(
        "weight", ((F.col("src") * 7 + F.col("dst") * 13) % 3 + 1).cast("double")
    )


# Bracha-Toueg demo wait-for graph: block-local request edges (8-vertex
# blocks bound the grant-chain depth, so the DuckDB oracle's fixpoint
# unroll stays small) plus a root initiator that requests every block
# head under a per-head tag — the N-out-of-M OR: the root is free iff
# ANY block head's subtree reduces.
DL_BLOCK = 8
DL_ROOT = V_DEMO  # 4096: one past the block vertex-id space

# Even blocks keep only forward edges (dmod > src mod block): an acyclic
# request DAG that fully reduces — grant chains up to DL_BLOCK hops deep
# exercise the fixpoint. Odd blocks keep every edge: dense wait cycles
# that stay deadlocked. The root is free iff ANY head frees (it does:
# every even head).
DEADLOCK_EDGES_SQL = f"""
SELECT src, dst, (src * 3 + dst * 5) % 2 AS tag FROM (
  SELECT DISTINCT src, (src - src % {DL_BLOCK}) + dmod AS dst FROM (
    SELECT (l_orderkey % {V_DEMO}) AS src,
           ((l_partkey * 31 + l_suppkey * 17) % {DL_BLOCK}) AS dmod
    FROM lineitem
  ) WHERE src <> (src - src % {DL_BLOCK}) + dmod
    AND ((src % {2 * DL_BLOCK} >= {DL_BLOCK}) OR dmod > (src % {DL_BLOCK}))
)
UNION ALL
SELECT {DL_ROOT} AS src, ({DL_BLOCK} * g) AS dst, ({DL_BLOCK} * g) AS tag
FROM range(0, {V_DEMO // DL_BLOCK}) t(g)
""".strip()


def deadlock_demo_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, tag) wait-for edges — matches DEADLOCK_EDGES_SQL verbatim."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    src = (F.col("l_orderkey") % V_DEMO).cast("long")
    dmod = ((F.col("l_partkey") * 31 + F.col("l_suppkey") * 17) % DL_BLOCK).cast("long")
    dst = src - src % DL_BLOCK + dmod
    base = (
        li.select(src.alias("src"), dst.alias("dst"), dmod.alias("dmod"))
        .where(
            (F.col("src") != F.col("dst"))
            & (
                (F.col("src") % (2 * DL_BLOCK) >= DL_BLOCK)
                | (F.col("dmod") > F.col("src") % DL_BLOCK)
            )
        )
        .dropDuplicates(["src", "dst"])
        .select("src", "dst", ((F.col("src") * 3 + F.col("dst") * 5) % 2).alias("tag"))
    )
    heads = spark.range(V_DEMO // DL_BLOCK).select(
        F.lit(DL_ROOT).cast("long").alias("src"),
        (F.col("id") * DL_BLOCK).cast("long").alias("dst"),
        (F.col("id") * DL_BLOCK).cast("long").alias("tag"),
    )
    return base.unionByName(heads)


def watts_strogatz_edges(
    spark: SparkSession,
    n_vertices: int,
    edges_per_vertex: int,
    beta: float,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic Watts-Strogatz small-world generator — ring lattice
    of ``edges_per_vertex`` forward neighbors per vertex, each edge
    re-wired to a uniform random target with probability ``beta``
    (reference: ``io/formats/WattsStrogatzVertexInputFormat.java:40-62``,
    knobs wattsStrogatz.{aggregateVertices,edgesPerVertex,beta,seed}).

    Deviations for determinism + cross-engine replay: the re-wire draw
    and target come from the portable 31-bit mix of
    ``algorithms.mis.luby_priority`` (the reference uses
    ``java.util.Random``), and a re-wire that lands on a self-loop or an
    existing pair is dropped rather than re-drawn (the reference retries
    against a per-vertex set). Same shape — high clustering, short
    paths — and an ANSI-SQL oracle can replay every edge exactly.

    Scale shape: pure ``spark.range`` + ``posexplode`` + integer
    expressions, no shuffle until the final dedup; a 10^9-edge lattice
    generates at scan speed.
    """
    from giraph_spark.algorithms.mis import luby_priority

    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism * 2
    e = int(edges_per_vertex)
    base = spark.range(0, n_vertices, numPartitions=partitions).select(
        F.col("id").alias("src")
    )
    ring = base.select(
        "src", F.posexplode(F.sequence(F.lit(1), F.lit(e))).alias("_", "j")
    ).drop("_")
    # two independent draws per (src, j): re-wire decision and new target
    key = F.col("src") * F.lit(2 * e + 2) + F.lit(2) * F.col("j")
    rewire = F.pmod(luby_priority(key, seed), F.lit(10_000)) < F.lit(
        int(round(beta * 10_000))
    )
    rand_dst = F.pmod(luby_priority(key + F.lit(1), seed), F.lit(n_vertices))
    lattice_dst = F.pmod(F.col("src") + F.col("j"), F.lit(n_vertices))
    return (
        ring.select(
            "src",
            F.when(rewire, rand_dst).otherwise(lattice_dst).cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
