"""Bucketed persisted edge tables — the CSR-like adjacency persistence.

North-rule / SURVEY §1.1 mapping: the edge list is hash-partitioned by
``src`` into adjacency partitions persisted as a *bucketed* table, so an
algorithm run (and every superstep inside it) reads edges already
partitioned on the scatter key and reshuffles only the (much smaller)
vertex state. This replaces the per-run ``repartition(N, "src").persist()``
exchange that the in-memory path pays once per invocation.

Reference analog: partition-routed input loading —
``giraph-core/.../partition/HashPartitionerFactory.java:36-43`` (owner =
``hash(id) % partitions``) and
``giraph-core/.../worker/VertexInputSplitsCallable.java:243`` (input
splits routed to their owning worker at load time).

The north rule names Iceberg as the table format; this container has no
Iceberg runtime jar, so the same contract is implemented with Spark's
built-in bucketed parquet tables (``bucketBy`` + ``saveAsTable``), which
record the hash-partitioning in the catalog and let Catalyst elide the
edge-side Exchange in every ``src``-keyed join or aggregation. On a
cluster with an Iceberg catalog, ``write_bucketed_edges`` maps 1:1 onto
``CREATE TABLE ... PARTITIONED BY (bucket(N, src))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_LOCATION = "/tmp/giraph_spark_warehouse"


def write_bucketed_edges(
    edges: DataFrame,
    table: str,
    buckets: int,
    location: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``edges`` as a parquet table bucketed (and by default
    sorted) by ``src``.

    Sorting within buckets gives the CSR-like adjacency layout: each
    file holds a contiguous run of per-source neighbor lists, so a
    bucket-local scan streams whole adjacencies (and min/max row-group
    stats prune source ranges).
    """
    if location is None:
        location = DEFAULT_LOCATION
    w = (
        edges.write.mode(mode)
        .format("parquet")
        .option("path", f"{location}/{table}")
        .bucketBy(buckets, "src")
    )
    if sort:
        w = w.sortBy("src")
    w.saveAsTable(table)


def read_bucketed_edges(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed edge table; joins/aggregations keyed on ``src``
    need no edge-side Exchange (pass ``pre_partitioned=True`` to the
    algorithms to skip their defensive repartition)."""
    return spark.table(table)


def partition_edges(
    edges: DataFrame, num_partitions: int, strategy: str = "hash"
) -> DataFrame:
    """In-memory partitioner selection — the reference's pluggable
    partitioner factories:

    - ``hash``:  owner = hash(src) % partitions
      (``partition/HashPartitionerFactory.java:36-43``)
    - ``range``: contiguous src ranges per partition, sampled bounds
      (``partition/SimpleRangePartitionerFactory.java:38-76``; tested by
      ``partition/SimpleRangePartitionFactoryTest.java``)

    Hash is the default for link graphs (url-hash ids are uniform);
    range keeps adjacent ids co-located, which the reference uses when
    ids encode locality (e.g. crawl order) — same tradeoff here.
    """
    if strategy == "hash":
        return edges.repartition(num_partitions, "src")
    if strategy == "range":
        return edges.repartitionByRange(num_partitions, "src")
    raise ValueError(f"unknown partition strategy {strategy!r} (hash|range)")


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan (broadcast
    exchanges excluded — they move no partitioned data) — the plan-shape
    assertion used by tests and the bench harness."""
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    return sum(
        plan.count(f"Exchange {kind}")
        for kind in ("hashpartitioning", "rangepartitioning", "SinglePartition")
    )


def partition_quality(
    edges: DataFrame, num_partitions: int, assign=None
) -> DataFrame:
    """Edge-cut / balance metrics for a vertex→partition assignment —
    (partition, edges, cut_edges) per src-side partition, where a cut
    edge crosses partitions (its message travels the wire at cluster
    scale). The reference tracks the same balance signal to trigger
    partition rebalancing (``partition/PartitionBalancer.java``).

    ``assign`` maps an id Column to a partition id; the default is the
    portable modulo (pmod(id, P)) so an external SQL engine can replay
    the metric exactly — Spark's physical hash partitioning (Murmur3)
    gives the same *distribution* but is not ANSI-replayable.
    """
    p = num_partitions

    def _assign(c):
        return F.pmod(c, F.lit(p)) if assign is None else assign(c)

    x = edges.select(
        _assign(F.col("src")).alias("ps"), _assign(F.col("dst")).alias("pd")
    )
    return x.groupBy(F.col("ps").alias("partition")).agg(
        F.count(F.lit(1)).alias("edges"),
        F.sum(F.when(F.col("ps") != F.col("pd"), 1).otherwise(0))
        .cast("long")
        .alias("cut_edges"),
    )
