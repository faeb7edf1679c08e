"""Bucketed persisted edge tables: plan shape + correctness parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from giraph_spark.algorithms.pagerank import pagerank
from giraph_spark.algorithms.wcc import connected_components
from giraph_spark.datasets import synthetic_edges
from giraph_spark.graph import symmetrize
from giraph_spark.storage import (
    count_exchanges,
    read_bucketed_edges,
    write_bucketed_edges,
)


def test_bucketed_scan_elides_src_exchange(spark):
    edges = synthetic_edges(spark, 500, avg_degree=6)
    write_bucketed_edges(edges, "t_edges_b1", buckets=4)
    b = read_bucketed_edges(spark, "t_edges_b1")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        state = b.select(F.col("src").alias("id")).distinct().withColumn(
            "rank", F.lit(1.0)
        )
        scatter = b.join(state.withColumnRenamed("id", "src"), "src")
        # only the state side shuffles; the bucketed edge scan does not
        n_bucketed = count_exchanges(scatter)

        plain = edges.join(state.withColumnRenamed("id", "src"), "src")
        n_plain = count_exchanges(plain)
        assert n_bucketed < n_plain, (n_bucketed, n_plain)

        # groupBy on the bucket key is exchange-free too
        assert count_exchanges(b.groupBy("src").count()) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_pagerank_matches_plain(spark):
    edges = synthetic_edges(spark, 400, avg_degree=5).persist()
    write_bucketed_edges(edges, "t_edges_b2", buckets=4)
    b = read_bucketed_edges(spark, "t_edges_b2")

    plain = pagerank(spark, edges, max_supersteps=4, num_partitions=4)
    buck = pagerank(
        spark, b, max_supersteps=4, num_partitions=4, pre_partitioned=True
    )
    a = {r.id: round(r.rank, 9) for r in plain.vertices.collect()}
    c = {r.id: round(r.rank, 9) for r in buck.vertices.collect()}
    assert a == c
    edges.unpersist()


def test_bucketed_wcc_matches_plain(spark):
    edges = synthetic_edges(spark, 300, avg_degree=3).persist()
    sym = symmetrize(edges)
    write_bucketed_edges(sym, "t_edges_b3", buckets=4)
    b = read_bucketed_edges(spark, "t_edges_b3")

    plain = connected_components(spark, edges, num_partitions=4)
    buck = connected_components(spark, b, pre_partitioned=True)
    a = {r.id: r.component for r in plain.vertices.collect()}
    c = {r.id: r.component for r in buck.vertices.collect()}
    assert a == c
    edges.unpersist()


def test_partition_edges_strategies(spark):
    from giraph_spark.storage import partition_edges

    e = spark.createDataFrame(
        [(i % 40, (i * 7) % 40) for i in range(400)], "src long, dst long"
    )
    for strat in ("hash", "range"):
        p = partition_edges(e, 8, strategy=strat)
        assert p.rdd.getNumPartitions() == 8
        assert p.count() == 400
    # range: partitions hold contiguous, non-overlapping src ranges
    p = partition_edges(e, 8, strategy="range")
    bounds = p.rdd.mapPartitions(
        lambda it: [(lambda xs: (min(xs), max(xs)) if xs else None)([r.src for r in it])]
    ).collect()
    bounds = sorted(b for b in bounds if b is not None)
    for (lo1, hi1), (lo2, hi2) in zip(bounds, bounds[1:]):
        assert hi1 <= lo2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        partition_edges(e, 8, strategy="nope")


def test_partition_quality_metrics(spark):
    from giraph_spark.storage import partition_quality

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (8, 0), (9, 1), (4, 12)], "src long, dst long"
    )
    got = {r.partition: (r.edges, r.cut_edges)
           for r in partition_quality(edges, 4).collect()}
    # modulo-4 parts: cuts where src%4 != dst%4 — (8,0), (9,1), (4,12)
    # are partition-local, the 3-cycle edges all cross
    assert got == {0: (3, 1), 1: (2, 1), 2: (1, 1)}
    # a partition-aligned graph has zero cut
    aligned = spark.createDataFrame(
        [(0, 4), (4, 8), (1, 5), (2, 6)], "src long, dst long"
    )
    got2 = {r.partition: r.cut_edges for r in partition_quality(aligned, 4).collect()}
    assert got2 == {0: 0, 1: 0, 2: 0}
