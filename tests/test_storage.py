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


def test_mapping_partitioner_colocates_and_falls_back(spark):
    from giraph_spark.storage import partition_edges

    e = spark.createDataFrame(
        [(i % 20, (i * 7) % 20) for i in range(200)] + [(99, 3)],
        "src long, dst long",
    )
    # host-clustered placement: ids 0-4 -> p0, 5-9 -> p1, ... (99 unmapped)
    mapping = spark.range(20).select(
        F.col("id"), (F.col("id") / 5).cast("long").alias("partition")
    )
    p = partition_edges(e, 4, strategy="mapping", mapping=mapping,
                        broadcast_mapping=True)
    assert p.count() == 201
    assert sorted(p.columns) == ["dst", "src"]
    assert p.rdd.getNumPartitions() == 4
    # co-location contract: all srcs with the same mapped pid share ONE
    # spark partition (unmapped 99 falls back to pmod(99, 4) = 3)
    by_part = p.rdd.mapPartitions(
        lambda it: [sorted({r.src for r in it})]
    ).collect()
    pid_of = {i: i // 5 for i in range(20)}
    pid_of[99] = 99 % 4
    # each logical pid lives in exactly ONE spark partition (collisions may
    # merge two pids into the same slot — a balance blemish, never a split)
    home: dict[int, int] = {}
    for slot, srcs in enumerate(by_part):
        for s in srcs:
            pid = pid_of[s]
            assert home.setdefault(pid, slot) == slot, (pid, home[pid], slot)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        partition_edges(e, 4, strategy="mapping")  # mapping frame required


def test_snapshot_append_overwrite_time_travel(spark, tmp_path):
    from giraph_spark import storage

    loc = str(tmp_path / "wh")
    a = spark.range(10).select("id", (F.col("id") * 2).alias("v"))
    b = spark.range(10, 15).select("id", (F.col("id") * 2).alias("v"))
    assert storage.snapshot_write(a, loc, "t") == 1
    assert storage.snapshot_write(b, loc, "t", mode="append") == 2
    assert storage.snapshot_write(a.where("id < 3"), loc, "t", mode="overwrite") == 3
    assert storage.current_snapshot_id(loc, "t") == 3
    # time travel: every committed snapshot readable, current is default
    assert storage.snapshot_read(spark, loc, "t", 1).count() == 10
    assert storage.snapshot_read(spark, loc, "t", 2).count() == 15
    assert storage.snapshot_read(spark, loc, "t").count() == 3
    hist = storage.snapshot_history(loc, "t")
    assert [(h["snapshot_id"], h["operation"], h["parent_id"]) for h in hist] == [
        (1, "append", None),  # first commit keeps the caller's mode verbatim
        (2, "append", 1),
        (3, "overwrite", 2),
    ]


def test_snapshot_expire_keeps_shared_files(spark, tmp_path):
    from giraph_spark import storage

    loc = str(tmp_path / "wh")
    a = spark.range(10).select("id")
    storage.snapshot_write(a, loc, "t")
    storage.snapshot_write(spark.range(10, 12).select("id"), loc, "t", mode="append")
    assert storage.snapshot_expire(loc, "t", keep_last=1) == [1]
    # snapshot 2 (append) still references snapshot 1's data files — they
    # must survive the expire (snapshot isolation)
    assert storage.snapshot_read(spark, loc, "t", 2).count() == 12
    import pytest as _pytest

    with _pytest.raises(ValueError, match="expired or never committed"):
        storage.snapshot_read(spark, loc, "t", 1)
    with _pytest.raises(ValueError, match="no committed snapshot"):
        storage.snapshot_read(spark, loc, "missing")


def test_snapshot_read_is_plain_scan(spark, tmp_path):
    # the snapshot layer must not change the data path: reading a
    # snapshot is a plain multi-dir parquet scan (filter pushdown etc.
    # all apply); schema comes back intact
    from giraph_spark import storage

    loc = str(tmp_path / "wh")
    df = spark.range(100).select(
        "id", (F.col("id") % 7).alias("k"), F.lit("x").alias("s")
    )
    storage.snapshot_write(df, loc, "t")
    got = storage.snapshot_read(spark, loc, "t")
    # parquet round-trips drop non-nullability; names + types must hold
    assert [(f.name, f.dataType) for f in got.schema] == [
        (f.name, f.dataType) for f in df.schema
    ]
    assert got.where("k = 3").count() == df.where("k = 3").count()
    plan = got.where("k = 3")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull(k)" in plan


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


def test_snapshot_read_pruned_manifest_stats(spark, tmp_path):
    """Manifest column bounds skip non-intersecting data dirs; unknown
    bounds are conservatively scanned; empty prune returns a typed empty
    frame."""
    from giraph_spark import storage

    loc = str(tmp_path)
    a = spark.createDataFrame([(i, f"d{i}") for i in range(0, 10)], "id long, s string")
    b = spark.createDataFrame([(i, f"d{i}") for i in range(10, 20)], "id long, s string")
    c = spark.createDataFrame([(i, f"d{i}") for i in range(20, 30)], "id long, s string")
    for df in (a, b, c):
        storage.snapshot_write(df, loc, "t", mode="append")
    got, stats = storage.snapshot_read_pruned(spark, loc, "t", "id", 12, 18)
    assert stats == {"dirs_total": 3, "dirs_scanned": 1, "dirs_skipped": 2}
    assert sorted(r.id for r in got.collect()) == list(range(12, 19))
    # straddling range scans both touched dirs only
    got, stats = storage.snapshot_read_pruned(spark, loc, "t", "id", 5, 15)
    assert stats["dirs_scanned"] == 2
    assert got.count() == 11
    # disjoint range: zero dirs, empty frame with the table schema
    got, stats = storage.snapshot_read_pruned(spark, loc, "t", "id", 100, 200)
    assert stats["dirs_scanned"] == 0 and got.count() == 0
    assert [f.name for f in got.schema.fields] == ["id", "s"]
    # a column with no recorded bounds (e.g. dropped stats) scans everything
    import json, os
    mpath = storage._manifest_path(loc, "t", 3)
    m = json.load(open(mpath))
    m["dir_bounds"] = {d: {} for d in m["data_dirs"]}
    json.dump(m, open(mpath, "w"))
    got, stats = storage.snapshot_read_pruned(spark, loc, "t", "id", 12, 18)
    assert stats["dirs_scanned"] == 3
    assert sorted(r.id for r in got.collect()) == list(range(12, 19))
