"""Louvain move phase: planted-structure recovery, determinism,
modularity improvement, multi-level expansion."""

from __future__ import annotations

from pyspark.sql import functions as F

from giraph_spark.algorithms.louvain import louvain_levels, louvain_move_phase
from giraph_spark.datasets import demo_edges
from giraph_spark.graph import clean_symmetric

SF = "/root/testdata/sf0.001"


def _clique(ids):
    return [(a, b) for a in ids for b in ids if a < b]


def _modularity(sym_edges, comm):
    m2 = sym_edges.count()
    e = sym_edges.join(
        comm.select(F.col("id").alias("src"), F.col("community").alias("cs")), "src"
    ).join(
        comm.select(F.col("id").alias("dst"), F.col("community").alias("cd")), "dst"
    )
    intra = e.where("cs = cd").count()
    dk = (
        sym_edges.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("k"))
        .join(comm, "id")
        .groupBy("community")
        .agg(F.sum("k").alias("dk"))
        .agg(F.sum(F.col("dk") * F.col("dk")))
        .collect()[0][0]
    )
    return intra / m2 - dk / (m2 * m2)


def test_louvain_recovers_planted_cliques(spark):
    edges = spark.createDataFrame(
        _clique([1, 2, 3, 4]) + _clique([10, 11, 12, 13]) + [(4, 10)],
        ["src", "dst"],
    )
    got = {r["id"]: r["community"] for r in louvain_move_phase(spark, edges).collect()}
    assert len({got[1], got[2], got[3], got[4]}) == 1
    assert len({got[10], got[11], got[12], got[13]}) == 1
    assert got[1] != got[10]


def test_louvain_deterministic_and_improves_modularity(spark):
    edges = demo_edges(spark, SF)
    a = sorted(
        (r["id"], r["community"])
        for r in louvain_move_phase(spark, edges, rounds=4).collect()
    )
    b = sorted(
        (r["id"], r["community"])
        for r in louvain_move_phase(spark, edges, rounds=4).collect()
    )
    assert a == b
    sym = clean_symmetric(edges).persist()
    comm = louvain_move_phase(spark, edges, rounds=4)
    q = _modularity(sym, comm)
    # singleton partition has Q = -sum(k^2)/(2m)^2 < 0; any grouping the
    # move phase accepts must beat it
    singleton = sym.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("community")
    )
    q0 = _modularity(sym, singleton)
    assert q > q0
    assert q > 0  # found real community structure
    sym.unpersist()


def test_louvain_levels_keeps_isolated_supervertices(spark):
    # two cliques with NO bridge: level-2 contraction leaves zero edges,
    # the mapping must still cover every vertex
    edges = spark.createDataFrame(
        _clique([1, 2, 3]) + _clique([7, 8, 9]), ["src", "dst"]
    )
    got = {r["id"]: r["community"] for r in louvain_levels(spark, edges, levels=2).collect()}
    assert set(got) == {1, 2, 3, 7, 8, 9}
    assert len({got[1], got[2], got[3]}) == 1
    assert len({got[7], got[8], got[9]}) == 1
    assert got[1] != got[7]


def test_weighted_louvain_weight_dominates(spark):
    # two triangles bridged by a HEAVY edge vs light internal ties:
    # with unit weights the triangles are separate communities; crank
    # the bridge weight high enough and the bridged pair merges
    tri = _clique([1, 2, 3]) + _clique([10, 11, 12])
    light = [(s, d, 1) for s, d in tri]
    heavy_bridge = light + [(3, 10, 50)]
    edges = spark.createDataFrame(heavy_bridge, ["src", "dst", "w"])
    got = {
        r["id"]: r["community"]
        for r in louvain_move_phase(spark, edges, weight_col="w").collect()
    }
    assert got[3] == got[10]  # the heavy edge pulls the pair together
    unit = spark.createDataFrame(tri + [(3, 10)], ["src", "dst"])
    got_u = {
        r["id"]: r["community"] for r in louvain_move_phase(spark, unit).collect()
    }
    assert got_u[3] != got_u[10]  # unit-weight bridge does not


def test_degree_histogram_oracle(spark):
    from giraph_spark.graph import degree_histogram

    # out-degrees: 1->{2,3,4} (3), 2->{3} (1); in-degrees: 2:1, 3:2, 4:1
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3)], ["src", "dst"]
    )
    got = {
        (r["kind"], r["bucket"]): (r["n_vertices"], r["min_degree"], r["max_degree"])
        for r in degree_histogram(edges).collect()
    }
    assert got[("out", 1)] == (1, 3, 3)  # deg 3 -> bucket 1
    assert got[("out", 0)] == (1, 1, 1)
    assert got[("in", 0)] == (2, 1, 1)
    assert got[("in", 1)] == (1, 2, 2)
