"""Mid-run mutation + VertexResolver semantics
(giraph-core/.../graph/DefaultVertexResolver.java:48-70,
giraph-examples/src/test/.../TestMutateGraph.java,
giraph-block-app/src/test/.../MultipleSimultanousMutationsTest.java)."""

from __future__ import annotations

from pyspark.sql import functions as F

from giraph_spark.mutation import (
    GraphChanges,
    resolve_mutations,
    run_mutable_supersteps,
)


def _graph(spark):
    v = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, value double"
    )
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (2, 1)], "src long, dst long"
    )
    return v, e


def test_edge_removal_then_vertex_removal_order(spark):
    v, e = _graph(spark)
    ch = GraphChanges(
        remove_edges=spark.createDataFrame([(1, 2)], "src long, dst long"),
        remove_vertices=spark.createDataFrame([(2,)], "id long"),
    )
    nv, ne = resolve_mutations(v, e, ch)
    assert sorted(r.id for r in nv.collect()) == [1, 3]
    # (1,2) removed by request; (2,3) and (2,1) removed with vertex 2;
    # (3,1) survives — in-edges at OTHER vertices' lists are untouched
    assert sorted((r.src, r.dst) for r in ne.collect()) == [(3, 1)]


def test_message_creates_vertex_with_default(spark):
    v, e = _graph(spark)
    targets = spark.createDataFrame([(9,), (1,)], "id long")
    nv, _ = resolve_mutations(
        v, e, GraphChanges(), message_targets=targets, default_value={"value": 0.0}
    )
    rows = {r.id: r.value for r in nv.collect()}
    assert rows[9] == 0.0  # created by message
    assert rows[1] == 10.0  # existing untouched


def test_removed_vertex_revived_by_message_default_resolver(spark):
    v, e = _graph(spark)
    ch = GraphChanges(remove_vertices=spark.createDataFrame([(2,)], "id long"))
    targets = spark.createDataFrame([(2,)], "id long")
    nv, _ = resolve_mutations(
        v, e, ch, message_targets=targets, default_value={"value": -1.0}
    )
    rows = {r.id: r.value for r in nv.collect()}
    assert rows[2] == -1.0  # DefaultVertexResolver: recreated fresh


def test_removed_vertex_stays_removed_with_test_resolver(spark):
    v, e = _graph(spark)
    ch = GraphChanges(remove_vertices=spark.createDataFrame([(2,)], "id long"))
    targets = spark.createDataFrame([(2,)], "id long")
    nv, _ = resolve_mutations(
        v, e, ch, message_targets=targets, recreate_removed_on_message=False
    )
    assert sorted(r.id for r in nv.collect()) == [1, 3]


def test_add_vertex_existing_ignored_and_conflicts_resolved(spark):
    v, e = _graph(spark)
    ch = GraphChanges(
        add_vertices=spark.createDataFrame(
            [(1, 99.0), (7, 5.0), (7, 3.0)], "id long, value double"
        )
    )
    nv, _ = resolve_mutations(v, e, ch)
    rows = {r.id: r.value for r in nv.collect()}
    assert rows[1] == 10.0  # add for existing id ignored
    assert rows[7] == 3.0  # conflicting adds -> deterministic min


def test_add_edge_creates_source_vertex(spark):
    v, e = _graph(spark)
    ch = GraphChanges(
        add_edges=spark.createDataFrame([(8, 1)], "src long, dst long")
    )
    nv, ne = resolve_mutations(v, e, ch, default_value={"value": 0.0})
    assert 8 in {r.id for r in nv.collect()}
    assert (8, 1) in {(r.src, r.dst) for r in ne.collect()}


def test_simultaneous_mutations_one_round(spark):
    # MultipleSimultanousMutationsTest: edge removal + vertex removal +
    # edge addition in the SAME round resolve in the documented order
    v, e = _graph(spark)
    ch = GraphChanges(
        remove_edges=spark.createDataFrame([(3, 1)], "src long, dst long"),
        remove_vertices=spark.createDataFrame([(1,)], "id long"),
        add_edges=spark.createDataFrame([(1, 3)], "src long, dst long"),
    )
    nv, ne = resolve_mutations(v, e, ch, default_value={"value": 0.0})
    rows = {r.id: r.value for r in nv.collect()}
    # vertex 1 removed (old value gone) then recreated by its edge addition
    assert rows[1] == 0.0
    got = sorted((r.src, r.dst) for r in ne.collect())
    # (1,2) dropped with vertex 1; (3,1) dropped by request; (1,3) added
    assert got == [(1, 3), (2, 1), (2, 3)]


def test_mutable_superstep_loop_dynamic_bfs(spark):
    """Frontier BFS over a graph that GROWS mid-run: each superstep the
    frontier scatters hop+1 messages; message targets that don't exist
    yet are created by the resolver (message-creates-vertex mid-run)."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    verts = spark.createDataFrame([(0, 0)], "id long, hops long")

    def step(v, e, s):
        # gather min(hops+1) from settled vertices; update EXISTING rows
        # only (left join) — brand-new ids exist next superstep solely
        # because the resolver created them from the message targets
        known = v.where(F.col("hops").isNotNull()).select(
            F.col("id").alias("src"), "hops"
        )
        msgs = (
            e.join(known, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min(F.col("hops") + 1).alias("m"))
        )
        new_v = v.join(msgs, "id", "left").select(
            "id",
            F.least(
                F.coalesce("hops", "m"), F.coalesce("m", "hops")
            ).alias("hops"),
        )
        return new_v, {"n": new_v.count()}, None, msgs.select("id")

    run = run_mutable_supersteps(
        spark, verts, edges, step, max_supersteps=9,
        default_value={"hops": None},
    )
    rows = {r.id: r.hops for r in run.vertices.collect()}
    assert rows == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}


def test_coarsen_graph_reference_fixture(spark):
    """TestCoarseningUtils.testSmallGraph: 7 vertices (values all 1),
    clusters (0,1)->-1, (2,3)->-2, (4,5)->-4, 6->-6; symmetric edges."""
    from giraph_spark.graph import coarsen_graph

    und = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (3, 5), (4, 5)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    verts = spark.createDataFrame([(i, 1) for i in range(7)], "id long, value long")
    cl = {0: -1, 1: -1, 2: -2, 3: -2, 4: -4, 5: -4, 6: -6}
    mapping = spark.createDataFrame(list(cl.items()), "id long, cluster long")

    cv, ce = coarsen_graph(verts, edges, mapping)
    vals = {r.cluster: r.value for r in cv.collect()}
    assert vals == {-1: 2, -2: 2, -4: 2, -6: 1}
    em = {(r.src, r.dst): r.weight for r in ce.collect()}
    # self-loops from internal edges (both directions), combined values
    assert em[(-1, -1)] == 2 and em[(-2, -2)] == 2 and em[(-4, -4)] == 2
    assert em[(-1, -2)] == 2 and em[(-2, -1)] == 2
    assert em[(-2, -4)] == 2 and em[(-4, -2)] == 2
    assert (-6, -6) not in em  # isolated cluster: vertex exists, no edges
    assert len(em) == 7

    # drop self loops variant
    _, ce2 = coarsen_graph(verts, edges, mapping, keep_self_loops=False)
    assert all(r.src != r.dst for r in ce2.collect())


def test_mutating_step_that_reads_edges_two_supersteps(spark):
    """Regression: two consecutive edge-mutating supersteps whose step
    reads the edge table. The superseded edge cut must stay alive until
    the new vertex state materializes (release-before-materialize raced
    with 'checkpoint block not found')."""
    from giraph_spark.mutation import GraphChanges, run_mutable_supersteps

    v0 = spark.createDataFrame([(i, 0) for i in range(6)], "id long, val long")
    e0 = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "src long, dst long"
    )

    def step(v, e, superstep):
        # message-passing step: reads BOTH carried tables lazily
        deg = e.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("d"))
        nv = (
            v.join(deg, "id", "left")
            .select("id", (F.col("val") + F.coalesce("d", F.lit(0))).alias("val"))
        )
        # drop one edge per superstep -> the edge table mutates every round
        drop = e.limit(1).select("src", "dst")
        return nv, {}, GraphChanges(remove_edges=drop), None

    run = run_mutable_supersteps(spark, v0, e0, step, max_supersteps=3)
    assert run.supersteps == 3
    assert run.edges.count() == 3  # 6 edges - one per superstep
    assert run.vertices.count() == 6
