"""Coverage for the previously implemented-but-untested surface:
graph-prep variants, overwrite/append reducers, If/Filtering blocks,
and the sendMessageToMultipleEdges scatter."""

from __future__ import annotations

from pyspark.sql import functions as F

from giraph_spark.blocks import (
    filtering,
    for_all_vertices,
    if_block,
    run_block,
    sequence,
)
from giraph_spark.graph import (
    is_symmetric,
    remove_standalone_vertices,
    symmetrize,
    symmetrize_weighted,
)
from giraph_spark.pregel import gather_messages, scatter_messages
from giraph_spark.reducers import reducer


def test_symmetrize_weighted_keeps_max(spark):
    e = spark.createDataFrame(
        [(1, 2, 5.0), (2, 1, 9.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    got = {(r.src, r.dst): r.weight for r in symmetrize_weighted(e).collect()}
    # symmetric closure, max weight per direction pair
    assert got == {(1, 2): 9.0, (2, 1): 9.0, (2, 3): 1.0, (3, 2): 1.0}


def test_remove_standalone_vertices(spark):
    v = spark.createDataFrame([(i,) for i in range(5)], "id long")
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    kept = sorted(r.id for r in remove_standalone_vertices(v, e).collect())
    assert kept == [0, 1, 2]


def test_is_symmetric(spark):
    asym = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    assert not is_symmetric(asym)
    assert is_symmetric(symmetrize(asym))


def test_overwrite_and_append_reducers(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    row = df.agg(
        reducer("overwrite", "k").alias("ow"),
        reducer("append", "s").alias("ap"),
    ).collect()[0]
    assert row["ow"] == 1 and row["ap"] == "a"
    multi = spark.createDataFrame([(1, "x"), (1, "y")], "k long, s string")
    row = multi.agg(reducer("append", "s").alias("ap")).collect()[0]
    assert sorted(row["ap"]) == ["x", "y"]  # concat of both, any order


def test_if_block_branches(spark):
    v0 = spark.createDataFrame([(1, 0)], "id long, x long")
    inc = for_all_vertices(lambda df: df.withColumn("x", F.col("x") + 1))
    dec = for_all_vertices(lambda df: df.withColumn("x", F.col("x") - 1))
    run = run_block(spark, v0, sequence(if_block(lambda: True, inc, dec)))
    assert run.vertices.collect()[0].x == 1
    run = run_block(spark, v0, sequence(if_block(lambda: False, inc, dec)))
    assert run.vertices.collect()[0].x == -1
    run = run_block(spark, v0, sequence(if_block(lambda: False, inc)))
    assert run.vertices.collect()[0].x == 0  # no else -> pass-through


def test_filtering_block(spark):
    v0 = spark.createDataFrame([(i, 0) for i in range(6)], "id long, x long")
    inc = for_all_vertices(lambda df: df.withColumn("x", F.col("x") + 10))
    run = run_block(spark, v0, filtering(F.col("id") < 3, inc))
    got = {r.id: r.x for r in run.vertices.collect()}
    assert got == {0: 10, 1: 10, 2: 10, 3: 0, 4: 0, 5: 0}


def test_scatter_to_multiple_edges(spark):
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (1, 3, 9.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    verts = spark.createDataFrame(
        [(1, 5.0), (2, 7.0), (3, None)], "id long, value double"
    )
    # sendMessageToMultipleEdges: only along heavy edges
    msgs = scatter_messages(edges, verts, F.col("value"), F.col("weight") > 2.0)
    assert [(r.dst, r.msg) for r in msgs.collect()] == [(3, 5.0)]
    # sendMessageToAllEdges + null supplier sends nothing (vertex 3)
    all_msgs = scatter_messages(edges, verts, F.col("value"))
    got = sorted((r.dst, r.msg) for r in all_msgs.collect())
    assert got == [(2, 5.0), (3, 5.0), (3, 7.0)]
    gathered = {
        r.dst: r.msg
        for r in gather_messages(all_msgs, [("msg", "sum")], key="dst").collect()
    }
    assert gathered == {2: 5.0, 3: 12.0}


def test_gather_topk_messages_salted_equivalent(spark):
    import random

    from giraph_spark.pregel import gather_topk_messages

    rng = random.Random(3)
    rows = [(rng.randrange(5), float(rng.randrange(100))) for _ in range(400)]
    msgs = spark.createDataFrame(rows, "dst long, msg double")
    plain = {r.dst: list(r.topk) for r in gather_topk_messages(msgs, 4).collect()}
    salted = {
        r.dst: list(r.topk)
        for r in gather_topk_messages(msgs, 4, salt=8).collect()
    }
    assert plain == salted
    # oracle
    want: dict[int, list[float]] = {}
    for d, m in rows:
        want.setdefault(d, []).append(m)
    want = {d: sorted(v, reverse=True)[:4] for d, v in want.items()}
    assert plain == want
    asc = {r.dst: list(r.topk) for r in gather_topk_messages(msgs, 4, ascending=True, salt=4).collect()}
    assert asc == {d: sorted(v)[:4] for d, v in {k: [m for dd, m in rows if dd == k] for k in want}.items()}


def test_gather_topk_messages_salted_composite_key(spark):
    # Regression: salted branch used the raw (possibly list) key in
    # groupBy instead of the normalized *keys — composite keys + salt
    # raised; unsalted worked. Both paths must agree.
    import random

    from giraph_spark.pregel import gather_topk_messages

    rng = random.Random(7)
    rows = [
        (rng.randrange(3), rng.randrange(2), float(rng.randrange(50)))
        for _ in range(300)
    ]
    msgs = spark.createDataFrame(rows, "dst long, part long, msg double")
    plain = {
        (r.dst, r.part): list(r.topk)
        for r in gather_topk_messages(msgs, 3, key=["dst", "part"]).collect()
    }
    salted = {
        (r.dst, r.part): list(r.topk)
        for r in gather_topk_messages(
            msgs, 3, key=["dst", "part"], salt=4
        ).collect()
    }
    assert plain == salted
    want: dict[tuple[int, int], list[float]] = {}
    for d, p, m in rows:
        want.setdefault((d, p), []).append(m)
    assert plain == {k: sorted(v, reverse=True)[:3] for k, v in want.items()}


def test_striped_block_covers_all_vertices_once(spark):
    """StripingUtils.java:66-137 — every vertex is in exactly one stripe,
    so a striped increment touches each vertex exactly once, in
    `stripes` sequential pieces."""
    from giraph_spark.blocks import striped

    v0 = spark.createDataFrame([(i, 0) for i in range(32)], "id long, x long")
    inc = for_all_vertices(lambda df: df.withColumn("x", F.col("x") + 1))
    blk = striped(4, lambda pred: filtering(pred, inc))
    run = run_block(spark, v0, blk)
    rows = run.vertices.collect()
    assert len(rows) == 32 and all(r.x == 1 for r in rows)
    assert run.supersteps == 5  # 4 stripe pieces + end-detection


def test_engine_side_round_is_half_away_not_bankers(spark):
    """Regression pin for the ADVICE rounding class (q_graph_summary /
    q_lsh_eval): ratios reported by entry queries must round HALF_UP
    (F.round, matching DuckDB's half-away-from-zero) — Python round()
    is banker's and diverges exactly on .5e-6 boundaries. Pin one:
    round(0.0000015, 6): HALF_UP -> 0.000002, banker's -> 0.000002;
    round(0.0000025, 6): HALF_UP -> 0.000003, banker's -> 0.000002."""
    import duckdb

    # 0.0000025 is NOT exactly representable in binary; use a ratio that
    # lands exactly on the boundary in decimal: 1/400000 = 0.0000025
    row = (
        spark.createDataFrame([(1, 400000)], "num long, den long")
        .select(F.round(F.col("num") / F.col("den"), 6).alias("r"))
        .collect()[0]
    )
    duck = duckdb.sql("SELECT round(1 / 400000.0, 6) AS r").fetchone()[0]
    assert row.r == duck  # Spark HALF_UP == DuckDB half-away
    assert row.r != round(1 / 400000, 6) or duck == round(1 / 400000, 6)
    # the entry queries must agree with the oracle engine on the boundary
    assert abs(row.r - 3e-6) < 1e-12


def test_trussness_oracle_forms_agree():
    """The memory-bounded delta-form trussness oracle must produce the
    exact rows of the independent recount-form chain (same DuckDB
    engine, same measured unroll bounds) — the guarantee that lets
    oracle_sql() switch forms by unroll depth without weakening the
    gate."""
    import duckdb

    import __spark_entry__ as E

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/lineitem.parquet')"
    )
    bounds = dict(E._truss_bounds("/root/testdata/sf0.001"))
    a = con.execute(E._trussness_sql(bounds)).fetchdf()
    d = con.execute(E._trussness_delta_sql(bounds)).fetchdf()
    key = ["u", "v"]
    a = a.sort_values(key).reset_index(drop=True)
    d = d.sort_values(key).reset_index(drop=True)
    assert len(a) == len(d) > 0
    assert a.equals(d)
