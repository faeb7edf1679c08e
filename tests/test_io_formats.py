"""Text/adjacency/JSON formats + the golden WCC fixture of
giraph-examples ConnectedComponentsComputationTest.java:48-107."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from giraph_spark.algorithms.wcc import connected_components
from giraph_spark.io_formats import (
    read_adjacency,
    read_edge_list,
    read_json_vertices,
    write_graphviz,
    write_id_value_text,
)

# the toy graph of ConnectedComponentsComputationTest (3 components)
TOY_ADJACENCY = """1 2 3
2 1 4 5
3 1 4
4 2 3 5 13
5 2 4 12 13
12 5 13
13 4 5 12

6 7 8
7 6 10 11
8 6 10
10 7 8 11
11 7 10

9"""


@pytest.fixture()
def toy_path(tmp_path):
    p = tmp_path / "toy.txt"
    p.write_text(TOY_ADJACENCY + "\n")
    return str(p)


def test_read_edge_list(spark, tmp_path):
    p = tmp_path / "edges.txt"
    p.write_text("1\t2\n2 3\n\n3\t1\n")
    rows = sorted((r.src, r.dst) for r in read_edge_list(spark, str(p)).collect())
    assert rows == [(1, 2), (2, 3), (3, 1)]


def test_adjacency_golden_wcc(spark, toy_path):
    verts, edges = read_adjacency(spark, toy_path)
    assert sorted(r.id for r in verts.collect()) == [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13]
    run = connected_components(spark, edges, num_partitions=4)
    comp: dict[int, set[int]] = {}
    got = {r.id: r.component for r in run.vertices.collect()}
    # isolated vertex 9 has no edges, so add it like the reference's
    # vertex-input (edge-less vertices still exist)
    got.setdefault(9, 9)
    for v, c in got.items():
        comp.setdefault(c, set()).add(v)
    assert comp[1] == {1, 2, 3, 4, 5, 12, 13}
    assert comp[6] == {6, 7, 8, 10, 11}
    assert comp[9] == {9}
    assert len(comp) == 3


def test_adjacency_with_value_and_weights(spark, tmp_path):
    p = tmp_path / "adj.txt"
    p.write_text("1\t0.1\t2\t0.2\t3\t0.3\n2\t0.5\n")
    verts, edges = read_adjacency(spark, str(p), has_value=True, weighted=True)
    v = {r.id: r.value for r in verts.collect()}
    assert v == {1: 0.1, 2: 0.5}
    e = sorted((r.src, r.dst, r.weight) for r in edges.collect())
    assert e == [(1, 2, 0.2), (1, 3, 0.3)]


def test_read_json_vertices(spark, tmp_path):
    p = tmp_path / "verts.json"
    p.write_text('[1,4.3,[[2,2.1],[3,0.7]]]\n[2,1.0,[]]\n[3,-2.5e-1,[[1,0.5]]]\n')
    verts, edges = read_json_vertices(spark, str(p))
    v = {r.id: r.value for r in verts.collect()}
    assert v == {1: 4.3, 2: 1.0, 3: -0.25}
    e = sorted((r.src, r.dst, round(r.weight, 6)) for r in edges.collect())
    assert e == [(1, 2, 2.1), (1, 3, 0.7), (3, 1, 0.5)]


def test_write_id_value_text_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, 0.5), (2, 1.5)], "id long, value double")
    out = str(tmp_path / "out")
    write_id_value_text(df, out)
    lines = sorted(r.value for r in spark.read.text(out).collect())
    assert lines == ["1\t0.5", "2\t1.5"]
    write_id_value_text(df, out, reverse=True)
    lines = sorted(r.value for r in spark.read.text(out).collect())
    assert lines == ["0.5\t1", "1.5\t2"]


def test_write_graphviz(spark, tmp_path):
    verts = spark.createDataFrame([(1, 0.5), (2, 1.5)], "id long, value double")
    edges = spark.createDataFrame([(1, 2, 2.0)], "src long, dst long, w double")
    out = str(tmp_path / "dot")
    write_graphviz(verts, edges, out, value_col="value", weight_col="w")
    lines = [r.value for r in spark.read.text(out).collect()]
    assert lines[0] == "digraph g {" and lines[-1] == "}"
    assert '"1" [label="<id> 1|0.5",shape=record,fillcolor="blue:orange"];' in lines
    assert "1:id -> 2:id [label=2.0 ];" in lines


def test_input_filters_and_multi_input(spark, tmp_path):
    from pyspark.sql import functions as F

    from giraph_spark.io_formats import (
        apply_input_filters,
        read_edge_list,
        read_multi_edges,
    )

    p = tmp_path / "edges.txt"
    p.write_text("1 2\n2 3\n3 1\n9 9\n")
    parq = spark.createDataFrame(
        [(5, 6, 0.5), (6, 5, 1.5)], "src long, dst long, weight double"
    )
    pdir = str(tmp_path / "edges.parquet")
    parq.write.parquet(pdir)

    # filters AND together and drop at scan time
    filtered = apply_input_filters(
        read_edge_list(spark, str(p)), F.col("src") != F.col("dst"), F.col("src") < 3
    )
    assert sorted((r.src, r.dst) for r in filtered.collect()) == [(1, 2), (2, 3)]

    # multi-input: text + parquet, weight aligned by name, per-source filter
    union = read_multi_edges(
        spark,
        [
            lambda s: read_edge_list(s, str(p)),
            spark.read.parquet(pdir),
        ],
        edge_filter=F.col("src") != F.col("dst"),
    )
    rows = sorted(
        (r.src, r.dst, None if r.weight is None else round(r.weight, 3))
        for r in union.collect()
    )
    assert rows == [
        (1, 2, None),
        (2, 3, None),
        (3, 1, None),
        (5, 6, 0.5),
        (6, 5, 1.5),
    ]
    assert union.columns == ["src", "dst", "weight"]


def test_json_base64_roundtrip(spark, tmp_path):
    from giraph_spark.io_formats import (
        read_json_base64_vertices,
        write_json_base64_vertices,
    )

    verts = spark.range(6).select("id", (F.col("id") + 0.5).alias("value"))
    edges = spark.createDataFrame(
        [(0, 1, 2.0), (0, 2, 3.5), (1, 2, 1.0), (4, 0, 0.25)],
        "src long, dst long, weight double",
    )
    p = str(tmp_path / "b64")
    write_json_base64_vertices(verts, edges, p)
    # every line must actually be base64 (the format's whole point)
    import base64

    raw = [r.value for r in spark.read.text(p).collect() if r.value.strip()]
    for line in raw:
        decoded = base64.b64decode(line).decode()
        assert decoded.startswith("[") and decoded.endswith("]")
    v2, e2 = read_json_base64_vertices(spark, p)
    assert sorted((r.id, r.value) for r in v2.collect()) == [
        (i, i + 0.5) for i in range(6)
    ]
    assert sorted((r.src, r.dst, r.weight) for r in e2.collect()) == [
        (0, 1, 2.0), (0, 2, 3.5), (1, 2, 1.0), (4, 0, 0.25)
    ]


def test_sequence_file_roundtrip(spark, tmp_path):
    from giraph_spark.io_formats import (
        read_sequence_vertices,
        write_sequence_vertices,
    )

    verts = spark.range(20).select("id", (F.col("id") * 1.25).alias("value"))
    p = str(tmp_path / "seq")
    write_sequence_vertices(verts, p)
    back = read_sequence_vertices(spark, p)
    assert back.schema.simpleString() == "struct<id:bigint,value:double>"
    assert sorted((r.id, r.value) for r in back.collect()) == [
        (i, i * 1.25) for i in range(20)
    ]
