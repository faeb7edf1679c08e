"""spark-submit CLI entry (giraph_spark/main.py) — end-to-end on tiny graphs."""

from __future__ import annotations

import json

from giraph_spark.main import main


def test_cli_pagerank_roundtrip(spark, tmp_path, capsys):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    ep = str(tmp_path / "edges.parquet")
    out = str(tmp_path / "ranks")
    metrics = str(tmp_path / "metrics.json")
    edges.write.parquet(ep)
    rc = main([
        "pagerank", "--edges", ep, "--output", out,
        "--max-supersteps", "100", "--tolerance", "1e-4",
        "--metrics-out", metrics, "--num-partitions", "4",
    ])
    assert rc == 0
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["algorithm"] == "pagerank" and printed["converged"]
    ranks = {r.id: r.rank for r in spark.read.parquet(out).collect()}
    assert set(ranks) == {1, 2, 3, 4}
    assert abs(sum(ranks.values()) - 4.0) < 1e-6  # mass conserved at N
    with open(metrics) as f:
        m = json.load(f)
    assert m["supersteps"] == printed["supersteps"]
    assert len(m["history"]) == m["supersteps"]


def test_cli_wcc_and_bfs(spark, tmp_path, capsys):
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4), (4, 3)], "src long, dst long"
    )
    ep = str(tmp_path / "e.parquet")
    edges.write.parquet(ep)

    out = str(tmp_path / "wcc")
    assert main(["wcc", "--edges", ep, "--output", out,
                 "--num-partitions", "4"]) == 0
    comp = {r.id: r.component for r in spark.read.parquet(out).collect()}
    assert comp == {1: 1, 2: 1, 3: 3, 4: 3}

    out2 = str(tmp_path / "bfs")
    assert main(["bfs", "--edges", ep, "--output", out2, "--source", "1",
                 "--num-partitions", "4"]) == 0
    hops = {r.id: r.hops for r in spark.read.parquet(out2).collect()}
    assert hops == {1: 0, 2: 1, 3: -1, 4: -1}


def test_cli_extract_edges(spark, tmp_path, capsys):
    from giraph_spark.corpus import synth_corpus

    pages = str(tmp_path / "pages.parquet")
    synth_corpus(spark, 100, seed=42).write.parquet(pages)
    out = str(tmp_path / "edges_out")
    assert main(["extract-edges", "--pages", pages, "--output", out]) == 0
    df = spark.read.parquet(out)
    assert df.columns == ["src", "dst"] and df.count() > 0


def test_cli_deadlock(spark, tmp_path, capsys):
    # cycle 1->2->3->1 with a free leaf 4 in 3's SAME AND-group as the
    # cycle edge: 4 grants 3 but the group still waits on 1, so the cycle
    # stays deadlocked while 4 is free. (With 3->4 under its own tag the
    # whole graph would reduce — separate tags are alternate N-of-M
    # request sets.)
    edges = spark.createDataFrame(
        [(1, 2, 0), (2, 3, 0), (3, 1, 0), (3, 4, 0)],
        "src long, dst long, tag long",
    )
    ep = str(tmp_path / "waitfor.parquet")
    edges.write.parquet(ep)
    out = str(tmp_path / "freedom")
    assert main(["deadlock", "--edges", ep, "--output", out,
                 "--source", "1", "--num-partitions", "4"]) == 0
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["algorithm"] == "deadlock" and printed["converged"]
    free = {r.id: r.is_free for r in spark.read.parquet(out).collect()}
    assert free == {1: False, 2: False, 3: False, 4: True}
