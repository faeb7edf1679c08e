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


def test_cli_via_spark_submit_py_files(tmp_path):
    """The north-rule launch path, literally: zip the package, spark-submit
    --py-files it, read the parquet output back (fresh JVM, no shared
    session state with the test suite)."""
    import os
    import shutil
    import subprocess
    import zipfile

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = os.path.join(
            os.path.dirname(pyspark.__file__), "bin", "spark-submit"
        )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = str(tmp_path / "gs.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(repo, "giraph_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, repo))

    # tiny edge table written by plain pyarrow (no Spark session needed)
    import pyarrow as pa
    import pyarrow.parquet as pq

    ep = str(tmp_path / "edges.parquet")
    pq.write_table(
        pa.table({"src": [1, 2, 3, 3], "dst": [2, 3, 1, 4]}), ep
    )
    out = str(tmp_path / "ranks")
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    res = subprocess.run(
        [
            spark_submit, "--master", "local[2]", "--py-files", zpath,
            os.path.join(repo, "giraph_spark", "main.py"),
            "pagerank", "--edges", ep, "--output", out,
            "--max-supersteps", "50", "--tolerance", "1e-4",
            "--num-partitions", "2",
        ],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    import duckdb

    ranks = duckdb.sql(
        f"SELECT sum(rank) AS s, count(*) AS n FROM read_parquet('{out}/*.parquet')"
    ).fetchone()
    assert ranks[1] == 4 and abs(ranks[0] - 4.0) < 1e-6
