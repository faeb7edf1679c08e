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


def with_weight(edges: DataFrame) -> DataFrame:
    """Attach the deterministic weight column (matches WEIGHT_SQL)."""
    return edges.withColumn(
        "weight", ((F.col("src") * 7 + F.col("dst") * 13) % 3 + 1).cast("double")
    )
