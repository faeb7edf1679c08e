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

import datetime
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

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
    edges: DataFrame,
    num_partitions: int,
    strategy: str = "hash",
    mapping: DataFrame | None = None,
    broadcast_mapping: bool = False,
) -> DataFrame:
    """In-memory partitioner selection — the reference's pluggable
    partitioner factories:

    - ``hash``:  owner = hash(src) % partitions
      (``partition/HashPartitionerFactory.java:36-43``)
    - ``range``: contiguous src ranges per partition, sampled bounds
      (``partition/SimpleRangePartitionerFactory.java:38-76``; tested by
      ``partition/SimpleRangePartitionFactoryTest.java``)
    - ``mapping``: a precomputed id→partition placement table
      (``mapping/LongByteMappingStore.java:48`` +
      ``LongMappingStorePartitionerFactory.java`` — the reference's
      locality story: an offline partitioner, e.g. host-clustered METIS
      output, decides placement; workers look the owner up instead of
      hashing). Pass ``mapping`` as (id, partition); edges missing from
      it fall back to pmod(src, num_partitions) (the reference defaults
      unmapped ids the same way).

    Hash is the default for link graphs (url-hash ids are uniform); range
    keeps adjacent ids co-located when ids encode locality (crawl order);
    mapping buys minimum edge-cut when an offline placement exists.

    Placement mechanics for ``mapping``: rows are exchanged on the looked-
    up partition id, so all edges with equal pid are co-located in ONE
    Spark partition — the whole locality benefit (their gather messages
    never cross the wire). The physical slot is hash(pid) % P rather than
    pid itself (Spark exposes no identity partitioner for DataFrames);
    a rare pid collision merges two logical groups into one slot — a
    balance blemish AQE splits back, never a correctness or locality
    loss. Giraph's byte-array store maps 1:1 onto the broadcast join
    (``broadcast_mapping=True``) when the vertex count fits a worker;
    at web scale leave it False — a shuffle join on src with the mapping
    pre-bucketed by id.
    """
    if strategy == "hash":
        return edges.repartition(num_partitions, "src")
    if strategy == "range":
        return edges.repartitionByRange(num_partitions, "src")
    if strategy == "mapping":
        if mapping is None:
            raise ValueError("strategy='mapping' needs a mapping DataFrame")
        m = mapping.select(F.col("id").alias("src"), F.col("partition").alias("_pid"))
        if broadcast_mapping:
            m = F.broadcast(m)
        placed = (
            edges.join(m, "src", "left")
            .withColumn(
                "_pid",
                F.coalesce(F.col("_pid"), F.pmod(F.col("src"), F.lit(num_partitions))),
            )
            .repartition(num_partitions, "_pid")
            .drop("_pid")
        )
        return placed
    raise ValueError(f"unknown partition strategy {strategy!r} (hash|range|mapping)")


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan (broadcast
    exchanges excluded — they move no partitioned data) — the plan-shape
    assertion used by tests and the bench harness."""
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    return sum(
        plan.count(f"Exchange {kind}")
        for kind in ("hashpartitioning", "rangepartitioning", "SinglePartition")
    )


# ---------------------------------------------------------------------------
# Snapshot tables — Iceberg-style commit/time-travel semantics on parquet.
#
# The north rule names an Iceberg corpus table; this container cannot load
# the Iceberg runtime (verified 2026-08-19, re-verified twice 2026-08-21 (latest: this session):
# `spark.jars.packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:
# 1.10.0` fails offline with "unresolved dependency ... not found"; DNS to
# repo1.maven.org does not resolve; no iceberg jar anywhere on disk). The same TABLE CONTRACT is therefore implemented
# directly, the way Iceberg itself does it: immutable parquet data files +
# driver-written JSON manifests + an atomically-swapped version pointer.
#
#   {location}/{table}/metadata/snap-00001.json   one manifest per snapshot
#   {location}/{table}/metadata/version-hint.txt  current snapshot (os.replace)
#   {location}/{table}/data/s00001/               immutable parquet dir
#
# - append    = new manifest referencing parent's data dirs + the new one
# - overwrite = new manifest referencing only the new dir (old files stay
#               on disk until expired — snapshot isolation: readers of any
#               committed snapshot never see paths disappear)
# - read      = union of the chosen manifest's dirs (time travel by id)
# - commit    = manifest write + version-hint rename; on a real lakehouse
#               the rename is Iceberg's catalog CAS — manifests here are
#               driver-side metadata exactly as in Iceberg, so the data
#               path (executor-parallel parquet) is unchanged at 100 TB
#
# Reference analog: the catalog-backed input surface, HCatalog connector
# (giraph-hcatalog/.../HCatalogVertexInputFormat.java) — Giraph reads the
# graph out of a catalog table the crawl pipeline maintains; the snapshot
# functions are that catalog, with the crawl-over-crawl history the corpus
# story needs (read crawl k vs crawl k-1 = two `snapshot_read`s).
# ---------------------------------------------------------------------------


def _meta_dir(location: str, table: str) -> str:
    return os.path.join(location, table, "metadata")


def _manifest_path(location: str, table: str, snapshot_id: int) -> str:
    return os.path.join(_meta_dir(location, table), f"snap-{snapshot_id:05d}.json")


def current_snapshot_id(location: str, table: str) -> int | None:
    """Committed snapshot id the version hint points at (None = no table)."""
    hint = os.path.join(_meta_dir(location, table), "version-hint.txt")
    try:
        with open(hint, encoding="utf-8") as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def _json_bound(v):
    """JSON-safe manifest bound: date/datetime min/max collect as Python
    temporal objects, which json.dump rejects; store their ISO-8601 form
    instead. ISO strings order lexicographically exactly like the values
    they encode, so the prune comparison stays correct without a parse."""
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v.isoformat()
    return v


def _read_manifest(location: str, table: str, snapshot_id: int) -> dict:
    try:
        with open(_manifest_path(location, table, snapshot_id), encoding="utf-8") as f:
            return json.load(f)
    except FileNotFoundError:
        raise ValueError(
            f"snapshot {snapshot_id} of table {table!r} does not exist "
            f"(expired or never committed)"
        ) from None


def snapshot_write(
    df: DataFrame,
    location: str,
    table: str,
    mode: str = "append",
) -> int:
    """Commit ``df`` as a new snapshot; returns the new snapshot id.

    ``mode="append"`` adds the rows to the current snapshot's contents;
    ``mode="overwrite"`` replaces them. Either way every previously
    committed snapshot stays readable (time travel) until
    ``snapshot_expire``.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"snapshot_write mode must be append|overwrite, got {mode!r}")
    meta = _meta_dir(location, table)
    os.makedirs(meta, exist_ok=True)
    parent = current_snapshot_id(location, table)
    new_id = 1 if parent is None else parent + 1
    # write the immutable data dir FIRST (executor-parallel); the snapshot
    # only becomes visible when the manifest + hint commit below succeed
    data_rel = f"data/s{new_id:05d}"
    df.write.mode("errorifexists").parquet(os.path.join(location, table, data_rel))
    # manifest-level column bounds for the NEW data dir (Iceberg manifest
    # file stats, the metadata a planner prunes files with): min/max per
    # numeric or string column, one small driver-side aggregate over the
    # just-written files
    written = df.sparkSession.read.parquet(os.path.join(location, table, data_rel))
    stat_cols = [
        f.name
        for f in written.schema.fields
        if f.dataType.typeName()
        in (
            "byte",
            "short",
            "integer",
            "long",
            "float",
            "double",
            "string",
            "date",
            "timestamp",
            "timestamp_ntz",
        )
    ]
    bounds: dict[str, list] = {}
    if stat_cols:
        aggs = []
        for c in stat_cols:
            aggs.append(F.min(c).alias(f"_lo_{c}"))
            aggs.append(F.max(c).alias(f"_hi_{c}"))
        row = written.agg(*aggs).collect()[0]
        for c in stat_cols:
            lo, hi = row[f"_lo_{c}"], row[f"_hi_{c}"]
            if lo is not None:
                bounds[c] = [_json_bound(lo), _json_bound(hi)]
    dirs = [data_rel]
    dir_bounds = {data_rel: bounds}
    if mode == "append" and parent is not None:
        pm = _read_manifest(location, table, parent)
        dirs = pm["data_dirs"] + dirs
        dir_bounds = {**pm.get("dir_bounds", {}), **dir_bounds}
    manifest = {
        "snapshot_id": new_id,
        "parent_id": parent,
        "operation": mode,
        "data_dirs": dirs,
        "dir_bounds": dir_bounds,
        "committed_at": time.time(),
        "schema": df.schema.jsonValue(),
    }
    mpath = _manifest_path(location, table, new_id)
    with open(mpath + ".tmp", "w", encoding="utf-8") as f:
        json.dump(manifest, f)
    os.replace(mpath + ".tmp", mpath)
    hint = os.path.join(meta, "version-hint.txt")
    with open(hint + ".tmp", "w", encoding="utf-8") as f:
        f.write(str(new_id))
    os.replace(hint + ".tmp", hint)  # the commit point (Iceberg catalog CAS)
    return new_id


def snapshot_read(
    spark: SparkSession,
    location: str,
    table: str,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read the table at a snapshot (default: current) — time travel."""
    if snapshot_id is None:
        snapshot_id = current_snapshot_id(location, table)
        if snapshot_id is None:
            raise ValueError(f"table {table!r} has no committed snapshot at {location}")
    m = _read_manifest(location, table, snapshot_id)
    paths = [os.path.join(location, table, d) for d in m["data_dirs"]]
    return spark.read.parquet(*paths)


def snapshot_read_pruned(
    spark: SparkSession,
    location: str,
    table: str,
    column: str,
    lo,
    hi,
    snapshot_id: int | None = None,
) -> tuple[DataFrame, dict]:
    """Manifest-level file pruning: read only the data dirs whose
    recorded [min, max] bounds for ``column`` intersect [lo, hi] — the
    Iceberg manifest-stats scan-planning path (a planner never opens
    files whose stats exclude the predicate). Returns ``(df, stats)``
    where the DataFrame ALSO applies the row-level filter (pruning is a
    superset cut, exactly like Iceberg: file skip first, then residual
    predicate), and stats = {"dirs_total", "dirs_scanned",
    "dirs_skipped"} — the read-path evidence for crawl-over-crawl
    incremental scans (each crawl's dir carries disjoint bounds, so a
    time/host-range query touches one crawl's files).

    A dir with NO recorded bounds for the column is conservatively
    scanned (unknown stats never skip data).
    """
    if snapshot_id is None:
        snapshot_id = current_snapshot_id(location, table)
        if snapshot_id is None:
            raise ValueError(f"table {table!r} has no committed snapshot at {location}")
    m = _read_manifest(location, table, snapshot_id)
    dir_bounds = m.get("dir_bounds", {})
    # normalize temporal probes the same way snapshot_write serialized the
    # stored bounds (ISO strings), so the comparison is like-for-like
    plo, phi = _json_bound(lo), _json_bound(hi)
    keep = []
    for d in m["data_dirs"]:
        b = dir_bounds.get(d, {}).get(column)
        if b is None or not (b[1] < plo or b[0] > phi):
            keep.append(d)
    stats = {
        "dirs_total": len(m["data_dirs"]),
        "dirs_scanned": len(keep),
        "dirs_skipped": len(m["data_dirs"]) - len(keep),
    }
    if not keep:
        schema = StructType.fromJson(m["schema"])
        return spark.createDataFrame([], schema), stats
    paths = [os.path.join(location, table, d) for d in keep]
    df = spark.read.parquet(*paths).where(F.col(column).between(lo, hi))
    return df, stats


def snapshot_history(location: str, table: str) -> list[dict]:
    """All committed manifests, oldest first (id, parent, operation,
    committed_at, n data dirs) — the table's crawl-over-crawl timeline."""
    meta = _meta_dir(location, table)
    out = []
    if not os.path.isdir(meta):
        return out
    for name in sorted(os.listdir(meta)):
        if name.startswith("snap-") and name.endswith(".json"):
            with open(os.path.join(meta, name), encoding="utf-8") as f:
                m = json.load(f)
            out.append(
                {
                    "snapshot_id": m["snapshot_id"],
                    "parent_id": m["parent_id"],
                    "operation": m["operation"],
                    "committed_at": m["committed_at"],
                    "n_data_dirs": len(m["data_dirs"]),
                }
            )
    return out


def snapshot_expire(location: str, table: str, keep_last: int = 1) -> list[int]:
    """Drop all but the newest ``keep_last`` snapshots and delete data dirs
    no surviving snapshot references; returns the expired ids. The current
    snapshot is always kept."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    hist = snapshot_history(location, table)
    if len(hist) <= keep_last:
        return []
    expired = [h["snapshot_id"] for h in hist[:-keep_last]]
    kept = [h["snapshot_id"] for h in hist[-keep_last:]]
    live: set[str] = set()
    for sid in kept:
        live.update(_read_manifest(location, table, sid)["data_dirs"])
    for sid in expired:
        dead = set(_read_manifest(location, table, sid)["data_dirs"]) - live
        for d in dead:
            shutil.rmtree(os.path.join(location, table, d), ignore_errors=True)
        os.remove(_manifest_path(location, table, sid))
    return expired


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
