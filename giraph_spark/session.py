"""SparkSession construction tuned for the superstep engine.

The reference engine's parallelism knobs (workers, compute threads:
``giraph-core/.../conf/GiraphConstants.java:800``, partition count
``partition/PartitionUtils.java:186-213``) map onto ``local[N]`` cores and
``spark.sql.shuffle.partitions``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "giraph-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a local SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or all
    CPUs. ``shuffle_partitions`` defaults to ``cores`` — the engine's
    superstep shuffles (message routing) are sized to the executor count,
    playing the role of Giraph's ``partition = |hash(id)| % P`` with
    ``P ~ multiplier * workers^2`` (HashPartitionerFactory.java:36-43);
    on a real cluster you would raise this to ~2-3x total cores.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 4)
    # Make giraph_spark importable by the worker daemon: the JVM we are
    # about to launch hands its own environment to every Python worker
    # process, and spark.python.daemon.module (below) needs the package
    # on the worker's sys.path. Must happen BEFORE the gateway launches.
    _repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _pp = os.environ.get("PYTHONPATH", "")
    if _repo_root not in _pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _repo_root + os.pathsep + _pp if _pp else _repo_root
        )
    builder = SparkSession.builder.appName(app_name)
    # Under spark-submit the gateway JVM is already up with the submitted
    # conf (--master yarn/k8s/...); PYSPARK_GATEWAY_PORT marks that path
    # (pyspark/java_gateway.py) and the master must NOT be overridden.
    # Bare `python` runs get the local[cores] default.
    if "PYSPARK_GATEWAY_PORT" not in os.environ:
        builder = builder.master(f"local[{cores}]")
        # pre-import numpy/pandas/pyarrow in the worker daemon so forked
        # workers inherit them copy-on-write: the first Arrow job no
        # longer pays num_slots x ~1.5s of contended imports (measured
        # ~4-5s at local[32]; see giraph_spark/daemon_warm.py). Local
        # mode only: the PYTHONPATH prepend above guarantees the module
        # resolves in-process here, while on a spark-submit cluster a
        # missing module would fail the executor hard — there, ship the
        # package with --py-files and set the conf explicitly if wanted.
        builder = builder.config(
            "spark.python.daemon.module", "giraph_spark.daemon_warm"
        )
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # throughput GC: G1's concurrent cycles inflate 32-thread batch CPU
        # 2.9x on the 126M-edge superstep job (tools/diag_scaling.py:
        # ParallelGC wall 199s vs G1 427s at local[32]); a batch engine
        # wants the stop-the-world throughput collector
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_DRIVER_JAVA_OPTS", "-XX:+UseParallelGC"),
        )
        # let AQE expose a cached plan's output partitioning: without this
        # an InMemoryRelation built under AQE reports Unknown partitioning
        # and EVERY superstep re-exchanges the cached edge table (measured:
        # a 2.8 GiB shuffle per superstep on the 126M-edge input that the
        # explicit repartition(N, "src").persist() was supposed to elide)
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
        )
        # iterative joins of a big cached table against small per-superstep
        # state want shuffled-hash, not sort-merge: SMJ re-sorts the 126M-row
        # edge side every superstep; hash-building the ~8M-row rank side is
        # strictly cheaper at these shapes (hot paths also hint SHUFFLE_HASH
        # explicitly — this conf lets AQE make the same call elsewhere)
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.ui.enabled", "false")
        # NOTE: do not lower spark.cleaner.periodicGC.interval below its
        # 30min default — System.gc() on a big ParallelGC heap is a full
        # STW collection (measured: adjacent 126M-edge supersteps swing
        # 27s -> 90s under a 1min periodic GC); superseded lineage cuts
        # are released explicitly (pregel.py prev_cut_jrdd) instead
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def suggest_num_partitions(
    n_rows: int, cores: int, rows_per_partition: int = 2_000_000
) -> int:
    """Data-proportional partition count for the superstep shuffles.

    Measured on the sf0.1 (358k-edge) and 126M-edge inputs: below ~8
    partitions-worth of data the per-task scheduling floor dominates a
    local run (34-superstep PageRank: 27.9s at 8 partitions vs 44.4s at
    32), while the big input wants ~2M edges/partition (64 partitions at
    126M edges). Rule: ceil(rows / rows_per_partition), capped at
    4*cores, floored at 8, rounded up to a multiple of 8 so partitions
    divide evenly across executor threads.
    """
    import math

    p = max(1, math.ceil(n_rows / rows_per_partition))
    p = min(p, 4 * cores)
    return max(8, ((p + 7) // 8) * 8)
