"""Training-data pipeline primitives: deterministic sampling, distributed
prefix sums, and token-budget shard packing.

These are the operations a 100 TB corpus pipeline runs between dedup and
training: carve reproducible train/eval splits, and pack documents into
fixed-token-budget shards for the data loader. None exist in the
reference (its scope ends at graph analytics); all are built so the SAME
rule is expressible in ANSI SQL for the oracle gate.

Scale notes:
- sampling is a pure row-local hash filter — no shuffle, fully pushed
  into the scan stage;
- the prefix sum is TWO-LEVEL: per-range-partition running totals plus a
  broadcast of the (tiny) per-partition offsets — never a global
  ``Window.orderBy`` over one partition, which is the classic
  single-reducer scale bug.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_fraction(col: Column | str) -> Column:
    """Deterministic per-row fraction in [0, 1): the first 60 bits of
    md5(value) — identical in Spark and DuckDB/ANSI SQL
    (``conv(substring(md5(x),1,15),16,10) / 2^60``), unlike xxhash64
    (Spark-only) or rand() (nondeterministic).
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("double")
        / F.lit(float(1 << 60))
    )


def sample_by_hash(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Reproducible sample: keep rows with hash_fraction(key) < fraction.

    Unlike ``df.sample`` this is stable across runs, partitionings, and
    engines, and the complement (>=) is the exact disjoint remainder —
    the train/eval split contract.
    """
    return df.where(hash_fraction(key) < F.lit(float(fraction)))


def stratified_sample_by_hash(
    df: DataFrame, key: str, stratum: str, fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language rates for a
    multilingual corpus). Row-local: rate lookup is a CASE expression,
    no join, no shuffle."""
    rate = F.lit(float(default_fraction))
    for value, frac in sorted(fractions.items()):
        rate = F.when(F.col(stratum) == value, F.lit(float(frac))).otherwise(rate)
    return df.where(hash_fraction(key) < rate)


def prefix_sum(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global running total of ``val_col`` in ``order_col`` order,
    WITHOUT a single-partition global window.

    Two-level: range-repartition on the (unique) order key so partition
    i holds strictly smaller keys than partition i+1, take a
    partition-local running sum, then add each partition's starting
    offset (the classic distributed scan: per-partition totals are
    ``num_partitions`` rows — broadcast back). Result is independent of
    the sampled range boundaries.
    """
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    d = df.repartitionByRange(num_partitions, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = d.withColumn(
        "_local",
        F.sum(val_col).over(
            Window.partitionBy("_pid")
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # partition total = sum of values (NOT max of the running sum, which
    # is wrong for signed val_col); computed from d, not the window output
    totals = d.groupBy("_pid").agg(
        F.coalesce(F.sum(val_col), F.lit(0)).alias("_tot")
    )
    offsets = totals.select(
        "_pid",
        (
            F.coalesce(
                F.sum("_tot").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            )
        ).alias("_off"),
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_local") + F.col("_off"))
        .drop("_pid", "_local")
    )


def pack_shards(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    budget: int,
    shard_col: str = "shard",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign rows (documents) to consecutive token-budget shards in
    ``order_col`` order — fixed-stride packing: shard k owns the rows
    whose preceding cumulative weight falls in [k*budget, (k+1)*budget),
    i.e. ``shard = floor((cumsum - weight) / budget)``. Every shard's
    total is < budget + max single weight, shards are contiguous in the
    order key, and (unlike the sequential greedy packer) the rule is a
    pure function of the global prefix sum — embarrassingly parallel and
    expressible in ANSI SQL for the oracle.
    """
    cum = prefix_sum(
        df, order_col, weight_col, out_col="_cum", num_partitions=num_partitions
    )
    return cum.withColumn(
        shard_col,
        F.floor((F.col("_cum") - F.col(weight_col)) / F.lit(int(budget))).cast(
            "long"
        ),
    ).drop("_cum")


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: for the step sequence ``steps`` count the
    users who performed step k strictly AFTER their earliest qualifying
    step k-1 (the product-analytics view -> click -> purchase funnel).
    Returns (step, event_type, n_users) with step 1-based.

    Scale shape: per step ONE filtered hash join against the previous
    step's (user, t) table plus ONE map-side-combined min-groupBy on
    user — no windows over the raw event stream, no per-user event
    collection; total cost is len(steps) bounded shuffles on user_id.
    The earliest-qualifying-time greedy is the standard funnel
    semantics: taking min(t) at every step maximizes the remaining
    window, so it never undercounts completions.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    counts = []
    reached: DataFrame | None = None
    for i, step in enumerate(steps):
        ev = events.where(F.col(type_col) == step).select(
            F.col(user_col).alias("_u"), F.col(ts_col).alias("_t")
        )
        if reached is None:
            reached = ev.groupBy("_u").agg(F.min("_t").alias("_t"))
        else:
            prev = reached.select("_u", F.col("_t").alias("_tp"))
            reached = (
                ev.join(prev, "_u")
                .where(F.col("_t") > F.col("_tp"))
                .groupBy("_u")
                .agg(F.min("_t").alias("_t"))
            )
        counts.append(
            reached.agg(
                F.lit(i + 1).cast("long").alias("step"),
                F.lit(step).alias("event_type"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    unit_us: int = 86_400_000_000,
    max_offset: int = 7,
) -> DataFrame:
    """Cohort retention matrix: bucket users by the period of their
    FIRST event (cohort), then count how many are active again k
    periods later. Returns (cohort, offset, n_users) for
    0 <= offset <= ``max_offset``; ``unit_us`` is the period length in
    microseconds (default 1 day). All arithmetic is integer
    (microseconds // unit), so any ANSI engine replays it exactly.

    Scale shape: one min-groupBy per user (the cohort), one distinct on
    (user, period), one hash join back on user, one count groupBy —
    four bounded shuffles on user_id / (cohort, offset), no windows
    over the raw stream.
    """
    ue = events.select(
        F.col(user_col).alias("_u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
    ).select(
        "_u",
        # integer division (not float-divide-then-truncate): exact at
        # any epoch magnitude, replayed verbatim by the SQL oracle
        F.expr(f"_us div {unit_us}").alias("_p"),
    )
    cohort = ue.groupBy("_u").agg(F.min("_p").alias("_c"))
    active = ue.distinct()
    return (
        active.join(cohort, "_u")
        .select("_c", (F.col("_p") - F.col("_c")).alias("offset"))
        .where(F.col("offset") <= max_offset)
        .groupBy(F.col("_c").alias("cohort"), "offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def balance_groups(
    df: DataFrame,
    group_col: str,
    key: str,
    target: int | None = None,
) -> DataFrame:
    """Data-mixing rebalance: deterministically down-sample every group
    to ~``target`` rows (default: the smallest group's size), the move a
    training pipeline makes to stop one language / source / domain from
    dominating the mixture. Keep rule: hash_fraction(key) <
    target / group_size — reproducible across runs, partitionings, and
    engines; groups at or under target pass through whole.

    Scale shape: one map-side-combined size groupBy, the 1-row min
    aggregate, then a broadcast join of the per-group rate back onto
    the stream — the filter itself is row-local.
    """
    sizes = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_gn"))
    if target is None:
        target = int(sizes.agg(F.min("_gn")).collect()[0][0])
    rate = F.least(F.lit(1.0), F.lit(float(target)) / F.col("_gn"))
    return (
        df.join(F.broadcast(sizes), group_col)
        .where(hash_fraction(key) < rate)
        .drop("_gn")
    )
