"""PageRank with sink-mass redistribution — the reference's production
("Blocks") semantics.

Reference semantics reproduced
(``giraph-block-app-8/src/main/java/org/apache/giraph/block_app/library/
pagerank/PageRankIteration.java:137-264``):

- init: every vertex value 1.0 (PageRankSettings.java:38); message-target-
  only vertices materialized (PageRankInitializeAndNormalizeEdgesPiece.java:81);
  weighted mode first normalizes out-edge weights to sum 1 per vertex
  (PageRankInitializeAndNormalizeEdgesPiece.java:70-83)
- per iteration: allSum = sum of all values; sinkSum = sum over out-degree-0
  vertices (PageRankIteration.java:160-165); non-sinks scatter
  ``value * edgeWeight`` (sum-combined, :166-178, :283-286); new value =
  ``d*(sum(msgs) + sinkSum/N) + (1-d)*allSum/N`` (:254-264) — total mass
  is conserved at N
- convergence reducers: L1 / Linf / RMSE of |delta| (:84-96, :204-231;
  threshold default 1e-5, PageRankSettings.java:49-52), loop wrapped in
  RepeatUntilBlock (PageRankBlockUtils.java:53-67)

Spark shape per superstep: one scatter join (edges × ranks, co-partitioned
on src==id so only the small rank state reshuffles), one gather
``groupBy(dst).sum`` (map-side combined = the DoubleSumMessageCombiner),
one update join, and ONE driver action computing next-iteration allSum /
sinkSum and all three convergence metrics in a single aggregate (the
per-superstep aggregator gather of master/MasterCompute.java:41-47).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from giraph_spark.graph import normalize_edge_weights, out_degrees, vertices_from_edges
from giraph_spark.pregel import PregelRun, gather_messages, run_supersteps


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    damping: float = 0.85,
    max_supersteps: int = 10,
    tolerance: float | None = None,
    convergence: str = "l1",  # l1 | l1_mean | linf | rmse (PageRankConvergenceType.java)
    weighted: bool = False,
    salt: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
    num_partitions: int | None = None,
    pre_partitioned: bool = False,
    init_ranks: DataFrame | None = None,
    verbose: bool = False,
) -> PregelRun:
    """Run PageRank; result ``vertices`` has columns (id, rank).

    ``tolerance=None`` runs exactly ``max_supersteps`` iterations
    (RepeatBlock semantics); otherwise halt when the chosen convergence
    metric drops below tolerance (RepeatUntilBlock semantics).
    ``pre_partitioned=True`` declares that ``edges`` already carries a
    hash-partitioning on ``src`` (a bucketed table from
    ``storage.write_bucketed_edges``) and skips the per-run exchange.

    ``init_ranks`` (id, rank) warm-starts the iteration — the
    incremental-recompute path after a graph mutation: seed with the
    previous run's converged ranks (vertices missing from it start at
    1.0, extra rows are ignored) and the power iteration re-converges in
    the few supersteps the perturbation needs instead of from scratch.
    """
    if convergence not in ("l1", "l1_mean", "linf", "rmse"):
        raise ValueError(f"unknown convergence type {convergence!r}")
    # the superstep runs as spark.sql over temp views, so the views and
    # the SQL must resolve in the SAME session: inside foreachBatch the
    # frames belong to a CLONED session whose temp-view catalog is
    # isolated from the outer session's — always work in the session
    # that owns the edge frame (identical to `spark` everywhere else)
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # --- init piece -------------------------------------------------------
    if weighted:
        e = normalize_edge_weights(edges.select("src", "dst", "weight"))
    else:
        deg = out_degrees(edges)
        e = (
            edges.select("src", "dst")
            .join(deg, "src")
            .withColumn("weight", F.lit(1.0) / F.col("out_degree").cast("double"))
            .drop("out_degree")
        )
    # static for the whole run: hash-partition by the scatter key once and
    # cache, so each superstep's scatter join reshuffles only the rank state;
    # a bucketed input table already IS partitioned that way — skip the
    # exchange entirely (storage.write_bucketed_edges)
    if not pre_partitioned:
        e = e.repartition(num_partitions, "src")
    e = e.persist()

    verts = vertices_from_edges(edges)
    sinks = verts.join(edges.select(F.col("src").alias("id")).distinct(), "id", "left_anti")
    state = verts.join(sinks.withColumn("is_sink", F.lit(True)), "id", "left")
    if init_ranks is not None:
        state = state.join(
            init_ranks.select("id", F.col("rank").alias("_warm")), "id", "left"
        ).select(
            "id",
            F.coalesce("_warm", F.lit(1.0)).alias("rank"),
            F.coalesce("is_sink", F.lit(False)).alias("is_sink"),
        )
    else:
        state = state.select(
            "id",
            F.lit(1.0).alias("rank"),
            F.coalesce("is_sink", F.lit(False)).alias("is_sink"),
        )
    state = state.repartition(num_partitions, "id")

    # ONE setup aggregate replaces verts.count() + the warm path's total
    # scan + the first superstep's in-loop _sums job: vertex count, sink
    # count, and (for the warm path) total / sink mass all come from the
    # same scan, so superstep 0 starts with the aggregator box already
    # initialized (fresh start: every rank is exactly 1.0)
    srow = state.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_sink").cast("long")).alias("n_sinks"),
        F.sum("rank").alias("mass"),
        F.sum(F.when(F.col("is_sink"), F.col("rank")).otherwise(F.lit(0.0))).alias(
            "sink_mass"
        ),
    ).collect()[0]
    n_vertices = int(srow["n"])
    if n_vertices == 0:
        return PregelRun(vertices=state.select("id", "rank"), supersteps=0, converged=True)
    init_sink_sum = float(srow["sink_mass"] or 0.0)
    if init_ranks is not None:
        # this formulation CONSERVES the initial mass (new = d·(msgs +
        # sink/N) + (1-d)·allSum/N), so an arbitrary warm vector must be
        # rescaled to the reference's mass-N convention or the fixpoint
        # itself would be scaled by the mass ratio
        total = float(srow["mass"] or 0.0)
        if total > 0:
            state = state.withColumn(
                "rank", F.col("rank") * F.lit(n_vertices / total)
            )
            init_sink_sum = init_sink_sum * (n_vertices / total)

    d = float(damping)
    # aggregator state visible to the *next* superstep (one-superstep lag,
    # master/MasterCompute.java:41-47). On resume the loop starts from a
    # snapshot this setup never saw, so the box must fall back to the
    # lazy in-loop _sums; otherwise it is fully initialized here.
    box: dict[str, float] = {
        "all_sum": float(n_vertices),
        "sink_sum": None if resume else init_sink_sum,
    }  # type: ignore[assignment]

    def _sums(df: DataFrame) -> tuple[float, float]:
        r = df.agg(
            F.sum("rank").alias("all_sum"),
            F.sum(F.when(F.col("is_sink"), F.col("rank")).otherwise(F.lit(0.0))).alias(
                "sink_sum"
            ),
        ).collect()[0]
        return float(r["all_sum"]), float(r["sink_sum"] or 0.0)

    # The step is issued as ONE spark.sql() text per superstep instead of
    # ~a dozen DataFrame-API calls: each Column/DataFrame builder is its
    # own py4j round trip, measured ~117 ms of the ~430 ms sf0.1
    # superstep floor; a SQL string ships the whole plan in one call and
    # parses/analyzes JVM-side (measured 442 -> 335 ms/superstep, ranks
    # identical to 1e-10 — FP reorder noise only). Join strategy hints
    # match the DataFrame formulation exactly:
    # - SHUFFLE_HASH(v) on the scatter join: sort-merge would re-sort the
    #   (static, cached, already src-partitioned) edge table every
    #   superstep; hash-building the much smaller per-superstep rank
    #   state streams the edges untouched.
    # - SHUFFLE_HASH(g) on the update join: build the gathered messages,
    #   probe the co-partitioned state.
    # The salted variant reproduces gather_messages' retry-safe two-level
    # reduction (content-hashed salt, pregel.py:104-114) in SQL.
    import uuid

    uid = uuid.uuid4().hex[:8]
    ev, sv, nv = f"pr_edges_{uid}", f"pr_state_{uid}", f"pr_new_{uid}"
    e.createOrReplaceTempView(ev)
    if salt and salt > 1:
        gather_cte = f"""m AS (
        SELECT /*+ SHUFFLE_HASH(v) */ e.dst AS dst, v.rank * e.weight AS msg
        FROM {ev} e JOIN {sv} v ON e.src = v.id
      ),
      s1 AS (
        SELECT dst, sum(msg) AS msg
        FROM m GROUP BY dst, pmod(xxhash64(dst, msg), {int(salt)})
      ),
      g AS (SELECT dst, sum(msg) AS msg FROM s1 GROUP BY dst)"""
    else:
        gather_cte = f"""g AS (
        SELECT /*+ SHUFFLE_HASH(v) */ e.dst AS dst, sum(v.rank * e.weight) AS msg
        FROM {ev} e JOIN {sv} v ON e.src = v.id
        GROUP BY e.dst
      )"""
    step_sql = (
        "WITH " + gather_cte + f"""
      SELECT /*+ SHUFFLE_HASH(g) */ v.id,
             {{d}} * coalesce(g.msg, 0.0) + {{base}} AS rank,
             v.is_sink,
             {{d}} * coalesce(g.msg, 0.0) + {{base}} - v.rank AS _delta
      FROM {sv} v LEFT JOIN g ON v.id = g.dst"""
    )
    agg_sql = f"""
      SELECT sum(rank) AS all_sum,
             sum(CASE WHEN is_sink THEN rank ELSE 0.0 END) AS sink_sum,
             sum(abs(_delta)) AS l1,
             max(abs(_delta)) AS linf,
             sqrt(avg(_delta * _delta)) AS rmse
      FROM {nv}"""

    def step(vertices: DataFrame, superstep: int) -> tuple[DataFrame, dict[str, Any]]:
        if box["sink_sum"] is None:  # resume from a snapshot this setup never saw
            box["all_sum"], box["sink_sum"] = _sums(vertices)
        all_sum, sink_sum = box["all_sum"], box["sink_sum"]
        base = d * sink_sum / n_vertices + (1.0 - d) * all_sum / n_vertices

        vertices.createOrReplaceTempView(sv)
        new_state = spark.sql(step_sql.format(d=repr(d), base=repr(base)))
        # LAZY lineage cut BEFORE the action: the convergence aggregate
        # below materializes the checkpoint blocks in ITS job, so the
        # superstep costs exactly one Spark job (the loop's step_precut
        # mode skips the separate eager-cut job — measured ~120 ms of
        # the sf0.1 superstep floor)
        new_state = new_state.localCheckpoint(eager=False)
        new_state.createOrReplaceTempView(nv)
        # ONE action: next-iteration sums + all convergence reducers
        row = spark.sql(agg_sql).collect()[0]
        box["all_sum"], box["sink_sum"] = float(row["all_sum"]), float(row["sink_sum"] or 0.0)
        stats = {
            "all_sum": box["all_sum"],
            "sink_sum": box["sink_sum"],
            "l1": float(row["l1"]),
            "l1_mean": float(row["l1"]) / n_vertices,
            "linf": float(row["linf"]),
            "rmse": float(row["rmse"]),
        }
        return new_state, stats

    halt = None
    if tolerance is not None:
        halt = lambda stats, i: stats[convergence] < tolerance  # noqa: E731

    try:
        run = run_supersteps(
            spark,
            state,
            step,
            max_supersteps=max_supersteps,
            halt=halt,
            checkpoint_dir=checkpoint_dir,
            checkpoint_interval=checkpoint_interval,
            resume=resume,
            verbose=verbose,
            # precut mode cuts lineage every superstep by construction
            # (the step pre-issues a lazy localCheckpoint its own
            # convergence aggregate materializes), so there is no
            # cut-interval knob here
            step_precut=True,
        )
    finally:
        for view in (ev, sv, nv):
            try:
                spark.catalog.dropTempView(view)
            except Exception:  # noqa: BLE001 — view may never have been created
                pass
    e.unpersist()
    return PregelRun(
        vertices=run.vertices.select("id", "rank"),
        supersteps=run.supersteps,
        converged=run.converged,
        history=run.history,
    )


def pagerank_random_walk(
    spark: SparkSession,
    edges: DataFrame,
    teleport: float = 0.15,
    max_supersteps: int = 30,
    tolerance: float | None = None,
    num_partitions: int | None = None,
    salt: int | None = None,
    pre_partitioned: bool = False,
    verbose: bool = False,
) -> PregelRun:
    """Random-walk normalized PageRank — the probability-distribution
    variant (``giraph-examples/.../RandomWalkComputation.java:115-155`` with
    ``PageRankComputation.java:33-56``): init 1/N; per superstep

        p' = [ (1-t)*(sum(msgs) + D_prev/N) + t/N ] / C_prev

    where ``D_prev`` = cumulative probability of dangling vertices and
    ``C_prev`` = cumulative probability of ALL vertices from the previous
    superstep (the one-superstep-lag aggregators
    CUMULATIVE_DANGLING_PROBABILITY / CUMULATIVE_PROBABILITY); the
    division is the reference's "rescale for numerical stability"
    (:126-129). Convergence = aggregated L1 of |p' - p| vs ``tolerance``.
    Ranks sum to 1 (vs the mass-N convention of ``pagerank``).

    ``salt`` / ``pre_partitioned`` match :func:`pagerank` (two-level
    gather on power-law hubs; skip the per-run exchange for a bucketed
    input) — identical knob surface so a caller can swap variants at
    100x scale without re-tuning.
    """
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    deg = out_degrees(edges)
    e = (
        edges.select("src", "dst")
        .join(deg, "src")
        .withColumn("weight", F.lit(1.0) / F.col("out_degree").cast("double"))
        .drop("out_degree")
    )
    if not pre_partitioned:
        e = e.repartition(num_partitions, "src")
    e = e.persist()
    verts = vertices_from_edges(edges)
    sinks = verts.join(
        edges.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    )
    n_vertices = verts.count()
    if n_vertices == 0:
        empty = verts.select("id", F.lit(0.0).alias("rank"))
        return PregelRun(vertices=empty, supersteps=0, converged=True)
    state = (
        verts.join(sinks.withColumn("is_sink", F.lit(True)), "id", "left")
        .select(
            "id",
            F.lit(1.0 / n_vertices).alias("rank"),
            F.coalesce("is_sink", F.lit(False)).alias("is_sink"),
        )
        .repartition(num_partitions, "id")
    )
    t = float(teleport)
    # one-superstep-lag aggregators over the initial distribution
    box = {"cum": 1.0, "dangling": None}

    def step(vertices: DataFrame, superstep: int):
        if box["dangling"] is None:
            r0 = vertices.agg(
                F.sum("rank").alias("c"),
                F.sum(F.when(F.col("is_sink"), F.col("rank")).otherwise(0.0)).alias("d"),
            ).collect()[0]
            box["cum"], box["dangling"] = float(r0["c"]), float(r0["d"] or 0.0)
        cum, dang = box["cum"], box["dangling"]

        msgs = e.join(
            vertices.select(F.col("id").alias("src"), "rank").hint("shuffle_hash"),
            "src",
        ).select("dst", (F.col("rank") * F.col("weight")).alias("msg"))
        gathered = gather_messages(msgs, [("msg", "sum")], key="dst", salt=salt)
        base = (1.0 - t) * dang / n_vertices + t / n_vertices
        raw = (
            F.lit(1.0 - t) * F.coalesce(F.col("msg"), F.lit(0.0)) + F.lit(base)
        ) / F.lit(cum)
        new_state = (
            vertices.join(
                gathered.withColumnRenamed("dst", "id").hint("shuffle_hash"),
                "id",
                "left",
            )
            .select(
                "id",
                raw.alias("rank"),
                "is_sink",
                (raw - F.col("rank")).alias("_delta"),
            )
            .persist()
        )
        row = new_state.agg(
            F.sum("rank").alias("c"),
            F.sum(F.when(F.col("is_sink"), F.col("rank")).otherwise(0.0)).alias("d"),
            F.sum(F.abs("_delta")).alias("l1"),
        ).collect()[0]
        box["cum"], box["dangling"] = float(row["c"]), float(row["d"] or 0.0)
        return new_state, {"cum": box["cum"], "l1": float(row["l1"])}

    halt = None
    if tolerance is not None:
        halt = lambda stats, i: stats["l1"] < tolerance  # noqa: E731
    run = run_supersteps(
        spark, state, step, max_supersteps=max_supersteps, halt=halt,
        verbose=verbose,
    )
    e.unpersist()
    return PregelRun(
        vertices=run.vertices.select("id", "rank"),
        supersteps=run.supersteps,
        converged=run.converged,
        history=run.history,
    )
