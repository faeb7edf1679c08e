"""The BSP superstep engine — Pregel on DataFrames.

Maps the reference's execution model onto Spark:

- superstep            = one driver-loop iteration issuing
                         ``scatter join -> groupBy(dst).agg -> update join``
                         (ComputeCallable.call(), graph/ComputeCallable.java:149-265)
- message transport    = the shuffle of the gather ``groupBy``
                         (replaces Netty, comm/SendMessageCache.java:51,240)
- message combiner     = map-side partial aggregation in ``groupBy().agg()``
                         (combiner/MessageCombiner.java:32-57)
- superstep barrier    = Spark stage boundary
                         (worker/BspServiceWorker.finishSuperstep():746-837)
- aggregators/master   = one driver-side action per superstep + Python
                         closure into the next plan
                         (master/MasterCompute.java:41-147)
- halt condition       = driver ``while``: all-halted-and-no-messages /
                         converged / max supersteps
                         (master/BspServiceMaster.java:1654-1679)
- checkpoint/restart   = CheckpointManager snapshots (BspServiceWorker
                         .storeCheckpoint():1249); the snapshot is also the
                         lineage cut that bounds Catalyst plan growth
- hub-skew salting     = two-level gather aggregation (our analog of
                         partition balancing, partition/PartitionBalancer.java,
                         required because a web graph's ``groupBy(dst)``
                         fan-in is power-law)

At 100 TB the same loop holds: ``edges`` is a bucketed-by-src table read
once per superstep with only the (much smaller) vertex state reshuffled;
AQE handles residual join skew; the salted gather bounds per-reducer
fan-in on mega-hubs.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from giraph_spark.checkpoint import CheckpointManager

# aggregate functions usable at BOTH levels of a salted two-level gather —
# exactly the MessageCombiner contract: commutative + associative
# (combiner/MessageCombiner.java:32-57)
_ASSOCIATIVE = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "bit_xor": lambda c: F.expr(f"bit_xor({c})"),
}


def scatter_to_targets(
    vertices: DataFrame,
    targets_col: str,
    msg_cols: list[str],
    dst_col: str = "dst",
) -> DataFrame:
    """sendMessageToMultipleEdges (``graph/Computation.java:123-135``):
    one message value fanned out to an explicit id list. The vertex row
    carries ``targets_col: array<long>``; the scatter is a single
    ``explode`` — Tungsten materializes the copies at shuffle-write, so
    the per-row cost matches Giraph's one-encode-many-ids message store
    (``comm/messages/MessageEncodeAndStoreType.java:25-38``).

    Returns (``dst_col``, *msg_cols) ready for ``gather_messages``."""
    return vertices.select(
        F.explode(F.col(targets_col)).alias(dst_col),
        *[F.col(c) for c in msg_cols],
    )


def gather_messages(
    messages: DataFrame,
    aggs: list[tuple[str, str]],
    key: str | list[str] = "dst",
    salt: int | None = None,
) -> DataFrame:
    """Combine messages per target vertex: ``groupBy(dst).agg(...)``.

    ``aggs`` is ``[(column, fn)]`` with fn in {sum,min,max,bit_xor} — the
    associative/commutative combiner set. With ``salt=S`` the reduction is
    two-level — ``groupBy(dst, hash(src-side row) % S)`` then
    ``groupBy(dst)`` — bounding any single reducer's fan-in on power-law
    hubs (north-rule skew requirement; Giraph analog: partition balancing
    + sharded aggregators, comm/aggregators/AggregatorUtils.java:29-41).
    Catalyst already performs map-side partial aggregation; explicit
    salting additionally splits the *reduce side* of a hot key.
    """
    for col, fn in aggs:
        if fn not in _ASSOCIATIVE:
            raise ValueError(f"gather fn must be associative, got {fn!r} for {col!r}")
    keys = [key] if isinstance(key, str) else list(key)
    if not salt or salt <= 1:
        return messages.groupBy(*keys).agg(
            *[_ASSOCIATIVE[fn](c).alias(c) for c, fn in aggs]
        )
    # Deterministic per-row salt: hash the full row CONTENT so a retried /
    # speculative map task reproduces identical salt assignments (a
    # nondeterministic expression like monotonically_increasing_id as a
    # shuffle key risks dropped/duplicated messages under partial stage
    # retry — the SPARK-23207 failure class).
    salted = messages.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in messages.columns]), F.lit(salt)),
    )
    level1 = salted.groupBy(*keys, "_salt").agg(
        *[_ASSOCIATIVE[fn](c).alias(c) for c, fn in aggs]
    )
    return level1.groupBy(*keys).agg(*[_ASSOCIATIVE[fn](c).alias(c) for c, fn in aggs])


def gather_topk_messages(
    messages: DataFrame,
    k: int,
    key: str | list[str] = "dst",
    msg_col: str = "msg",
    ascending: bool = False,
    salt: int | None = None,
) -> DataFrame:
    """Per-target top-k of incoming messages — the per-vertex TopNReduce
    gather (reference analog: sharded reducers feeding TopNReduce,
    ``reducers/collect/ShardedReducerHandle.java``).

    Unlike the algebraic gathers in :func:`gather_messages`, a top-k over
    ``collect_list`` is NOT reduced by map-side partial aggregation — the
    hot key's messages all land on one reducer. ``salt=S`` makes the
    merge two-level: per (key, salt) bucket take a local top-k (bounding
    any reducer's input to fan-in/S), then merge the S bounded lists.
    Bounded top-k merge is associative, so the result is exactly the
    unsalted one. Returns (key, topk: array<msg type>).

    Degeneration caveat: the salt is a pure function of row CONTENT
    (required for exactly-once semantics under task retry, SPARK-23207
    class), so byte-identical duplicate messages share one salt bucket.
    A hot key whose fan-in is dominated by ONE repeated value degrades
    to the unsalted plan; distinct-valued hot keys (the normal top-k
    workload) spread uniformly. If duplicate-heavy gathers matter,
    pre-collapse them with an algebraic ``groupBy(key, msg).count()``
    (map-side combinable) before the top-k.
    """
    order_desc = not ascending

    def topk_of(col: Column) -> Column:
        arr = F.array_sort(col)
        if order_desc:
            arr = F.reverse(arr)
        return F.slice(arr, 1, k)

    keys = [key] if isinstance(key, str) else list(key)
    if not salt or salt <= 1:
        return messages.groupBy(*keys).agg(
            topk_of(F.collect_list(msg_col)).alias("topk")
        )
    salted = messages.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in messages.columns]), F.lit(salt)),
    )
    level1 = salted.groupBy(*keys, "_salt").agg(
        topk_of(F.collect_list(msg_col)).alias("_t")
    )
    return level1.groupBy(*keys).agg(
        topk_of(F.flatten(F.collect_list("_t"))).alias("topk")
    )


def scatter_messages(
    edges: DataFrame,
    vertices: DataFrame,
    message,
    edge_filter=None,
) -> DataFrame:
    """The send-side API family (graph/Computation.java): ``sendMessage``
    / ``sendMessageToAllEdges`` / ``sendMessageToMultipleEdges``.

    ``message`` is a Column over the vertex frame; ``edge_filter`` (a
    boolean Column over the edge frame) restricts which out-edges carry
    it — the multiple-edges variant; None sends to all out-edges.
    Vertices whose message is null send nothing (the reference's
    null-supplier contract). Returns (dst, msg) rows for
    ``gather_messages``.
    """
    vm = vertices.select(F.col("id").alias("src"), message.alias("msg")).where(
        F.col("msg").isNotNull()
    )
    e = edges if edge_filter is None else edges.where(edge_filter)
    return e.select("src", "dst").join(vm, "src").select("dst", "msg")


def materialize_count(df: DataFrame, pred_col: str) -> int:
    """ONE action that both materializes a just-``persist()``-ed state and
    returns ``count(pred_col)`` — replaces the ``.where(pred).count()``
    second job per superstep (the frontier-size aggregator); the scan that
    fills the cache is the same scan that counts."""
    row = df.agg(
        F.sum(F.when(F.col(pred_col), 1).otherwise(0)).alias("c")
    ).collect()[0]
    return int(row["c"] or 0)


# --- refcounted AQE suppression ------------------------------------------
#
# The iterative loops disable AQE for their duration (fixed-shape plans;
# rationale at run_supersteps). A bare save/set/restore races when two
# loops overlap on the SAME session from different threads (e.g. the
# parallel oracle sweep, or a streaming foreachBatch): loop A's restore
# can re-enable AQE in the middle of loop B's run — re-creating the
# orphaned-stage condition the release gating guards against — and B's
# restore then pins A's suppressed value forever. Suppression is
# therefore REFCOUNTED per session-conf: the first suppressor saves the
# user's value and turns AQE off; only the last one out restores it.
# Keyed by the session object (cloned foreachBatch sessions have their
# own SQLConf and suppress independently).

_AQE_LOCK = __import__("threading").Lock()
_AQE_STATE: dict[int, tuple[int, str]] = {}  # id(session) -> (depth, saved)


def suppress_aqe(spark) -> None:
    """Turn AQE off for this session, refcounted (pair with restore_aqe)."""
    with _AQE_LOCK:
        depth, saved = _AQE_STATE.get(id(spark), (0, "true"))
        if depth == 0:
            saved = spark.conf.get("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        _AQE_STATE[id(spark)] = (depth + 1, saved)


def restore_aqe(spark) -> None:
    """Undo one suppress_aqe; restores the saved value at depth zero."""
    with _AQE_LOCK:
        depth, saved = _AQE_STATE.get(id(spark), (0, "true"))
        if depth <= 1:
            _AQE_STATE.pop(id(spark), None)
            spark.conf.set("spark.sql.adaptive.enabled", saved)
        else:
            _AQE_STATE[id(spark)] = (depth - 1, saved)


# --- job-completion-gated checkpoint-block release -----------------------
#
# Releasing a localCheckpoint block that a still-running task reads aborts
# that task unrecoverably (the lineage is truncated by construction). The
# engine's driver loops release in program order AFTER awaiting each
# action, which is safe — except for (a) orphaned stages: an AQE replan
# can let an action return while an already-submitted stage of a pruned
# subtree is still running (the r4 trussness race), and (b) any caller
# that overlaps actions from a second thread. Instead of unpersisting
# immediately, every release below is GATED: the blocks are freed only
# once no job/stage that was live at release-request time is still
# active. In the single-threaded loops the active sets are empty at
# request time and the free happens inline (no behavior change, ~1 py4j
# call); under overlap the free is deferred and drained on subsequent
# release/cut calls. The reference trusts its BSP barrier for the same
# guarantee (worker/BspServiceWorker.finishSuperstep() waits for all
# workers before checkpoint cleanup).

_PENDING_RELEASES: list[tuple[Any, frozenset, object]] = []
_RELEASES_LOCK = __import__("threading").Lock()


def _live_work_ids(sc) -> frozenset:
    """Ids of currently-active jobs AND stages (tagged to keep the two id
    spaces distinct). Stages matter independently: an orphaned stage can
    outlive its job's action returning (AQE empty-relation replan)."""
    try:
        t = sc.statusTracker()
        return frozenset(
            [("j", j) for j in t.getActiveJobsIds()]
            + [("s", s) for s in t.getActiveStageIds()]
        )
    except Exception:  # noqa: BLE001
        return frozenset()


def drain_releases() -> int:
    """Free every pending handle whose watched jobs/stages have all
    finished; return how many remain pending. Thread-safe: a release can
    be requested from a streaming foreachBatch thread while the main
    loop drains (the lock stops a concurrent append from being lost
    when the pending list is swapped)."""
    global _PENDING_RELEASES
    with _RELEASES_LOCK:
        pending, _PENDING_RELEASES = _PENDING_RELEASES, []
    if not pending:
        return 0
    still: list[tuple[Any, frozenset, object]] = []
    live_cache: dict[int, frozenset] = {}
    for sc, watched, handle in pending:
        key = id(sc)
        if key not in live_cache:
            live_cache[key] = _live_work_ids(sc)
        if watched & live_cache[key]:
            still.append((sc, watched, handle))
        else:
            try:
                handle.unpersist(False)  # type: ignore[attr-defined]
            except Exception:  # noqa: BLE001
                pass
    with _RELEASES_LOCK:
        _PENDING_RELEASES.extend(still)
        return len(_PENDING_RELEASES)


def _gated_release(sc, handle) -> None:
    """Release ``handle``'s checkpoint blocks as soon as nothing that was
    running at request time can still read them."""
    drain_releases()
    if handle is None:
        return
    watched = _live_work_ids(sc)
    if not watched:
        try:
            handle.unpersist(False)  # type: ignore[attr-defined]
        except Exception:  # noqa: BLE001
            pass
    else:
        with _RELEASES_LOCK:
            _PENDING_RELEASES.append((sc, watched, handle))


def flush_releases(timeout: float = 30.0) -> int:
    """Wait (bounded) for every pending release's watched work to finish
    and free those blocks. Entries whose watched jobs/stages are STILL
    live after the timeout stay pending — never free under a possible
    reader (the pool is process-global, so with concurrent queries a
    force-free here could yank another thread's deferred handle
    mid-read); they drain on any later gated call or die with the
    session. Returns how many remain pending."""
    deadline = time.time() + timeout
    while True:
        left = drain_releases()
        if left == 0 or time.time() >= deadline:
            return left
        time.sleep(0.05)


def _checkpointed_jrdd(df: DataFrame):
    """Best-effort handle to the java RDD backing a localCheckpoint'ed
    DataFrame (LogicalRDD.rdd), for explicit release — there is no public
    unpersist for checkpoint blocks. Returns None if the internals don't
    match (then the block lives until session end, the pre-existing
    behavior)."""
    try:
        return df._jdf.queryExecution().analyzed().rdd()  # noqa: SLF001
    except Exception:  # noqa: BLE001
        return None


def bare_checkpoint(df: DataFrame) -> tuple[DataFrame, Callable[[], None]]:
    """Eager localCheckpoint returning a BARE ``LogicalRDD`` wrap of the
    checkpointed data — stripped of the origin-stats/constraints
    references ``Dataset.checkpoint`` bakes into its leaf.

    Why it exists (measured, round 4): a checkpoint leaf keeps lazy
    references to its ORIGIN plan's statistics, and in an iterated loop
    the origin plan references the previous round's leaf several times —
    so Catalyst's stats consumers (InjectRuntimeFilter, join-strategy
    selection, AQE) walk a tree that grows ~branching^depth. In the
    trussness peel this doubled the per-round planning time every round
    (1 s -> 100 s within 8 rounds, identical plan text) and is the same
    accumulation that OOMed a round-3 run inside
    SizeInBytesOnlyStatsPlanVisitor; reliable ``checkpoint()`` carries
    the same chain, and a parquet round-trip breaks it only because a
    file scan has no origin. Rebuilding the leaf with
    ``internalCreateDataFrame`` over the already-checkpointed internal
    RDD severs the chain with zero IO: planning measured flat (70 ms)
    at every depth.

    Trades: the bare leaf loses outputPartitioning/ordering metadata
    (downstream joins may add an exchange the original leaf could have
    elided) and reports default stats. Use it for loops whose state is
    re-shuffled anyway; keep plain ``LineageCuts`` where cut-to-cut
    co-partitioning matters (the pregel superstep state).

    Returns ``(bare_df, release)``; ``release()`` frees the checkpoint
    blocks once nothing downstream reads them.
    """
    spark = df.sparkSession
    c = df.localCheckpoint(eager=True)
    handle = _checkpointed_jrdd(c)
    jdf = spark._jsparkSession.internalCreateDataFrame(  # noqa: SLF001
        c._jdf.queryExecution().toRdd(), c._jdf.schema(), False  # noqa: SLF001
    )
    bare = DataFrame(jdf, spark)

    sc = spark.sparkContext

    def release() -> None:
        _gated_release(sc, handle)

    # expose the checkpointed java-RDD handle for tests/diagnostics that
    # need the concrete rdd id (e.g. asserting release() freed exactly
    # these blocks without assuming the session-wide store is empty)
    bare._bare_checkpoint_handle = handle  # type: ignore[attr-defined]
    return bare, release


class LineageCuts:
    """Per-slot localCheckpoint bookkeeping with explicit block release.

    The engine-level mechanism behind every iterative driver loop
    (scc/mis/wcc-star): ``cut(df, slot)`` eagerly checkpoints ``df`` and
    frees the slot's previous blocks (``DataFrame.unpersist`` cannot --
    checkpoint RDD blocks are only reachable via the java handle).
    """

    def __init__(self) -> None:
        # slot -> (SparkContext, java-RDD handle): the sc is captured at
        # cut time so release() can gate on live work even when called
        # from a thread where SparkSession.getActiveSession() is None
        # (fresh py4j threads don't inherit the active-session local)
        self._handles: dict[str, tuple[Any, object]] = {}

    def cut(self, df: DataFrame, slot: str) -> DataFrame:
        out = df.localCheckpoint(eager=True)
        sc = df.sparkSession.sparkContext
        prev = self._handles.get(slot)
        if prev is not None:
            _gated_release(*prev)
        self._handles[slot] = (sc, _checkpointed_jrdd(out))
        return out

    def forget(self, slot: str) -> None:
        """Stop tracking (the cut's blocks outlive this run — e.g. the
        result) without releasing them."""
        self._handles.pop(slot, None)

    def release(self, slot: str) -> None:
        """Free a slot's blocks once no live job/stage can read them."""
        prev = self._handles.pop(slot, None)
        if prev is not None:
            _gated_release(*prev)


@dataclass
class WorkerHooks:
    """Application/superstep lifecycle hooks — the reference's
    WorkerContext surface (``worker/WorkerContext.java:78-154``:
    preApplication / preSuperstep / postSuperstep / postApplication).

    Giraph runs these once per *worker JVM*; here the superstep loop is
    driver-orchestrated, so the hooks run once per application / superstep
    on the driver, with the current vertex-state DataFrame and the loop's
    aggregator dict in scope (the idiomatic Spark home for per-worker
    setup like reading config or verifying invariants — per-executor init
    belongs inside a ``mapInPandas`` batch fn, SURVEY §2 row 13). Any
    hook may be None. ``post_superstep`` receives the superstep's stats
    dict and may mutate it (visible to ``halt`` and the history)."""

    pre_application: Callable[[DataFrame], None] | None = None
    pre_superstep: Callable[[DataFrame, int], None] | None = None
    post_superstep: Callable[[DataFrame, int, dict[str, Any]], None] | None = None
    post_application: Callable[[DataFrame], None] | None = None


@dataclass
class PregelRun:
    """Outcome of a superstep loop."""

    vertices: DataFrame
    supersteps: int
    converged: bool
    history: list[dict[str, Any]] = field(default_factory=list)

    @property
    def last_stats(self) -> dict[str, Any]:
        return self.history[-1] if self.history else {}


def run_supersteps(
    spark: SparkSession,
    vertices: DataFrame,
    step: Callable[[DataFrame, int], tuple[DataFrame, dict[str, Any]]],
    max_supersteps: int,
    halt: Callable[[dict[str, Any], int], bool] | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
    lineage_cut_interval: int = 1,
    hooks: WorkerHooks | None = None,
    verbose: bool = False,
    step_precut: bool = False,
) -> PregelRun:
    """Drive the BSP loop.

    ``step_precut=True`` declares that ``step`` returns a LAZILY
    localCheckpoint'ed frame whose own convergence action materializes
    the checkpoint blocks (``df.localCheckpoint(eager=False)`` issued
    BEFORE the step's aggregate). The loop then skips both its persist
    and its separate eager-cut job — one Spark job per superstep instead
    of two — and keeps only the block-release bookkeeping. Measured at
    sf0.1: the dedicated localCheckpoint job plus its driver gap was
    ~120 ms of the ~430 ms superstep floor.

    ``step(vertices, superstep)`` returns ``(new_vertices, stats)`` and must
    have issued exactly the actions it needs (typically ONE ``agg`` that
    both materializes the new state and computes convergence metrics —
    the per-superstep aggregator gather of MasterCompute.java:41-47).
    ``halt(stats, superstep)`` True ends the loop — the master halt
    decision of BspServiceMaster.java:1654-1679. Snapshots + per-partition
    lineage metrics are written every ``checkpoint_interval`` supersteps;
    with ``resume=True`` the loop continues from the newest valid snapshot.

    Lineage-cut invalidation: each cut explicitly releases the PREVIOUS
    cut's localCheckpoint blocks, so a ``step``/``halt`` closure must not
    retain and later re-execute a DataFrame derived from an earlier
    superstep — it would fail with "checkpoint block not found". Derive
    everything you need within the superstep (or from ``PregelRun.
    vertices`` after the loop).

    Fault tolerance at cluster scale: ``localCheckpoint`` blocks are
    executor-local and NOT fault-tolerant — between reliable snapshots,
    one lost executor aborts the run (the job then restarts from the
    newest ``checkpoint_dir`` snapshot via ``resume=True``, Giraph's
    checkpoint-restart contract, BspServiceMaster superstep recovery).
    On a 1000-executor cluster size ``checkpoint_interval`` by
    (executor MTBF / superstep time): the cost of a reliable snapshot
    every k supersteps buys losing at most k supersteps of work, while
    the per-superstep local cut only bounds plan growth. local[*] runs
    can ignore this (one JVM = no partial loss).

    Concurrency: the loop toggles the session-wide
    ``spark.sql.adaptive.enabled`` conf for its duration (see the inline
    rationale below) and assumes a SINGLE-THREADED driver — queries run
    concurrently on the same SparkSession from other threads would
    silently lose AQE's skew handling while a loop is active, and two
    interleaved loops could restore a stale value. Run concurrent
    driver-side work on a separate ``spark.newSession()`` clone (its conf
    is independent) if that pattern is ever needed.
    """
    ckpt = (
        CheckpointManager(spark, checkpoint_dir, checkpoint_interval)
        if checkpoint_dir
        else None
    )
    superstep = 0
    if resume and ckpt is not None:
        found = ckpt.latest()
        if found is not None:
            superstep, vertices, _m = found
            if verbose:
                print(f"[pregel] resuming from checkpoint superstep={superstep}")

    current = vertices.persist()
    start_partitions = current.rdd.getNumPartitions()
    est_partitions = start_partitions  # maintained from each cut's java RDD
    # AQE off for the loop: superstep plans are fixed-shape (explicit
    # shuffle_hash hints, explicit partition counts, salting for skew),
    # so adaptive re-planning adds only its latency — AQE materializes
    # query stages one at a time with a driver re-plan between them,
    # measured ~60ms/superstep at sf0.1 (interleaved 5-rep A/B medians:
    # 490 -> 433 ms/superstep). Restored after the loop so one-shot
    # analytics queries keep AQE's skew-join safety net.
    history: list[dict[str, Any]] = []
    converged = False
    last_saved = superstep if (resume and ckpt is not None) else None
    prev_cut_jrdd = None  # java RDD behind the previous lineage cut
    suppress_aqe(spark)  # refcounted: safe under overlapping loops
    try:
        # inside the try so a raising hook cannot leak AQE=false into the
        # shared session (the finally below always restores it)
        if hooks is not None and hooks.pre_application is not None:
            hooks.pre_application(current)
        while superstep < max_supersteps:
            t0 = time.time()
            if hooks is not None and hooks.pre_superstep is not None:
                hooks.pre_superstep(current, superstep)
            new_vertices, stats = step(current, superstep)
            if not step_precut:
                new_vertices = new_vertices.persist()
            if not stats:  # ensure materialization even if step ran no action
                stats = {"rows": new_vertices.count()}
            stats = dict(stats)
            stats["superstep"] = superstep
            stats["seconds"] = time.time() - t0
            if hooks is not None and hooks.post_superstep is not None:
                hooks.post_superstep(new_vertices, superstep, stats)
            history.append(stats)
            if verbose:
                print(f"[pregel] superstep={superstep} {stats}")

            superstep += 1
            current.unpersist()
            current = new_vertices

            if ckpt is not None and ckpt.should_save(superstep):
                reloaded = ckpt.save(current, superstep, stats)
                last_saved = superstep
                if step_precut:
                    # the reliable snapshot replaces the precut state:
                    # release this superstep's (and the pending previous)
                    # checkpoint blocks now — nothing reads them again
                    _gated_release(spark.sparkContext, _checkpointed_jrdd(current))
                    _gated_release(spark.sparkContext, prev_cut_jrdd)
                    prev_cut_jrdd = None
                current.unpersist()
                current = reloaded.persist()
            elif step_precut:
                # the step's action already materialized this superstep's
                # checkpoint blocks — just swap the release handles
                _gated_release(spark.sparkContext, prev_cut_jrdd)
                prev_cut_jrdd = _checkpointed_jrdd(current)
                if prev_cut_jrdd is not None:
                    try:
                        est_partitions = int(prev_cut_jrdd.getNumPartitions())
                    except Exception:  # noqa: BLE001
                        est_partitions = start_partitions
                # same defensive width bound as the eager-cut branch below:
                # a step that unions frames compounds partition width every
                # superstep until the cut materializes tens of thousands of
                # tiny blocks. The coalesce is narrow and lands on the INPUT
                # of the next step, so its cut materializes at the bounded
                # width (one superstep of lag, 8x headroom — same contract
                # as the est_partitions probe documented below)
                if est_partitions > 8 * max(start_partitions, 1):
                    current = current.coalesce(start_partitions)
                    est_partitions = start_partitions
            elif lineage_cut_interval and superstep % lineage_cut_interval == 0:
                # bound Catalyst analysis time across iterations (risk register:
                # iterative-plan blowup; Giraph analog: checkpoint frequency).
                # Measured: without the cut, analysis grows ~+3s/superstep on a
                # 16M-edge graph, while the cut itself reuses the cached
                # partitions and costs well under a second — hence every step.
                # defensive width bound: a step that unions frames (narrow
                # union sums partition counts) would otherwise compound the
                # width superstep over superstep until the cut materializes
                # tens of thousands of tiny blocks; coalesce is narrow (no
                # shuffle) and a no-op while the width stays sane
                persisted = current  # keep a handle: unpersist must target the
                # CACHED frame, not a coalesce built on top of it (coalesce is
                # a different plan — unpersisting it is a no-op and leaks)
                # width probe: use the PREVIOUS cut's width (a plain java-RDD
                # call) instead of converting `current` to a python RDD every
                # superstep (DataFrame.rdd re-analyzes the plan and builds a
                # pickle pipeline — a measurable slice of the per-superstep
                # driver floor). One step of lag is safe: the bound is
                # defensive with 8x headroom, so a union-growing step coalesces
                # at the NEXT cut instead of this one.
                if est_partitions > 8 * max(start_partitions, 1):
                    current = current.coalesce(start_partitions)
                cut = current.localCheckpoint(eager=True)
                persisted.unpersist()
                current = cut
                # release the PREVIOUS cut's checkpointed RDD: unlike persist(),
                # localCheckpoint blocks are not freed by DataFrame.unpersist,
                # so a long run would otherwise hold every superstep's state
                _gated_release(spark.sparkContext, prev_cut_jrdd)
                prev_cut_jrdd = _checkpointed_jrdd(cut)
                if prev_cut_jrdd is not None:
                    try:
                        est_partitions = int(prev_cut_jrdd.getNumPartitions())
                    except Exception:  # noqa: BLE001
                        est_partitions = start_partitions

            if halt is not None and halt(stats, superstep):
                converged = True
                break

        # final snapshot — but never overwrite the directory the current state
        # was just reloaded from (write-into-source)
        if ckpt is not None and history and last_saved != superstep:
            ckpt.save(current, superstep, history[-1])
        if hooks is not None and hooks.post_application is not None:
            hooks.post_application(current)
    finally:
        restore_aqe(spark)
        # opportunistic, non-forcing: free any release whose watched
        # work has finished (the loop's own releases are usually freed
        # inline; this catches ones deferred past a straggler)
        drain_releases()
    return PregelRun(
        vertices=current, supersteps=superstep, converged=converged, history=history
    )
