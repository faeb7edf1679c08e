"""Aggregator / reducer library — the reference's scalar+array reduce
surface as named Spark aggregate expressions.

Maps every aggregator family in
``giraph-core/src/main/java/org/apache/giraph/aggregators/`` and
``reducers/impl/`` (SURVEY.md §2.2) onto one Catalyst expression; the
distributed tree-reduce (partial + final aggregation) replaces both the
MessageCombiner path and the sharded-reducer machinery
(``reducers/collect/ShardedReducerHandle.java`` — unnecessary on Spark,
where ``agg`` has no master bottleneck).

Use with the Pregel core's per-superstep aggregate, ``blocks.
reduce_and_broadcast``, or directly: ``df.agg(reducer("sum", "x"))``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_REDUCERS: dict[str, object] = {
    # {Int,Long,Float,Double}SumAggregator / SumReduce
    "sum": F.sum,
    # *MinAggregator / MinReduce, *MaxAggregator / MaxReduce
    "min": F.min,
    "max": F.max,
    # *ProductAggregator
    "product": F.product,
    # BooleanAndAggregator / AndReduce, BooleanOrAggregator / OrReduce
    "and": F.bool_and,
    "or": F.bool_or,
    # LongXorReduce handled specially in reducer() (SQL-only aggregate)
    # *OverwriteAggregator — any surviving value wins in a distributed agg
    "overwrite": F.any_value,
    # TextAppendAggregator
    "append": lambda c: F.concat_ws("", F.collect_list(c)),
    "count": F.count,
    "avg": F.avg,
}


def reducer(name: str, col: Column | str) -> Column:
    """Named reduce operation over a column (ReduceOperation.java:36-63)."""
    c = F.col(col) if isinstance(col, str) else col
    if name == "xor":
        # LongXorReduce — SQL aggregate, no DataFrame-API twin
        if not isinstance(col, str):
            raise ValueError("xor reducer needs a column name")
        return F.expr(f"bit_xor({col})")
    if name not in _REDUCERS:
        raise ValueError(f"unknown reducer {name!r}; have {sorted(_REDUCERS)}")
    return _REDUCERS[name](c)  # type: ignore[operator]


def top_n(df: DataFrame, col: str, n: int, ascending: bool = False) -> DataFrame:
    """TopNReduce (giraph-block-app/.../reducers/TopNReduce.java:32) —
    bounded priority queue == Spark's TakeOrdered (orderBy + limit).

    Ties on ``col`` are broken by the remaining columns ascending, so the
    selected set (and its order) is deterministic across executions — the
    reference's priority queue is likewise total-ordered on (value, id).
    """
    ordering = [F.col(col).asc() if ascending else F.col(col).desc()]
    ordering += [F.col(c).asc() for c in df.columns if c != col]
    return df.orderBy(*ordering).limit(n)


def arg_max(df: DataFrame, key: str, by: str) -> DataFrame:
    """MaxPairReducer (argmax): the row whose ``by`` is maximal,
    deterministic tie-break on smallest ``key``."""
    return df.agg(
        F.expr(f"max_by({key}, struct({by}, -{key}))").alias(key),
        F.max(by).alias(by),
    )


def matrix_reduce(
    df: DataFrame,
    name: str = "sum",
    row: str = "row",
    col: str = "col",
    val: str = "val",
) -> DataFrame:
    """Matrix aggregators (``aggregators/matrix/dense/*MatrixSumAggregator
    .java``, ``sparse/*``): the distributed reduce of per-worker (row, col,
    val) contributions. A sparse COO DataFrame groupBy replaces both the
    dense and sparse variants — absent cells are implicit zeros, and the
    tree-reduce has no master bottleneck."""
    return df.groupBy(row, col).agg(reducer(name, val).alias(val))


def vector_reduce(
    df: DataFrame, name: str = "sum", pos: str = "pos", val: str = "val"
) -> DataFrame:
    """Vector aggregators (``aggregators/matrix/dense/*VectorSumAggregator
    .java``) — one row per coordinate."""
    return df.groupBy(pos).agg(reducer(name, val).alias(val))


def keyed_reduce(df: DataFrame, key: str, name: str, col: str, alias: str) -> DataFrame:
    """Sharded/huge reducers (ArrayReduce, BasicMapReduce,
    ShardedReducerHandle — e.g. the 3137-shard per-component size count in
    UndirectedConnectedComponents.java:347-373): on Spark just a keyed
    groupBy, already a distributed tree-reduce."""
    return df.groupBy(key).agg(reducer(name, col).alias(alias))
