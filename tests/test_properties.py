"""Property-based tests (hypothesis) — randomized semantics checks.

Mirrors the reference's randomized-graph test strategy (SURVEY.md §5:
e.g. ``TestGraphPartitioner`` / aggregator tests run over generated
inputs, not only fixtures): each property drives the same Spark
aggregate / gather through arbitrary small inputs and compares against
a plain-Python model.

Spark-per-example is expensive, so examples are capped and the shared
module session is reused; these are semantics properties, not fuzzing.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from giraph_spark.reducers import arg_max, reducer, top_n

# derandomize: the suite must be deterministically green run-over-run —
# examples are generated from a fixed seed, not the wall clock
SET = settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)

ints = st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=30)


@SET
@given(xs=ints)
def test_scalar_reducers_match_python(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    row = df.agg(
        reducer("sum", "x").alias("s"),
        reducer("min", "x").alias("mn"),
        reducer("max", "x").alias("mx"),
        reducer("count", "x").alias("n"),
        reducer("xor", "x").alias("xr"),
    ).collect()[0]
    want_xor = 0
    for x in xs:
        want_xor ^= x & (2**64 - 1)
    # bit_xor is over two's-complement longs; normalize both to unsigned
    assert (row.xr & (2**64 - 1)) == want_xor
    assert (row.s, row.mn, row.mx, row.n) == (sum(xs), min(xs), max(xs), len(xs))


@SET
@given(
    xs=st.lists(
        st.tuples(st.integers(0, 9), st.integers(-1000, 1000)),
        min_size=1,
        max_size=40,
    ),
    k=st.integers(1, 5),
)
def test_salted_topk_gather_equals_unsalted(spark, xs, k):
    """The two-level bounded merge is exactly the plain top-k for ANY
    message multiset, salt count, and k (associativity of bounded
    ordered merge)."""
    from giraph_spark.pregel import gather_topk_messages

    msgs = spark.createDataFrame(xs, "dst long, msg long")
    plain = {
        r.dst: list(r.topk)
        for r in gather_topk_messages(msgs, k, salt=None).collect()
    }
    salted = {
        r.dst: list(r.topk)
        for r in gather_topk_messages(msgs, k, salt=3).collect()
    }
    assert salted == plain
    # model check: per-key descending top-k
    want: dict[int, list[int]] = {}
    for d, m in xs:
        want.setdefault(d, []).append(m)
    want = {d: sorted(v, reverse=True)[:k] for d, v in want.items()}
    assert plain == want


@SET
@given(
    xs=st.lists(
        st.tuples(st.integers(0, 20), st.floats(-100, 100, allow_nan=False)),
        min_size=1,
        max_size=25,
    ),
    n=st.integers(1, 4),
)
def test_top_n_and_argmax_match_python(spark, xs, n):
    df = spark.createDataFrame(xs, "id long, v double")
    got = [(r.id, r.v) for r in top_n(df, "v", n).collect()]
    want = sorted(xs, key=lambda t: (-t[1], t[0]))[:n]
    assert got == want
    am = arg_max(df, key="id", by="v").collect()[0]
    best_v = max(v for _, v in xs)
    best_id = min(i for i, v in xs if v == best_v)
    assert (am.id, am.v) == (best_id, best_v)
    assert math.isfinite(am.v)


@settings(max_examples=5, deadline=None, derandomize=True, suppress_health_check=[HealthCheck.too_slow])
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(
            lambda t: t[0] != t[1]
        ),
        min_size=1,
        max_size=40,
    )
)
def test_wcc_matches_union_find(spark, edges):
    """Min-label WCC over arbitrary digraphs == plain union-find."""
    from giraph_spark.algorithms.wcc import connected_components

    df = spark.createDataFrame(list(set(edges)), "src long, dst long")
    got = {
        r.id: r.component
        for r in connected_components(spark, df, max_supersteps=30).vertices.collect()
    }
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots: dict[int, list[int]] = {}
    for v in {x for e in edges for x in e}:
        roots.setdefault(find(v), []).append(v)
    want = {v: min(vs) for vs in roots.values() for v in vs}
    assert got == want


def test_pagerank_partition_count_invariance(spark):
    """SURVEY §5 derived-plan item (e): the same job at different
    physical parallelism yields the same scores — partition count must
    only change summation order (bounded float noise), never semantics."""
    from giraph_spark.algorithms.pagerank import pagerank

    n = 150
    rows = [((i * 17 + j) % n, (i * 31 + 7 * j) % n) for i in range(n) for j in (1, 2)]
    rows = [(a, b) for a, b in rows if a != b]
    e = spark.createDataFrame(sorted(set(rows)), "src long, dst long")
    r_small = {
        r.id: r.rank
        for r in pagerank(
            spark, e.repartition(2), max_supersteps=8, tolerance=None, num_partitions=2
        ).vertices.collect()
    }
    r_big = {
        r.id: r.rank
        for r in pagerank(
            spark, e.repartition(13), max_supersteps=8, tolerance=None, num_partitions=13
        ).vertices.collect()
    }
    assert r_small.keys() == r_big.keys()
    assert max(abs(r_small[k] - r_big[k]) for k in r_small) < 1e-9


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


@SET
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-50, 50)),
        min_size=1,
        max_size=40,
    ),
    k=st.integers(1, 4),
)
def test_grouped_topk_matches_python(spark, rows, k):
    from giraph_spark.graph import grouped_topk

    df = spark.createDataFrame(rows, "g long, v long")
    got = sorted(
        (r.g, r.v, r.rk)
        for r in grouped_topk(
            df, ["g"], [F.desc("v"), F.asc("g")], k, salt=None
        ).collect()
    )
    salted = sorted(
        (r.g, r.v, r.rk)
        for r in grouped_topk(
            df, ["g"], [F.desc("v"), F.asc("g")], k, salt=4, salt_on="v"
        ).collect()
    )
    # python model: per group sort desc, take k (row_number over a
    # non-total order is tie-ambiguous in v, so compare multisets of v)
    want = []
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        for i, v in enumerate(sorted(vs, reverse=True)[:k], 1):
            want.append((g, v, i))
    assert got == sorted(want)
    assert salted == got


@SET
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 6), st.sampled_from("abc"), st.integers(0, 50)),
        min_size=1,
        max_size=40,
    )
)
def test_funnel_counts_match_python(spark, rows):
    from datetime import datetime, timedelta

    from giraph_spark.pipeline import funnel

    base = datetime(2024, 1, 1)
    data = [(u, t, base + timedelta(seconds=s)) for u, t, s in rows]
    df = spark.createDataFrame(
        data, "user_id long, event_type string, ts timestamp"
    )
    steps = ["a", "b", "c"]
    got = {r.step: r.n_users for r in funnel(df, steps).collect()}

    def reach(u):
        evs = sorted((s, t) for uu, t, s in rows if uu == u)
        depth, t_prev = 0, None
        for step in steps:
            cand = [s for s, t in evs if t == step and (t_prev is None or s > t_prev)]
            if not cand:
                break
            t_prev = min(cand)
            depth += 1
        return depth

    users = {u for u, _, _ in rows}
    for i in range(1, 4):
        want = sum(1 for u in users if reach(u) >= i)
        assert got.get(i, 0) == want
