"""Densest subgraph (Bahmani et al. (1+eps)-peel) vs a pure-Python
replay of the same deterministic peel, plus structural sanity."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from giraph_spark.algorithms.densest import densest_subgraph


def _replay(edge_list, eps):
    adj = defaultdict(set)
    for u, v in edge_list:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    alive = set(adj)
    factor = 2.0 * (1.0 + eps)
    rounds: dict[int, int] = {}
    hist = []
    r = 0
    while alive:
        r += 1
        deg = {u: len(adj[u] & alive) for u in alive}
        m2 = sum(deg.values())
        n = len(alive)
        rho = (m2 / 2) / n
        hist.append((r, rho))
        thr = factor * rho
        rem = {u for u in alive if deg[u] <= thr}
        for u in rem:
            rounds[u] = r
        alive -= rem
    best_r = max(hist, key=lambda t: (t[1], -t[0]))[0] if hist else 0
    best_rho = max((t[1] for t in hist), default=0.0)
    return rounds, best_r, best_rho


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_k5_with_tail(spark):
    # K5 on 1..5 plus tail 5-6-7-8: densest = the K5 (rho 2.0)
    k5 = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    tail = [(5, 6), (6, 7), (7, 8)]
    res = densest_subgraph(spark, _edges_df(spark, k5 + tail), eps=0.1)
    rows = {r["id"]: r for r in res.vertices.collect()}
    dens = {i for i, r in rows.items() if r["in_densest"]}
    assert dens == {1, 2, 3, 4, 5}
    assert res.best_density == pytest.approx(2.0)
    exp_rounds, exp_best, exp_rho = _replay(k5 + tail, 0.1)
    assert res.best_round == exp_best
    assert res.best_density == exp_rho
    assert {i: r["removal_round"] for i, r in rows.items()} == exp_rounds


@pytest.mark.parametrize("eps", [0.1, 0.5])
def test_matches_python_replay_random(spark, eps):
    import numpy as np

    rng = np.random.RandomState(11)
    pairs = list(
        {
            (int(a), int(b))
            for a, b in zip(rng.randint(0, 60, 400), rng.randint(0, 60, 400))
            if a != b
        }
    )
    res = densest_subgraph(spark, _edges_df(spark, pairs), eps=eps)
    exp_rounds, exp_best, exp_rho = _replay(pairs, eps)
    got = {r["id"]: r["removal_round"] for r in res.vertices.collect()}
    assert got == exp_rounds
    assert res.best_round == exp_best
    assert res.best_density == pytest.approx(exp_rho, abs=0)
    # in_densest consistency
    n_in = res.vertices.where("in_densest").count()
    assert n_in == sum(1 for v, r in exp_rounds.items() if r >= exp_best)


def test_single_edge_and_isolated_free(spark):
    res = densest_subgraph(spark, _edges_df(spark, [(1, 2)]), eps=0.5)
    rows = {r["id"]: r for r in res.vertices.collect()}
    assert set(rows) == {1, 2}
    # rho = 1/2; thr = 3 * 0.5 = 1.5 >= deg 1 -> both removed round 1
    assert all(r["removal_round"] == 1 and r["in_densest"] for r in rows.values())
    assert res.best_density == pytest.approx(0.5)
    assert res.rounds == 1


def test_density_history_monotone_shrink(spark):
    k5 = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    res = densest_subgraph(spark, _edges_df(spark, k5 + [(5, 6)]), eps=0.2)
    ns = [h["n"] for h in res.history]
    assert ns == sorted(ns, reverse=True) and len(set(ns)) == len(ns)
