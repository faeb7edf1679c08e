"""ANF / HyperANF: exact baseline vs HLL-sketch scale path.

Layered strategy per SURVEY.md §5: tiny graphs with hand-computable
curves, then the sketch variant cross-checked against the exact one on
a real fixture slice within HLL error bounds.
"""

from __future__ import annotations

import pytest

from giraph_spark.algorithms.anf import anf_exact, anf_hll, effective_diameter
from giraph_spark.datasets import scc_demo_edges

SF = "/root/testdata/sf0.001"


def test_anf_exact_path_graph(spark):
    # path 1-2-3-4: N(0)=4, N(1)=4+2*3=10 (ends reach 1, middles 2),
    # N(2)=4+6+4=14, N(3)=16 (all pairs), N(4)=16
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    got = {r["t"]: r["n_pairs"] for r in anf_exact(spark, edges, max_t=4).collect()}
    assert got == {0: 4, 1: 10, 2: 14, 3: 16, 4: 16}


def test_anf_exact_emits_full_range_after_convergence(spark):
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    got = anf_exact(spark, edges, max_t=3).collect()
    assert [(r["t"], r["n_pairs"]) for r in sorted(got)] == [
        (0, 2),
        (1, 4),
        (2, 4),
        (3, 4),
    ]


def test_anf_hll_matches_exact_within_sketch_error(spark):
    edges = scc_demo_edges(spark, SF)
    exact = {r["t"]: r["n_pairs"] for r in anf_exact(spark, edges, max_t=6).collect()}
    est = {
        r["t"]: r["n_pairs_est"]
        for r in anf_hll(spark, edges, max_t=6, lgk=14, rel_eps=0.0).collect()
    }
    # lgk=14 -> relative standard error ~0.8%; allow 4 sigma
    for t, n in exact.items():
        assert t in est
        assert abs(est[t] - n) / n < 0.04, (t, n, est[t])


def test_effective_diameter_interpolation(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    curve = anf_exact(spark, edges, max_t=4)
    d = effective_diameter(curve, q=0.9)
    # target 14.4 pairs sits between N(2)=14 and N(3)=16 -> 2.2
    assert d == pytest.approx(2.2, abs=1e-9)
