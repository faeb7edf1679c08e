"""Bracha-Toueg deadlock detection — the reference's golden fixtures.

Each case mirrors ``giraph-examples/src/test/java/org/apache/giraph/
examples/BrachaTouegDeadlockComputationTest.java:47-232`` (input format
``[id,[[dst,tag],...]]`` with default initiator 1).
"""
from __future__ import annotations

import pytest

from giraph_spark.algorithms.deadlock import bracha_toueg_free, is_deadlocked


def _run(spark, vertices, requests, initiator=1):
    vdf = spark.createDataFrame([(v,) for v in vertices], "id long")
    if requests:
        rdf = spark.createDataFrame(requests, "src long, dst long, tag long")
    else:
        rdf = spark.createDataFrame([], "src long, dst long, tag long")
    run = bracha_toueg_free(spark, rdf, initiator, vertices=vdf)
    return {r.id: r.is_free for r in run.vertices.collect()}


def test_one_init_node(spark):
    # [1,[]] -> 1 free (isolated initiator)
    assert _run(spark, [1], []) == {1: True}


def test_one_not_init_node(spark):
    # [0,[]] with initiator 1 absent -> 0 never notified
    assert _run(spark, [0], []) == {0: False}


def test_three_nodes_free_but_unnotified(spark):
    # 2 and 3 wait on the free initiator but are never NOTIFY-reached
    got = _run(spark, [1, 2, 3], [(2, 1, 0), (3, 1, 0)])
    assert got == {1: True, 2: False, 3: False}


def test_three_nodes_cycle_all_blocked(spark):
    got = _run(spark, [1, 2, 3], [(1, 2, 0), (2, 3, 0), (3, 1, 0)])
    assert got == {1: False, 2: False, 3: False}
    rdf = spark.createDataFrame(
        [(1, 2, 0), (2, 3, 0), (3, 1, 0)], "src long, dst long, tag long"
    )
    assert is_deadlocked(spark, rdf, 1)


def test_three_nodes_multi_tag_groups_free(spark):
    # 1 waits for 2 (group 0) and 3 (group 1): either grant frees it
    got = _run(spark, [1, 2, 3], [(1, 2, 0), (1, 3, 1)])
    assert got == {1: True, 2: True, 3: True}


def test_three_nodes_one_group_n_out_of_m_free(spark):
    # both in group 0: needs both grants; both targets are free leaves
    got = _run(spark, [1, 2, 3], [(1, 2, 0), (1, 3, 0)])
    assert got == {1: True, 2: True, 3: True}


def test_initiator_2_confines_notification(spark):
    # same graph, initiator=2: only 2 is notified (it has no out-edges)
    got = _run(spark, [1, 2, 3], [(1, 2, 0), (1, 3, 0)], initiator=2)
    assert got == {1: False, 2: True, 3: False}


def test_three_nodes_blocked_n_out_of_m(spark):
    # 1 needs both 2 and 3; 2 and 3 deadlock each other
    got = _run(spark, [1, 2, 3], [(1, 2, 0), (1, 3, 0), (2, 3, 0), (3, 2, 0)])
    assert got == {1: False, 2: False, 3: False}


def test_five_nodes_all_free(spark):
    # 4's three requests sit in three distinct groups: 5's grant unblocks it
    reqs = [
        (1, 2, 0), (1, 5, 0),
        (2, 4, 0),
        (3, 2, 0), (3, 5, 0),
        (4, 1, 0), (4, 5, 1), (4, 3, 2),
    ]
    got = _run(spark, [1, 2, 3, 4, 5], reqs)
    assert got == {1: True, 2: True, 3: True, 4: True, 5: True}


def test_five_nodes_blocked(spark):
    # same but 4's groups are {1} and {5,3}: 3 never grants -> deadlock
    reqs = [
        (1, 2, 0), (1, 5, 0),
        (2, 4, 0),
        (3, 2, 0), (3, 5, 0),
        (4, 1, 0), (4, 5, 1), (4, 3, 1),
    ]
    got = _run(spark, [1, 2, 3, 4, 5], reqs)
    assert got == {1: False, 2: False, 3: False, 4: False, 5: True}
