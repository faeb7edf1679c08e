"""Pipeline primitives: deterministic sampling, distributed prefix sum,
shard packing (giraph_spark/pipeline.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from giraph_spark.pipeline import (
    hash_fraction,
    pack_shards,
    prefix_sum,
    sample_by_hash,
    stratified_sample_by_hash,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


def test_sample_by_hash_deterministic_disjoint(docs):
    a = {r.doc_id for r in sample_by_hash(docs, "doc_id", 0.3).collect()}
    b = {r.doc_id for r in sample_by_hash(docs, "doc_id", 0.3).collect()}
    assert a == b
    rest = {
        r.doc_id
        for r in docs.where(hash_fraction("doc_id") >= 0.3).collect()
    }
    total = docs.count()
    assert len(a) + len(rest) == total and not (a & rest)
    # roughly the requested fraction (hash-uniform)
    assert 0.1 < len(a) / total < 0.5


def test_stratified_rates(docs):
    out = stratified_sample_by_hash(
        docs, "doc_id", "lang", {"en": 1.0}, default_fraction=0.0
    )
    got = {(r.doc_id, r.lang) for r in out.select("doc_id", "lang").collect()}
    want = {(r.doc_id, r.lang) for r in docs.where("lang = 'en'").select("doc_id", "lang").collect()}
    assert got == want


@pytest.mark.parametrize("parts", [1, 3, 8])
def test_prefix_sum_matches_python(spark, parts):
    rows = [(i, (i * 37 + 11) % 100 + 1) for i in range(257)]
    df = spark.createDataFrame(rows, "k long, w long").repartition(5)
    got = {
        r.k: r.cumsum
        for r in prefix_sum(df, "k", "w", num_partitions=parts).collect()
    }
    acc, want = 0, {}
    for k, w in rows:
        acc += w
        want[k] = acc
    assert got == want


def test_pack_shards_budget_and_contiguity(spark):
    rows = [(i, (i * 53 + 17) % 400 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, w long")
    budget = 1500
    out = sorted(
        ((r.k, r.w, r.shard) for r in pack_shards(df, "k", "w", budget).collect())
    )
    max_w = max(w for _, w in rows)
    # shards non-decreasing and gap-free in key order
    shards = [s for _, _, s in out]
    assert shards == sorted(shards)
    assert set(shards) == set(range(max(shards) + 1))
    # per-shard total bounded by budget + one straddling row
    totals: dict[int, int] = {}
    for _, w, s in out:
        totals[s] = totals.get(s, 0) + w
    assert all(t < budget + max_w for t in totals.values())
    # all but the last shard are at least budget-full up to the straddler
    for s, t in totals.items():
        if s != max(shards):
            assert t >= budget - max_w


def test_prefix_sum_signed_values(spark):
    """Partition totals must be sums, not maxima of the running sum —
    regression for signed val_col."""
    rows = [(i, (5 if i % 2 == 0 else -3)) for i in range(40)]
    df = spark.createDataFrame(rows, "k long, w long")
    got = {r.k: r.cumsum for r in prefix_sum(df, "k", "w", num_partitions=4).collect()}
    acc, want = 0, {}
    for k, w in rows:
        acc += w
        want[k] = acc
    assert got == want
