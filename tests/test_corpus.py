"""Corpus generator + extraction invariants.

The per-row invariant from BASELINE.json input_hint: byte-identical
extracted text per url (`extract_text(html) == text` exactly).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from giraph_spark.corpus import (
    N_HUBS,
    build_edges,
    extract_links,
    synth_corpus,
    url_id,
    with_extracted_text,
)


def test_byte_identical_extraction(spark):
    pages = synth_corpus(spark, n_pages=500, seed=42)
    df = with_extracted_text(pages)
    bad = df.where(F.col("extracted_text") != F.col("text")).count()
    assert bad == 0
    assert df.count() == 500


def test_corpus_deterministic(spark):
    a = synth_corpus(spark, 300, seed=42).orderBy("url").collect()
    b = synth_corpus(spark, 300, seed=42).orderBy("url").collect()
    assert a == b
    c = synth_corpus(spark, 300, seed=7).orderBy("url").collect()
    assert a != c


def test_links_resolved_to_canonical_urls(spark):
    pages = synth_corpus(spark, 400, seed=42)
    links = extract_links(pages)
    # every resolved href is absolute and points at a generated page url
    n_rel = links.where(~F.col("href").startswith("https://")).count()
    assert n_rel == 0
    known = pages.select(F.col("url").alias("href")).distinct()
    dangling = links.join(known, "href", "left_anti").count()
    assert dangling == 0


def test_edges_dedup_and_hub_skew(spark):
    pages = synth_corpus(spark, 1000, seed=42)
    edges = build_edges(pages).cache()
    n = edges.count()
    assert n > 1000
    assert edges.dropDuplicates(["src", "dst"]).count() == n
    assert edges.where(F.col("src") == F.col("dst")).count() == 0
    # hub pages (index 0..N_HUBS-1) should absorb a large share of in-links
    from giraph_spark.corpus import page_url
    import numpy as np

    hub_urls = page_url(np.arange(N_HUBS), max(10, 1000 // 50)).tolist()
    hub_ids = {
        r.id
        for r in spark.createDataFrame([(u,) for u in hub_urls], "url string")
        .select(url_id(F.col("url")).alias("id"))
        .collect()
    }
    hub_in = edges.where(F.col("dst").isin(list(hub_ids))).count()
    assert hub_in / n > 0.02  # dedup collapses repeats, skew still visible
    edges.unpersist()


def test_host_graph_rollup(spark):
    from giraph_spark.corpus import extract_links, host_graph, synth_corpus

    pages = synth_corpus(spark, 400, seed=7)
    hg = host_graph(pages).cache()
    total_links = extract_links(pages).count()
    rows = hg.collect()
    assert sum(r.n_links for r in rows) == total_links
    assert all(r.src_host and r.dst_host for r in rows)
    # multi-site corpus → cross-host edges exist
    assert any(r.src_host != r.dst_host for r in rows)
    hg.unpersist()


def test_canonicalize_url_cases(spark):
    from giraph_spark.corpus import canonicalize_url

    cases = {
        "HTTP://A.Com:80/X": "http://a.com/X",
        "https://B.com:443/": "https://b.com",
        "http://c.com/p?utm_source=x": "http://c.com/p",
        "http://c.com/p?z=1&a=2&utm_b=3#frag": "http://c.com/p?a=2&z=1",
        "http://c.com/p/": "http://c.com/p",
        "http://c.com:8080/p": "http://c.com:8080/p",
        "https://d.com/A/B?b=2&a=1": "https://d.com/A/B?a=1&b=2",
    }
    df = spark.createDataFrame([(k,) for k in cases], "url string")
    got = {
        r.url: r.c
        for r in df.select("url", canonicalize_url(F.col("url")).alias("c")).collect()
    }
    assert got == cases


def test_mirror_hosts_detects_alias(spark):
    from pyspark.sql import functions as F

    from giraph_spark.corpus import mirror_hosts

    urls = [
        # a.com and b.com serve identical 3-path sets (mirrors);
        # c.com shares only 1 of its 3 paths with a.com
        *[f"https://a.com/p/{i}" for i in range(3)],
        *[f"https://b.com/p/{i}" for i in range(3)],
        "https://c.com/p/0", "https://c.com/x", "https://c.com/y",
        # www-alias canonicalizes to the same host only if url identical;
        # different-case scheme + utm noise still match after canon
        "HTTPS://a.com/p/0?utm_source=z",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {(r.host_a, r.host_b): (r.n_shared, r.jaccard)
           for r in mirror_hosts(df, threshold=0.5).collect()}
    assert got == {("a.com", "b.com"): (3, 1.0)}
    low = {(r.host_a, r.host_b)
           for r in mirror_hosts(df, threshold=0.2).collect()}
    assert ("a.com", "c.com") in low and ("b.com", "c.com") in low


def test_domain_graph_rolls_up_hosts(spark):
    from giraph_spark.corpus import domain_graph, host_graph, synth_corpus

    pages = synth_corpus(spark, n_pages=300, seed=11, n_sites=5)
    hg = host_graph(pages)
    dg = domain_graph(pages)
    # corpus hosts are 2-label (siteN.example) -> domains == hosts, and
    # the rollup must conserve total link mass
    assert dg.agg(F.sum("n_links")).collect()[0][0] == \
        hg.agg(F.sum("n_links")).collect()[0][0]
    hosts = {r.src_domain for r in dg.select("src_domain").distinct().collect()}
    assert hosts <= {f"site{i}.example" for i in range(5)}
