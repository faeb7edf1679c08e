"""Training-data pipeline operators: text analysis, dedup, vector search.

Oracles are plain-Python recomputations on collected rows (exact, small
inputs) — the same layered strategy as the reference's golden toy tests
(SURVEY.md §5), applied to the pipeline ops the reference lacks.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from giraph_spark.datasets import demo_edges, with_weight
from giraph_spark.dedup import (
    containment_pairs,
    exact_duplicates,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
    simhash_signatures,
)
from giraph_spark.embeddings import cosine_topk, ivf_assign, ivf_topk
from giraph_spark.text import (
    boilerplate_shingles,
    pmi_pairs,
    fingerprints,
    quality_scores,
    shingles,
    token_counts,
    tokenize,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet").limit(60).persist()
    )


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").limit(80).persist()


def _pytokens(text: str) -> list[str]:
    return re.findall(r"[a-z0-9]+", text.lower())


def test_tokenize_matches_python(docs):
    got = {
        (r.doc_id, r.pos): r.token
        for r in tokenize(docs).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        toks = _pytokens(row.text)
        for i, tok in enumerate(toks, start=1):
            assert got[(row.doc_id, i)] == tok
        assert sum(1 for k in got if k[0] == row.doc_id) == len(toks)


def test_token_counts_oracle(docs):
    got = {r.doc_id: r for r in token_counts(docs).collect()}
    for row in docs.select("doc_id", "text").collect():
        toks = _pytokens(row.text)
        g = got[row.doc_id]
        assert g.n_tokens == len(toks)
        assert g.n_distinct == len(set(toks))
        assert g.n_chars == len(row.text)


def test_shingles_oracle(docs):
    got = {}
    for r in shingles(docs, 3).collect():
        got.setdefault(r.doc_id, set()).add(r.shingle)
    for row in docs.select("doc_id", "text").collect():
        toks = _pytokens(row.text)
        want = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        assert got.get(row.doc_id, set()) == want


def test_fingerprint_is_min_md5_shingle(docs):
    got = {r.doc_id: r.fingerprint for r in fingerprints(docs).collect()}
    for row in docs.select("doc_id", "text").collect():
        toks = _pytokens(row.text)
        hs = {
            hashlib.md5(" ".join(toks[i : i + 3]).encode()).hexdigest()
            for i in range(len(toks) - 2)
        }
        assert got[row.doc_id] == min(hs)


def test_quality_scores_bounded(docs):
    rows = quality_scores(docs).collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 0.0 <= r.quality <= 1.0
        assert 0.0 <= r.stop_ratio <= 1.0
        assert 0.0 < r.distinct_ratio <= 1.0


def test_exact_duplicates_finds_planted_dup(spark):
    data = [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "other text")]
    df = spark.createDataFrame(data, "doc_id long, text string")
    out = {r.keep_id: r.n_copies for r in exact_duplicates(df).collect()}
    assert out == {1: 2, 3: 1}


def test_jaccard_pairs_oracle(spark):
    data = [
        (1, "a b c d"),
        (2, "a b c e"),  # J(1,2) = 3/5
        (3, "x y z w"),
    ]
    df = spark.createDataFrame(data, "doc_id long, text string")
    rows = jaccard_pairs(df, threshold=0.5, n=1).collect()
    assert {(r.doc_a, r.doc_b): r.jaccard for r in rows} == {(1, 2): 0.6}


def test_minhash_lsh_finds_near_dup(spark):
    base = "one two three four five six seven eight nine ten"
    data = [
        (1, base),
        (2, base + " eleven"),  # shares most 3-grams with 1
        (3, "totally different words appear in this document here now"),
    ]
    df = spark.createDataFrame(data, "doc_id long, text string")
    rows = minhash_lsh_pairs(df, threshold=0.3, bands=8, n=3).collect()
    pairs = {(r.doc_a, r.doc_b) for r in rows}
    assert (1, 2) in pairs
    assert all(p == (1, 2) for p in pairs)


def test_simhash_near_dup_vs_distinct(spark):
    base = " ".join(f"tok{i}" for i in range(40))
    data = [
        (1, base),
        (2, base + " extra"),  # hamming distance should be small
        (3, " ".join(f"zzz{i}" for i in range(40))),
    ]
    df = spark.createDataFrame(data, "doc_id long, text string")
    sigs = {r.doc_id: r.simhash for r in simhash_signatures(df).collect()}
    d12 = bin(sigs[1] ^ sigs[2]).count("1")
    d13 = bin(sigs[1] ^ sigs[3]).count("1")
    assert d12 < d13
    rows = simhash_pairs(df, max_hamming=d12)
    assert (1, 2) in {(r.doc_a, r.doc_b) for r in rows.collect()}


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def test_cosine_topk_matches_python(emb):
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb.collect()}
    queries = emb.where(F.col("vec_id") < 2)
    got = cosine_topk(emb, queries, k=4).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    for qid in [0, 1]:
        scored = sorted(
            ((round(_cos(vecs[qid], v), 6), -nid) for nid, v in vecs.items() if nid != qid),
            reverse=True,
        )
        want = [(-negnid) for _, negnid in scored[:4]]
        assert [nid for _, nid in sorted(by_q[qid])] == want


def test_ivf_assign_is_argmax(emb):
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb.collect()}
    cents = {i: vecs[i] for i in range(6)}
    got = {r.vec_id: r.centroid_id for r in ivf_assign(
        emb, emb.where(F.col("vec_id") < 6).select(
            F.col("vec_id").alias("centroid_id"), "embedding")).collect()}
    for vid, v in vecs.items():
        best = max(cents, key=lambda c: (round(_cos(v, cents[c]), 6), -c))
        assert got[vid] == best


def test_ivf_topk_full_probe_equals_brute(emb):
    cents = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    q = emb.where(F.col("vec_id") < 2)
    bf = {(r.query_id, r.rank, r.neighbor_id) for r in cosine_topk(emb, q, k=3).collect()}
    ivf = {
        (r.query_id, r.rank, r.neighbor_id)
        for r in ivf_topk(emb, q, cents, k=3, n_probe=5).collect()
    }
    assert bf == ivf


def test_kmeans_trained_ivf_recall(emb, spark):
    from giraph_spark.embeddings import kmeans_fit

    cents = kmeans_fit(emb, k=6, iters=3, seed=7)
    assert cents.count() == 6
    # deterministic across invocations
    a = sorted(map(repr, cents.collect()))
    b = sorted(map(repr, kmeans_fit(emb, k=6, iters=3, seed=7).collect()))
    assert a == b

    q = emb.where(F.col("vec_id") < 8)
    bf = {}
    for r in cosine_topk(emb, q, k=5).collect():
        bf.setdefault(r.query_id, set()).add(r.neighbor_id)
    # full probe == exhaustive == brute force
    full = {}
    for r in ivf_topk(emb, q, cents, k=5, n_probe=6).collect():
        full.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert full == bf
    # trained index at n_probe=2 recalls most true neighbors
    approx = {}
    for r in ivf_topk(emb, q, cents, k=5, n_probe=2).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(approx.get(qid, set()) & bf[qid]) for qid in bf)
    total = sum(len(s) for s in bf.values())
    assert hits / total >= 0.5, f"recall@5 {hits}/{total}"


def test_demo_edges_deterministic_and_clean(spark):
    e1 = demo_edges(spark, SF)
    e2 = demo_edges(spark, SF)
    assert e1.count() == e2.count()
    assert e1.where(F.col("src") == F.col("dst")).count() == 0
    assert e1.groupBy("src", "dst").count().where("count > 1").count() == 0
    ws = {r.weight for r in with_weight(e1).select("weight").distinct().collect()}
    assert ws <= {1.0, 2.0, 3.0}


def test_lang_id_deterministic(spark, docs):
    from giraph_spark.text import lang_id

    a = sorted((r.doc_id, r.pred_lang) for r in lang_id(docs).collect())
    b = sorted((r.doc_id, r.pred_lang) for r in lang_id(docs).collect())
    assert a == b
    assert all(p in {"de", "en", "es", "fr", "zh", "und"} for _, p in a)


def test_cosine_pairs_matches_python(emb):
    from giraph_spark.embeddings import cosine_pairs

    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb.collect()}
    want = {
        (a, b): round(_cos(vecs[a], vecs[b]), 6)
        for a in vecs
        for b in vecs
        if a < b and round(_cos(vecs[a], vecs[b]), 6) >= 0.35
    }
    got = {(r.id_a, r.id_b): r.cosine for r in cosine_pairs(emb, 0.35).collect()}
    assert got == want


def test_lsh_cosine_pairs_exact_precision_and_recall(emb):
    """Precision is exact by construction (verify join); recall at
    32 planes / 16 bands is ~0.9997 per qualifying pair — on this
    fixed corpus+seed it must be exactly 1 (deterministic)."""
    from giraph_spark.embeddings import cosine_pairs, lsh_cosine_pairs

    bf = {(r.id_a, r.id_b, r.cosine) for r in cosine_pairs(emb, 0.35).collect()}
    lsh = {
        (r.id_a, r.id_b, r.cosine)
        for r in lsh_cosine_pairs(
            emb, 0.35, dim=64, planes=32, bands=16, seed=42
        ).collect()
    }
    assert lsh == bf and len(bf) > 0


def test_hyperplane_signatures_deterministic(emb):
    from giraph_spark.embeddings import hyperplane_signatures

    a = sorted(map(tuple, hyperplane_signatures(emb, dim=64).collect()))
    b = sorted(map(tuple, hyperplane_signatures(emb, dim=64).collect()))
    assert a == b
    # one row per (vector, band)
    n = emb.count()
    assert len(a) == n * 8


def test_repetition_stats_python_oracle(spark):
    from giraph_spark.text import repetition_stats

    rows = [
        (1, "a b a b a b a b"),            # heavy 2-gram repetition
        (2, "one two three four five"),    # all distinct
        (3, "x x x x x x"),                # single-token repetition
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    # doc 1: 8 tokens, 2 distinct; modal token 'a' x4; modal 2-gram
    # 'a b' x4 of 7 2-grams; 6 3-grams, 2 distinct
    assert got[1]["n_tokens"] == 8
    assert got[1]["dup_token_frac"] == round(1 - 2 / 8, 6)
    assert got[1]["top_token_frac"] == 0.5
    assert got[1]["top_2gram_frac"] == 1.0
    assert got[1]["dup_3gram_frac"] == round(1 - 2 / 6, 6)
    assert got[1]["repetitive"] is True
    # doc 2: no repetition at all
    assert got[2]["dup_token_frac"] == 0.0
    assert got[2]["top_2gram_frac"] == round(2 / 5, 6)
    assert got[2]["dup_3gram_frac"] == 0.0
    # doc 3: one token repeated
    assert got[3]["top_token_frac"] == 1.0
    assert got[3]["dup_3gram_frac"] == 0.75
    assert got[3]["repetitive"] is True


def test_pii_scan_counts_and_redaction(spark):
    from giraph_spark.text import pii_scan

    rows = [
        (1, "mail me at Bob.Smith+x@Example.COM today"),
        (2, "server at 192.168.0.1 and 10.0.0.2"),
        (3, "call +1 555 0134 now"),
        (4, "nothing sensitive here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in pii_scan(docs).collect()}
    assert (got[1]["n_emails"], got[1]["n_ips"], got[1]["n_phones"]) == (1, 0, 0)
    assert (got[2]["n_emails"], got[2]["n_ips"], got[2]["n_phones"]) == (0, 2, 0)
    assert (got[3]["n_emails"], got[3]["n_ips"], got[3]["n_phones"]) == (0, 0, 1)
    assert (got[4]["n_emails"], got[4]["n_ips"], got[4]["n_phones"]) == (0, 0, 0)
    # redaction: the hash of doc 1 equals md5 of the expected redacted text
    exp = hashlib.md5(b"mail me at <EMAIL> today").hexdigest()
    assert got[1]["redacted_md5"] == exp
    exp4 = hashlib.md5(b"nothing sensitive here").hexdigest()
    assert got[4]["redacted_md5"] == exp4


def test_contamination_overlap(spark):
    from giraph_spark.text import contamination

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            (1, "zzz alpha beta gamma delta yyy"),   # shares 2 distinct 4-grams? no: 1
            (2, "alpha beta gamma delta epsilon"),   # identical: 2 4-grams
            (3, "totally clean document here"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["n_shared"] for r in contamination(train, bench, n=4).collect()}
    assert got[1] == 1  # 'alpha beta gamma delta'
    assert got[2] == 2  # both 4-grams of the 5-token doc
    assert 3 not in got


def test_neighborhood_jaccard_triangle_plus_tail(spark):
    from giraph_spark.algorithms.linkpred import neighborhood_jaccard

    # path 1-2, 2-3 plus tail 3-4: candidate pair (1,3) via z=2;
    # N(1)={2}, N(3)={2,4} -> jaccard 1/2; (2,4) via z=3: N(2)={1,3},
    # N(4)={3} -> 1/2
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], ["src", "dst"]
    )
    got = {(r["u"], r["v"]): r for r in neighborhood_jaccard(edges).collect()}
    assert set(got) == {(1, 3), (2, 4)}
    assert got[(1, 3)]["common_neighbors"] == 1
    assert abs(got[(1, 3)]["jaccard"] - 0.5) < 1e-12
    assert abs(got[(2, 4)]["jaccard"] - 0.5) < 1e-12


def test_repetition_stats_single_token_doc(spark):
    from giraph_spark.text import repetition_stats

    docs = spark.createDataFrame([(1, "solo")], ["doc_id", "text"])
    row = repetition_stats(docs).collect()[0]
    # no 2-grams / 3-grams exist: fractions must be 0, not null-poisoned 1
    assert row["top_2gram_frac"] == 0.0
    assert row["dup_3gram_frac"] == 0.0
    assert row["repetitive"] is False


def test_cocitation_and_bib_coupling(spark):
    from giraph_spark.algorithms.linkpred import bibliographic_coupling, cocitation

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 2), (4, 3), (5, 2), (5, 3), (5, 6), (1, 2)],
        "src long, dst long",
    )
    cc = {(r.a, r.b): r.n_common for r in cocitation(e, min_count=2).collect()}
    # 2 and 3 are co-cited by sources 1, 4, 5; no other pair reaches 2
    assert cc == {(2, 3): 3}
    bc = {
        (r.a, r.b): r.n_common
        for r in bibliographic_coupling(e, min_count=2).collect()
    }
    # every source pair among {1,4,5} shares targets {2,3}
    assert bc == {(1, 4): 2, (1, 5): 2, (4, 5): 2}
    # pivot cap drops the hub: out-degree cap 2 removes source 5
    cc_capped = {
        (r.a, r.b): r.n_common
        for r in cocitation(e, min_count=2, max_out_degree=2).collect()
    }
    assert cc_capped == {(2, 3): 2}


def test_window_dup_stats(spark):
    from giraph_spark.dedup import window_dup_stats

    text = "a b c d e f g h i j"  # 10 tokens -> 3 windows of 8
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "x y"), (4, "q r s t u v w x y z")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in window_dup_stats(docs, n=8, threshold=0.5).collect()}
    assert rows[1].n_windows == 3 and rows[1].n_shared_windows == 3
    assert rows[1].shared_frac == 1.0 and rows[1].dup_candidate
    assert rows[2].shared_frac == 1.0 and rows[2].dup_candidate
    # too short for any window: zero stats, not a candidate
    assert rows[3].n_windows == 0 and rows[3].shared_frac == 0.0
    assert not rows[3].dup_candidate
    # unique content: windows exist but none shared
    assert rows[4].n_windows == 3 and rows[4].n_shared_windows == 0
    assert not rows[4].dup_candidate


def test_quantize_int8(spark):
    from giraph_spark.embeddings import quantize_int8

    emb = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25]), (2, [0.0, 0.0, 0.0]), (3, [127.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in quantize_int8(emb).collect()}
    # max|x| maps to ±127 exactly; interior values round against the
    # 9-dp-rounded scale (-0.5 / round(1/127, 9) = -63.49999 -> -63)
    assert list(rows[1].q) == [127, -63, 32]
    assert rows[1].scale == round(1.0 / 127.0, 9)
    # all-zero vector: scale 0, zero codes, no div-by-zero under ANSI
    assert rows[2].scale == 0.0 and rows[2].q == [0, 0, 0]
    assert rows[3].scale == 1.0 and rows[3].q == [127]
    # dequantization error is bounded by scale/2 per component
    for r in rows.values():
        assert all(abs(c) <= 127 for c in r.q)


def test_pq_codes_and_adc_scores(emb):
    from giraph_spark.embeddings import pq_encode, pq_fit, pq_topk

    m, k, dim = 4, 4, 64
    width = dim // m
    cb = pq_fit(emb, m=m, k=k, iters=2, dim=dim, seed=7)
    cbs = {
        (r.subspace, r.centroid_id): [float(x) for x in r.embedding]
        for r in cb.collect()
    }
    assert len(cbs) == m * k
    assert all(len(v) == width for v in cbs.values())

    codes = pq_encode(emb, cb, m=m, dim=dim).collect()
    n_vec = emb.count()
    assert len(codes) == n_vec * m
    assert all(0 <= r.code < k for r in codes)
    by_vec = {}
    for r in codes:
        by_vec.setdefault(r.vec_id, {})[r.subspace] = r.code

    # ADC scores reconstruct from the returned codebooks exactly
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb.collect()}
    q = emb.where(F.col("vec_id") < 2)
    top = pq_topk(emb, cb, q, k=5, m=m, dim=dim).collect()
    assert {r.query_id for r in top} == {0, 1}
    for r in top:
        qv = vecs[r.query_id]
        want = 0.0
        for s in range(m):
            cv = cbs[(s, by_vec[r.neighbor_id][s])]
            want += sum(
                qv[s * width + i] * cv[i] for i in range(width)
            )
        assert abs(r.score - round(want, 6)) < 2e-6, (r, want)
    # ranks are 1..5 per query, deterministic ordering
    for qid in (0, 1):
        ranks = sorted(r.rank for r in top if r.query_id == qid)
        assert ranks == [1, 2, 3, 4, 5]


def test_containment_asymmetric(spark):
    # doc 1's shingles are a strict subset of doc 2's
    data = [
        (1, "a b c d e"),          # 3 shingles, all inside doc 2
        (2, "a b c d e f g h"),    # 6 shingles
        (3, "x y z w q"),
    ]
    df = spark.createDataFrame(data, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.containment
           for r in containment_pairs(df, threshold=0.4, n=3).collect()}
    assert got == {(1, 2): 1.0, (2, 1): 0.5}


def test_boilerplate_shingles_detects_footer(spark):
    footer = "all rights reserved"
    data = [
        (1, "s1", f"unique one text {footer}"),
        (2, "s1", f"different words again {footer}"),
        (3, "s1", f"third doc body {footer}"),
        (4, "s1", "no footer here at all"),
        (5, "s2", f"other group page {footer}"),
    ]
    df = spark.createDataFrame(data, "doc_id long, source string, text string")
    out = boilerplate_shingles(df, group_col="source", n=3,
                               min_docs=3, min_ratio=0.5).collect()
    assert [(r.source, r.shingle, r.n_docs, r.ratio) for r in out] == [
        ("s1", footer, 3, 0.75)
    ]


def test_registrable_domain_rules(spark):
    from giraph_spark.corpus import registrable_domain

    cases = [
        ("WWW.Blog.Example.CO.UK:443", "example.co.uk"),
        ("a.b.c.example.com", "example.com"),
        ("www.example.org", "example.org"),
        ("example.net:8080", "example.net"),
        ("localhost", "localhost"),
        ("shop.site9.example", "site9.example"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = dict(
        df.select("host", registrable_domain(F.col("host")).alias("d")).collect()
    )
    assert got == {h: d for h, d in cases}


def test_pmi_pairs_matches_python(spark):
    import math

    data = [
        (1, "a b"), (2, "a b"), (3, "a b c"), (4, "a c"), (5, "c d"),
    ]
    df = spark.createDataFrame(data, "doc_id long, text string")
    got = {(r.tok_a, r.tok_b): (r.n_ab, r.pmi)
           for r in pmi_pairs(df, min_pair_docs=2).collect()}
    # df: a=4 b=3 c=3 d=1, N=5; pairs: (a,b)=3 (a,c)=2 (b,c)=1 (c,d)=1
    want = {
        ("a", "b"): (3, round(math.log(3 * 5 / (4 * 3)), 6)),
        ("a", "c"): (2, round(math.log(2 * 5 / (4 * 3)), 6)),
    }
    assert got == want


def test_semdedup_drops_near_identical(spark):
    from giraph_spark.embeddings import semdedup

    # 1 and 2 identical direction; 3 scaled copy of 1 (same cosine=1);
    # 10, 11 orthogonal singletons
    data = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),
        (3, [2.0, 0.0, 0.0]),
        (10, [0.0, 1.0, 0.0]),
        (11, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    out = {r.vec_id: r.keep
           for r in semdedup(df, k=3, threshold=0.99, iters=2).collect()}
    # min-id representative 1 kept, its duplicates 2 and 3 dropped
    assert out[1] and not out[2] and not out[3]
    assert out[10] and out[11]


def test_tfidf_top_terms(spark):
    import math

    from giraph_spark.text import tfidf_top_terms

    data = [
        (1, "g1", "apple apple shared"),
        (2, "g1", "shared"),
        (3, "g2", "banana shared"),
    ]
    df = spark.createDataFrame(data, "doc_id long, source string, text string")
    got = {(r.source, r.token): (r.tf, r.score, r.rk)
           for r in tfidf_top_terms(df, k=2).collect()}
    ln2 = round(2 * math.log(2 / 1), 6)
    ln1 = round(1 * math.log(2 / 1), 6)
    # 'shared' appears in both groups -> idf ln(2/2)=0, never outranks
    assert got[("g1", "apple")] == (2, ln2, 1)
    assert got[("g2", "banana")] == (1, ln1, 1)
    assert got[("g1", "shared")][2] == 2 and got[("g1", "shared")][1] == 0.0


def test_funnel_ordering(spark):
    from datetime import datetime

    from giraph_spark.pipeline import funnel

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # user 1 completes a->b->c in order
        (1, "a", t(1)), (1, "b", t(2)), (1, "c", t(3)),
        # user 2 does b BEFORE a: reaches step 1 only
        (2, "b", t(1)), (2, "a", t(2)),
        # user 3: a then c (skips b): reaches step 1
        (3, "a", t(1)), (3, "c", t(2)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {r.step: r.n_users for r in funnel(df, ["a", "b", "c"]).collect()}
    assert got == {1: 3, 2: 1, 3: 1}


def test_cohort_retention_matrix(spark):
    from datetime import datetime

    from giraph_spark.pipeline import cohort_retention

    d = lambda day, h: datetime(2024, 1, day, h)  # noqa: E731
    rows = [
        (1, d(1, 5)), (1, d(2, 3)),          # cohort day0, back on day1
        (2, d(1, 9)), (2, d(1, 23)),         # cohort day0, same-day only
        (3, d(2, 1)), (3, d(4, 1)),          # cohort day1, back offset 2
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    base = 19723  # 2024-01-01 in days since epoch
    got = {(r.cohort - base, r.offset): r.n_users
           for r in cohort_retention(df).collect()}
    assert got == {(0, 0): 2, (0, 1): 1, (1, 0): 1, (1, 2): 1}


def test_filter_corpus_reasons(spark):
    from giraph_spark.text import filter_corpus

    data = [
        (1, "short text"),                                     # too_short
        (2, " ".join(f"tok{i:02d}" for i in range(20))),       # kept
        (3, "the a and of to in is it " * 3),                  # stopword-heavy
        (4, "spam spam " * 10),                                # low diversity
    ]
    df = spark.createDataFrame(data, "doc_id long, text string")
    got = {r.doc_id: (r.keep, r.reject_reason)
           for r in filter_corpus(df).collect()}
    assert got[1] == (False, "too_short")
    assert got[2] == (True, None)
    assert got[3][1] == "stopword_heavy"
    assert got[4][1] == "low_diversity"


def test_bm25_ranks_term_density(spark):
    import math

    from giraph_spark.text import bm25_scores

    data = [
        (1, "cat cat cat dog"),
        (2, "cat dog bird fish"),
        (3, "dog bird fish frog"),
    ]
    df = spark.createDataFrame(data, "doc_id long, text string")
    got = {r.doc_id: r.score for r in bm25_scores(df, ["cat"]).collect()}
    assert set(got) == {1, 2}
    assert got[1] > got[2] > 0
    # exact value for doc 2: tf=1, df=2, N=3, dl=4, avgdl=4
    idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    want = round(idf * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 1.0)), 6)
    assert got[2] == want


def test_unigram_surprisal_orders_rarity(spark):
    from giraph_spark.text import unigram_surprisal

    # doc 1 = common tokens only; doc 2 contains a hapax 'zyx'
    data = [
        (1, "cat cat dog dog"),
        (2, "cat dog zyx"),
    ]
    df = spark.createDataFrame(data, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.surprisal)
           for r in unigram_surprisal(df).collect()}
    import math
    # corpus counts: cat=3 dog=3 zyx=1, T=7
    s1 = round(-(2 * math.log(3 / 7) + 2 * math.log(3 / 7)) / 4, 6)
    s2 = round(-(math.log(3 / 7) * 2 + math.log(1 / 7)) / 3, 6)
    assert got == {1: (4, s1), 2: (3, s2)}
    assert got[2][1] > got[1][1]


def test_bpe_token_counts_classes(spark):
    from giraph_spark.text import bpe_token_counts

    # "It's 42 AD, really?" -> [It]['s][ 42][ AD][,][ really][?]
    df = spark.createDataFrame(
        [(1, "It's 42 AD, really?")], "doc_id long, text string"
    )
    r = bpe_token_counts(df).collect()[0]
    assert (r.n_bpe_tokens, r.n_word, r.n_num, r.n_punct, r.n_ws) == (
        7, 4, 1, 2, 0
    )


def test_balance_groups_caps_majority(spark):
    from giraph_spark.pipeline import balance_groups

    rows = [(i, "big" if i < 200 else "small") for i in range(220)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    kept = balance_groups(df, "grp", "doc_id")
    counts = {r.grp: r.n for r in
              kept.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    # minority group passes through whole; majority sampled to ~20
    assert counts["small"] == 20
    assert 5 <= counts["big"] <= 40
    # deterministic: same result on recompute
    again = {r.grp: r.n for r in
             balance_groups(df, "grp", "doc_id").groupBy("grp")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert again == counts


def test_phrase_match_counts(spark):
    from giraph_spark.text import phrase_match

    data = [
        (1, "the quick brown fox jumps"),
        (2, "quick brown shoes and quick brown fox"),
        (3, "brown quick nothing"),
    ]
    df = spark.createDataFrame(data, "doc_id long, text string")
    got = {r.phrase: (r.n_docs, r.n_hits)
           for r in phrase_match(df, ["Quick Brown", "quick brown fox"]).collect()}
    assert got == {"quick brown": (2, 3), "quick brown fox": (2, 2)}


def test_minhash_lsh_incremental_boundary_only(spark):
    from giraph_spark.dedup import minhash_lsh_incremental

    base = "alpha beta gamma delta epsilon zeta eta theta"
    idx = [(1, base), (2, base + " iota"), (3, "totally different words here")]
    new = [(10, base), (11, "unrelated text again entirely")]
    out = minhash_lsh_incremental(
        spark.createDataFrame(new, "doc_id long, text string"),
        spark.createDataFrame(idx, "doc_id long, text string"),
        threshold=0.3,
    ).collect()
    pairs = {(r.doc_new, r.doc_idx): r.jaccard for r in out}
    # new doc 10 duplicates index docs 1 (exact) and 2 (near);
    # no index-index or new-new pairs ever emitted
    assert pairs[(10, 1)] == 1.0
    assert (10, 2) in pairs and pairs[(10, 2)] > 0.3
    assert all(k[0] in (10, 11) and k[1] in (1, 2, 3) for k in pairs)
    assert (11, 3) not in pairs
