"""Deduplication operators: exact, MinHash+LSH, n-gram Jaccard, SimHash.

Web-corpus dedup at 100 TB is a join problem, not a pairwise-compare
problem; every operator here is expressed as keyed joins/aggregations:

- exact:   one groupBy on a content hash (md5) — shuffle on the hash key.
- Jaccard: inverted-index self-join (token -> docs), so cost is
  sum over tokens of df(token)^2, not |docs|^2; ``max_df`` drops
  ubiquitous tokens to bound the join skew (standard posting-list cap).
- MinHash+LSH: per-band min of md5(band:shingle) — the signature is a
  lexicographic min over hex digests, which every SQL engine computes
  identically (no engine-specific hash needed); candidates share a
  (band, signature) bucket, then are verified with true Jaccard.
- SimHash: 60-bit signature from per-token md5 bits, bit-majority
  aggregated; near-dup pairs found by banding the signature.

The reference has no dedup (its only "dedup" is edge-level,
``prepare_graph/PrepareGraphPieces.java:139``); these are pipeline-side
first-class ops per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from giraph_spark.text import shingles, tokenize

SIMHASH_BITS = 60  # 15 hex chars of md5 -> fits a signed 64-bit long


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Group identical texts: (content_hash, keep_id, n_copies).

    ``keep_id`` = min doc_id per group — the canonical survivor.
    """
    return docs.groupBy(F.md5(F.col(text_col)).alias("content_hash")).agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 1,
    max_df: int | None = 1000,
) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard similarity.

    (doc_a, doc_b, jaccard) with doc_a < doc_b and jaccard >= threshold,
    via an inverted-index join on shared shingles. The self-join cost is
    sum over shingles of df(shingle)^2, so one ubiquitous shingle is a
    quadratic blow-up at corpus scale: ``max_df`` drops shingles occurring
    in more than that many documents (they carry little similarity signal;
    the jaccard is then computed over the surviving shingle sets).
    Defaults to 1000 — pass ``max_df=None`` explicitly to accept the
    exact-but-unbounded join on small corpora.
    """
    if n == 1:
        sh = tokenize(docs).select("doc_id", F.col("token").alias("shingle")).distinct()
    else:
        sh = shingles(docs, n)
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        sh = sh.join(df_counts.where(F.col("_df") <= max_df), "shingle").select(
            "doc_id", "shingle"
        )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        shared.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb")), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("doc_a", "doc_b", "jaccard")


def minhash_signatures(docs: DataFrame, bands: int = 8, n: int = 3) -> DataFrame:
    """(doc_id, band, signature): per-band MinHash over word n-grams.

    signature = min over the doc's shingles of md5('<band>:' || shingle);
    md5 hex is uniform, so the lexicographic min is a valid min-hash and
    is engine-portable (pure string comparison on lowercase hex).
    """
    return _minhash_signatures_from(shingles(docs, n), bands)


def _minhash_signatures_from(sh: DataFrame, bands: int) -> DataFrame:
    """Signature aggregation over a prebuilt (doc_id, shingle) table —
    lets LSH pipelines persist the shingle table ONCE and reuse it for
    both the signature and the Jaccard-verify phases (shingling is the
    dominant text cost; recomputing it doubled the LSH wall-clock)."""
    # all `bands` minima in ONE map-side-combinable groupBy pass: the
    # naive explode-by-band ships bands x |shingles| rows through the
    # shuffle; conditional min aggregates ship one partial row per
    # (doc, map task) regardless of band count
    per_doc = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(F.concat_ws(":", F.lit(str(b)), F.col("shingle")))
            ).alias(f"_s{b}")
            for b in range(bands)
        ]
    )
    return per_doc.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("int").alias("band"),
                        F.col(f"_s{b}").alias("signature"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_bs"),
    ).select("doc_id", F.col("_bs.band").alias("band"), F.col("_bs.signature").alias("signature"))


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float = 0.4, bands: int = 8, n: int = 3
) -> DataFrame:
    """MinHash-LSH near-dup detection: candidates share at least one
    (band, signature) bucket; survivors verified with true n-gram
    Jaccard >= threshold. Returns (doc_a, doc_b, jaccard).

    At scale the bucket join touches only colliding docs — the classic
    shingle -> minhash -> band -> bucket-join pipeline. The shingle
    table is persisted across the signature and verify phases (it is by
    far the most expensive input, scanned by both) and released before
    returning; the returned pair table is eagerly materialized so the
    release is safe.
    """
    sh = shingles(docs, n).persist()
    sig = _minhash_signatures_from(sh, bands)
    a = sig.select(F.col("doc_id").alias("doc_a"), "band", "signature")
    b = sig.select(F.col("doc_id").alias("doc_b"), "band", "signature")
    cand = (
        a.join(b, ["band", "signature"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "shingle"), ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb")), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.coalesce(F.col("inter"), F.lit(0))
                / (F.col("sza") + F.col("szb") - F.coalesce(F.col("inter"), F.lit(0))),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
    out = out.select("doc_a", "doc_b", "jaccard").localCheckpoint(eager=True)
    sh.unpersist()
    return out


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 60-bit SimHash over the distinct-token set.

    Each token hashes to 60 bits (md5 hex -> long); per bit position the
    +1/-1 votes are summed and the signature bit is the majority sign.
    Expressed as 60 conditional sums in one aggregation — wide but fully
    codegen'd, one shuffle on doc_id.
    """
    t = tokenize(docs).select("doc_id", "token").distinct()
    h = F.conv(F.substring(F.md5(F.col("token")), 1, 15), 16, 10).cast("long")
    t = t.select("doc_id", h.alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = t.groupBy("doc_id").agg(*votes)
    sig = None
    for i in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{i}") > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return agg.select("doc_id", sig.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 8,
    chunks: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash banding: candidates agree on >=1 of
    ``chunks`` signature chunks, verified by bit_count(xor) <= max_hamming.

    Returns (doc_a, doc_b, hamming).

    Scale knobs (the bucket self-join is sum over buckets of size^2, so
    one hot bucket is a quadratic blow-up at corpus scale):

    - ``chunks`` sets the band width to ``SIMHASH_BITS // chunks`` bits;
      the default 3 gives 20-bit bands. Bands NARROWER than ~16 bits
      (chunks=4 -> 15 bits) collide near-quadratically on templated /
      boilerplate-heavy corpora — measured on the synthetic sf0.1 docs,
      15-bit bands produced 2.27M candidates from 5k docs vs 0.78M at 20
      bits. Pigeonhole recall guarantee is only hamming <= chunks - 1
      either way; beyond that banding is probabilistic, so prefer wider
      bands and let the xor verify arbitrate.
    - ``max_bucket`` (like ``max_df`` in :func:`jaccard_pairs`) drops
      (chunk, value) buckets larger than the cap before the self-join —
      a hot bucket of B docs costs B^2/2 pairs and carries little
      discrimination; true near-dups usually still collide in another
      chunk. None = exact banding (no cap).
    """
    sig = simhash_signatures(docs)
    width = SIMHASH_BITS // chunks
    mask = (1 << width) - 1
    chunked = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("cv"),
    ).select("doc_id", "simhash", F.col("cv.chunk").alias("chunk"), F.col("cv.val").alias("val"))
    if max_bucket is not None:
        bucket_sizes = chunked.groupBy("chunk", "val").agg(
            F.count(F.lit(1)).alias("_bsz")
        )
        chunked = chunked.join(
            bucket_sizes.where(F.col("_bsz") <= max_bucket).select("chunk", "val"),
            ["chunk", "val"],
            "left_semi",
        )
    a = chunked.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"), "chunk", "val"
    )
    b = chunked.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"), "chunk", "val"
    )
    cand = (
        a.join(b, ["chunk", "val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def window_dup_stats(
    docs: DataFrame,
    n: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Cross-document exact-substring duplication (the token-window
    dedup of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): for every document, how much of it is an
    n-token window that also appears verbatim in ANOTHER document.

    Returns (doc_id, n_windows, n_shared_windows, shared_frac,
    dup_candidate): ``n_windows`` = distinct n-token windows in the
    doc, ``n_shared_windows`` = those whose exact text occurs in at
    least one other doc, ``shared_frac`` = their ratio (0.0 when the
    doc has fewer than n tokens), ``dup_candidate`` = shared_frac >=
    ``threshold`` — the bit a training pipeline drops or trims on.

    The published implementation builds a suffix array; distributed,
    the equivalent candidate generator is a plain keyed aggregation —
    window -> document-frequency — which is exactly ONE shuffle:

    - windows are enumerated by array-slicing inside codegen
      (:func:`giraph_spark.text.ngram_occurrences`, no Python);
    - dedup to distinct (doc_id, window) [shuffle 1, combiner-friendly];
    - windows are keyed by ``xxhash64`` so the document-frequency
      shuffle moves 8-byte keys, not 50-char strings [same shuffle];
    - doc-frequency >= 2 marks the window shared; a broadcast-sized
      semi-join is wrong here (the shared set is large), so the flag
      rides back on a sort-merge join keyed by the same hash — AQE
      coalesces both sides onto one exchange.

    64-bit hashing admits collisions at ~1e-10 per pair of distinct
    windows — negligible against the false-positive rate of window
    dedup itself (the oracle uses the window text verbatim; any
    mismatch at test scale would surface as a hash diff).
    """
    from giraph_spark.text import ngram_occurrences

    w = ngram_occurrences(docs, n).select(
        "doc_id", F.xxhash64("shingle").alias("w")
    )
    dw = w.dropDuplicates(["doc_id", "w"])
    freq = dw.groupBy("w").agg(F.count(F.lit(1)).alias("_df"))
    per_doc = (
        dw.join(freq, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum((F.col("_df") >= 2).cast("long")).alias("n_shared_windows"),
        )
    )
    shared_frac = F.round(
        F.coalesce(
            F.col("n_shared_windows") / F.col("n_windows").cast("double"),
            F.lit(0.0),
        ),
        6,
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_windows"), F.lit(0)).alias("n_windows"),
            F.coalesce(F.col("n_shared_windows"), F.lit(0)).alias(
                "n_shared_windows"
            ),
            shared_frac.alias("shared_frac"),
            (shared_frac >= threshold).alias("dup_candidate"),
        )
    )


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    max_df: int | None = 1000,
) -> DataFrame:
    """Asymmetric containment C(a in b) = |Sa & Sb| / |Sa| — catches a
    document QUOTED or WRAPPED inside a larger one (aggregator pages,
    quote-reply chains), which symmetric Jaccard misses when the sizes
    differ a lot (Broder's containment measure, the other half of the
    resemblance/containment pair).

    Returns (doc_a, doc_b, containment) for ORDERED pairs a != b where
    the fraction of a's n-gram shingles also present in b is >=
    ``threshold`` (rounded to 6 decimals first, so any ANSI engine
    replays the cut). Same inverted-index bound as
    :func:`jaccard_pairs`: cost = sum over shingles of df^2, capped by
    ``max_df``; no all-pairs scan.
    """
    sh = shingles(docs, n)
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        sh = sh.join(df_counts.where(F.col("_df") <= max_df), "shingle").select(
            "doc_id", "shingle"
        )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .where(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        shared.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza")),
            "doc_a",
        )
        .withColumn("containment", F.round(F.col("inter") / F.col("sza"), 6))
        .where(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    )


def minhash_lsh_incremental(
    new_docs: DataFrame,
    index_docs: DataFrame,
    threshold: float = 0.05,
    bands: int = 8,
    n: int = 3,
) -> DataFrame:
    """Incremental near-dup: compare only the NEW documents against the
    existing corpus index — the daily-crawl production shape (the
    index's signatures are computed once and persisted; no old-vs-old
    pairs are ever re-enumerated). Candidates share a (band, signature)
    bucket across the new/index boundary; survivors verified with true
    n-gram Jaccard >= ``threshold``. Returns (doc_new, doc_idx,
    jaccard).

    Scale shape: cost is O(|new| signatures + boundary bucket
    collisions) — independent of index-vs-index pair counts; at 100 TB
    the signature table is the persisted artifact and each day's batch
    joins against it by (band, signature), a plain hash join.
    """
    shn = shingles(new_docs, n).persist()
    shi = shingles(index_docs, n).persist()
    sn = _minhash_signatures_from(shn, bands).select(
        F.col("doc_id").alias("doc_new"), "band", "signature"
    )
    si = _minhash_signatures_from(shi, bands).select(
        F.col("doc_id").alias("doc_idx"), "band", "signature"
    )
    cand = sn.join(si, ["band", "signature"]).select(
        "doc_new", "doc_idx"
    ).distinct()
    szn = shn.groupBy("doc_id").agg(F.count(F.lit(1)).alias("szn"))
    szi = shi.groupBy("doc_id").agg(F.count(F.lit(1)).alias("szi"))
    inter = (
        cand.join(shn.select(F.col("doc_id").alias("doc_new"), "shingle"), "doc_new")
        .join(shi.select(F.col("doc_id").alias("doc_idx"), "shingle"), ["doc_idx", "shingle"])
        .groupBy("doc_new", "doc_idx")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        cand.join(inter, ["doc_new", "doc_idx"], "left")
        .join(szn.select(F.col("doc_id").alias("doc_new"), "szn"), "doc_new")
        .join(szi.select(F.col("doc_id").alias("doc_idx"), "szi"), "doc_idx")
        .withColumn(
            "jaccard",
            F.round(
                F.coalesce(F.col("inter"), F.lit(0))
                / (F.col("szn") + F.col("szi") - F.coalesce(F.col("inter"), F.lit(0))),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_new", "doc_idx", "jaccard")
        .localCheckpoint(eager=True)
    )
    shn.unpersist()
    shi.unpersist()
    return out
