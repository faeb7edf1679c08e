"""Deterministic synthetic web-page corpus + Arrow-vectorized extraction.

The engine's external-facing input is a Common-Crawl-style table of web
pages ``(url: string, warc_ts: timestamp, html: binary, text: string,
lang: string)``; the graph algorithms run over an edge table derived from
it. This module plays the role of the reference's synthetic input
generators (``giraph-core/.../io/formats/PseudoRandomVertexInputFormat.java:48``,
``WattsStrogatzVertexInputFormat.java:49`` — knobs
``PseudoRandomInputFormatConstants.java:26-35``) but produces web pages
whose link structure has a power-law out-degree plus a handful of
mega-hub targets, so the gather stage exercises skew salting.

Everything is deterministic (splitmix64 streams keyed by ``(seed, row)``)
and generated distributed via ``mapInPandas`` (Arrow batches, numpy
vectorized — no driver-side materialization, no per-row Python UDFs).

Extraction (``with_extracted_text`` / ``extract_links``) is pure
pandas-vectorized regex over a frozen HTML grammar, so the per-row
invariant ``extract_text(html) == text`` holds byte-identically.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_HUBS = 10          # pages 0..9 receive a disproportionate share of links
HUB_PROB_1_IN = 8    # ~1/8 of all links point at a hub page
MAX_OUT_DEGREE = 20
_EPOCH = pd.Timestamp("2024-01-01T00:00:00")

_VOCAB = np.array(
    """the quick brown fox jumps over lazy dog data spark graph page rank
    crawl web link node edge vertex label component triangle shuffle join
    partition cluster iceberg arrow vector hash salt skew hub degree text
    html parse extract token corpus index query engine scale batch stream
    merge sort scan filter count sum mean union split apply march science
    river stone cloud metal paper glass light sound""".split()
)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a deterministic uint64 stream."""
    with np.errstate(over="ignore"):
        x = np.asarray(x, dtype=np.uint64).copy()
        x += np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _stream(seed: int, tag: int, idx: np.ndarray) -> np.ndarray:
    """Independent uint64 stream per (seed, tag) over row indices."""
    return _mix64(idx.astype(np.uint64) ^ _mix64(np.uint64(seed * 1_000_003 + tag)))


def page_url(i: np.ndarray, n_sites: int) -> np.ndarray:
    sites = (i % n_sites).astype(str)
    return "https://site" + pd.Series(sites) + ".example/p/" + pd.Series(i.astype(str))


def _out_degree(seed: int, i: np.ndarray) -> np.ndarray:
    """Power-law (zipf a~2) out-degree in [1, MAX_OUT_DEGREE]."""
    u = (_stream(seed, 1, i) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    deg = np.minimum(MAX_OUT_DEGREE, np.maximum(1, (1.0 / (1.0 - u)).astype(np.int64)))
    return deg


def _link_targets(seed: int, src: np.ndarray, k: np.ndarray, n_pages: int) -> np.ndarray:
    """Target page index for the k-th link of page src (hub-skewed)."""
    r = _mix64(_stream(seed, 2, src) + k.astype(np.uint64))
    is_hub = (r % np.uint64(HUB_PROB_1_IN)) == 0
    hub_t = (r >> np.uint64(8)) % np.uint64(N_HUBS)
    uni_t = (r >> np.uint64(8)) % np.uint64(n_pages)
    return np.where(is_hub, hub_t, uni_t).astype(np.int64)


def _page_text(seed: int, i: np.ndarray) -> tuple[pd.Series, pd.Series]:
    """Two deterministic paragraphs per page (ground-truth `text` is
    para1 + "\\n" + para2). Includes a literal '&' so HTML escaping is
    exercised by the byte-identical invariant."""
    n = len(i)
    n_words = (12 + (_stream(seed, 3, i) % np.uint64(24))).astype(np.int64)
    max_w = int(n_words.max()) if n else 0
    # (n, max_w) matrix of vocab indices — fully vectorized
    widx = (
        _mix64(_stream(seed, 4, i)[:, None] + np.arange(max_w, dtype=np.uint64)[None, :])
        % np.uint64(len(_VOCAB))
    )
    words = _VOCAB[widx.astype(np.int64)]
    para1 = pd.Series(
        [" ".join(words[r, : n_words[r] // 2]) for r in range(n)], dtype=object
    )
    para2 = pd.Series(
        [" ".join(words[r, n_words[r] // 2 : n_words[r]]) for r in range(n)],
        dtype=object,
    )
    amp = (_stream(seed, 5, i) % np.uint64(4)) == 0
    para2 = para2.where(~amp, para2 + " salt & pepper")
    return para1, para2


_LANGS = np.array(["en"] * 17 + ["de", "fr", "es"])


def synth_corpus(
    spark: SparkSession,
    n_pages: int,
    n_sites: int | None = None,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus (url, warc_ts, html, text, lang)."""
    if n_sites is None:
        n_sites = max(10, n_pages // 50)
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            i = pdf["id"].to_numpy(dtype=np.int64)
            n = len(i)
            urls = page_url(i, n_sites)
            para1, para2 = _page_text(seed, i)
            text = para1 + "\n" + para2
            deg = _out_degree(seed, i)
            # ragged link targets, vectorized via repeat + per-link offsets
            # (k = global position minus the page's start offset — no
            # per-page arange materialization)
            src_rep = np.repeat(i, deg)
            starts = np.concatenate(([0], np.cumsum(deg)[:-1])) if n else np.array([], dtype=np.int64)
            k = (
                (np.arange(int(deg.sum()), dtype=np.int64) - np.repeat(starts, deg)).astype(np.uint64)
                if n
                else np.array([], dtype=np.uint64)
            )
            tgt = _link_targets(seed, src_rep, k, n_pages)
            tgt_site = tgt % n_sites
            src_site = src_rep % n_sites
            # relative href when the target lives on the same site (exercises
            # URL resolution); absolute otherwise
            t_str = tgt.astype(str)
            abs_href = "https://site" + pd.Series(tgt_site.astype(str)) + ".example/p/" + pd.Series(t_str)
            rel_href = "/p/" + pd.Series(t_str)
            href = pd.Series(np.where(tgt_site == src_site, rel_href, abs_href), dtype=object)
            # varied-but-deterministic anchor text per (source, target) —
            # drives anchor-text aggregation; a pure function of ids so
            # any engine parsing the SAME html sees the same tokens
            a1 = (tgt % np.uint64(31)).astype(str)
            a2 = ((src_rep.astype(np.uint64) * np.uint64(3) + tgt * np.uint64(7)) % np.uint64(17)).astype(str)
            anchor_txt = "t" + pd.Series(a1) + " a" + pd.Series(a2)
            anchors = '<a href="' + href + '">' + anchor_txt + "</a>"
            # per-page concat WITHOUT pandas groupby.agg (pure-Python
            # group iteration measured 0.64 s of a 0.68 s batch): src_rep
            # is contiguous-sorted by construction, so each page's anchors
            # are the slice [starts[j], starts[j] + deg[j])
            a_arr = anchors.to_numpy(dtype=object)
            ends = starts + deg
            anchor_col = np.fromiter(
                ("".join(a_arr[s:e]) for s, e in zip(starts, ends)),
                dtype=object,
                count=n,
            )
            esc1 = para1.str.replace("&", "&amp;", regex=False)
            esc2 = para2.str.replace("&", "&amp;", regex=False)
            html = (
                "<html><head><title>Page " + pd.Series(i.astype(str)) + "</title></head>"
                "<body><p>" + esc1 + "</p><p>" + esc2 + "</p><nav>"
                + pd.Series(anchor_col) + "</nav></body></html>"
            )
            yield pd.DataFrame(
                {
                    "url": urls.astype(object),
                    "warc_ts": _EPOCH + pd.to_timedelta(i, unit="s"),
                    "html": html.str.encode("utf-8"),
                    "text": text.astype(object),
                    "lang": pd.Series(_LANGS[(_stream(seed, 6, i) % np.uint64(len(_LANGS))).astype(np.int64)], dtype=object),
                }
            )

    base = spark.range(0, n_pages, numPartitions=partitions)
    return base.mapInPandas(
        gen, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )


# ---------------------------------------------------------------------------
# Extraction — Arrow-vectorized (pandas C-regex), frozen grammar
# ---------------------------------------------------------------------------

_ENTITY_MAP = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def _extract_text_pd(html: pd.Series) -> pd.Series:
    """Byte-identical text extraction: concatenation of <p> bodies joined
    by newline, HTML entities unescaped. Pure function of the html bytes
    (per-row invariant from BASELINE.json input_hint)."""
    s = html.str.decode("utf-8")
    paras = s.str.findall(r"<p>(.*?)</p>")
    out = paras.map(lambda xs: "\n".join(xs))
    for ent, ch in _ENTITY_MAP:
        out = out.str.replace(ent, ch, regex=False)
    return out


def with_extracted_text(pages: DataFrame, out_col: str = "extracted_text") -> DataFrame:
    """Add the extracted-text column via a vectorized Arrow UDF."""

    @F.pandas_udf("string")
    def _udf(html: pd.Series) -> pd.Series:
        return _extract_text_pd(html)

    return pages.withColumn(out_col, _udf(F.col("html")))


def extract_links(pages: DataFrame) -> DataFrame:
    """(url, href) pairs with relative hrefs resolved against the page's
    origin — vectorized Arrow path (mapInPandas), one output row per link.

    Plays the role of the reference's edge-input stage
    (``io/EdgeInputFormat.java``; edges routed to owners in
    ``worker/EdgeInputSplitsCallable.java``) with the parse done here
    instead of at a text-file boundary.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            html = pdf["html"].str.decode("utf-8")
            hrefs = html.str.findall(r'<a\s+href="([^"]*)"')
            counts = hrefs.map(len).to_numpy(dtype=np.int64)
            urls = np.repeat(pdf["url"].to_numpy(dtype=object), counts)
            flat = pd.Series(
                [h for lst in hrefs for h in lst], dtype=object
            )
            if len(flat) == 0:
                yield pd.DataFrame({"url": pd.Series(dtype=object), "href": pd.Series(dtype=object)})
                continue
            # resolve scheme-relative/path-relative hrefs against the origin
            origin = pd.Series(urls, dtype=object).str.extract(r"^(https?://[^/]+)", expand=False)
            is_rel = flat.str.startswith("/")
            resolved = flat.where(~is_rel, origin.to_numpy(dtype=object) + flat)
            yield pd.DataFrame({"url": pd.Series(urls, dtype=object), "href": resolved})

    return pages.select("url", "html").mapInPandas(gen, schema="url string, href string")


def extract_anchors(pages: DataFrame) -> DataFrame:
    """(url, href, anchor) triples — the paired href + anchor-text parse
    (resolution identical to :func:`extract_links`). Anchor text is the
    classic external description of a target page (what search engines
    index a URL under); aggregation happens in ``anchor_summary``."""

    pat = r'<a\s+href="([^"]*)">([^<]*)</a>'

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        empty = pd.DataFrame(
            {
                "url": pd.Series(dtype=object),
                "href": pd.Series(dtype=object),
                "anchor": pd.Series(dtype=object),
            }
        )
        for pdf in batches:
            html = pdf["html"].str.decode("utf-8")
            pairs = html.str.findall(pat)
            counts = pairs.map(len).to_numpy(dtype=np.int64)
            urls = np.repeat(pdf["url"].to_numpy(dtype=object), counts)
            flat_h = pd.Series([h for lst in pairs for h, _ in lst], dtype=object)
            flat_a = pd.Series([a for lst in pairs for _, a in lst], dtype=object)
            if len(flat_h) == 0:
                yield empty
                continue
            origin = pd.Series(urls, dtype=object).str.extract(
                r"^(https?://[^/]+)", expand=False
            )
            is_rel = flat_h.str.startswith("/")
            resolved = flat_h.where(~is_rel, origin.to_numpy(dtype=object) + flat_h)
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype=object),
                    "href": resolved,
                    "anchor": flat_a,
                }
            )

    return pages.select("url", "html").mapInPandas(
        gen, schema="url string, href string, anchor string"
    )


def anchor_summary(pages: DataFrame) -> DataFrame:
    """Per-target anchor-text rollup: (target, n_links, n_anchors,
    top_anchor) where ``target`` is the normalized resolved href,
    ``n_anchors`` counts distinct anchor strings, and ``top_anchor`` is
    the most frequent anchor (ties broken lexicographically — fully
    deterministic).

    Scale shape: one groupBy on (target, anchor) for the counts, then a
    max(struct) per target — two map-side-combinable shuffles, no
    per-target lists materialized (the reference has no analog; this is
    the search-index side of link extraction)."""
    a = extract_anchors(pages).select(
        normalize_url(F.col("href")).alias("target"), "anchor"
    )
    per = a.groupBy("target", "anchor").agg(F.count(F.lit(1)).alias("n"))
    # lexicographic tie-break via max(struct(n, neg-anchor)): invert the
    # anchor ordering by using min over struct(-n, anchor)
    best = per.groupBy("target").agg(
        F.min(F.struct((-F.col("n")).alias("neg"), F.col("anchor"))).alias("b"),
        F.sum("n").cast("long").alias("n_links"),
        F.count(F.lit(1)).cast("long").alias("n_anchors"),
    )
    return best.select(
        "target", "n_links", "n_anchors", F.col("b.anchor").alias("top_anchor")
    )


def normalize_url(col: Column) -> Column:
    """Canonical form for id hashing: lowercase, strip fragment and any
    trailing slash. Pure Spark SQL expressions (JVM-side, codegen)."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"#.*$", "")
    return F.regexp_replace(c, r"/$", "")


def canonicalize_url(col: Column) -> Column:
    """Full crawl-grade URL canonicalization — the dedup key a crawler
    uses before frontier scheduling. Semantics (applied in this order):

    1. strip the fragment (``#...``);
    2. split off the query string; drop empty and ``utm_*`` tracking
       params, sort the rest byte-wise, rejoin with ``&``;
    3. strip one trailing ``/`` from the path;
    4. lowercase the scheme and authority (path/query case preserved);
    5. strip explicit default ports (``:80`` for http, ``:443`` https).

    Pure JVM-side Spark SQL expressions (codegen, no Python) — a 100 TB
    url column canonicalizes at scan speed; the DuckDB oracle
    reimplements the same spec independently (``_url_canonical_sql``)."""
    u = F.regexp_replace(col, r"#.*$", "")
    base = F.regexp_extract(u, r"^([^?]*)", 1)
    q = F.regexp_extract(u, r"^[^?]*\?(.*)$", 1)
    kept = F.filter(
        F.split(q, "&"),
        lambda x: (~x.startswith("utm_")) & (x != F.lit("")),
    )
    sq = F.array_join(F.array_sort(kept), "&")
    base = F.regexp_replace(base, r"/$", "")
    pref = F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)", 1)
    low = F.concat(F.lower(pref), F.substr(base, F.length(pref) + F.lit(1)))
    low = F.regexp_replace(low, r"^(http://[^/:]+):80([/?]|$)", r"$1$2")
    low = F.regexp_replace(low, r"^(https://[^/:]+):443([/?]|$)", r"$1$2")
    return F.when(sq == "", low).otherwise(F.concat(low, F.lit("?"), sq))


def url_id(col: Column) -> Column:
    """Deterministic 64-bit vertex id: xxhash64 of the normalized URL —
    stable across runs and parallelism levels (replaces the reference's
    WritableComparable vertex ids, ``graph/Vertex.java:63``)."""
    return F.xxhash64(normalize_url(col))


def build_edges(
    pages: DataFrame,
    drop_self_loops: bool = True,
    same_site_only: bool = False,
) -> DataFrame:
    """Derive the deduped edge table (src: long, dst: long) from pages.

    Graph-prep semantics follow
    ``giraph-block-app-8/.../prepare_graph/PrepareGraphPieces.java:87-139``
    (dedup + self-loop drop). ``same_site_only`` keeps only links whose
    origin matches the page's origin (an input filter — SURVEY §2.6's
    multi-input/filter surface), yielding a many-component site-local
    subgraph.
    """
    links = extract_links(pages)
    if same_site_only:
        origin = r"^(https?://[^/]+)"
        links = links.where(
            F.regexp_extract(F.col("url"), origin, 1)
            == F.regexp_extract(F.col("href"), origin, 1)
        )
    edges = links.select(
        url_id(F.col("url")).alias("src"), url_id(F.col("href")).alias("dst")
    )
    if drop_self_loops:
        edges = edges.where(F.col("src") != F.col("dst"))
    return edges.dropDuplicates(["src", "dst"])


def url_mapping(pages: DataFrame) -> DataFrame:
    """(id, url) dimension for joining results back to URLs."""
    return pages.select(url_id(F.col("url")).alias("id"), "url").dropDuplicates(["id"])


def corpus_parquet(
    spark: SparkSession,
    n_pages: int,
    seed: int = 42,
    base_dir: str = "/tmp/giraph_spark_corpus",
) -> str:
    """Materialize the deterministic synthetic corpus to parquet (once per
    (n_pages, seed)) and return the path — so an external SQL engine
    (the DuckDB oracle) reads the *identical* table the Spark queries
    read, instead of trusting two generators to agree."""
    import os

    # _v2: bump whenever the generator's html layout changes, so stale
    # caches from an older generator are never silently reused
    path = f"{base_dir}/n{n_pages}_seed{seed}_v2.parquet"
    marker = f"{path}/_SUCCESS"
    if not os.path.exists(marker):
        synth_corpus(spark, n_pages=n_pages, seed=seed).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def host_of(col: Column) -> Column:
    """Host (netloc) of an absolute http(s) URL — '' when not absolute."""
    return F.regexp_extract(col, r"^https?://([^/]+)", 1)


def host_graph(pages: DataFrame) -> DataFrame:
    """Roll the page link graph up to the host level:
    (src_host, dst_host, n_links) with one row per ordered host pair and
    ``n_links`` = raw link occurrences (pre-dedup, self-pairs included —
    intra-host density is itself a signal).

    The standard Common-Crawl reduction (page graph → host graph, ~1000×
    smaller); at 100 TB this is one map-side-combined groupBy whose hot
    keys (mega-hosts) AQE's skew handling or a salted two-level count
    absorb — same skew story as the vertex gathers.
    """
    links = extract_links(pages)
    return (
        links.select(
            host_of(F.col("url")).alias("src_host"),
            host_of(F.col("href")).alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


# Two-level public suffixes handled by registrable_domain — a small,
# fixed, documented subset of the public-suffix list (the full PSL is
# a data file a production deployment would broadcast-join instead).
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr",
)


def registrable_domain(col: Column) -> Column:
    """Pay-level (registrable) domain of a host — the key every
    host-level rollup actually wants to group by (``blog.example.co.uk``
    and ``www.example.co.uk`` are the same site owner). Semantics:
    lowercase, strip a ``:port`` suffix and one leading ``www.``; if the
    last two labels form a known two-level suffix keep three labels,
    else keep two; hosts with <= 2 labels pass through.

    Pure JVM expressions (split + element_at + when), codegen-friendly:
    a 100 TB host column rolls up at scan speed. The suffix set is the
    in-repo :data:`TWO_LEVEL_SUFFIXES` subset, disclosed and oracle-
    replayable; production would broadcast the full public-suffix list.
    """
    h = F.lower(F.regexp_replace(col, r":\d+$", ""))
    h = F.regexp_replace(h, r"^www\.", "")
    parts = F.split(h, r"\.")
    np_ = F.size(parts)
    last2 = F.concat_ws(
        ".", F.element_at(parts, -2), F.element_at(parts, -1)
    )
    dom3 = F.concat_ws(".", F.element_at(parts, -3), last2)
    return F.when(np_ <= 2, h).otherwise(
        F.when(last2.isin(*TWO_LEVEL_SUFFIXES), dom3).otherwise(last2)
    )


def domain_graph(pages: DataFrame) -> DataFrame:
    """Link graph rolled up to the registrable-domain level:
    (src_domain, dst_domain, n_links). One groupBy past
    :func:`host_graph` — the next rung of the standard Common-Crawl
    page -> host -> domain reduction ladder."""
    hg = host_graph(pages)
    return (
        hg.select(
            registrable_domain(F.col("src_host")).alias("src_domain"),
            registrable_domain(F.col("dst_host")).alias("dst_domain"),
            "n_links",
        )
        .groupBy("src_domain", "dst_domain")
        .agg(F.sum("n_links").alias("n_links"))
    )


def mirror_hosts(
    urls: DataFrame,
    threshold: float = 0.5,
    url_col: str = "url",
    max_df: int | None = None,
) -> DataFrame:
    """Mirror / alias host detection: host pairs whose sets of
    canonical paths (path + sorted query, :func:`canonicalize_url`)
    overlap with Jaccard >= ``threshold`` — the crawl-dedup signal for
    the same site served under several hostnames (www vs bare, CDN
    aliases, parked mirrors). Returns (host_a, host_b, n_shared,
    jaccard) for host_a < host_b, jaccard rounded to 6 decimals before
    the cut.

    Scale shape: the pair enumeration is an inverted-index join on the
    shared PATH (cost = sum over paths of hosts(path)^2 — the
    :func:`giraph_spark.dedup.jaccard_pairs` bound, with ``max_df``
    dropping ubiquitous paths like '/' or '/index'), never
    all-host-pairs; set sizes and intersections are map-side-combined
    counts.
    """
    canon = urls.select(canonicalize_url(F.col(url_col)).alias("c"))
    hp = canon.select(
        F.regexp_extract("c", r"^https?://([^/]+)", 1).alias("host"),
        F.regexp_replace("c", r"^https?://[^/]+", "").alias("path"),
    ).distinct()
    if max_df is not None:
        pdf = hp.groupBy("path").agg(F.count(F.lit(1)).alias("_df"))
        hp = hp.join(pdf.where(F.col("_df") <= max_df), "path").select(
            "host", "path"
        )
    sizes = hp.groupBy("host").agg(F.count(F.lit(1)).alias("sz"))
    a = hp.select(F.col("host").alias("host_a"), "path")
    b = hp.select(F.col("host").alias("host_b"), "path")
    shared = (
        a.join(b, "path")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(
            sizes.select(F.col("host").alias("host_a"), F.col("sz").alias("_sa")),
            "host_a",
        )
        .join(
            sizes.select(F.col("host").alias("host_b"), F.col("sz").alias("_sb")),
            "host_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared")
                / (F.col("_sa") + F.col("_sb") - F.col("n_shared")),
                6,
            ),
        )
        .where(F.col("jaccard") >= F.lit(float(threshold)))
        .select("host_a", "host_b", "n_shared", "jaccard")
    )
