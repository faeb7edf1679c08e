"""Text-analysis operators for a large-scale training-data pipeline.

Tokenization, quality scoring, language-ID, token counting and document
fingerprinting over a ``documents(doc_id, text, lang, source, n_chars)``
table. Everything is built from JVM-side Spark SQL expressions
(``regexp_extract_all`` + ``posexplode`` + aggregates — whole-stage
codegen, no Python in the hot path), so at 100 TB each op is one scan +
one keyed aggregation with map-side combine.

The reference engine has no text operators (its extension surface is the
per-vertex ``compute()`` UDF, ``graph/Computation.java:70``); these are
the pipeline-side capabilities a web-corpus engine needs alongside the
link-graph algorithms (SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Frozen tokenizer grammar — shared (as a regex literal) with the DuckDB
# oracles; changing it breaks the cross-engine contract.
TOKEN_RE = "[a-z0-9]+"

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")

# language marker words for the n-gram/stopword heuristic classifier
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "das"),
    "fr": ("le", "et", "les"),
    "es": ("el", "y", "los"),
    "zh": ("de5", "shi4", "le5"),  # romanized placeholders
}


def tokenize(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, pos, token) — one row per token, 1-based position."""
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '({TOKEN_RE})', 1)")
    return docs.select(F.col(id_col), F.posexplode(toks).alias("pos0", "token")).select(
        id_col, (F.col("pos0") + 1).alias("pos"), "token"
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Per-document token statistics: (doc_id, n_tokens, n_distinct, n_chars)."""
    toks = F.expr(f"regexp_extract_all(lower(text), '({TOKEN_RE})', 1)")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.length("text").cast("long").alias("n_chars"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality scoring: length / stopword / diversity signals.

    All ratios are pure arithmetic over token counts so the score is
    reproducible bit-for-bit in any SQL engine (rounded to 6 decimals).
    """
    t = tokenize(docs)
    stop = F.sum(F.when(F.col("token").isin(*STOPWORDS), 1).otherwise(0))
    agg = t.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("token").alias("n_distinct"),
        F.sum(F.length("token")).alias("tok_chars"),
        stop.alias("n_stop"),
    )
    n = F.col("n_tokens").cast("double")
    stop_ratio = F.col("n_stop") / n
    distinct_ratio = F.col("n_distinct") / n
    mean_len = F.col("tok_chars") / n
    score = (
        F.lit(0.25) * F.least(n / F.lit(100.0), F.lit(1.0))
        + F.lit(0.35) * distinct_ratio
        + F.lit(0.25) * F.least(mean_len / F.lit(8.0), F.lit(1.0))
        + F.lit(0.15) * (F.lit(1.0) - stop_ratio)
    )
    return agg.select(
        "doc_id",
        F.col("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language classifier: (doc_id, pred_lang, lang).

    Scores each candidate language by its marker-word hit count in the
    token multiset; argmax with deterministic tie-break on language code
    (ascending), falling back to 'und' when no marker hits at all.
    """
    t = tokenize(docs)
    scores = [
        F.sum(
            F.when(F.col("token").isin(*markers), 1).otherwise(0)
        ).alias(f"s_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    agg = t.groupBy("doc_id").agg(*scores)
    # argmax over a fixed small set of columns: fold with greatest + when
    langs = sorted(LANG_MARKERS)
    best_score = F.greatest(*[F.col(f"s_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties (checked last)
        pred = F.when(
            (F.col(f"s_{lang}") == best_score) & (best_score > 0), F.lit(lang)
        ).otherwise(pred)
    return (
        agg.select("doc_id", pred.alias("pred_lang"))
        .join(docs.select("doc_id", "lang"), "doc_id")
    )


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams, space-joined.

    Built with posexplode + lead-free self-alignment (array slicing) so
    the whole thing stays in codegen; one row per distinct shingle.
    """
    toks = F.expr(f"regexp_extract_all(lower(text), '({TOKEN_RE})', 1)")
    base = docs.select("doc_id", F.posexplode(toks).alias("pos0", "token"), toks.alias("_toks"))
    parts = [
        F.col("_toks").getItem(F.col("pos0") + i) for i in range(n)
    ]
    sh = base.where(F.col("pos0") + n <= F.size("_toks")).select(
        "doc_id", F.concat_ws(" ", *parts).alias("shingle")
    )
    return sh.dropDuplicates(["doc_id", "shingle"])


def fingerprints(docs: DataFrame, n: int = 3) -> DataFrame:
    """Document fingerprint: lexicographic min of md5(word-n-gram).

    A 1-min-sketch (winnowing-style content fingerprint): identical up to
    n-gram set equality, stable across engines because md5 hex strings
    compare identically everywhere.
    """
    sh = shingles(docs, n)
    return sh.groupBy("doc_id").agg(F.min(F.md5(F.col("shingle"))).alias("fingerprint"))
