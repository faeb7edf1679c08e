"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the correctness baseline, and an IVF-style
(inverted-file) variant as the scale path: assign vectors to their
nearest centroid once, then restrict candidate generation to same-cell
vectors. Dot products run through ``F.zip_with`` + ``F.aggregate`` —
JVM-side higher-order functions, no Python UDFs, so a 100 TB scan stays
in whole-stage codegen and the only shuffle is the top-k aggregation.

The reference has no vector search; these are pipeline-side first-class
ops per the build brief (SURVEY.md §2.7 audit: engine's extension
surface is UDFs; ours is Spark SQL higher-order functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# fixed-point scale for portable (engine-independent) LSH sign bits:
# floor(x * 2^20) is exact on any IEEE-754 engine because a power-of-two
# scaling of a float32-widened-to-double is exact
QUANT_SCALE = 1 << 20


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    """Add cosine(a, b) for two array<float> columns."""
    ca, cb = F.col(a), F.col(b)
    return df.withColumn(out, _dot(ca, cb) / (_norm(ca) * _norm(cb)))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: for each query vector, the k nearest
    non-identical vectors. Returns (query_id, rank, neighbor_id, cosine).

    The query side is broadcast (small dim table); ranking is a window
    top-k = Spark's TakeOrdered per key. Deterministic tie-break on
    neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vvec"))
    scored = (
        v.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_qvec"), F.col("_vvec"))
                / (_norm(F.col("_qvec")) * _norm(F.col("_vvec"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Assign every vector to its max-cosine centroid (IVF cell).

    Returns (vec_id, centroid_id, cosine). Centroids are broadcast; the
    argmax is a per-vector window rank — at scale this is one broadcast
    nested-loop over C centroids per row, no shuffle until the output.
    """
    c = centroids.select(
        F.col(centroid_id_col).alias("centroid_id"), F.col(vec_col).alias("_cvec")
    )
    v = vectors.select(F.col(id_col), F.col(vec_col).alias("_vvec"))
    scored = v.crossJoin(F.broadcast(c)).withColumn(
        "cosine",
        F.round(
            _dot(F.col("_vvec"), F.col("_cvec"))
            / (_norm(F.col("_vvec")) * _norm(F.col("_cvec"))),
            6,
        ),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("cosine").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, "centroid_id", "cosine")
    )


def kmeans_fit(
    vectors: DataFrame,
    k: int,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Train IVF centroids: deterministic spherical k-means.

    Init picks the ``k`` vectors with the smallest portable
    ``luby_priority(id, seed)`` (reproducible across runs, parallelism
    levels, and engines — no xxhash64). Each iteration is the same
    Pregel-shaped round the graph algorithms use: broadcast-assign
    (``ivf_assign``, cosine rounded to 6dp with centroid-id tie-break,
    so the argmax is cross-engine deterministic) then a groupBy
    element-wise mean; empty cells keep their previous centroid.
    Centroids (k × dim doubles) are driver-side aggregator state —
    collected per round like any MasterCompute aggregate.

    Returns (centroid_id, ``vec_col``) with array<double> centroids.
    """
    from giraph_spark.algorithms.mis import luby_priority

    spark = vectors.sparkSession
    init = (
        vectors.select(
            F.col(id_col), F.col(vec_col),
            luby_priority(F.col(id_col), seed).alias("_p"),
        )
        .orderBy("_p", id_col)
        .limit(k)
    )
    cent = init.select(
        (F.row_number().over(Window.orderBy("_p", id_col)) - 1).alias("centroid_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(vec_col),
    )

    schema = f"centroid_id int, {vec_col} array<double>"
    cent_rows = [
        (int(r["centroid_id"]), [float(x) for x in r[vec_col]])
        for r in cent.collect()
    ]

    for _ in range(iters):
        cdf = spark.createDataFrame(cent_rows, schema)
        assign = ivf_assign(vectors, cdf, id_col=id_col, vec_col=vec_col)
        ex = assign.join(vectors, id_col).select(
            "centroid_id", F.posexplode(vec_col).alias("pos", "v")
        )
        means = (
            ex.groupBy("centroid_id", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias(vec_col)
            )
        )
        updated = {
            int(r["centroid_id"]): [float(x) for x in r[vec_col]]
            for r in means.collect()
        }
        cent_rows = [(cid, updated.get(cid, old)) for cid, old in cent_rows]
    return spark.createDataFrame(cent_rows, schema)


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: search only vectors whose cell is among the
    query's ``n_probe`` nearest centroids. Same output shape as
    ``cosine_topk`` — the scale path (candidate set shrinks by ~C/n_probe).
    """
    assign = ivf_assign(vectors, centroids, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("centroid_id").alias("_cell")
    )
    c = centroids.select(
        F.col("centroid_id").alias("_cell"), F.col(vec_col).alias("_cvec")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"))
    qcells = (
        q.crossJoin(F.broadcast(c))
        .withColumn(
            "_qc",
            _dot(F.col("_qvec"), F.col("_cvec"))
            / (_norm(F.col("_qvec")) * _norm(F.col("_cvec"))),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("_qc").desc(), F.col("_cell").asc()
                )
            ),
        )
        .where(F.col("_rn") <= n_probe)
        .select("query_id", "_qvec", "_cell")
    )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vvec"))
    cand = qcells.join(assign, "_cell").join(v, "neighbor_id").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.withColumn(
        "cosine",
        F.round(
            _dot(F.col("_qvec"), F.col("_vvec"))
            / (_norm(F.col("_qvec")) * _norm(F.col("_vvec"))),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def cosine_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, brute force — the exact
    baseline: all (id_a < id_b) pairs with cosine >= threshold. Returns
    (id_a, id_b, cosine) with cosine rounded to 6 dp for cross-engine
    determinism. O(n^2) by construction — the correctness oracle for
    :func:`lsh_cosine_pairs`, usable directly only on bounded inputs
    (a dedup shard, a candidate pool), never on the full corpus.
    """
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_va"), F.col("_vb"))
                / (_norm(F.col("_va")) * _norm(F.col("_vb"))),
                6,
            ),
        )
        .where(F.col("cosine") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "cosine")
    )


def hyperplane_signatures(
    vectors: DataFrame,
    dim: int,
    planes: int = 16,
    bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (SimHash-for-vectors) band signatures.

    Each of ``planes`` pseudo-random Rademacher hyperplanes (components
    +-1, deterministic from ``seed`` via numpy so retried tasks agree)
    contributes one sign bit: bit_p = [dot(v, h_p) >= 0]. Bits are packed
    into ``bands`` integer bucket keys of planes/bands bits each — the
    banded LSH family for angular distance: two vectors at cosine
    similarity s collide in one band with prob ((1 - acos(s)/pi) ** r),
    r = planes/bands. Returns (vec_id, band, bucket) — one row per band,
    all JVM-side arithmetic (no shuffle until the caller groups buckets).

    The dot is computed on *integer-quantized* components
    (floor(x * 2^20) as long), so the sign bit is exact integer
    arithmetic: bit-reproducible across summation orders, retried tasks,
    and engines (the replay oracle computes the identical buckets in
    SQL). A float fold's last-ulp noise can flip the sign of a
    near-orthogonal plane dot and silently move a vector between
    buckets; quantization error (~1e-6 relative) only perturbs which
    side of the plane a genuinely borderline vector lands on, which the
    LSH family is insensitive to. Quantized magnitudes are ~2^20 * |x|,
    so the long accumulator is overflow-safe up to dim ~ 2^40.
    """
    import numpy as np

    rng = np.random.RandomState(seed)
    h = rng.choice([-1.0, 1.0], size=(planes, dim))
    r = planes // bands
    if r * bands != planes:
        raise ValueError(f"planes ({planes}) must divide evenly into bands ({bands})")
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(QUANT_SCALE))).cast("long"),
    )
    bits = [
        (
            F.aggregate(
                F.zip_with(
                    q,
                    F.array(*[F.lit(int(x)).cast("long") for x in h[p]]),
                    lambda a, s: a * s,
                ),
                F.lit(0).cast("long"),
                lambda acc, t: acc + t,
            )
            >= 0
        ).cast("long")
        for p in range(planes)
    ]
    bucket_cols = []
    for b in range(bands):
        acc = F.lit(0)
        for j in range(r):
            acc = acc * 2 + bits[b * r + j]
        bucket_cols.append(F.struct(F.lit(b).alias("band"), acc.alias("bucket")))
    return vectors.select(
        F.col(id_col), F.explode(F.array(*bucket_cols)).alias("_bb")
    ).select(id_col, F.col("_bb.band").alias("band"), F.col("_bb.bucket").alias("bucket"))


def lsh_cosine_pairs(
    vectors: DataFrame,
    threshold: float,
    dim: int,
    planes: int = 16,
    bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup at scale: candidates = pairs sharing any
    (band, bucket) of :func:`hyperplane_signatures`, then an exact cosine
    verify join keeps pairs >= threshold. Precision is exact (every
    emitted cosine is recomputed); recall is the banded-LSH bound — at
    the defaults (16 planes, 8 bands of 2 bits) a cosine-0.9 pair is a
    candidate with prob ~0.9998. No all-pairs stage anywhere: the only
    quadratic term is within a single LSH bucket, the same bound as
    ``dedup.minhash_lsh_pairs``. Returns (id_a, id_b, cosine).
    """
    sig = hyperplane_signatures(
        vectors, dim=dim, planes=planes, bands=bands, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    left = sig.select("band", "bucket", F.col(id_col).alias("id_a"))
    right = sig.select("band", "bucket", F.col(id_col).alias("id_b"))
    cand = (
        left.join(right, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_va"), F.col("_vb"))
                / (_norm(F.col("_va")) * _norm(F.col("_vb"))),
                6,
            ),
        )
        .where(F.col("cosine") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "cosine")
    )


def quantize_int8(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: (id, scale, q).

    ``scale`` = max|x| / 127 (rounded to 9 dp so every engine agrees on
    the divisor bit-for-bit), ``q[i]`` = round(x[i] / scale) ∈
    [-127, 127]. The standard 4× embedding-store compression before an
    ANN index is built at corpus scale; dequantize as ``q[i] * scale``.

    All-zero vectors get scale 0.0 and an all-zero ``q`` instead of a
    divide-by-zero (ANSI mode would fail the stage otherwise).

    Scale shape: one narrow projection — higher-order functions only,
    no shuffle, no Python; at 100 TB this is a pure map stage that
    rides whatever partitioning the embedding table already has.
    """
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    scale = F.round(F.array_max(F.transform(x, F.abs)) / F.lit(127.0), 9)
    q = F.when(scale == 0.0, F.transform(x, lambda v: F.lit(0))).otherwise(
        F.transform(x, lambda v: F.round(v / scale).cast("int"))
    )
    return emb.select(
        F.col(id_col), scale.alias("scale"), q.alias("q")
    )


def pq_fit(
    vectors: DataFrame,
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Product-quantization codebooks (Jegou, Douze & Schmid, TPAMI 2011):
    split the ``dim``-vector into ``m`` contiguous subspaces and train
    ``k`` centroids per subspace with the SAME deterministic spherical
    k-means as the IVF index (``kmeans_fit``; per-subspace seed =
    ``seed + s`` so every subspace's init is independent but replayable).

    Returns (subspace, centroid_id, ``vec_col``) — m*k rows of
    ``dim/m``-wide double centroids: the 4 kB-scale codebook that gets
    broadcast everywhere at corpus scale while the vectors themselves
    compress to ``m`` byte-codes each (PQ's whole point at 100 TB:
    64 float32 -> 4 codes = 64x smaller candidate scan).
    """
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    width = dim // m
    parts = []
    for s in range(m):
        sub = vectors.select(
            id_col, F.slice(F.col(vec_col), s * width + 1, width).alias(vec_col)
        )
        cb = kmeans_fit(sub, k=k, iters=iters, id_col=id_col,
                        vec_col=vec_col, seed=seed + s)
        parts.append(cb.select(F.lit(s).alias("subspace"), "centroid_id", vec_col))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _subvectors(
    vectors: DataFrame, m: int, width: int, id_col: str, vec_col: str
) -> DataFrame:
    """(id, subspace, subvec) — one row per (vector, subspace)."""
    return vectors.select(
        id_col,
        F.posexplode(F.sequence(F.lit(0), F.lit(m - 1))).alias("_", "subspace"),
        F.col(vec_col),
    ).select(
        id_col,
        "subspace",
        F.expr(f"slice({vec_col}, subspace * {width} + 1, {width})").alias("_sv"),
    )


def pq_encode(
    vectors: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ codes: (vec_id, subspace, code) — per subspace, the max-cosine
    codebook centroid (6dp-rounded, centroid-id tie-break: the exact
    ``ivf_assign`` argmax semantics, so any engine replays it).

    Scale shape: codebooks broadcast (m*k tiny rows), one narrow
    window-rank per (vector, subspace) — no shuffle of the vectors
    beyond their existing partitioning."""
    width = dim // m
    sv = _subvectors(vectors, m, width, id_col, vec_col)
    cb = codebooks.select(
        "subspace", F.col("centroid_id").alias("code"), F.col(vec_col).alias("_cv")
    )
    scored = sv.join(F.broadcast(cb), "subspace").withColumn(
        "_cos",
        F.round(_dot(F.col("_sv"), F.col("_cv")) / (_norm(F.col("_sv")) * _norm(F.col("_cv"))), 6),
    )
    w = Window.partitionBy(id_col, "subspace").orderBy(
        F.col("_cos").desc(), F.col("code").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, "subspace", "code")
    )


def pq_topk(
    vectors: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: score(q, x) = sum over subspaces
    of dot(q_s, codebook[s][code(x, s)]) — the query stays exact, the
    database side is its PQ reconstruction. Returns (query_id, rank,
    neighbor_id, score) with deterministic (score desc, id asc) ranking.

    Scale shape: the distance table (queries x m x k dots) is tiny and
    broadcast; the scan over codes is one broadcast join + a sum of m
    terms per (query, vector) — no full-dimension math on the database
    side, which is what makes PQ the 100 TB candidate-generation path."""
    width = dim // m
    codes = pq_encode(vectors, codebooks, m=m, dim=dim, id_col=id_col, vec_col=vec_col)
    qsv = _subvectors(
        queries.select(F.col(id_col).alias("query_id"), vec_col),
        m, width, "query_id", vec_col,
    )
    cb = codebooks.select(
        "subspace", F.col("centroid_id").alias("code"), F.col(vec_col).alias("_cv")
    )
    dtable = qsv.join(F.broadcast(cb), "subspace").select(
        "query_id", "subspace", "code",
        _dot(F.col("_sv"), F.col("_cv")).alias("_d"),
    )
    scores = (
        codes.join(F.broadcast(dtable), ["subspace", "code"])
        .groupBy("query_id", F.col(id_col).alias("neighbor_id"))
        .agg(F.round(F.sum("_d"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"),
                "neighbor_id", "score")
    )


def semdedup(
    vectors: DataFrame,
    k: int = 8,
    threshold: float = 0.95,
    iters: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup of
    an embedded corpus — k-means-cluster the embeddings, compare ONLY
    within-cluster pairs, and drop every vector that has a same-cell
    neighbor with cosine >= ``threshold`` and a smaller id (the kept row
    is the min-id representative; one deterministic pass, no transitive
    closure). Returns (vec_id, centroid_id, keep).

    Scale shape: the quadratic compare is confined to k-means cells —
    O(sum over cells of |cell|^2) instead of corpus^2, and cells are
    balanced by the trained centroids (:func:`kmeans_fit`, portable
    deterministic init). At 100 TB: k grows with corpus size so cells
    stay bounded (~sqrt scaling), and each cell's pair join is an
    ordinary shuffle-hash join on centroid_id. Cosines are rounded to
    6 dp before thresholding for cross-engine replay.
    """
    cents = kmeans_fit(
        vectors, k=k, iters=iters, seed=seed, id_col=id_col, vec_col=vec_col
    )
    asg = ivf_assign(vectors, cents, id_col=id_col, vec_col=vec_col).select(
        id_col, "centroid_id"
    )
    av = asg.join(vectors.select(id_col, vec_col), id_col)
    a = av.select(
        F.col(id_col).alias("id_a"), "centroid_id", F.col(vec_col).alias("_va")
    )
    b = av.select(
        F.col(id_col).alias("id_b"), "centroid_id", F.col(vec_col).alias("_vb")
    )
    dropped = (
        a.join(b, "centroid_id")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_va"), F.col("_vb"))
                / (_norm(F.col("_va")) * _norm(F.col("_vb"))),
                6,
            ),
        )
        .where(F.col("cosine") >= F.lit(float(threshold)))
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("_drop", F.lit(True))
    )
    return asg.join(dropped, id_col, "left").select(
        id_col,
        "centroid_id",
        (~F.coalesce("_drop", F.lit(False))).alias("keep"),
    )
