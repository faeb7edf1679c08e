"""Text / adjacency / JSON graph I/O — the reference's pluggable formats.

Readers map the §2.6 input surface onto ``spark.read.text`` plus JVM-side
split/regex expressions (whole-stage codegen; no Python in the parse
path), so a 100 TB text edge list scans and parses at full executor
parallelism with nothing but narrow transformations:

- ``read_edge_list``     — ``io/formats/IntNullTextEdgeInputFormat.java:36-46``
                           (one ``src<TAB-or-space>dst`` pair per line)
- ``read_adjacency``     — ``io/formats/AdjacencyListTextVertexInputFormat.java:30-41``
                           (``id value dst1 w1 dst2 w2 ...``) and the
                           unweighted/valueless variant
                           ``IntIntNullTextInputFormat`` (``id nbr nbr ...``)
- ``read_json_vertices`` — ``io/formats/JsonLongDoubleFloatDoubleVertexInputFormat.java``
                           (lines ``[id, value, [[dst, w], ...]]``)

Writers map the §2.6 output surface:

- ``write_id_value_text`` — ``io/formats/IdWithValueTextOutputFormat.java:45-93``
                            (``id<delim>value``, optional reverse)
- ``write_graphviz``      — ``io/formats/GraphvizOutputFormat.java:94-142``
                            (dot digraph; node records + ``a:id -> b:id`` edges)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_WS = r"[\t ]+"


def read_edge_list(
    spark: SparkSession, path: str, delimiter: str = _WS
) -> DataFrame:
    """(src: long, dst: long) from one ``src<sep>dst`` pair per line.
    Blank lines are skipped; ``delimiter`` is a regex (the reference
    splits on tab-or-space)."""
    lines = spark.read.text(path).where(F.trim("value") != "")
    toks = F.split(F.trim("value"), delimiter)
    return lines.select(
        toks.getItem(0).cast("long").alias("src"),
        toks.getItem(1).cast("long").alias("dst"),
    )


def read_adjacency(
    spark: SparkSession,
    path: str,
    delimiter: str = _WS,
    has_value: bool = False,
    weighted: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Parse adjacency-list lines into (vertices, edges).

    ``id [value] dst1 [w1] dst2 [w2] ...`` — with ``has_value`` the second
    token is the vertex value (double); with ``weighted`` neighbor tokens
    alternate ``dst weight``. Returns ``(vertices(id[, value]),
    edges(src, dst[, weight]))``.
    """
    lines = spark.read.text(path).where(F.trim("value") != "")
    toks = lines.select(F.split(F.trim("value"), delimiter).alias("t"))

    vcols = [F.col("t").getItem(0).cast("long").alias("id")]
    nbr_start = 1
    if has_value:
        vcols.append(F.col("t").getItem(1).cast("double").alias("value"))
        nbr_start = 2
    vertices = toks.select(*vcols)

    rest = toks.select(
        F.col("t").getItem(0).cast("long").alias("src"),
        F.posexplode(F.slice("t", nbr_start + 1, 1 << 30)).alias("pos", "tok"),
    )
    if weighted:
        dsts = rest.where(F.col("pos") % 2 == 0).select(
            "src", F.col("pos").alias("i"), F.col("tok").cast("long").alias("dst")
        )
        ws = rest.where(F.col("pos") % 2 == 1).select(
            "src",
            (F.col("pos") - 1).alias("i"),
            F.col("tok").cast("double").alias("weight"),
        )
        edges = dsts.join(ws, ["src", "i"]).select("src", "dst", "weight")
    else:
        edges = rest.select("src", F.col("tok").cast("long").alias("dst"))
    return vertices, edges


def write_adjacency(
    vertices: DataFrame,
    edges: DataFrame,
    path: str,
    delimiter: str = "\t",
    value_col: str | None = None,
    weight_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``id [value] dst1 [w1] dst2 [w2] ...`` lines — the write
    side of :func:`read_adjacency` and the reference's
    ``io/formats/AdjacencyListTextVertexOutputFormat.java:28-62`` (one
    line per vertex: id, value, then (target, edge value) pairs joined
    by the delimiter). Vertices with no out-edges still emit a line, and
    neighbors are sorted by dst so the text artifact is deterministic.

    Distributed shape: ONE groupBy on src (map-side collect_list into
    bounded per-vertex arrays), one left join back to the vertex table —
    no driver materialization; each task writes its own part file.
    """
    def _tok(c, what):
        # a null token would be silently dropped by array_join below,
        # shifting every later token one slot left and corrupting the
        # round-trip; text adjacency has no null syntax, so fail the
        # write loudly instead (coalesce short-circuits: raise_error
        # only fires on an actual null)
        return F.coalesce(
            c.cast("string"),
            F.raise_error(F.lit(f"write_adjacency: null {what} cannot be encoded")),
        )

    ecols = [F.struct(F.col("dst"), F.col(weight_col).alias("w"))] if weight_col else [
        F.struct(F.col("dst"))
    ]
    nbrs = edges.groupBy("src").agg(
        F.array_sort(F.collect_list(*ecols)).alias("ns")
    )
    joined = vertices.join(nbrs, vertices["id"] == nbrs["src"], "left")
    head = [_tok(F.col("id"), "vertex id")]
    if value_col is not None:
        head.append(_tok(F.col(value_col), f"vertex value ({value_col})"))
    if weight_col:
        flat = F.flatten(
            F.transform(
                "ns",
                lambda s: F.array(
                    _tok(s["dst"], "edge dst"), _tok(s["w"], f"edge weight ({weight_col})")
                ),
            )
        )
    else:
        flat = F.transform("ns", lambda s: _tok(s["dst"], "edge dst"))
    toks = F.concat(F.array(*head), F.coalesce(flat, F.array().cast("array<string>")))
    joined.select(F.array_join(toks, delimiter).alias("value")).write.mode(
        mode
    ).text(path)


def read_json_vertices(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Lines of ``[id, value, [[dst, w], ...]]`` → (vertices(id, value),
    edges(src, dst, weight)). The heterogeneous outer array is peeled
    with regex (JVM-side); the homogeneous edge array parses with
    ``from_json``."""
    lines = spark.read.text(path).where(F.trim("value") != "")
    return _parse_json_vertex_lines(lines.select(F.col("value").alias("line")))


def write_id_value_text(
    df: DataFrame,
    path: str,
    id_col: str = "id",
    value_col: str | None = None,
    delimiter: str = "\t",
    reverse: bool = False,
    mode: str = "overwrite",
) -> None:
    """``id<delim>value`` per line (IdWithValueTextOutputFormat semantics,
    including ``reverse.id.and.value``). ``value_col`` defaults to the
    first non-id column."""
    if value_col is None:
        value_col = next(c for c in df.columns if c != id_col)
    a, b = (value_col, id_col) if reverse else (id_col, value_col)
    out = df.select(
        F.concat_ws(delimiter, F.col(a).cast("string"), F.col(b).cast("string")).alias(
            "value"
        )
    )
    out.write.mode(mode).text(path)


_NODE_COLOR = "blue:orange"  # GraphvizOutputFormat.NODE_TEXT_COLOR


def graphviz_lines(
    vertices: DataFrame,
    edges: DataFrame,
    value_col: str | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Distributed dot-body lines (one per vertex/edge) plus header and
    footer rows, ordered by a rank column — GraphvizOutputFormat.java's
    node-record + ``src:id -> dst:id`` grammar."""
    label = F.concat(F.lit("<id> "), F.col("id").cast("string"))
    if value_col is not None:
        label = F.concat(label, F.lit("|"), F.col(value_col).cast("string"))
    nodes = vertices.select(
        F.lit(1).alias("rk"),
        F.concat(
            F.lit('"'),
            F.col("id").cast("string"),
            F.lit('" [label="'),
            label,
            F.lit(f'",shape=record,fillcolor="{_NODE_COLOR}"];'),
        ).alias("line"),
    )
    edge_txt = F.concat(
        F.col("src").cast("string"),
        F.lit(":id -> "),
        F.col("dst").cast("string"),
        F.lit(":id"),
    )
    if weight_col is not None:
        edge_txt = F.concat(
            edge_txt, F.lit(" [label="), F.col(weight_col).cast("string"), F.lit(" ];")
        )
    elines = edges.select(F.lit(2).alias("rk"), edge_txt.alias("line"))
    spark = vertices.sparkSession
    header = spark.createDataFrame([(0, "digraph g {"), (3, "}")], "rk int, line string")
    return nodes.unionByName(elines).unionByName(header)


def write_graphviz(
    vertices: DataFrame,
    edges: DataFrame,
    path: str,
    value_col: str | None = None,
    weight_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write the dot file. A single ordered part keeps ``digraph g {`` /
    ``}`` framing readable (the reference writes separate begin/end part
    files for the same reason — GraphvizOutputFormat.java:94-111); at
    scale keep the body distributed via ``graphviz_lines`` instead."""
    body = graphviz_lines(vertices, edges, value_col, weight_col)
    body.coalesce(1).sortWithinPartitions("rk").select("line").write.mode(mode).text(
        path
    )


def _parse_json_vertex_lines(parsed_src) -> tuple[DataFrame, DataFrame]:
    """Shared tail of the JSON vertex grammar: a column ``line`` holding
    ``[id, value, [[dst, w], ...]]`` → (vertices, edges)."""
    num = r"(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
    parsed = parsed_src.select(
        F.regexp_extract("line", r"^\s*\[\s*(-?\d+)", 1).cast("long").alias("id"),
        F.regexp_extract("line", r"^\s*\[\s*-?\d+\s*,\s*" + num, 1)
        .cast("double")
        .alias("val"),
        F.from_json(
            F.regexp_extract("line", r",\s*(\[.*\])\s*\]\s*$", 1),
            "array<array<double>>",
        ).alias("adj"),
    )
    vertices = parsed.select("id", F.col("val").alias("value"))
    edges = parsed.select(
        F.col("id").alias("src"), F.explode("adj").alias("e")
    ).select(
        "src",
        F.element_at("e", 1).cast("long").alias("dst"),
        F.element_at("e", 2).alias("weight"),
    )
    return vertices, edges


def read_json_base64_vertices(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Base64-wrapped JSON vertex lines → (vertices(id, value),
    edges(src, dst, weight)).

    Reference: ``io/formats/JsonBase64VertexFormat.java`` +
    ``JsonBase64VertexInputFormat.java`` — each line is the base64 of a
    serialized vertex, used where the transport mangles raw bytes
    (Hadoop streaming). The payload grammar here is the portable JSON
    vertex (``[id, value, [[dst, w], ...]]``) rather than Java Writable
    binary — Writables are not a cross-engine format; the base64 framing
    and line-per-vertex contract are what the format IS. Decode + parse
    are a single JVM projection (``unbase64`` → regex/``from_json``), so
    the scan stays whole-stage-codegen at any scale."""
    lines = spark.read.text(path).where(F.trim("value") != "")
    decoded = lines.select(
        F.decode(F.unbase64(F.trim("value")), "UTF-8").alias("line")
    )
    return _parse_json_vertex_lines(decoded)


def write_json_base64_vertices(
    vertices: DataFrame,
    edges: DataFrame,
    path: str,
    mode: str = "overwrite",
) -> None:
    """Inverse of :func:`read_json_base64_vertices`:
    ``base64("[id, value, [[dst, w], ...]]")`` per vertex
    (JsonBase64VertexOutputFormat semantics). Vertices with no out-edges
    emit an empty adjacency array."""
    adj = edges.groupBy(F.col("src").alias("id")).agg(
        F.concat(
            F.lit("["),
            F.array_join(
                F.transform(
                    F.collect_list(F.array(F.col("dst").cast("double"), F.col("weight").cast("double"))),
                    lambda e: F.concat(
                        F.lit("["),
                        F.element_at(e, 1).cast("long").cast("string"),
                        F.lit(","),
                        F.element_at(e, 2).cast("string"),
                        F.lit("]"),
                    ),
                ),
                ",",
            ),
            F.lit("]"),
        ).alias("adj_txt")
    )
    line = F.concat(
        F.lit("["),
        F.col("id").cast("string"),
        F.lit(","),
        F.col("value").cast("string"),
        F.lit(","),
        F.coalesce(F.col("adj_txt"), F.lit("[]")),
        F.lit("]"),
    )
    # Spark's base64 may chunk per RFC 2045 (76-char lines + CRLF), which
    # a line-oriented sink would split into unparseable fragments — strip
    # the soft breaks; the payload itself is line-free by construction
    b64 = F.regexp_replace(F.base64(F.encode(line, "UTF-8")), "[\\r\\n]", "")
    out = vertices.join(adj, "id", "left").select(b64.alias("value"))
    out.write.mode(mode).text(path)


def read_sequence_vertices(
    spark: SparkSession, path: str, value_type: str = "double"
) -> DataFrame:
    """Hadoop SequenceFile of (LongWritable id, Writable value) →
    (id: long, value) — ``io/formats/SequenceFileVertexInputFormat.java``
    (typed key/value splits handed to the vertex reader).

    Uses the JVM sequenceFile reader (one task per split, exactly the
    reference's input-split parallelism); records surface through the
    Pyrolite bridge, so this is a LEGACY-INGEST path: at 100 TB read the
    sequence files once, convert to parquet/bucketed tables, and run the
    engine on those (the reference's users did the same migration —
    SequenceFile is its compatibility tier, not its fast path)."""
    rdd = spark.sparkContext.sequenceFile(path)
    return spark.createDataFrame(rdd, f"id long, value {value_type}")


def write_sequence_vertices(
    df: DataFrame, path: str, id_col: str = "id", value_col: str = "value"
) -> None:
    """Write (id, value) as a Hadoop SequenceFile (LongWritable,
    <value Writable>) — SequenceFileVertexOutputFormat analog; the
    inverse of :func:`read_sequence_vertices`."""
    df.select(id_col, value_col).rdd.map(tuple).saveAsSequenceFile(path)


def apply_input_filters(
    df: DataFrame,
    *filters,
):
    """Drop records at load time — the reference's input-filter hook
    (``io/filters/EdgeInputFilter.java`` / ``VertexInputFilter.java``:
    a per-record ``dropEdge/dropVertex`` predicate consulted while
    splits are read).

    ``filters`` are Column predicates meaning KEEP (the inverse of the
    reference's drop-convention, which is the natural Spark phrasing);
    they are ANDed and applied as one ``where`` so Catalyst pushes the
    conjunction into the scan (parquet row-group / text split pruning)
    instead of materializing unfiltered rows.
    """
    for f in filters:
        df = df.where(f)
    return df


def read_multi_edges(
    spark: SparkSession,
    sources,
    edge_filter=None,
) -> DataFrame:
    """Union several edge inputs of possibly different formats into one
    edge DataFrame — the reference's multi-input machinery
    (``io/formats/multi/MultiEdgeInputFormat.java``: each sub-input keeps
    its own format/path, records merge into one graph).

    ``sources`` is an iterable of either ready DataFrames or callables
    ``spark -> DataFrame`` (so formats mix freely:
    ``read_edge_list(...)``, parquet scans, ``read_json_vertices``
    edges). Columns are aligned by name (missing ``weight`` filled with
    null) and the optional keep-filter is applied per-source BEFORE the
    union so pushdown happens per input format.
    """
    dfs = []
    for s in sources:
        df = s(spark) if callable(s) else s
        if edge_filter is not None:
            df = df.where(edge_filter)
        dfs.append(df)
    if not dfs:
        raise ValueError("read_multi_edges needs at least one source")
    cols = set()
    for df in dfs:
        cols.update(df.columns)
    ordered = [c for c in ("src", "dst", "weight") if c in cols] + sorted(
        c for c in cols if c not in ("src", "dst", "weight")
    )
    aligned = [
        df.select(
            *[
                (F.col(c) if c in df.columns else F.lit(None)).alias(c)
                for c in ordered
            ]
        )
        for df in dfs
    ]
    out = aligned[0]
    for df in aligned[1:]:
        out = out.unionByName(df)
    return out
