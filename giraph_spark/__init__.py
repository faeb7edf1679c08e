"""giraph_spark — a from-scratch PySpark-native Pregel-style link-graph engine.

Re-expresses the query/data-processing capabilities of Apache Giraph
(reference: PedroJoaquim/giraph, studied at /root/reference) as idiomatic
Spark: a driver-side superstep loop over two DataFrames (``vertices``,
``edges``) with ``join -> groupBy.agg -> join`` per superstep, Arrow-
vectorized UDFs for corpus text/href extraction, explicit hash
partitioning + salting for hub skew, and checkpointed resumable
supersteps.

Modules
-------
- ``session``     SparkSession builder tuned for the engine
- ``corpus``      deterministic synthetic web-page corpus + Arrow extraction UDFs
- ``graph``       edge-table ETL (graph-prep operators of
                  ``giraph-block-app-8/.../prepare_graph/PrepareGraphPieces.java``)
- ``pregel``      the BSP superstep engine (Computation/Combiner/MasterCompute
                  semantics of ``giraph-core/.../graph/Computation.java``)
- ``blocks``      composable superstep combinators (Blocks framework)
- ``reducers``    aggregator/reducer library incl. matrix/vector reduce
- ``checkpoint``  superstep snapshots with per-partition lineage + metrics
- ``storage``     bucketed-by-src persisted edge tables; partitioner selection
- ``mutation``    mid-run add/remove requests with VertexResolver order
- ``io_formats``  text/adjacency/JSON readers, id-value/Graphviz writers
- ``algorithms``  PageRank variants, WCC (frontier + alternating-star), LPA,
                  triangles, SSSP, BFS, SCC, MIS, PPR, deadlock detection
- ``text``        token stats, quality scoring, language id, fingerprints
- ``dedup``       exact / n-gram Jaccard / MinHash-LSH / SimHash near-dup
- ``embeddings``  cosine top-k, k-means + IVF ANN, cosine near-dup (+LSH)
- ``pipeline``    deterministic sampling, distributed prefix sum, shard packing
- ``multimodal``  binary-column (image/audio) plumbing with stubbed decoders
- ``streaming``   Structured Streaming ingest/windows + stateful Pandas ops
- ``datasets``    oracle-checkable demo tables + synthetic link-graph generator
- ``main``        spark-submit CLI (GiraphRunner analog)
"""

__version__ = "0.1.0"
