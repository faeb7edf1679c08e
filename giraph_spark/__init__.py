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
- ``checkpoint``  superstep snapshots with per-partition lineage + metrics
- ``algorithms``  PageRank, WCC, label propagation, triangles, SSSP, BFS, ...
- ``textops``     training-data pipeline: dedup (exact/minhash/simhash/jaccard),
                  text quality, language id, token counts, fingerprints
- ``vectors``     embedding similarity search (brute-force + LSH-bucketed)
- ``multimodal``  binary-column (image/audio) plumbing with stubbed decoders
"""

__version__ = "0.1.0"
