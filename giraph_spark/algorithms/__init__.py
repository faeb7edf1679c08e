"""Algorithm library on the superstep engine — the Spark re-expression of
``giraph-block-app-8``'s algorithm library and ``giraph-examples``."""

from giraph_spark.algorithms.pagerank import pagerank
from giraph_spark.algorithms.wcc import connected_components
from giraph_spark.algorithms.lpa import label_propagation, max_label_propagation
from giraph_spark.algorithms.triangles import triangle_count, triangles_per_vertex
from giraph_spark.algorithms.paths import sssp, bfs
from giraph_spark.algorithms.hits import hits

__all__ = [
    "hits",
    "pagerank",
    "connected_components",
    "label_propagation",
    "max_label_propagation",
    "triangle_count",
    "triangles_per_vertex",
    "sssp",
    "bfs",
]
