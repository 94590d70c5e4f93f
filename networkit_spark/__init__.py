"""networkit_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the query capabilities of NetworKit (reference: fabratu/networkit,
C++17/OpenMP core with Cython bindings) as idiomatic Spark DataFrame programs:

- canonical edge-table data model (``graph.py``) replacing the in-memory
  adjacency-list ``Graph`` (reference ``include/networkit/graph/Graph.hpp:107``),
- iterative kernels (PageRank, connected components, label propagation,
  triangle counting, ...) in ``operators/`` as superstep driver loops over
  DataFrames with checkpoint/resume (``plans/iteration.py``),
- web-corpus ingest (``sources/pages.py``): Common-Crawl-style pages
  ``(url, warc_ts, html, text, lang)`` -> frozen text extraction -> href
  parsing -> dictionary-encoded edge table, all vectorized (no per-row Python),
- training-data pipeline functions (``functions/``): dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding cosine), similarity search, text
  analysis, multimodal plumbing.

Nothing here materializes a graph in single-node memory; every operator is a
DataFrame program whose physical plan Catalyst optimizes (broadcast joins for
score/dictionary tables, AQE skew handling for hub vertices, partial
aggregation for message combining).
"""

from networkit_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
