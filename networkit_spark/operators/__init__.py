"""Operators: the reference's ~200 Algorithm classes, re-expressed Spark-first.

Each module mirrors a reference module (file:line cites in docstrings):
``pagerank`` / ``centrality`` <- ``cpp/centrality/``, ``components`` <-
``cpp/components/``, ``plp`` + ``community`` <- ``cpp/community/``,
``triangles`` <- ``cpp/centrality/LocalClusteringCoefficient.cpp`` +
``cpp/edgescores/``, ``distance`` <- ``cpp/distance/``, ``kcore`` <-
``cpp/centrality/CoreDecomposition.cpp``, ``linkprediction`` <-
``cpp/linkprediction/``.
"""
