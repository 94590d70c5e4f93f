"""Streaming & dynamic-graph layer.

Reference: ``include/networkit/dynamics/GraphEvent.hpp:18-52`` (event record),
``GraphUpdater``, ``GraphDifference``, ``DGSStreamParser``, and the ``Dyn*``
algorithms (``components/DynConnectedComponents.cpp`` etc.). Spark mapping:
Structured Streaming over an event table (``events.py``) with watermarks +
windowed aggregation, ``foreachBatch`` incremental maintenance of the edge
table and kernel state, and batch incremental updates (``dynamics.py``-style
functions) matching the ``update/updateBatch`` API shape.
"""
