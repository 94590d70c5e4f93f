"""Sources: web-corpus ingest + edge-list/readers analog.

The reference's IO surface is ``networkit/graphio.pyx`` (18 file formats,
dispatcher at :1043-1546). Our native storage is Parquet (Iceberg-compatible
layout); ``pages.py`` is the primary source (Common-Crawl-style pages) and
``edgelist.py`` covers the reference's edge-list dialects
(``cpp/io/EdgeListReader.cpp``).
"""
