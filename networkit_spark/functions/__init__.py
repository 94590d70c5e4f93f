"""Training-data pipeline functions over document/embedding tables.

Beyond the reference's graph operators: the operations a large-scale
web-text training pipeline needs — deduplication (``dedup.py``), similarity
search (``similarity.py``), text analysis (``text.py``), multimodal column
plumbing (``multimodal.py``). All DataFrame-first; Python only as vectorized
pandas UDFs.
"""
