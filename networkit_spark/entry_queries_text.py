"""Training-data pipeline query registrations (dedup, similarity search,
text analysis) over the ``documents`` and ``embeddings`` tables. Populated as
functions land; importing registers into ``entry_queries.QUERIES``."""
