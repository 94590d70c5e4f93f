"""Graph-kernel query registrations beyond PageRank (CC, PLP, triangles,
centrality family, k-core, BFS, link prediction). Populated as operators land;
importing this module registers everything into ``entry_queries.QUERIES``."""
