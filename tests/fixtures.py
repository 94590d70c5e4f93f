"""Golden graph fixtures transcribed from the reference test suite.

Each is (edge list, expected outputs) — see FIXTURES.md for the file:line
provenance in /root/reference.
"""

# pr8: weighted undirected 8-node PageRank graph
# CentralityGTest.cpp:608-648 (Matlab golden scores, tol 1e-4)
PR8_EDGES = [
    (0, 2, 3.0), (1, 2, 2.0), (2, 3, 3.0), (2, 4, 2.0), (2, 5, 1.5),
    (3, 5, 3.0), (4, 5, 2.0), (5, 6, 3.0), (5, 7, 2.0),
]
PR8_EXPECTED = [0.0753, 0.0565, 0.2552, 0.1319, 0.0942, 0.2552, 0.0753, 0.0565]
# same graph, eigenvector centrality (CentralityGTest.cpp:567-606)
PR8_EVZ_EXPECTED = [0.2254, 0.1503, 0.5290, 0.4508, 0.3006, 0.5290, 0.2254, 0.1503]

# pr5-sink: directed 5-node normalized/sink-handling graph
# CentralityGTest.cpp:521-565 (Berberich et al. example); nodes 3,4 isolated
PR5_EDGES = [(0, 1), (1, 0), (0, 2), (1, 2)]
PR5_N = 5
PR5_DIRECTED_EXPECTED = [1.7391, 1.7391, 2.4781, 1.0, 1.0]
PR5_UNDIRECTED_EXPECTED = [7.4026, 7.4026, 5.1948, 1.0, 1.0]

# cc20: 20-node 5-component graph (ConnectedComponentsGTest.cpp:32-63)
CC20_EDGES = [
    (0, 1), (1, 2), (2, 4), (4, 8), (8, 16), (16, 19),
    (3, 5), (5, 6), (6, 7), (7, 9),
    (10, 11), (10, 18), (10, 12), (18, 17),
    (13, 14),
]
CC20_N = 20  # node 15 isolated
CC20_N_COMPONENTS = 5
CC20_SIZES = sorted([7, 5, 5, 2, 1])

# lcc16: 16-node clustering-coefficient graph (CentralityGTest.cpp:1247-1303)
LCC16_EDGES = [
    (2, 4), (3, 4), (4, 5), (5, 7), (6, 7), (6, 8), (6, 9), (6, 11),
    (7, 12), (8, 9), (8, 10), (8, 11), (8, 13), (9, 10), (9, 11), (9, 13),
    (10, 11), (10, 13), (10, 14), (11, 13), (11, 14), (12, 15), (13, 14),
    (14, 15),
]
LCC16_N = 16
LCC16_EXPECTED = [0, 0, 0, 0, 0, 0, 0.5, 0, 0.8, 0.8, 0.8, 2.0 / 3.0, 0, 0.8, 0.5, 0]

# lcc6: 6-node graph (CentralityGTest.cpp:1305-1325)
LCC6_EDGES = [
    (1, 0), (2, 0), (2, 1), (3, 2), (3, 0), (3, 1), (4, 2), (4, 0),
    (5, 3), (5, 4), (5, 1),
]
LCC6_N = 6
LCC6_EXPECTED = [2 / 3, 2 / 3, 2 / 3, 2 / 3, 1 / 3, 1 / 3]


def clique_edges(k: int = 10, size: int = 20):
    """plp-cliques fixture: k disjoint cliques of `size` nodes (CommunityGTest.cpp:204-281 pattern)."""
    edges = []
    for c in range(k):
        base = c * size
        for a in range(size):
            for b in range(a + 1, size):
                edges.append((base + a, base + b))
    return edges
