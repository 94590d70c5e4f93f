from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.community import modularity
from networkit_spark.operators.plm import PLM
from networkit_spark.operators.plp import PLP

from tests.fixtures import clique_edges


def labels_map(df):
    return {r["node"]: r["label"] for r in df.collect()}


def planted_cliques_with_bridges(k, size):
    """k cliques + one weak bridge edge between consecutive cliques."""
    edges = clique_edges(k, size)
    for c in range(k - 1):
        edges.append((c * size, (c + 1) * size))
    return edges


def test_plm_recovers_planted_cliques(spark):
    k, size = 4, 8
    e = symmetrize(edges_df(spark, planted_cliques_with_bridges(k, size)))
    nodes = nodes_range(spark, k * size)
    res = PLM().run(e, nodes)
    lab = labels_map(res.get_partition())
    for c in range(k):
        base = c * size
        assert len({lab[base + i] for i in range(size)}) == 1, f"clique {c} split"
    assert res.number_of_communities() == k


def test_plm_modularity_at_least_plp(spark):
    k, size = 4, 6
    e = symmetrize(edges_df(spark, planted_cliques_with_bridges(k, size)))
    nodes = nodes_range(spark, k * size)
    q_plm = modularity(e, PLM().run(e, nodes).get_partition())
    q_plp = modularity(e, PLP(update_threshold=0).run(e, nodes).get_partition())
    assert q_plm >= q_plp - 1e-9
    assert q_plm > 0.5


def test_plm_merges_tight_pair(spark):
    # two triangles joined by a heavy double edge -> still two communities at
    # gamma=1, but one community if fully connected pair (k4 via bridge all)
    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(3, 4), (4, 5), (3, 5)]
    e = symmetrize(edges_df(spark, tri1 + tri2 + [(2, 3)]))
    res = PLM().run(e, nodes_range(spark, 6))
    lab = labels_map(res.get_partition())
    assert lab[0] == lab[1] == lab[2]
    assert lab[3] == lab[4] == lab[5]
    assert lab[0] != lab[3]


def test_plm_singleton_on_empty_graph(spark):
    e = edges_df(spark, [], weighted=True)
    res = PLM().run(symmetrize(e), nodes_range(spark, 5))
    lab = labels_map(res.get_partition())
    assert lab == {i: i for i in range(5)}
