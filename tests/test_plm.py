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


def test_plm_fixed_sweeps_groups_cliques(spark):
    """Oracle-portable fixed-sweep twin: after enough parity sweeps every
    clique collapses to one community, labels normalized to min member id."""
    from networkit_spark.operators.plm import plm_fixed_sweeps

    k, size = 3, 6
    e = symmetrize(edges_df(spark, planted_cliques_with_bridges(k, size)))
    nodes = nodes_range(spark, k * size)
    lab = labels_map(plm_fixed_sweeps(e, nodes, iterations=6))
    for c in range(k):
        base = c * size
        assert len({lab[base + i] for i in range(size)}) == 1, f"clique {c} split"
    # label = min member node id
    for node, label in lab.items():
        assert label == min(n for n, l2 in lab.items() if l2 == label)
    assert modularity(e, plm_fixed_sweeps(e, nodes, iterations=6)) > 0.4


def test_plm_fixed_sweeps_singletons_on_empty(spark):
    from networkit_spark.operators.plm import plm_fixed_sweeps

    e = symmetrize(edges_df(spark, [], weighted=True))
    lab = labels_map(plm_fixed_sweeps(e, nodes_range(spark, 4), iterations=2))
    assert lab == {i: i for i in range(4)}


def test_plm_singleton_on_empty_graph(spark):
    e = edges_df(spark, [], weighted=True)
    res = PLM().run(symmetrize(e), nodes_range(spark, 5))
    lab = labels_map(res.get_partition())
    assert lab == {i: i for i in range(5)}


def test_leiden_communities_connected(spark):
    """The Leiden guarantee: every output community is internally connected
    (Louvain can produce disconnected ones — the refinement fixes it)."""
    from pyspark.sql import functions as F

    from networkit_spark.graph import nodes_range, symmetrize
    from networkit_spark.operators.components import ConnectedComponents
    from networkit_spark.operators.plm import ParallelLeiden
    from networkit_spark.sources.generators import planted_partition

    e = symmetrize(planted_partition(spark, blocks=4, block_size=12, m_in=40, m_out=10, seed=5))
    nodes = nodes_range(spark, 48)
    res = ParallelLeiden(max_sweeps_per_level=8, max_levels=3).run(e, nodes)
    labels = res.get_partition()
    # per community: CC over its induced subgraph must have exactly 1 part
    la = labels.select(F.col("node").alias("src"), F.col("label").alias("ls"))
    lb = labels.select(F.col("node").alias("dst"), F.col("label").alias("ld"))
    intra = e.join(la, "src").join(lb, "dst").filter(F.col("ls") == F.col("ld"))
    sub = ConnectedComponents().run(
        intra.select("src", "dst", "weight"), labels.select(F.col("node").alias("id"))
    ).labels_df
    # nodes sharing a community must share a CC part (and vice versa for
    # singleton communities trivially)
    n_comms = labels.select("label").distinct().count()
    # count distinct (community, intra-CC-part) pairs: connected communities
    # contribute exactly one pair each
    pairs = (
        labels.join(sub.withColumnRenamed("label", "part"), "node")
        .select("label", "part").distinct().count()
    )
    assert pairs == n_comms


def test_leiden_recovers_planted_blocks(spark):
    from pyspark.sql import functions as F

    from networkit_spark.graph import nodes_range, symmetrize
    from networkit_spark.operators.community import modularity
    from networkit_spark.operators.plm import PLM, ParallelLeiden
    from networkit_spark.sources.generators import planted_partition

    e = symmetrize(planted_partition(spark, blocks=4, block_size=12, m_in=60, m_out=6, seed=8))
    nodes = nodes_range(spark, 48)
    res = ParallelLeiden(max_sweeps_per_level=8, max_levels=3).run(e, nodes)
    q_leiden = modularity(e, res.get_partition())
    assert q_leiden > 0.5  # planted blocks -> strong modularity
