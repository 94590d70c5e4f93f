"""b-suitor b-matching: greedy-replica parity under distinct weights,
validity/maximality invariants, vector-b form."""

from collections import Counter

from pyspark.sql import functions as F

from networkit_spark.graph import edges_df, nodes_range
from networkit_spark.operators.bmatching import b_suitor_matching
from networkit_spark.operators.matching import local_max_matching


def _weighted(spark, triples):
    return spark.createDataFrame(triples, "src long, dst long, weight double")


def _toy(n=20):
    """Canonical undirected edges with distinct weights."""
    pairs = {(min(i, (i * 3 + 1) % n), max(i, (i * 3 + 1) % n)) for i in range(n)}
    pairs |= {(min(i, (i * 7 + 2) % n), max(i, (i * 7 + 2) % n)) for i in range(n)}
    pairs = sorted((a, b) for a, b in pairs if a != b)
    return [(a, b, 1.0 + ((a * 31 + b * 17) % 97) / 97.0 + 0.0001 * (a * n + b)) for a, b in pairs]


def _greedy_b_matching(triples, b):
    cap = Counter()
    out = []
    for a, bb, w in sorted(triples, key=lambda t: (-t[2], t[0], t[1])):
        if cap[a] < b and cap[bb] < b:
            out.append((a, bb))
            cap[a] += 1
            cap[bb] += 1
    return sorted(out)


def test_bsuitor_equals_greedy_distinct_weights(spark):
    triples = _toy(20)
    e = _weighted(spark, triples)
    for b in (1, 2, 3):
        got = sorted(
            (r.u, r.v) for r in b_suitor_matching(e, b, nodes_range(spark, 20)).collect()
        )
        assert got == _greedy_b_matching(triples, b), f"b={b}"


def test_bsuitor_b1_equals_local_max(spark):
    triples = _toy(24)
    e = _weighted(spark, triples)
    sym = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    got = sorted((r.u, r.v) for r in b_suitor_matching(e, 1).collect())
    want = sorted((r.u, r.v) for r in local_max_matching(sym).collect())
    assert got == want


def test_bsuitor_validity_and_maximality(spark):
    triples = _toy(30)
    b = 2
    e = _weighted(spark, triples)
    got = [(r.u, r.v) for r in b_suitor_matching(e, b).collect()]
    deg = Counter()
    for u, v in got:
        assert u < v
        deg[u] += 1
        deg[v] += 1
    assert all(d <= b for d in deg.values())
    assert len(got) == len(set(got))
    # maximality: every unmatched edge has a saturated endpoint
    chosen = set(got)
    for a, bb, _ in triples:
        if (a, bb) not in chosen:
            assert deg[a] == b or deg[bb] == b, (a, bb)


def test_bsuitor_vector_b(spark):
    triples = _toy(16)
    e = _weighted(spark, triples)
    bvec = spark.createDataFrame(
        [(i, 1 if i % 2 == 0 else 3) for i in range(16)], "node long, b long"
    )
    got = [(r.u, r.v) for r in b_suitor_matching(e, bvec).collect()]
    deg = Counter()
    for u, v in got:
        deg[u] += 1
        deg[v] += 1
    for i in range(16):
        assert deg[i] <= (1 if i % 2 == 0 else 3)
