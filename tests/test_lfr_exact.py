"""Exact LFR generator (cpp/generators/LFRGenerator.cpp twin): degree
sequence, community sizes, mixing parameter, and realizability contracts."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.sources.generators import lfr_exact


def _load(spark, **kw):
    edges, part = lfr_exact(spark, **kw)
    und = {
        (r["src"], r["dst"]) for r in edges.filter("src < dst").collect()
    }
    zeta = {r["node"]: r["subset"] for r in part.collect()}
    return und, zeta


def test_lfr_basic_contracts(spark):
    n, mu = 300, 0.2
    und, zeta = _load(
        spark, n=n, avg_degree=10, max_degree=30, min_community=20,
        max_community=60, mu=mu, seed=7,
    )
    # partition covers all nodes; community sizes in the requested band
    assert set(zeta) == set(range(n))
    from collections import Counter

    sizes = Counter(zeta.values())
    assert sum(sizes.values()) == n
    # one community may have absorbed the fill remainder / a merge
    assert all(s >= 20 for s in sizes.values())
    assert max(sizes.values()) <= 2 * 60

    # degree contract: bounded by max_degree, average near target
    deg = Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    assert max(deg.values()) <= 30
    avg = 2 * len(und) / n
    assert 6.0 <= avg <= 13.0, avg  # HH-ignore/rewire drops allow slack

    # mixing contract: realized inter-community edge fraction ~ mu
    inter = sum(1 for a, b in und if zeta[a] != zeta[b])
    realized_mu = inter / len(und)
    assert abs(realized_mu - mu) < 0.12, realized_mu


def test_lfr_mixing_tracks_mu(spark):
    """Higher mu -> more inter-community edges, monotonically."""
    mus = [0.1, 0.4]
    realized = []
    for mu in mus:
        und, zeta = _load(
            spark, n=250, avg_degree=8, max_degree=25, min_community=20,
            max_community=60, mu=mu, seed=11,
        )
        realized.append(sum(1 for a, b in und if zeta[a] != zeta[b]) / len(und))
    assert realized[0] < realized[1]
    assert abs(realized[0] - 0.1) < 0.12
    assert abs(realized[1] - 0.4) < 0.15


def test_lfr_deterministic(spark):
    a = _load(spark, n=150, avg_degree=6, max_degree=20, min_community=15,
              max_community=50, mu=0.25, seed=3)
    b = _load(spark, n=150, avg_degree=6, max_degree=20, min_community=15,
              max_community=50, mu=0.25, seed=3)
    assert a == b


def test_lfr_unrealizable_raises(spark):
    # mu ~ 0 with max internal degree far above the largest community
    with pytest.raises(RuntimeError, match="not realizable"):
        lfr_exact(
            spark, n=120, avg_degree=15, max_degree=60, min_community=10,
            max_community=20, mu=0.0, seed=5,
        )


def test_lfr_guarded_at_scale(spark):
    from networkit_spark.sources.generators import DRIVER_GEN_MAX_N

    with pytest.raises(ValueError, match="lfr_like"):
        lfr_exact(spark, n=DRIVER_GEN_MAX_N + 1)
