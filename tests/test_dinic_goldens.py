"""Dinic golden fixtures transcribed from the reference test suite
(cpp/flow/test/DinicGTest.cpp) — exact expected max-flow values,
including the antiparallel-arc variants and the tolerance-gating
numerical-stability cases."""

import pytest

from networkit_spark.operators.dinic import dinic_max_flow


def _df(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), float(c)) for a, b, c in triples],
        "src long, dst long, capacity double",
    )


def _value(spark, triples, s, t):
    return dinic_max_flow(_df(spark, triples), s, t).value


def test_three_disjoint_paths(spark):
    # DinicGTest.cpp:78-89 (+ :92-106, the antiparallel variant — same flow)
    base = [(0, 1, 1), (1, 4, 1), (0, 2, 1), (2, 4, 1), (0, 3, 1), (3, 4, 1)]
    assert _value(spark, base, 0, 4) == pytest.approx(3.0)
    anti = base + [(1, 0, 1), (2, 0, 1), (3, 0, 1)]
    assert _value(spark, anti, 0, 4) == pytest.approx(3.0)


def test_three_cycle_with_tail(spark):
    # DinicGTest.cpp:109-122
    g = [(0, 1, 0.3), (1, 2, 0.6), (2, 0, 0.9), (2, 3, 0.7)]
    assert _value(spark, g, 0, 3) == pytest.approx(0.3)
    assert _value(spark, g, 1, 3) == pytest.approx(0.6)


def test_three_cycle_with_tail_antiparallel(spark):
    # DinicGTest.cpp:125-141
    g = [(0, 1, 0.3), (1, 0, 1.3), (1, 2, 0.6), (2, 1, 1.6),
         (2, 0, 0.9), (0, 2, 1.9), (2, 3, 0.7)]
    assert _value(spark, g, 0, 3) == pytest.approx(0.7)
    assert _value(spark, g, 1, 3) == pytest.approx(0.7)


FOUR_LAYER = [
    (0, 1, 1.0), (0, 2, 1.0), (0, 3, 1.0),
    (1, 4, 1.0), (2, 4, 1.0), (2, 5, 1.0), (3, 5, 1.0), (3, 6, 1.0),
    (4, 7, 1.0), (5, 7, 1.0), (6, 7, 1.0),
]


def test_four_layered_dag(spark):
    # DinicGTest.cpp:144-172 (+ :205-224, the shuffled-insertion variant:
    # a DataFrame has no insertion order, so one case covers both)
    assert _value(spark, FOUR_LAYER, 0, 7) == pytest.approx(3.0)
    assert _value(spark, FOUR_LAYER, 3, 7) == pytest.approx(2.0)
    assert _value(spark, FOUR_LAYER, 0, 5) == pytest.approx(2.0)
    assert _value(spark, FOUR_LAYER, 2, 4) == pytest.approx(1.0)


def test_diamond_with_cross(spark):
    # DinicGTest.cpp:175-190
    g = [(0, 1, 10.0), (0, 2, 10.0), (1, 2, 5.0), (1, 3, 10.0), (2, 3, 10.0)]
    assert _value(spark, g, 0, 3) == pytest.approx(20.0)
    assert _value(spark, g, 0, 2) == pytest.approx(15.0)


def test_disconnected(spark):
    # DinicGTest.cpp:192-203
    g = [(0, 1, 10.0), (1, 2, 5.0), (2, 3, 7.0), (4, 5, 11.0), (5, 6, 10.0)]
    assert _value(spark, g, 0, 5) == pytest.approx(0.0)


def test_numerical_stability_decimal_splits(spark):
    # DinicGTest.cpp:227-246 — the 1e-18 arc sits below the relative
    # tolerance (1e-12 * maxcap) and must be gated out
    g = [(0, 1, 1.0), (1, 2, 0.1), (2, 6, 0.1), (1, 3, 0.2), (3, 6, 0.2),
         (1, 4, 0.3), (4, 6, 0.3), (1, 5, 0.4), (5, 6, 0.4), (0, 6, 1e-18)]
    assert _value(spark, g, 0, 6) == pytest.approx(1.0, abs=1e-12)


def test_numerical_stability_tiny_scale(spark):
    # DinicGTest.cpp:248-268 — absolute tolerance floor dominates at 1e-9
    # scale; the 1e-18 arc still gated
    s = 1e-9
    g = [(0, 1, 1.0 * s), (1, 2, 0.1 * s), (2, 6, 0.1 * s),
         (1, 3, 0.2 * s), (3, 6, 0.2 * s), (1, 4, 0.3 * s), (4, 6, 0.3 * s),
         (1, 5, 0.4 * s), (5, 6, 0.4 * s), (0, 6, 1e-18)]
    assert _value(spark, g, 0, 6) == pytest.approx(1.0 * s, abs=1e-15)
