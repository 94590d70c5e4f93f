import json
import os

from pyspark.sql import functions as F

from networkit_spark.plans.iteration import SuperstepRunner, aqe_disabled, truncate_lineage


def counter_step(state, i):
    new = state.select((F.col("v") + 1).alias("v"))
    return new, {"iter_seen": i}


def test_runner_basic_convergence(spark, tmp_path):
    init = spark.createDataFrame([(0,)], "v long")
    r = SuperstepRunner(spark, run_id="t1", state_dir=str(tmp_path))
    res = r.run(init, counter_step, converged_fn=lambda info: info["iter_seen"] >= 4,
                max_iterations=100)
    assert res.converged
    assert res.iterations == 5
    assert res.state.first()["v"] == 5


def test_runner_resume_continues_from_commit(spark, tmp_path):
    init = spark.createDataFrame([(0,)], "v long")
    r1 = SuperstepRunner(spark, run_id="t2", state_dir=str(tmp_path), checkpoint_every=1)
    r1.run(init, counter_step, max_iterations=3)
    assert r1.latest_committed() == 2

    r2 = SuperstepRunner(spark, run_id="t2", state_dir=str(tmp_path), checkpoint_every=1)
    res = r2.run(init, counter_step, max_iterations=7, resume=True)
    assert res.state.first()["v"] == 7  # 3 committed + 4 more
    assert res.iterations == 4

    # metrics log is contiguous across the two runs
    with open(os.path.join(str(tmp_path), "t2", "metrics.jsonl")) as f:
        iters = [json.loads(ln)["iteration"] for ln in f]
    assert iters == list(range(7))


def test_runner_resume_without_state_starts_fresh(spark, tmp_path):
    init = spark.createDataFrame([(0,)], "v long")
    r = SuperstepRunner(spark, run_id="t3", state_dir=str(tmp_path))
    res = r.run(init, counter_step, max_iterations=2, resume=True)
    assert res.state.first()["v"] == 2


def test_runner_old_iterations_pruned(spark, tmp_path):
    init = spark.createDataFrame([(0,)], "v long")
    r = SuperstepRunner(spark, run_id="t4", state_dir=str(tmp_path), checkpoint_every=1)
    r.run(init, counter_step, max_iterations=5)
    base = os.path.join(str(tmp_path), "t4")
    iters = sorted(int(d.split("=")[1]) for d in os.listdir(base) if d.startswith("iter="))
    assert iters[-1] == 4
    assert len(iters) <= 2  # only the last two kept


def test_aqe_disabled_restores(spark):
    before = spark.conf.get("spark.sql.adaptive.enabled")
    with aqe_disabled(spark):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    assert spark.conf.get("spark.sql.adaptive.enabled") == before


def test_truncate_lineage_resets_plan(spark):
    df = spark.range(10).select(F.col("id").alias("v"))
    for _ in range(3):
        df = truncate_lineage(df.select((F.col("v") + 1).alias("v")))
    assert df.count() == 10
    assert df.agg(F.min("v")).first()[0] == 3
    # plan is a bare scan of an existing RDD
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in plan or "ExistingRDD" in plan


def test_runner_catalog_kill_resume(spark, tmp_path):
    """North-rule durability through the Iceberg facade: per-iteration
    state commits go to TableCatalog (parquet warehouse here; real Iceberg
    snapshots on a cluster with the runtime jars — same calls). Kill the
    run mid-way, resume from the last committed snapshot, final state
    identical to an uninterrupted run."""
    from networkit_spark.sources.catalog import TableCatalog

    cat = TableCatalog(spark, warehouse=str(tmp_path / "wh"))
    init = spark.createDataFrame([(0,)], "v long")

    class Boom(RuntimeError):
        pass

    def killing_step(state, i):
        if i == 4:  # simulate the driver dying mid-iteration 4
            raise Boom()
        return counter_step(state, i)

    r1 = SuperstepRunner(spark, run_id="kr", catalog=cat, checkpoint_every=2)
    try:
        r1.run(init, killing_step, max_iterations=10)
        raise AssertionError("step was supposed to die")
    except Boom:
        pass
    # iterations 0..3 ran; commits at i=1 and i=3 (every 2nd) -> latest 3
    assert r1.latest_committed() == 3

    r2 = SuperstepRunner(spark, run_id="kr", catalog=cat, checkpoint_every=2)
    res = r2.run(init, counter_step, max_iterations=10, resume=True)
    assert res.iterations == 6  # resumed at 4, ran 4..9
    assert res.state.first()["v"] == 10  # == uninterrupted 10-iteration run
    assert r2.latest_committed() == 9


def test_runner_catalog_iceberg_branch(spark, tmp_path):
    """Executes the REAL Iceberg branch (snapshot-per-commit with
    nk-iteration summary property) when the Iceberg Spark runtime is on the
    classpath. This container has no network and no iceberg jars (recorded
    in BENCH/BASELINE.md §iceberg), so it skips here; on a cluster run with
    --packages org.apache.iceberg:iceberg-spark-runtime it is the
    durability integration test."""
    import pytest

    from networkit_spark.sources.catalog import TableCatalog

    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        pytest.skip("iceberg-spark-runtime not on classpath (no-network container)")

    spark.conf.set("spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it.warehouse", str(tmp_path / "iwh"))
    cat = TableCatalog(spark)
    assert cat.iceberg or TableCatalog(spark).iceberg  # probe after conf set
    cat.iceberg = True
    init = spark.createDataFrame([(0,)], "v long")
    r = SuperstepRunner(spark, run_id="it.db.run1", catalog=cat, checkpoint_every=1)
    res = r.run(init, counter_step, max_iterations=3)
    assert res.state.first()["v"] == 3
    assert r.latest_committed() == 2
    snaps = spark.sql("SELECT summary['nk-iteration'] AS it FROM it.db.run1_state.snapshots").collect()
    assert {s["it"] for s in snaps} >= {"0", "1", "2"}
