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
