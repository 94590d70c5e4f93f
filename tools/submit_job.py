"""spark-submit entry point: run a kernel from the packaged engine.

Usage (see tools/submit.sh):
  spark-submit --py-files networkit_spark.zip tools/submit_job.py \
      --kernel pagerank --pages 10000 --cores-note "N executors"

On a real cluster drop --master local[...] for the cluster master and the
same zip ships to executors; state/metrics land under --state-dir (shared
storage on a cluster).
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel", default="pagerank",
                    choices=["pagerank", "components", "plp", "triangles"])
    ap.add_argument("--pages", type=int, default=10_000)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--state-dir", default="/tmp/networkit_spark_state")
    ap.add_argument("--run-id", default="submit_run")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(f"networkit_spark_{args.kernel}").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from networkit_spark.graph import nodes_range
    from networkit_spark.plans.iteration import SuperstepRunner
    from networkit_spark.sources.generators import powerlaw_digraph

    edges = powerlaw_digraph(spark, args.pages, args.pages * 8, gamma=2.3).persist()
    m = edges.count()
    nodes = nodes_range(spark, args.pages)
    runner = SuperstepRunner(
        spark, run_id=args.run_id, state_dir=args.state_dir, checkpoint_every=5
    )
    t0 = time.monotonic()
    if args.kernel == "pagerank":
        from networkit_spark.operators.pagerank import PageRank

        res = PageRank(tol=args.tol).run(
            edges, nodes, directed=True, runner=runner, resume=args.resume
        )
        out = {"iterations": res.iterations, "converged": res.converged,
               "max_score": res.maximum()}
    elif args.kernel == "components":
        from networkit_spark.operators.components import ConnectedComponents

        res = ConnectedComponents().run(edges, nodes, runner=runner, resume=args.resume)
        out = {"iterations": res.iterations, "components": res.number_of_components()}
    elif args.kernel == "plp":
        from networkit_spark.operators.plp import PLP

        und = edges.select("src", "dst").union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct().withColumn("weight", F.lit(1.0))
        res = PLP(max_iterations=20).run(und, nodes, runner=runner, resume=args.resume)
        out = {"iterations": res.iterations, "communities": res.number_of_communities()}
    else:
        from networkit_spark.operators.triangles import total_triangles

        und = edges.select("src", "dst").union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct().withColumn("weight", F.lit(1.0))
        out = {"triangles": total_triangles(und)}
    out.update({"kernel": args.kernel, "edges": m, "wall_sec": round(time.monotonic() - t0, 2)})
    print("SUBMIT_RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
