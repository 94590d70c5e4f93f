"""Iceberg-first table catalog with a parquet fallback.

The north rule stores edge/state tables in Iceberg (``writeTo(...).using(
"iceberg")`` with snapshot commits). This container has no Iceberg runtime
jars, so the module probes for the Iceberg catalog classes at runtime and
otherwise falls back to a parquet warehouse directory with the SAME atomic-
commit semantics the rest of the engine relies on (_SUCCESS markers, see
``plans/iteration.py``). All call sites go through this facade, so on a real
cluster with ``--packages org.apache.iceberg:iceberg-spark-runtime-...`` the
engine writes true Iceberg tables with zero code change.

Why Iceberg at 100 TB: snapshot isolation for the per-superstep state
commits (resume = read the last committed snapshot), partition-pruned scans
of the edge table, and compaction of the small per-iteration files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the classpath AND a catalog
    is configured (both are required for ``USING iceberg``)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
    except Exception:
        return False
    try:
        cats = [
            k for k in ("spark.sql.catalog.spark_catalog", "spark.sql.catalog.local")
            if spark.conf.get(k, None)
        ]
        return bool(cats)
    except Exception:
        return False


class TableCatalog:
    """``write(df, name)`` / ``read(name)`` / ``exists(name)`` over Iceberg
    when available, else a parquet warehouse dir."""

    def __init__(self, spark: SparkSession, warehouse: str | None = None):
        self.spark = spark
        self.iceberg = iceberg_available(spark)
        self.warehouse = warehouse or os.environ.get(
            "SPARK_GRAFT_WAREHOUSE", "/tmp/networkit_spark_warehouse"
        )
        if not self.iceberg:
            os.makedirs(self.warehouse, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.warehouse, name.replace(".", "/"))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        if self.iceberg:
            w = df.writeTo(name).using("iceberg")
            if mode == "overwrite":
                w.createOrReplace()
            else:
                w.append()
        else:
            df.write.mode(mode if mode != "append" else "append").parquet(self._path(name))

    def read(self, name: str) -> DataFrame:
        if self.iceberg:
            return self.spark.read.table(name)
        return self.spark.read.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        if self.iceberg:
            try:
                self.spark.read.table(name).schema
                return True
            except Exception:
                return False
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))

    # -- per-iteration state commits (superstep checkpoint/resume) ----------
    #
    # Iceberg: each commit is a table REPLACE -> a new snapshot whose summary
    # carries ``nk-iteration`` (written via the documented
    # ``snapshot-property.`` write option); resume reads the CURRENT snapshot
    # and its iteration from the ``<table>.snapshots`` metadata table, and
    # old snapshots are reclaimed by ordinary snapshot expiration — no
    # per-iteration table proliferation. Parquet fallback: one ``iter=N``
    # subdirectory per commit with Spark's atomic ``_SUCCESS`` marker,
    # identical resume semantics (used by SuperstepRunner when a catalog is
    # passed; same layout the runner uses standalone).

    def commit_state(self, df: DataFrame, name: str, iteration: int,
                     keep_last: int = 2) -> None:
        """Durably commit ``df`` as the state of ``name`` at ``iteration``."""
        if self.iceberg:
            (
                df.writeTo(name)
                .using("iceberg")
                .option("snapshot-property.nk-iteration", str(iteration))
                .createOrReplace()
            )
            return
        df.write.mode("overwrite").parquet(
            os.path.join(self._path(name), f"iter={iteration}")
        )
        base = self._path(name)
        for entry in os.listdir(base):
            if entry.startswith("iter=") and int(entry.split("=", 1)[1]) <= iteration - keep_last:
                import shutil

                shutil.rmtree(os.path.join(base, entry), ignore_errors=True)

    def latest_state_iteration(self, name: str) -> int | None:
        """Highest durably-committed iteration of ``name`` (None if no
        commit). Iceberg: max ``nk-iteration`` over snapshot summaries."""
        if self.iceberg:
            try:
                row = self.spark.sql(
                    f"SELECT max(cast(summary['nk-iteration'] AS INT)) AS it "
                    f"FROM {name}.snapshots"
                ).collect()[0]
                return row["it"]
            except Exception:
                return None
        base = self._path(name)
        if not os.path.isdir(base):
            return None
        its = [
            int(e.split("=", 1)[1])
            for e in os.listdir(base)
            if e.startswith("iter=")
            and os.path.exists(os.path.join(base, e, "_SUCCESS"))
        ]
        return max(its) if its else None

    def read_state(self, name: str, iteration: int) -> DataFrame:
        """State as of ``iteration``. Iceberg: commits REPLACE the table, so
        the latest committed iteration is the current snapshot (older ones
        remain reachable by snapshot id until expired)."""
        if self.iceberg:
            return self.spark.read.table(name)
        return self.spark.read.parquet(
            os.path.join(self._path(name), f"iter={iteration}")
        )
