#!/usr/bin/env bash
# Package the engine and run a kernel via spark-submit --py-files
# (north_rule deployment path; swap --master for a real cluster URL).
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f /tmp/networkit_spark.zip
zip -qr /tmp/networkit_spark.zip networkit_spark -x "*__pycache__*"
exec spark-submit \
  --master "${SPARK_MASTER:-local[8]}" \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-8}" \
  --conf spark.ui.enabled=false \
  --py-files /tmp/networkit_spark.zip \
  tools/submit_job.py "$@"
