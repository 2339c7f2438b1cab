#!/usr/bin/env bash
# Run the build + query job exactly as the north rule prescribes: shipped to
# Spark via `spark-submit --py-files` with the package zipped (NOT importable
# from the driver's cwd), so the same invocation works unchanged on a real
# multi-executor cluster by swapping --master.
#
# Usage: bench/submit.sh [n_pages]        (default 200000)
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/fatespark_pyfiles.zip
rm -f "$ZIP"
zip -qr "$ZIP" fatespark -x '*__pycache__*'

# run from a scratch dir so `import fatespark` can ONLY resolve via --py-files
WORK=$(mktemp -d)
cp bench/submit_job.py "$WORK/submit_job.py"
cd "$WORK"

exec spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-32}]" \
  --py-files "$ZIP" \
  --conf spark.sql.shuffle.partitions=$(( ${SPARK_GRAFT_CPUS:-32} * 4 )) \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.coalescePartitions.enabled=false \
  --conf spark.sql.files.maxPartitionBytes=16m \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.local.dir=/dev/shm/fatespark-spark-local \
  --conf spark.ui.enabled=false \
  --driver-memory 24g \
  submit_job.py "${1:-200000}"
