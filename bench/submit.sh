#!/usr/bin/env bash
# Run the scaling bench exactly as the north rule prescribes: the job shipped
# to Spark via `spark-submit --py-files` (the package zipped, not importable
# from the driver's cwd), so the same invocation works unchanged on a real
# multi-executor cluster by swapping --master.
#
# Usage: bench/submit.sh [n_pages]        (default 200000)
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/fatespark_pyfiles.zip
rm -f "$ZIP"
(cd . && zip -qr "$ZIP" fatespark -x '*__pycache__*')

# run from /tmp so `import fatespark` can ONLY resolve via --py-files
WORK=$(mktemp -d)
cp bench/scaling.py "$WORK/scaling_job.py"
cd "$WORK"

exec spark-submit \
  --master "local[32]" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.ui.enabled=false \
  scaling_job.py "${1:-200000}"
