#!/usr/bin/env bash
# Run the CDC replay bench the way the north rule specifies: the engine
# shipped to executors via `spark-submit --py-files` (a zip of the
# bear_spark package), not via a driver-local sys.path. On a real
# cluster, swap --master for the cluster manager URL; everything else
# is identical.
#
#   ./tools/submit_bench.sh [cores] [events] [batches]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CORES="${1:-32}"
EVENTS="${2:-16000000}"
BATCHES="${3:-4}"

ZIP="$(mktemp -d)/bear_spark.zip"
(cd "$REPO" && python -c "
import shutil, sys
shutil.make_archive(sys.argv[1][:-4], 'zip', root_dir='.', base_dir='bear_spark')
" "$ZIP")

SPARK_SUBMIT="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"

BENCH_MODE=cdc BENCH_CDC_EVENTS="$EVENTS" BENCH_CDC_BATCHES="$BATCHES" \
SPARK_GRAFT_CPUS="$CORES" \
"$SPARK_SUBMIT" \
  --master "local[$CORES]" \
  --driver-memory 16g \
  --conf spark.driver.extraJavaOptions="-Xms16g -XX:+AlwaysPreTouch -XX:+UseTransparentHugePages" \
  --py-files "$ZIP" \
  "$REPO/bench.py"
