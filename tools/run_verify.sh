#!/bin/bash
# Run graft.Verify (Spark side) + the DuckDB oracle compare, like the driver.
# Usage: tools/run_verify.sh [sfDir] [outDir]
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
rm -rf "$OUT"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
java $ADD_OPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF" "$OUT" ${3:+"$3"} 2>/tmp/verify_spark.log || {
    echo "Verify failed; last log lines:"; tail -20 /tmp/verify_spark.log; exit 1; }
grep -E "^\[verify\]" /tmp/verify_spark.log || true
python3 tools/verify_local.py "$SF" "$OUT"
