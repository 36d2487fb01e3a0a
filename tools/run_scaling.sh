#!/bin/bash
# Run graft.Scaling like the builder: amplified ×-factor audit at sf0.1.
# Usage: tools/run_scaling.sh [outPath] [onlyQueries] (env: SPARK_GRAFT_FACTORS)
set -e
cd "$(dirname "$0")/.."
OUT=${1:-SCALING_r9.json}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS -Xmx48g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Scaling "$OUT" ${2:+"$2"}
