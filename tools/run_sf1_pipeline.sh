#!/bin/bash
# Full sf1 sweep pipeline (VERDICT Next #9), isolated from the foreground
# dev loop: runs off a classes SNAPSHOT and a PRIVATE stream-dump base
# (-Dgraft.stream.dumpBase is baked into the emitted oracle SQL, so the
# sweep reads the right dumps regardless of foreground Verify runs).
# Usage: tools/run_sf1_pipeline.sh <classesSnapshotDir> <round>
set -euo pipefail
CLASSES=${1:?classes snapshot dir}
ROUND=${2:?round tag, e.g. r13}
SF1=/tmp/graft_sf1/sf1
VOUT=/tmp/verify_sf1_$ROUND
DUMPS=/tmp/graft_sf1_dumps_$ROUND
CP="$CLASSES:/opt/spark/jars/*"
# A snapshot taken after bare `sbt compile` has NO resources (compile does
# not run copyResources) — the DSv2 `nexmark` source then fails to register
# and every stream_* entry dies with DATA_SOURCE_NOT_FOUND. Snapshot after
# a `runMain`/`Compile/copyResources`, and fail fast here otherwise.
if [ ! -f "$CLASSES/META-INF/services/org.apache.spark.sql.sources.DataSourceRegister" ]; then
  echo "FATAL: $CLASSES lacks META-INF/services (snapshot after copyResources)" >&2
  exit 2
fi
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
COMMON="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

echo "[sf1] $(date -u +%T) ScaleUp -> $SF1"
rm -rf "$SF1" "$VOUT" "$DUMPS"
SPARK_GRAFT_CPUS=16 java $OPENS $COMMON -Xmx16g -cp "$CP" \
  graft.tools.ScaleUp /root/testdata/sf0.1 "$SF1" 10

echo "[sf1] $(date -u +%T) Verify -> $VOUT"
SPARK_GRAFT_CPUS=32 java $OPENS $COMMON -Xmx48g \
  -Dgraft.stream.dumpBase="$DUMPS" -cp "$CP" \
  graft.Verify "$SF1" "$VOUT"

echo "[sf1] $(date -u +%T) sweep (single pass; dumps are private)"
python3 tools/sf1_sweep.py "$SF1" "$VOUT" --timeout 900 \
  --out /tmp/sf1_sweep_$ROUND.json
echo "[sf1] $(date -u +%T) DONE -> /tmp/sf1_sweep_$ROUND.json"
