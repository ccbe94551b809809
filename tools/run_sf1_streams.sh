#!/bin/bash
# Second-pass sf1 Verify for a subset of entries (the stream_* re-run after
# a resource-less snapshot, plus late-added entries), into the SAME verify
# out dir + private dump base as tools/run_sf1_pipeline.sh, followed by a
# subset sweep. Merge with tools/merge_sweeps.py afterwards.
# Usage: tools/run_sf1_streams.sh <classesSnapshotDir> <round> <entriesCsv>
set -euo pipefail
CLASSES=${1:?classes snapshot dir}
ROUND=${2:?round tag}
ENTRIES=${3:?comma-separated entry names}
SF1=/tmp/graft_sf1/sf1
VOUT=/tmp/verify_sf1_$ROUND
DUMPS=/tmp/graft_sf1_dumps_$ROUND
CP="$CLASSES:/opt/spark/jars/*"
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

echo "[sf1b] $(date -u +%T) Verify subset -> $VOUT"
SPARK_GRAFT_CPUS=32 java $OPENS $COMMON -Xmx48g \
  -Dgraft.stream.dumpBase="$DUMPS" -cp "$CP" \
  graft.Verify "$SF1" "$VOUT" "$ENTRIES"

echo "[sf1b] $(date -u +%T) sweep subset"
python3 tools/sf1_sweep.py "$SF1" "$VOUT" --timeout 900 \
  --only "$ENTRIES" --out /tmp/sf1_sweep_${ROUND}_streams.json
echo "[sf1b] $(date -u +%T) DONE -> /tmp/sf1_sweep_${ROUND}_streams.json"
