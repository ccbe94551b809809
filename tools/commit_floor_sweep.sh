#!/bin/bash
# r14 VERDICT Next #1: the streaming replay commit-path floor sweep.
# Runs stream_outer_join under the constant-batch decade probe
# (GRAFT_STREAM_ROWS_PER_BATCH pinned to the sf0.1 default 41,667
# rows/subtask/batch -> 30/300 batches at sf1/sf10) through graft.Bench
# off a CLASSES SNAPSHOT (isolated from foreground sbt), with
# GRAFT_STREAM_COMMIT_STATS printing the per-batch completion-time
# deciles that show whether the floor grows with batches elapsed.
#
# Sweep points (one positional arg picks the point):
#   default     stock engine conf (the r13 baseline shape)
#   tuned       minBatchesToRetain=2 + fileSink compactInterval=200 +
#               maintenanceInterval=30s (the mitigation candidate)
#   nocompact   fileSink compactInterval=1000000 (no in-run compaction:
#               isolates the sink-log compaction term)
#   nometa      foreachBatch direct-parquet sink (no sink metadata log at
#               all: the non-metadata control)
#   retain      minBatchesToRetain=2 only (isolates the checkpoint/state
#               retention term)
#   fullcurve   minBatchesToRetain=400 (retain the whole commit log so
#               COMMITSTATS sees every batch from id 0 — the full
#               per-batch curve, not the tail-only default window)
#   gc          periodicGC.interval=15s + minBatchesToRetain=400 (the
#               driver-garbage hypothesis: reclaim past batches' local
#               shuffle/broadcast files on a fixed GC cadence)
# Usage: tools/commit_floor_sweep.sh <classesDir> <point> <sfTag: sf1|sf10> [entry]
set -euo pipefail
CLASSES=${1:?classes snapshot dir}
POINT=${2:?sweep point}
SFTAG=${3:?sf1 or sf10}
ENTRY=${4:-stream_outer_join}
CP="$CLASSES:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

# engine confs ride as -Dspark.* SYSTEM properties (session-conf defaults),
# NOT GRAFT_STREAM_CONF: the sink metadata-log READER derives expected
# .compact ids from the conf at read time, so a per-run override that is
# restored before the final sink read makes the read fail (observed:
# "119.compact doesn't exist" after a compactInterval=1000000 run).
case "$POINT" in
  default)   DCONF=""; SINK="" ;;
  tuned)     DCONF="-Dspark.sql.streaming.minBatchesToRetain=2 -Dspark.sql.streaming.fileSink.log.compactInterval=200 -Dspark.sql.streaming.stateStore.maintenanceInterval=30s"; SINK="" ;;
  nocompact) DCONF="-Dspark.sql.streaming.fileSink.log.compactInterval=1000000"; SINK="" ;;
  nometa)    DCONF=""; SINK="foreachBatch" ;;
  retain)    DCONF="-Dspark.sql.streaming.minBatchesToRetain=2"; SINK="" ;;
  # full per-batch curve: retain the whole commit log so COMMITSTATS sees
  # every batch from id 0 (retention itself measured neutral: 236 vs 221 s)
  fullcurve) DCONF="-Dspark.sql.streaming.minBatchesToRetain=400"; SINK="" ;;
  # driver-garbage hypothesis: local-mode shuffle/broadcast files of PAST
  # batches are reclaimed only when the driver GCs (ContextCleaner weak
  # refs); Spark's own lever for long driver-heavy runs
  gc)        DCONF="-Dspark.cleaner.periodicGC.interval=15s -Dspark.sql.streaming.minBatchesToRetain=400"; SINK="" ;;
  *) echo "unknown point $POINT" >&2; exit 2 ;;
esac

export SPARK_GRAFT_SF_DIR="/tmp/graft_decade/$SFTAG"
mkdir -p "$SPARK_GRAFT_SF_DIR"
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_ONLY="$ENTRY"
export GRAFT_BENCH_RUNS=1
export GRAFT_STREAM_ROWS_PER_BATCH=41667
export GRAFT_STREAM_COMMIT_STATS=1
unset GRAFT_STREAM_CONF
[ -n "$SINK" ] && export GRAFT_STREAM_SINK="$SINK" || unset GRAFT_STREAM_SINK

echo "[sweep] $(date -u +%T) point=$POINT sf=$SFTAG entry=$ENTRY conf='$DCONF' sink='$SINK'"
java $OPENS $DCONF -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dgraft.stream.dumpInputs=false -Xmx48g -cp "$CP" graft.Bench 2>/dev/null \
  | grep -E 'COMMITSTATS|"metric"'
echo "[sweep] $(date -u +%T) done point=$POINT sf=$SFTAG"
