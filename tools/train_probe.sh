#!/bin/bash
# Drive graft.app.TrainHeapProbe directly on the compiled classes (no
# sbt per run) so heap size and GC flags vary per invocation:
#
#   tools/train_probe.sh <xmx> [extra JVM flags...]
#
# e.g.  tools/train_probe.sh 64g -XX:+UseParallelGC
#
# Requires a prior `sbt compile`. The shared corpus lives under
# $PROBE_DIR (default /tmp/graft-train-probe) and is prepared once.
set -euo pipefail
cd "$(dirname "$0")/.."
XMX="${1:?usage: train_probe.sh <xmx> [jvm flags...]}"
shift
CLASSES=target/scala-2.13/classes
[ -d "$CLASSES" ] || { echo "run sbt compile first" >&2; exit 1; }
SPARK_JARS="${SPARK_JARS:-/opt/spark/jars}"
[ -d "$SPARK_JARS" ] || { echo "Spark jars not found at $SPARK_JARS (set SPARK_JARS)" >&2; exit 1; }
PROBE_DIR="${PROBE_DIR:-/tmp/graft-train-probe}"
KIND="${PROBE_KIND:-lr}"
REPS="${PROBE_REPS:-2}"
ROWS="${PROBE_ROWS:-1600000}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -Xmx"$XMX" "$@" $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:$SPARK_JARS/*" \
  graft.app.TrainHeapProbe "$PROBE_DIR" "$KIND" "$REPS" "$ROWS"
