#!/bin/bash
# Run a repo main (graft.Probe / graft.Bench / graft.Verify) without sbt —
# same JVM flags as build.sbt's forked run. Usage:
#   tools/jrun.sh graft.Probe /root/testdata/sf0.1 time q1_agg 3
# Env: SPARK_DRIVER_MEM (default 48g), SPARK_GRAFT_CPUS (Probe/Bench read it).
set -euo pipefail
MEM="${SPARK_DRIVER_MEM:-48g}"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx"$MEM" -XX:ReservedCodeCacheSize=1g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
