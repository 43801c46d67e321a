#!/bin/bash
# Run a graft main (Verify/Bench/Probe) against the compiled classes without
# holding the sbt lock. Usage: tools/run.sh graft.Verify [args...]
MAIN=$1; shift
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
# RAM-aware default heap (mirrors build.sbt): 40% of physical, capped at
# 48g, floored at 4g — a hardcoded 48g would swap/OOM a smaller machine.
if [ -z "$SPARK_DRIVER_MEM" ]; then
  PHYS_MB=$(awk '/MemTotal/ {print int($2/1024)}' /proc/meminfo 2>/dev/null || echo 16384)
  HEAP_MB=$(( PHYS_MB * 2 / 5 ))
  [ "$HEAP_MB" -gt 49152 ] && HEAP_MB=49152
  [ "$HEAP_MB" -lt 4096 ] && HEAP_MB=4096
  SPARK_DRIVER_MEM="${HEAP_MB}m"
fi
exec java $ADDOPENS \
  -Xmx${SPARK_DRIVER_MEM} -XX:ReservedCodeCacheSize=1g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
