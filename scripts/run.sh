#!/bin/bash
# Run a graft main class directly on the compiled classes, bypassing
# sbt's JVM startup. Usage: scripts/run.sh graft.Verify <args...>
set -e
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# Codegen-heavy workloads (every query compiles generated classes)
# overflow the default 240M code cache mid-run; once full the JIT
# stops compiling and later queries run interpreted (measured 10-75×).
exec java $OPENS ${SPARK_GRAFT_GC_LOG:+-Xlog:gc=info:file=$SPARK_GRAFT_GC_LOG} \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -XX:ReservedCodeCacheSize=1g \
  -XX:MaxMetaspaceSize=2g \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/root/repo/src/main/resources:/opt/spark/jars/*" \
  "$@"
