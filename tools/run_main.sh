#!/bin/bash
# Run a graft main (Bench/Verify) directly with java, bypassing sbt.
# usage: tools/run_main.sh graft.Bench   (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_ONLY, GRAFT_HEAP)
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
# GRAFT_CLASSES: optional snapshot dir — point long background runs at a
# copied classes tree so a mid-run `sbt compile` can't corrupt them
# (lazily loaded classes otherwise mix versions mid-JVM).
CP="${GRAFT_CLASSES:-$REPO/target/scala-2.13/classes}:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
CP="${CP%:}"
exec java -Xmx"${GRAFT_HEAP:-96g}" -XX:+UseG1GC \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -Dio.netty.tryReflectionSetAccessible=true \
  -cp "$CP" "$@"
