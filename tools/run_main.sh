#!/bin/bash
# Run a graft main class outside sbt (same JVM options as build.sbt fork).
# Usage: tools/run_main.sh graft.Verify <args...>
set -e
CP="/root/repo/target/scala-2.13/classes:$(ls -d /opt/spark/jars/* | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
OPENS="$OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
# -Xss: GraphX Pregel (scc) builds deep closure/lineage chains; the 1 MB
# default thread stack overflows during task serialization at 10x soak
# scale when earlier kernels already ran in the same JVM
exec java -Xmx${SPARK_DRIVER_MEM:-32g} -Xss${SPARK_DRIVER_STACK:-16m} $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
