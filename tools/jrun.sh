#!/bin/bash
# Run a graft main class directly against the compiled classes + the
# unmanaged Spark jars (no sbt JVM): tools/jrun.sh [-JXmx16g] <mainClass> [args...]
# SPARK_GRAFT_CPUS caps local[] cores + shuffle partitions (GraftSession).
set -euo pipefail
cd "$(dirname "$0")/.."
XMX="-Xmx16g"
if [[ "${1:-}" == -J* ]]; then XMX="-${1#-J}"; shift; fi
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS $XMX -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
