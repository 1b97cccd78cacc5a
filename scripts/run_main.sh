#!/bin/bash
# Run a graft main class directly against the sbt-compiled classes —
# bypasses the sbt launcher (and its single-instance lock) for bench /
# data-generation runs. Mirrors build.sbt's javaOptions exactly.
#   SPARK_DRIVER_MEM=24g scripts/run_main.sh graft.Bench
set -euo pipefail
MEM="${SPARK_DRIVER_MEM:-8g}"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -Xmx"$MEM" $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Duser.language=en -Duser.country=US \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
