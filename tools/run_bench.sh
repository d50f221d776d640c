#!/bin/bash
# Run graft.Bench outside sbt. Usage: run_bench.sh [sfdir] [only_csv]
# only_csv: optional comma-separated query names (SPARK_GRAFT_ONLY filter).
set -e
SF=${1:-/root/testdata/sf0.1}
ONLY=${2:-}
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} SPARK_GRAFT_ONLY="$ONLY" \
exec java $ADD_OPENS -Xmx16g \
  -cp "$CP" graft.Bench
