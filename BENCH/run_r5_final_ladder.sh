#!/bin/bash
# Round-5 FINAL-build 1->4 pair, official protocol (broadcast probe regime,
# 300k urls, 4 rounds x 3 reps, one JVM per level).
set -u
cd /root/repo
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
for CPUS in 4 1; do
  echo "=== level local[$CPUS] start $(date -u +%H:%M:%S)"
  SPARK_DRIVER_MEM=48g GRAFT_CRAWL_VERBOSE=1 \
  java $ADD_OPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.CrawlBench $CPUS 300000 4 3 BENCH/r5_final3_local$CPUS.json 2>&1 | grep -E "^\[round\]|crawl_urls_per_sec"
  echo "=== level local[$CPUS] done $(date -u +%H:%M:%S)"
done
echo "LADDER COMPLETE"
