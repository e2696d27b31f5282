#!/bin/bash
# Round-5 retries + write control, idle window after the main ladder:
#   1) probe_broadcast local[4] retry (the in-ladder section ran degraded)
#   2) durable_legacy local[16] retry (every in-ladder rep caught stalls)
#   3) parquet-write bandwidth control at 4 and 16 cores (WriteBench):
#      ~92k rows x ~9.6KB itemText ~= one bench crawl round's page volume.
set -u
cd /root/repo
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

run () { # run <tag> <cpus> <extra-env...>
  local tag=$1 cpus=$2; shift 2
  echo "=== $tag local[$cpus] start $(date -u +%H:%M:%S)"
  env "$@" SPARK_DRIVER_MEM=48g GRAFT_CRAWL_VERBOSE=1 \
  java $ADD_OPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.CrawlBench $cpus 300000 4 3 BENCH/r5_${tag}_local$cpus.json 2>&1 \
    | grep -E "^\[round\]|crawl_urls_per_sec"
  echo "=== $tag local[$cpus] done $(date -u +%H:%M:%S)"
}

wb () { # wb <cpus>
  local cpus=$1
  echo "=== writebench local[$cpus] start $(date -u +%H:%M:%S)"
  SPARK_DRIVER_MEM=48g \
  java $ADD_OPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.WriteBench $cpus 92160 3 BENCH/r5_writebench_local$cpus.json 2>&1 \
    | grep -E "parquet_write_sec"
  echo "=== writebench local[$cpus] done $(date -u +%H:%M:%S)"
}

run probe_broadcast_retry 4
run durable_legacy_retry 16 GRAFT_DURABLE=1 GRAFT_WRITE_ONCE=0
wb 4
wb 16
echo "R5 RETRIES COMPLETE"
