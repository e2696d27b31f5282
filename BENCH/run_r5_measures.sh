#!/bin/bash
# Round-5 measurements, official protocol (300k URLs, 4 rounds x 3 reps,
# one JVM per run, same input, GenerativeFetcher):
#   1) durable-path A/B: write-once pages commit vs legacy persist+commit,
#      local[4] and local[16]  -> BENCH/r5_durable_<mode>_local<N>.json
#   2) probe-regime A/B: broadcast vs partitioned bloom probe (in-memory
#      bench path), local[1] and local[4] -> BENCH/r5_probe_<mode>_local<N>.json
# Stage lines ([round] ...) stream into BENCH/r5_measures.log for the
# stage decomposition.
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

run durable_writeonce 4  GRAFT_DURABLE=1
run durable_legacy    4  GRAFT_DURABLE=1 GRAFT_WRITE_ONCE=0
run durable_writeonce 16 GRAFT_DURABLE=1
run durable_legacy    16 GRAFT_DURABLE=1 GRAFT_WRITE_ONCE=0
run probe_broadcast   4
run probe_partitioned 4  GRAFT_PROBE=partitioned
run probe_broadcast   1
run probe_partitioned 1  GRAFT_PROBE=partitioned
echo "R5 MEASURES COMPLETE"
