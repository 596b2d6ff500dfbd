#!/bin/bash
# SURVEY §6 controlled bench pair, round 19: attribute the r18 bench
# smear (official artifact +33%/stream-halved in a window whose sweep
# 100% env-stalled) to code vs window. Trees: /tmp/r17 = a5df6cb
# (r17 head), /tmp/r18 = f87eba7 (r18 head). ABBA BenchOne (min-of-3
# x2 per tree) on the four named movers, then one full Bench rep per
# tree, interleaved. Output: tools/benchpair_r19.log
set -u
LOG=/root/repo/tools/benchpair_r19.log
: > "$LOG"
AO=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  AO="$AO --add-opens java.base/$p=ALL-UNNAMED"
done
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g"
CP="target/scala-2.13/classes:/opt/spark/jars/*"

one() { # tree label query
  ( cd "$1" && java $AO $JOPTS -cp "$CP" graft.BenchOne "$3" \
      /root/testdata/sf0.1 3 2>/dev/null | grep BENCHONE \
      | sed "s/^/$2 /" >> "$LOG" )
}

for q in q_quantiles_by_key_view_incr q_retention_view_incr \
         q_hybrid_search q_join_view_incr; do
  one /tmp/r17 r17 "$q"
  one /tmp/r18 r18 "$q"
  one /tmp/r18 r18 "$q"
  one /tmp/r17 r17 "$q"
done

echo "=== full Bench, one run per tree, interleaved order r18,r17 ===" >> "$LOG"
( cd /tmp/r18 && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    java $AO $JOPTS -cp "$CP" graft.Bench 2>/dev/null \
    | tail -1 | sed 's/^/r18_FULL /' >> "$LOG" )
( cd /tmp/r17 && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    java $AO $JOPTS -cp "$CP" graft.Bench 2>/dev/null \
    | tail -1 | sed 's/^/r17_FULL /' >> "$LOG" )
echo BENCHPAIR_DONE >> "$LOG"
