#!/bin/bash
# Alternated fresh-JVM A/B: HEAD vs r8 checkout, same testdata, same tool.
set -u
OUT=/root/repo/target/ab_r8_head.log
: > $OUT
for round in 1 2 3; do
  for side in HEAD R8; do
    dir=/root/repo; [ $side = R8 ] && dir=/root/repo/.r8wt
    echo "=== round $round side $side loadavg $(cut -d' ' -f1-3 /proc/loadavg) ===" >> $OUT
    (cd $dir && SPARK_DRIVER_MEM=8g sbt -batch "runMain graft.AbQueries /root/testdata/sf0.1 4 agg_regression,agg_percentiles" 2>&1 | grep '\[ab\]') >> $OUT
  done
done
echo DONE >> $OUT
