#!/bin/bash
set -u
OUT=/root/repo/target/prof_r8_head.log
: > $OUT
for round in 1 2; do
  for side in R8 HEAD; do
    dir=/root/repo; [ $side = R8 ] && dir=/root/repo/.r8wt
    echo "=== round $round side $side loadavg $(cut -d' ' -f1-3 /proc/loadavg) ===" >> $OUT
    (cd $dir && SPARK_DRIVER_MEM=8g sbt -batch "runMain graft.AbProfile /root/testdata/sf0.1 5 agg_regression" 2>&1 | grep '\[prof\]') >> $OUT
  done
done
echo DONE >> $OUT
