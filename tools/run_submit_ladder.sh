#!/bin/bash
# spark-submit scaling ladder (north_rule "runs through spark-submit"):
# interleaved local[2] / local[8] BuildIndexApp samples over the same
# 1M-doc corpus, fresh JVM + fresh indexDir per sample, warm flag (untimed
# JIT warm-up build), ParallelGC, work dirs on /dev/shm (a real submit
# would set spark.local.dir to fast storage the same way).
# usage: tools/run_submit_ladder.sh [rounds] [docs]
set -u
ROUNDS=${1:-4}
DOCS=${2:-1000000}
JAR=target/scala-2.13/lucenesolrspark_2.13-0.1.0.jar
BASE=/dev/shm/graft_submit
CORPUS=$BASE/corpus
mkdir -p $BASE
run_one() { # cores tag
  local cores=$1 tag=$2
  local idx=$BASE/index_$tag
  rm -rf "$idx" "$idx.warmup" "$idx.warmup.corpus"
  /opt/spark/bin/spark-submit --master "local[$cores]" --driver-memory 24g \
    --conf spark.driver.extraJavaOptions=-XX:+UseParallelGC \
    --class graft.apps.BuildIndexApp "$JAR" "$CORPUS" "$idx" "$DOCS" 1 warm \
    2>/dev/null | grep -a '\[graft\]'
  rm -rf "$idx" "$idx.warmup" "$idx.warmup.corpus"
}
for r in $(seq 1 "$ROUNDS"); do
  echo "== round $r lo (local[2]) =="
  run_one 2 lo
  echo "== round $r hi (local[8]) =="
  run_one 8 hi
done
