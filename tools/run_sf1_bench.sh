#!/usr/bin/env bash
# 10x-scale bench datapoint (VERDICT r3 next-1): the full Bench ladder over
# a ~12M-doc corpus (10x the per-round sf0.1 bench corpus). Takes ~1h on a
# quiet 32-core host — too long for the per-round driver bench, so this
# writes BENCH/bench_sf1.json which graft.Bench then embeds VERBATIM (with
# provenance) into every subsequent bench_out.json as index_build_sf1 /
# query_latency_sf1.
#
# Run on an otherwise-idle machine: concurrent compile/test load poisons
# the scaling samples (the steal/quiesce gates will fight it, bounded).
set -euo pipefail
cd "$(dirname "$0")/.."

export SPARK_GRAFT_BENCH_DOCS="${SPARK_GRAFT_BENCH_DOCS:-12000000}"
# 2 interleaved rounds (each: 1 lo + 2 hi + 2 max build) + up to 2 top-ups;
# a single lo(2-core) build of 12M docs alone is ~12 min
export SPARK_GRAFT_SCALE_ROUNDS="${SPARK_GRAFT_SCALE_ROUNDS:-2}"
export SPARK_GRAFT_SCALE_EXTRA="${SPARK_GRAFT_SCALE_EXTRA:-2}"
# skip the 1-vs-4-core secondary pair: a 1-core 12M-doc build is ~30 min
export SPARK_GRAFT_ALT_ROUNDS=0
export SPARK_GRAFT_BENCH_OUT="${SPARK_GRAFT_BENCH_OUT:-BENCH/bench_sf1.json}"
# don't self-embed a previous sf1 artifact into this run's output
export SPARK_GRAFT_SF1_JSON=/nonexistent
# ~10 GB index dirs + ~4 GB corpus: use disk, not /dev/shm
export SPARK_GRAFT_BENCH_WORK="${SPARK_GRAFT_BENCH_WORK:-/root/graft_sf1_work}"
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-64g}"

mkdir -p "$SPARK_GRAFT_BENCH_WORK"
trap 'rm -rf "$SPARK_GRAFT_BENCH_WORK"' EXIT

sbt -batch "runMain graft.Bench"
echo "[run_sf1_bench] wrote $SPARK_GRAFT_BENCH_OUT"
