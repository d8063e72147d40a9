#!/bin/bash
# Round-9 orchestration-tail A/B (VERDICT r8 item 4): full headline
# bench at 32 cores under alternating session-level shuffle-sizing
# variants, counterbalanced ABCD-DCBA so host drift cancels to first
# order.  BENCH_DETAIL.json is restored from the same snapshot before
# every run so the rerun-grant conditions are identical; each run's
# map is saved aside under /tmp/ab_r9/.
set -u
cd /root/repo
mkdir -p /tmp/ab_r9
cp BENCH_DETAIL.json /tmp/ab_r9/prior_snapshot.json

run_one () {  # $1 = variant label, $2 = shuffle partitions, $3 = conf json
  cp /tmp/ab_r9/prior_snapshot.json BENCH_DETAIL.json
  export SPARK_GRAFT_CPUS=32
  export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  export SPARK_GRAFT_SHUFFLE_PARTITIONS="$2"
  if [ -n "$3" ]; then export SPARK_GRAFT_CONF_JSON="$3"; else unset SPARK_GRAFT_CONF_JSON; fi
  seq=$(date +%s)
  echo "=== variant $1 (partitions=$2 conf=$3) start $(date -u +%H:%M:%S)"
  python bench.py 2>/dev/null | tail -1 | tee "/tmp/ab_r9/${1}_${seq}.jsonl"
  cp BENCH_DETAIL.json "/tmp/ab_r9/${1}_${seq}_detail.json"
}

for v in A B C D D C B A; do
  case $v in
    A) run_one A 32 "" ;;
    B) run_one B 8 "" ;;
    C) run_one C 16 "" ;;
    D) run_one D 32 '{"spark.sql.adaptive.coalescePartitions.initialPartitionNum": "128"}' ;;
  esac
done
cp /tmp/ab_r9/prior_snapshot.json BENCH_DETAIL.json
echo "A/B sweep complete"
