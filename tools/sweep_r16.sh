#!/usr/bin/env bash
# Round-end frozen-surface determinism sweep: 3 repeats x 3 SFs, thread
# counts deliberately varied (the one Spark-side nondeterminism channel
# is partition count/order). Prints one PASS/FAIL line per leg.
set -uo pipefail
cd /root/repo
for i in 1 2 3; do
  for sf in 0.001 0.01 0.1; do
    cpus=16; [ "$i" = "1" ] && [ "$sf" = "0.001" ] && cpus=4
    [ "$i" = "2" ] && [ "$sf" = "0.001" ] && cpus=4
    out=/tmp/sweep16_${sf}_$i
    SPARK_GRAFT_CPUS=$cpus sbt -batch "runMain graft.Verify /root/testdata/sf$sf $out" \
      > /tmp/sweep16_${sf}_${i}.log 2>&1
    echo "leg sf=$sf rep=$i cpus=$cpus verify_exit=$?"
    python3 tools/check_parity.py /root/testdata/sf$sf $out | tail -1
  done
done
