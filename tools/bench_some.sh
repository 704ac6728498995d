#!/bin/bash
# Quick single/multi-query bench A/B helper (builder-local; the driver
# always runs the full surface): tools/bench_some.sh q_a q_b ...
# Prints the per-query medians + mins from a 3-pass interleaved run.
set -e
cd /root/repo
out=$(mktemp /tmp/bench_some_XXXX.json)
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
SPARK_GRAFT_BENCH_OUT=$out \
sbt -batch "runMain graft.Bench $*" > /tmp/bench_some_last.log 2>&1 || {
  tail -20 /tmp/bench_some_last.log; exit 1; }
python3 - "$out" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
q, qm = d["queries"], d["queries_min"]
for k in q:
    print(f'{q[k]:8.3f} med {qm[k]:8.3f} min  {k}')
print(f'total med {d["value"]:.3f}  min {d["total_min"]:.3f}  load {d["load_avg"]:.2f}  errors {d["errors"]}')
EOF
echo "full record: $out"
