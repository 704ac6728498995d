#!/usr/bin/env bash
# Environment-drift A/B (r15 VERDICT directive 1).
#
# Problem it closes: a round-over-round bench delta can be BOX DRIFT
# (multi-tenant host slower today) or CODE. r15's ~21% scare took a
# judge-side worktree A/B to settle. This script codifies that protocol
# from the repo side:
#
#   tools/bench_ab.sh <prior_commit> [sf_dir] [reps]
#
# Benches HEAD and <prior_commit> INTERLEAVED in the same session (pass 1
# of HEAD, pass 1 of prior, pass 2 of HEAD, ...) on the same box, so any
# load burst hits both sides roughly equally, then writes
# tools/bench_ab.json:
#   { head_commit, prior_commit, head_total_min, prior_total_min,
#     head_total_med, prior_total_med, ratio_median, ratio_p10, ratio_p90,
#     n_carried, passes_per_side }
# graft.Bench embeds that file into the bench artifact as "bench_ab".
#
# WHEN to run it (the trigger, checked by the round workflow): the
# carried-surface total in the new builder bench moved >10% vs the prior
# round's committed bench_r{N-1}_builder.json. If the trigger doesn't
# fire, NEXT.md records that instead.
#
# Mechanics: the prior commit builds in a git worktree (its own sbt
# project lock, shared offline coursier cache). Each side runs
# single-pass Bench invocations (SPARK_GRAFT_REPS=1) `reps` times,
# alternating; per-query seconds come from each run's bench_out.json.
set -euo pipefail

PRIOR=${1:?usage: bench_ab.sh <prior_commit> [sf_dir] [reps]}
SF=${2:-/root/testdata/sf0.1}
REPS=${3:-3}
REPO=/root/repo
WT=/tmp/graft_ab_prior
OUT=/tmp/graft_ab_out
mkdir -p "$OUT"

cd "$REPO"
HEAD_COMMIT=$(git rev-parse --short HEAD)
PRIOR_COMMIT=$(git rev-parse --short "$PRIOR")

if [ ! -d "$WT" ]; then
  git worktree add "$WT" "$PRIOR" >/dev/null
else
  git -C "$WT" checkout -q "$PRIOR"
fi

echo "[ab] compiling both sides..."
(cd "$REPO" && sbt -batch compile >/dev/null)
(cd "$WT" && sbt -batch compile >/dev/null)

run_side() { # side(head|prior) dir pass
  local side=$1 dir=$2 pass=$3
  echo "[ab] $side pass $pass..."
  (cd "$dir" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_REPS=1 \
    SPARK_GRAFT_BENCH_OUT="$OUT/${side}_$pass.json" \
    sbt -batch "runMain graft.Bench" >/dev/null 2>&1)
}

for pass in $(seq 1 "$REPS"); do
  run_side head "$REPO" "$pass"
  run_side prior "$WT" "$pass"
done

python3 - "$OUT" "$REPS" "$HEAD_COMMIT" "$PRIOR_COMMIT" <<'PY'
import json, statistics, sys
out, reps, head_c, prior_c = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
def load(side):
    runs = [json.load(open(f"{out}/{side}_{p}.json")) for p in range(1, reps+1)]
    qs = {}
    for r in runs:
        for k, v in r["queries"].items():
            qs.setdefault(k, []).append(v)
    return qs
h, p = load("head"), load("prior")
carried = sorted(set(h) & set(p))
hm = {k: statistics.median(h[k]) for k in carried}
pm = {k: statistics.median(p[k]) for k in carried}
ratios = sorted(hm[k] / pm[k] for k in carried if pm[k] > 0)
def pct(xs, q):
    i = max(0, min(len(xs)-1, int(q*len(xs))))
    return xs[i]
blob = {
  "head_commit": head_c, "prior_commit": prior_c,
  "head_total_med": sum(hm.values()), "prior_total_med": sum(pm.values()),
  "head_total_min": sum(min(h[k]) for k in carried),
  "prior_total_min": sum(min(p[k]) for k in carried),
  "ratio_median": statistics.median(ratios),
  "ratio_p10": pct(ratios, 0.10), "ratio_p90": pct(ratios, 0.90),
  "n_carried": len(carried), "passes_per_side": reps,
}
with open("/root/repo/tools/bench_ab.json", "w") as f:
    json.dump(blob, f, indent=1)
print("[ab] head/prior carried med: %.1f / %.1f s, ratio median %.3f" %
      (blob["head_total_med"], blob["prior_total_med"], blob["ratio_median"]))
print("[ab] wrote tools/bench_ab.json")
PY
