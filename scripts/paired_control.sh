#!/usr/bin/env bash
# Paired cross-round perf control (BASELINE.md "Environment-shift
# adjudication", mandatory from r18 on): the driver regenerates
# /root/testdata each round AND the VM reboots between rounds, so a raw
# artifact-vs-artifact ratio confounds code with environment. The only
# honest cross-round number is PAIRED — rebuild the prior round's final
# commit and run both binaries same-day on the current corpus.
#
# usage: scripts/paired_control.sh <prior-commit> [sf-dir] [only-gates]
#   prior-commit  e.g. the last commit of round N-1
#   sf-dir        corpus dir (default /root/testdata/sf0.1)
#   only-gates    optional SPARK_GRAFT_ONLY filter for a quick pair
#
# Prints both compact bench lines and the current/prior ratio. Quote the
# ratio ONLY when both artifacts say normalized_valid:true.
set -euo pipefail

PRIOR=${1:?usage: paired_control.sh <prior-commit> [sf-dir] [only-gates]}
SF=${2:-/root/testdata/sf0.1}
ONLY=${3:-}
ROOT=$(git rev-parse --show-toplevel)
SHORT=$(git -C "$ROOT" rev-parse --short "$PRIOR")
WT=/tmp/graft_paired_$SHORT

if [ ! -d "$WT" ]; then
  git -C "$ROOT" worktree add "$WT" "$PRIOR"
fi
echo "[paired] building prior $SHORT in $WT" >&2
(cd "$WT" && sbt -batch compile >/dev/null)

run_bench() { # $1 = dir, $2 = tag
  echo "[paired] bench $2 ($1) on $SF" >&2
  (cd "$1" && SPARK_GRAFT_SF_DIR="$SF" ${ONLY:+SPARK_GRAFT_ONLY="$ONLY"} \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '"metric"' | tail -1) > "/tmp/paired_$2.json"
  cat "/tmp/paired_$2.json"
}

# prior first, current second — both in one sitting on the same corpus
run_bench "$WT" prior
run_bench "$ROOT" current

python3 - <<'EOF'
import json, re
def load(tag):
    line = open(f"/tmp/paired_{tag}.json").read()
    return json.loads(line[line.index('{'):])
p, c = load("prior"), load("current")
ok = p.get("normalized_valid") and c.get("normalized_valid")
ratio = c["value"] / p["value"] if p["value"] else float("nan")
print(f'[paired] prior raw={p["value"]:.1f}s norm={p["value_normalized"]:.1f}s valid={p.get("normalized_valid")}')
print(f'[paired] current raw={c["value"]:.1f}s norm={c["value_normalized"]:.1f}s valid={c.get("normalized_valid")}')
print(f'[paired] current/prior raw ratio = {ratio:.3f}' + ('' if ok else '  (NOT QUOTABLE: a side is normalized_valid:false)'))
EOF

echo "[paired] worktree kept at $WT (git worktree remove $WT when done)" >&2
