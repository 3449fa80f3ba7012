#!/bin/bash
# r10 closing A/B: old HEAD (r9 close) vs new HEAD, driver-protocol
# bench, alternating processes on the same host, 32 then 8 cores.
# Usage: bash tools/closing_ab_r10.sh <old-rev>
set -e
OLD_REV=${1:-d302c60}
WT=/tmp/wt-close-old
git -C /root/repo worktree remove --force "$WT" 2>/dev/null || true
git -C /root/repo worktree add "$WT" "$OLD_REV" >/dev/null 2>&1
for cpus in 32 8; do
  for round in 1 2; do
    for side in old new; do
      if [ "$side" = old ]; then dir="$WT"; else dir=/root/repo; fi
      out=$(cd "$dir" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
        SPARK_GRAFT_CPUS=$cpus python bench.py 2>/dev/null | tail -1)
      echo "cpus=$cpus round=$round side=$side $out"
    done
  done
done
git -C /root/repo worktree remove --force "$WT"
