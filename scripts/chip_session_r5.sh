#!/bin/bash
# Round-5 chip session. Ordered by information-per-minute under a flaky
# tunnel (VERDICT r4 next-steps #1/#2/#3/#4 + ADVICE medium):
#   1. Pallas warp kernel validation (ADVICE gate: compile+parity on chip)
#   2. Roofline profile of the stream stages (--cost)
#   3. Flagship stream bench (warms the .jax_cache the driver will hit)
#   4. Train-step attempt (windows=1 — diagnose the r4 compile SIGKILL)
#   5. lanes=2 1080p memcheck (compile-only)
# Each leg bounded + logged; a dead tunnel costs one leg, not the session.
set -u
LOGDIR=${LOGDIR:-/tmp/chip_session_r5}
mkdir -p "$LOGDIR"
cd /root/repo

leg() {
  name=$1; to=$2; shift 2
  echo "=== leg $name ($(date +%H:%M:%S)): $*"
  timeout "$to" "$@" >"$LOGDIR/$name.out" 2>"$LOGDIR/$name.err"
  rc=$?
  echo "--- $name rc=$rc"
  tail -15 "$LOGDIR/$name.out"
  [ $rc -ne 0 ] && tail -5 "$LOGDIR/$name.err"
}

leg pallas_warp 3000 python scripts/microbench_pallas_warp.py
leg roofline 3600 python scripts/profile_stream.py --size 1080x1920 --cost
leg bench1080 3600 python bench.py --size 1080x1920
leg train_w1 3600 python - <<'EOF'
import sys, json
sys.path.insert(0, "/root/repo")
import bench
print(json.dumps({"train_steps_per_s_w1": round(
    bench.bench_train(windows=1, iters=2), 4)}))
EOF
leg memcheck_lanes2 3000 python scripts/memcheck_stream.py --size 1080x1920 --lanes 2
echo "=== done $(date +%H:%M:%S) ==="
