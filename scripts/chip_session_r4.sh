#!/bin/bash
# Round-4 chip session, leg 1: the pipelined-streaming A/B that round 3
# never captured (VERDICT r3 next-steps #1). True 1080x1920 HD-in -> real
# 8K (4320x7680) out, bf16, flagship 30 blocks x 48 ch, single v5e chip.
# Sequential (one chip); each leg bounded; full logs kept per leg.
set -u
LOGDIR=/tmp/chip_session_r4
mkdir -p "$LOGDIR"
cd /root/repo

run_leg() {
  name=$1; shift
  echo "=== leg $name: $* ($(date +%H:%M:%S)) ==="
  timeout 3600 python bench.py "$@" >"$LOGDIR/$name.out" 2>"$LOGDIR/$name.err"
  rc=$?
  echo "--- rc=$rc result:"
  grep -h '^{' "$LOGDIR/$name.out" || tail -3 "$LOGDIR/$name.err"
}

run_leg lanes0 --size 1080x1920 --lanes 0
run_leg lanes2 --size 1080x1920 --lanes 2
run_leg lanes3 --size 1080x1920 --lanes 3
echo "=== done $(date +%H:%M:%S) ==="
