#!/bin/bash
# Round-3 on-chip measurement session (VERDICT r2 #1/#2): validate the true-8K
# single-chip bench fix FIRST, then execute the queued A/B decision tree.
# Each step individually timed out; logs to /tmp/chip_session_r3/<step>.log.
#
# Usage: bash scripts/chip_session_r3.sh [outdir]
set -u
OUT=${1:-/tmp/chip_session_r3}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  tail -5 "$OUT/$name.log"
  echo "=== $name rc=$rc ==="
}

# 0. quick attach sanity (fail fast if the tunnel is down)
run attach 300 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((256,256)) @ jnp.ones((256,256))).sum()))"
grep -q "16777216" "$OUT/attach.log" || { echo "TPU attach failed; aborting"; exit 1; }

# 1. FLAGSHIP: true 1080x1920 -> 8K bench (validates the 4205ab6 OOM fix)
run bench_1080 2700 python bench.py --size 1080x1920

# 2. SPyNet conv formulation A/B (biggest known-bad kernel: 339 ms, 37x floor)
run spynet_xla 2400 python scripts/profile_stream.py --size 1080x1920 --part spynet_pair
run spynet_im2col 2400 env REFVSR_SPYNET_CONV=im2col_w \
  python scripts/profile_stream.py --size 1080x1920 --part spynet_pair

# 3. prop-step A/Bs: baseline, banded warp on, affine quad threshold up
run prop_base 3000 python scripts/profile_stream.py --size 1080x1920 --part prop_step
run prop_banded 3000 env REFVSR_BANDED_WARP=1 \
  python scripts/profile_stream.py --size 1080x1920 --part prop_step
run prop_affinequad 3000 env REFVSR_AFFINE_QUAD_MB=3584 \
  python scripts/profile_stream.py --size 1080x1920 --part prop_step

# 4. banded warp microbench at the production warp shapes
run banded_warp 2400 python scripts/microbench_banded_warp.py

# 5. batch-scaling probe (decides the batched-backward restructure)
run prop_batch 3000 python scripts/profile_stream.py --size 1080x1920 --part prop_batch

# 6. fresh full component profile at 1080p-HD-in
run profile_1080 3000 python scripts/profile_stream.py --size 1080x1920

# 7. train-throughput leg
run bench_train 2400 python bench.py --train

echo "chip session r3 complete: $OUT"
