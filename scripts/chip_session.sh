#!/bin/bash
# One-shot measurement session for when the TPU tunnel is available.
# Captures every queued A/B in priority order; each step is individually
# timed out so a wedged compile can't eat the session. Logs to
# /tmp/chip_session/<step>.log (tail -f to watch).
#
# Usage: bash scripts/chip_session.sh [outdir]
set -u
OUT=${1:-/tmp/chip_session}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  tail -20 "$OUT/$name.log"
  echo "=== $name rc=$rc ==="
}

# 0. quick attach sanity (fail fast if the tunnel is still down)
run attach 300 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((256,256)) @ jnp.ones((256,256))).sum()))"
grep -q "16777216" "$OUT/attach.log" || { echo "TPU attach failed; aborting"; exit 1; }

# 1. row-gather wall characterization (L-sweep + block8)
run gather_wall 1800 python scripts/microbench_gather.py

# 2. Mosaic in-VMEM gather candidates
run pallas_gather 1800 python scripts/microbench_pallas_gather.py

# 3. banded warp vs quad at the two production warp shapes
run banded_warp 2400 python scripts/microbench_banded_warp.py

# 4. SPyNet conv formulation A/B
run spynet_xla 2400 python scripts/profile_stream.py --size 1080x1920 --part spynet_pair
run spynet_im2col 2400 env REFVSR_SPYNET_CONV=im2col_w \
  python scripts/profile_stream.py --size 1080x1920 --part spynet_pair

# 5. fresh full component profile at 1080p-HD-in (ring buffers + resize wins)
run profile_1080 3000 python scripts/profile_stream.py --size 1080x1920

# 6. prop-step A/Bs: banded warp on; affine quad threshold up
run prop_banded 3000 env REFVSR_BANDED_WARP=1 \
  python scripts/profile_stream.py --size 1080x1920 --part prop_step
run prop_affinequad 3000 env REFVSR_AFFINE_QUAD_MB=3584 \
  python scripts/profile_stream.py --size 1080x1920 --part prop_step

# 6b. batch-scaling probe (decides the batched-backward restructure)
run prop_batch 3000 python scripts/profile_stream.py --size 1080x1920 --part prop_batch

# 7. bench end-to-end (small size first for sanity, then true 8K)
run bench_small 2700 python bench.py --size 272x480
run bench_8k 3600 python bench.py

echo "chip session complete: $OUT"
