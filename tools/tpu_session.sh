#!/bin/bash
# One tunnel window -> all round artifacts. Each stage tolerates failure of
# the previous (the persistent JAX compilation cache in /root/.jax_cache
# amortizes remote compiles across stages and reruns).
#
# Usage: bash tools/tpu_session.sh [round_tag]   (default r03)
set -x
cd "$(dirname "$0")/.."
TAG=${1:-r03}

# 1. Liveness + driver entry compile check.
timeout 570 python __graft_entry__.py || exit 1

# 2. Device-time breakdown (writes to stdout; capture).
timeout 1800 python tools/profile_scene.py full prep kernel \
    2>&1 | tee "/tmp/profile_${TAG}_main.log"
timeout 1800 python tools/profile_scene.py mode9 \
    2>&1 | tee "/tmp/profile_${TAG}_mode9.log"

# 3. On-chip Mosaic-vs-interpreter + fused-vs-windowed artifact.
timeout 2400 python tools/check_pallas_tpu.py \
    --json "PALLAS_CHECK_${TAG}.json" 1 7 9 2>&1 | tee /tmp/check_a.log
timeout 2400 python tools/check_pallas_tpu.py \
    --json "PALLAS_CHECK_${TAG}_quad.json" 11 13 2>&1 | tee /tmp/check_b.log

# 4. Bench payload (all modes + pipelined + spread).
timeout 1800 python bench.py 2>&1 | tee "/tmp/bench_${TAG}.log"
