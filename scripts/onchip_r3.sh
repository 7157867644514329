#!/bin/bash
# Round-3 on-chip session runbook, ONE python process per phase (the axon
# relay warmup dominates; never run two TPU processes concurrently).
# Usage: bash scripts/onchip_r3.sh   (on a host with the TPU relay up)
set -euo pipefail
cd "$(dirname "$0")/.."
echo "== 1/4 Mosaic smoke gate =="
timeout 1800 python bench.py --smoke | tail -1
echo "== 2/4 sweep (regressions + shared-term sphere A/B + lanes/unroll) =="
timeout 7200 python scripts/sweep_r3.py
echo "== 3/5 apply measured tuning (lanes/unroll winners -> tuned.json) =="
timeout 300 python scripts/apply_tuning.py /tmp/sweep_r3.log || true
echo "== 4/5 dragon op-level profile (VPU-tail decomposition) =="
timeout 3600 python scripts/profile_scene.py dragon --top 60
echo "== 4b lane-occupancy probe (packed slab/leaf blocks: build or drop) =="
timeout 1200 python scripts/probe_lanepack.py || true
echo "== 5/6 headline bench (picks up tuned.json) =="
timeout 1800 python bench.py | tail -1
echo "== 6/6 secondary metric: Cornell 1024 spp wall-clock (plain + NEE) =="
timeout 1200 python bench.py --cornell1024 --rpp 8 | tail -1
timeout 1200 python bench.py --cornell1024 --rpp 8 --nee | tail -1
