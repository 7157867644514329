#!/bin/bash
# One-shot bench sweep: all headline scenes + the Mosaic smoke gate.
# Run on a TPU host; results append to /tmp/bench_all.log as JSON lines.
set -u
cd "$(dirname "$0")/.."
: > /tmp/bench_all.log
for sc in dragon sponza room2 random_balls cornell metal room balls; do
  timeout 900 python bench.py --scene "$sc" --frames 10 2>/dev/null \
    | tail -1 >> /tmp/bench_all.log
done
timeout 300 python bench.py --smoke 2>/dev/null | tail -1 >> /tmp/bench_all.log
cat /tmp/bench_all.log
