#!/bin/bash
# FPS benchmarks: headline JSON line + the full harness.
set -e
cd "$(dirname "$0")/.."
for game in breakout amidar space_invaders; do
  python bench.py "$game" "${NENVS:-8192}"
done
python -m toybox_tpu.benchmark --game breakout
