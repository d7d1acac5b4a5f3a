#!/bin/bash
# Behavioral acceptance scenarios (reference scripts/utils/behavior_tests.sh)
set -e
cd "$(dirname "$0")/.."
for game in breakout amidar space_invaders; do
  python -m toybox_tpu.sample_tests "$game" --episodes "${EPISODES:-2}"
done
