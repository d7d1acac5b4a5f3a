#!/bin/bash
# Behavioral acceptance scenarios (reference scripts/utils/behavior_tests.sh).
# Scenario scale doesn't need an accelerator: default to the CPU backend so
# the suite is deterministic and runs even with no device attached
# (TOYBOX_FORCE_CPU=0 to use the default backend).
set -e
cd "$(dirname "$0")/.."
export TOYBOX_FORCE_CPU=${TOYBOX_FORCE_CPU:-1}
ARGS=()
[ -n "$MAX_FRAMES" ] && ARGS+=(--max-frames "$MAX_FRAMES")
for game in breakout amidar space_invaders; do
  python -m toybox_tpu.sample_tests "$game" --episodes "${EPISODES:-2}" \
    "${ARGS[@]}"
done
