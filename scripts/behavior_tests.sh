#!/bin/bash
# Behavioral acceptance gate (reference scripts/utils/behavior_tests.sh:4-17
# runs toybox.sample_tests.* as unittests against saved ppo2 models).
#
# Default: gate EVERY committed model family (families.py registry —
# ppo/ppo1/a2c/acer/acktr/trpo/deepq/gail/bc) through every white-box
# scenario (EnemyRemoval/OneEnemyTarget/GangUpNoJump{Random,Target},
# EZChannel/LastBrick/PolarStarts, NoShields/JitterVary/ShieldXs), each
# with its calibrated or explicitly-waived checks; exit nonzero if any
# gated family regresses. FAMILIES="ppo1 a2c" narrows the set.
#
# SMOKE=1: cheap per-frame random-policy smoke instead (CI; always exit 0
# unless the harness itself breaks). MAX_FRAMES/EPISODES cap the budget.
# Scenario scale doesn't need an accelerator: default to the CPU backend
# (TOYBOX_FORCE_CPU=0 to use the default backend, e.g. the TPU chip).
set -e
cd "$(dirname "$0")/.."
export TOYBOX_FORCE_CPU=${TOYBOX_FORCE_CPU:-1}
FAMILIES=${FAMILIES:-"ppo ppo1 a2c acer acktr trpo deepq gail bc"}
ARGS=()
[ -n "$MAX_FRAMES" ] && ARGS+=(--max-frames "$MAX_FRAMES")
[ -n "$EPISODES" ] && ARGS+=(--episodes "$EPISODES")

rc=0
for game in breakout amidar space_invaders; do
  if [ -n "${SMOKE:-}" ]; then
    echo "== $game: smoke (random policy) =="
    python -m toybox_tpu.sample_tests "$game" \
      --episodes "${EPISODES:-2}" \
      ${MAX_FRAMES:+--max-frames "$MAX_FRAMES"}
    continue
  fi
  for family in $FAMILIES; do
    echo "== $game: gating family $family =="
    if ! python -m toybox_tpu.sample_tests "$game" --family="$family" \
        "${ARGS[@]}"; then
      rc=1
    fi
  done
done
exit $rc
