#!/bin/bash
# Behavioral acceptance gate (reference scripts/utils/behavior_tests.sh:4-17
# runs toybox.sample_tests.* as unittests against saved ppo2 models).
#
# Default: gate the committed trained models — every white-box scenario
# (EnemyRemoval/OneEnemyTarget/GangUpNoJump{Random,Target}, EZChannel/
# LastBrick/PolarStarts, NoShields/JitterVary/ShieldXs) runs BATCHED with
# the model and its failable check; the script exits nonzero if any gated
# model regresses.
#
# SMOKE=1: cheap per-frame random-policy smoke instead (CI; always exit 0
# unless the harness itself breaks). MAX_FRAMES/EPISODES cap the budget.
# Scenario scale doesn't need an accelerator: default to the CPU backend
# (TOYBOX_FORCE_CPU=0 to use the default backend, e.g. the TPU chip).
set -e
cd "$(dirname "$0")/.."
export TOYBOX_FORCE_CPU=${TOYBOX_FORCE_CPU:-1}
ARGS=()
[ -n "$MAX_FRAMES" ] && ARGS+=(--max-frames "$MAX_FRAMES")
[ -n "$EPISODES" ] && ARGS+=(--episodes "$EPISODES")

model_for() {
  case "$1" in
    breakout) echo models/Breakout.ppo1.model ;;
    amidar) echo models/Amidar.ppo1.model ;;
    space_invaders) echo models/SpaceInvaders.ppo1.model ;;
  esac
}

for game in breakout amidar space_invaders; do
  model=$(model_for "$game")
  if [ -z "${SMOKE:-}" ] && [ -f "$model" ]; then
    echo "== $game: gating $model =="
    python -m toybox_tpu.sample_tests "$game" --alg=ppo1 \
      --load_path="$model" "${ARGS[@]}"
  else
    echo "== $game: smoke (random policy) =="
    python -m toybox_tpu.sample_tests "$game" \
      --episodes "${EPISODES:-2}" \
      ${MAX_FRAMES:+--max-frames "$MAX_FRAMES"}
  fi
done
