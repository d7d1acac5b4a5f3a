#!/bin/bash
# ppo regression gate on all 3 games (reference scripts/utils/regress.sh)
set -e
cd "$(dirname "$0")/.."
MODELS=${MODELS:-models}
for game in Breakout Amidar SpaceInvaders; do
  python -m toybox_tpu.regress --env="${game}ToyboxNoFrameskip-v4" \
    --load_path="$MODELS/$game.regress.model" --threshold "${THRESHOLD:-50}"
done
