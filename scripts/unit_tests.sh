#!/bin/bash
# CI test entry (reference scripts/utils/unit_tests.sh): smoke + full suite.
set -e
cd "$(dirname "$0")/.."
python - <<'PY'
# FFI-style smoke test (reference scripts/utils/test_games.py:42-78)
from toybox_tpu import Toybox, Input
for game in ("breakout", "amidar", "space_invaders", "gridworld"):
    with Toybox(game) as tb:
        cfg = tb.config_to_json(); tb.write_config_json(cfg)
        st = tb.to_state_json(); tb.write_state_json(st)
        assert tb.to_state_json() == st, game
        assert tb.get_legal_action_set()
        tb.set_seed(1234); tb.new_game()
        for _ in range(100):
            tb.apply_ale_action(0)
        assert tb.get_rgb_frame().shape[2] == 3
        print(f"{game}: OK")
PY
python -m pytest tests/ -q
