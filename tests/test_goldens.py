"""Golden-trajectory determinism tests.

The reference's acceptance bar is trajectory parity under fixed seeds
(SURVEY.md §6-7; scripts/utils/test_games.py). The Rust engine isn't
runnable here, so the goldens are this engine's own recorded trajectories
(tests/goldens/*.json): fixed seed + fixed action script -> state-JSON
digests at checkpoints. Any refactor that changes dynamics, RNG draw
order, or the JSON codec trips these.

Regenerate intentionally with:  python -m tests.test_goldens
"""

import hashlib
import json
import os

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
GAMES = ["breakout", "amidar", "space_invaders", "gridworld"]
SEED = 1234
N_STEPS = 200
CHECK_EVERY = 50


def _action_script(game, legal, n):
    """Deterministic action sequence exercising movement + fire."""
    acts = []
    for i in range(n):
        if i % 13 == 0:
            acts.append(1 if 1 in legal else legal[0])     # FIRE
        else:
            acts.append(legal[(i * 7 + i // 9) % len(legal)])
    return acts


def _digest(state_json) -> str:
    return hashlib.sha256(
        json.dumps(state_json, sort_keys=True).encode()).hexdigest()[:16]


def _run(game):
    from toybox_tpu import Toybox

    tb = Toybox(game, seed=SEED)
    legal = tb.get_legal_action_set()
    digests = {}
    for i, a in enumerate(_action_script(game, legal, N_STEPS)):
        tb.apply_ale_action(a)
        if (i + 1) % CHECK_EVERY == 0:
            digests[str(i + 1)] = _digest(tb.to_state_json())
    return {"seed": SEED, "steps": N_STEPS, "score": tb.get_score(),
            "lives": tb.get_lives(), "digests": digests}


@pytest.mark.parametrize("game", GAMES)
def test_golden_trajectory(game):
    path = os.path.join(GOLDEN_DIR, f"{game}.json")
    assert os.path.exists(path), (
        f"golden missing; regenerate with python -m tests.test_goldens")
    expected = json.load(open(path))
    actual = _run(game)
    assert actual == expected, (
        f"{game} trajectory diverged from golden. If the dynamics change "
        f"was intentional, regenerate via python -m tests.test_goldens")


def regenerate():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for game in GAMES:
        path = os.path.join(GOLDEN_DIR, f"{game}.json")
        with open(path, "w") as f:
            json.dump(_run(game), f, indent=1, sort_keys=True)
        print("wrote", path)


if __name__ == "__main__":
    regenerate()
