"""Committed seed-state fixtures replay correctly.

The fixtures in tests/fixtures/seed_states/ were produced by
``python -m toybox_tpu.run_get_seed_state --alg=ppo1
--load_path=models/Breakout.ppo1.model`` (a TRAINED agent played until the
predicate held — the reference dumps the same fixtures for acceptance
tests, baselines/run_get_seed_state.py:95-102). The tests assert the
predicate still holds after a load (guards against engine-schema drift
silently invalidating the fixtures) and that play can resume from them.
"""

import json
import os

import pytest

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures",
                           "seed_states")


def _load(name):
    with open(os.path.join(FIXTURE_DIR, name)) as f:
        return json.load(f)


@pytest.mark.parametrize("fixture,predicate", [
    ("breakout_channel_seed0.json", "channel"),
    ("breakout_last_brick_seed0.json", "last_brick"),
    ("breakout_life_lost_seed0.json", "life_lost"),
])
def test_fixture_predicate_holds_after_load(fixture, predicate):
    from toybox_tpu import Toybox
    from toybox_tpu.run_get_seed_state import PREDICATES

    tb = Toybox("breakout", withstate=_load(fixture))
    assert PREDICATES[predicate](tb), \
        f"{predicate} no longer holds after reloading {fixture}"


def test_fixture_roundtrips_and_resumes():
    from toybox_tpu import Toybox

    js = _load("breakout_last_brick_seed0.json")
    tb = Toybox("breakout", withstate=js)
    # exact round-trip through the JSON codec
    assert tb.to_state_json() == js
    # play resumes from the snapshot: the lone brick is still clearable
    before = tb.rstate.breakout_bricks_remaining()
    assert before == 1
    for _ in range(100):
        tb.apply_ale_action(1)  # FIRE serves if needed, then NOOP-ish
    assert tb.get_lives() >= 0  # stepping from a fixture never crashes


def test_life_lost_semantics_match_start_lives():
    """life_lost means 'lost at least one life' for EVERY game (Breakout
    starts at 5 lives, Amidar/SI at 3) — name and semantics agree."""
    from toybox_tpu import Toybox
    from toybox_tpu.run_get_seed_state import PREDICATES

    for game in ("breakout", "amidar", "space_invaders"):
        tb = Toybox(game, seed=0)
        assert not PREDICATES["life_lost"](tb), \
            f"fresh {game} game must not read as life_lost"
    js = _load("breakout_life_lost_seed0.json")
    assert js["lives"] == 4  # exactly one life lost at extraction time
