"""Randomized engine-invariant tests.

The deep goldens (tests/test_goldens_deep.py) pin exact trajectories;
these pin PROPERTIES over random action sequences, so a dynamics bug off
the golden paths still trips something: scores never decrease inside an
episode, lives never increase, destroyed things stay destroyed.
"""

import numpy as np
import pytest

from toybox_tpu import Toybox

STEPS = 300


def _random_rollout(game, seed, per_frame):
    """Step the facade with seeded random ALE actions; call
    per_frame(tb, prev, cur) for consecutive (prev, cur) state dicts
    while the game is live. Stops at game over."""
    rng = np.random.RandomState(seed)
    with Toybox(game) as tb:
        tb.set_seed(seed)
        tb.new_game()
        legal = tb.get_legal_action_set()
        prev = tb.to_state_json()
        for _ in range(STEPS):
            tb.apply_ale_action(int(rng.choice(legal)))
            if tb.game_over():
                break
            cur = tb.to_state_json()
            per_frame(tb, prev, cur)
            prev = cur


@pytest.mark.parametrize("seed", [0, 7])
def test_breakout_invariants(seed):
    def check(tb, prev, cur):
        assert cur["score"] >= prev["score"]
        assert cur["lives"] <= prev["lives"]
        assert cur["level"] >= prev["level"]
        if cur["level"] == prev["level"]:
            alive = sum(b["alive"] for b in cur["bricks"])
            alive_prev = sum(b["alive"] for b in prev["bricks"])
            assert alive <= alive_prev, "bricks resurrected mid-level"

    _random_rollout("breakout", seed, check)


@pytest.mark.parametrize("seed", [0, 7])
def test_amidar_invariants(seed):
    def count_painted(s):
        return sum(row.count("Painted") for row in s["board"]["tiles"])

    def check(tb, prev, cur):
        assert cur["score"] >= prev["score"]
        assert cur["lives"] <= prev["lives"]
        assert 0 <= cur["jumps"] <= prev["jumps"] + 1  # +1: level-up refill
        if (cur["level"] == prev["level"]
                and cur["lives"] == prev["lives"]):
            assert count_painted(cur) >= count_painted(prev), \
                "tiles unpainted mid-life"

    _random_rollout("amidar", seed, check)


@pytest.mark.parametrize("seed", [0, 7])
def test_space_invaders_invariants(seed):
    def shield_cells(tb):
        return tb.query_state_json("shield_cell_count")

    def check(tb, prev, cur):
        assert cur["score"] >= prev["score"]
        assert cur["lives"] <= prev["lives"]
        if cur["level"] == prev["level"]:
            alive = sum(e["alive"] for e in cur["enemies"])
            alive_prev = sum(e["alive"] for e in prev["enemies"])
            assert alive <= alive_prev, "enemies resurrected mid-wave"

    _random_rollout("space_invaders", seed, check)


@pytest.mark.parametrize("seed", [0])
def test_si_shield_erosion_monotone(seed):
    """Shield pixels only erode within a wave (laser damage never
    repairs), via the engine-side shield_cell_count query."""
    rng = np.random.RandomState(seed)
    with Toybox("space_invaders") as tb:
        tb.set_seed(seed)
        tb.new_game()
        legal = tb.get_legal_action_set()
        prev_cells = tb.query_state_json("shield_cell_count")
        prev_level = tb.to_state_json()["level"]
        for _ in range(STEPS):
            tb.apply_ale_action(int(rng.choice(legal)))
            if tb.game_over():
                break
            cells = tb.query_state_json("shield_cell_count")
            level = tb.to_state_json()["level"]
            if level == prev_level:
                assert cells <= prev_cells, "shield pixels restored"
            prev_cells, prev_level = cells, level
