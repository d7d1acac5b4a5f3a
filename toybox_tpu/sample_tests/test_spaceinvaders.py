"""Space Invaders behavioral scenarios (reference behavior_tests.sh:14-17:
NoShields, JitterVary, ShieldXs)."""

from __future__ import annotations

import numpy as np

from toybox_tpu.interventions.space_invaders import SpaceInvadersIntervention
from toybox_tpu.sample_tests.base import BehavioralFixture


class NoShields(BehavioralFixture):
    """All shield pixels cleared: the agent must dodge without cover."""

    game = "space_invaders"
    max_frames = 8_000

    def intervene(self, tb):
        with SpaceInvadersIntervention(tb) as iv:
            for shield in iv.game.shields:
                for row in shield.data:
                    for px in row:
                        px.a = 0


class JitterVary(BehavioralFixture):
    """Enemy-fire randomness (the jitter config knob) swept away from the
    training value (reference space_invaders.py:165-170)."""

    game = "space_invaders"
    max_frames = 8_000
    jitter = 1.0

    def intervene(self, tb):
        with SpaceInvadersIntervention(tb) as iv:
            iv.set_jitter(self.jitter)


class ShieldXs(BehavioralFixture):
    """Shields moved to shifted x positions."""

    game = "space_invaders"
    max_frames = 8_000
    xs = [60, 124, 188]

    def intervene(self, tb):
        cfg = tb.config_to_json()
        cfg["shields"] = [[x, 157] for x in self.xs]
        tb.write_config_json(cfg)
        tb.new_game()


SCENARIOS = [NoShields, JitterVary, ShieldXs]
