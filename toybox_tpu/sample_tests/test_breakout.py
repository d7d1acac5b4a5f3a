"""Breakout behavioral scenarios (reference behavior_tests.sh:4-9:
EZChannel, LastBrick, PolarStarts)."""

from __future__ import annotations

import numpy as np

from toybox_tpu.interventions.breakout import BreakoutIntervention
from toybox_tpu.sample_tests.base import BehavioralFixture


class EZChannel(BehavioralFixture):
    """A channel is pre-cut; a competent agent exploits it to finish the
    board faster."""

    game = "breakout"
    channel_col = 3

    def intervene(self, tb):
        with BreakoutIntervention(tb) as iv:
            iv.add_channel(self.channel_col)


class LastBrick(BehavioralFixture):
    """Only one brick remains; the agent should clear it (generalization
    to a near-terminal state)."""

    game = "breakout"
    max_frames = 30_000

    def intervene(self, tb):
        with BreakoutIntervention(tb) as iv:
            for i, brick in enumerate(iv.game.bricks):
                brick.alive = (i == 50)

    def should_end(self, tb, frame):
        return (tb.game_over()
                or tb.rstate.breakout_bricks_remaining() == 0)

    def check(self, scores):
        # clearing the last brick scores its points
        return bool(np.any(np.asarray(scores) > 0))


class PolarStarts(BehavioralFixture):
    """Ball always serves from the far-left start position."""

    game = "breakout"

    def intervene(self, tb):
        cfg = tb.config_to_json()
        cfg["ball_start_positions"] = [
            {"x": 24.0, "y": 80.0, "angle_degrees": 30.0}]
        tb.write_config_json(cfg)
        tb.new_game()


SCENARIOS = [EZChannel, LastBrick, PolarStarts]
