"""Amidar behavioral scenarios (reference behavior_tests.sh:10-13:
EnemyRemoval, OneEnemyTarget, GangUpNoJump)."""

from __future__ import annotations

import numpy as np

from toybox_tpu.interventions.amidar import (AmidarIntervention, Direction,
                                             MovementAI, TilePoint)
from toybox_tpu.sample_tests.base import BehavioralFixture


class EnemyRemoval(BehavioralFixture):
    """All enemies removed: the agent should paint freely (score must be
    at least as good as with enemies)."""

    game = "amidar"
    max_frames = 3_000

    def intervene(self, tb):
        with AmidarIntervention(tb) as iv:
            enemies = iv.game.enemies
            while len(enemies) > 0:
                enemies.remove(enemies[0])

    def should_end(self, tb, frame):
        return tb.game_over() or frame >= self.max_frames - 1


class OneEnemyTarget(BehavioralFixture):
    """A single enemy running the TargetPlayer protocol."""

    game = "amidar"
    max_frames = 5_000

    def intervene(self, tb):
        with AmidarIntervention(tb) as iv:
            enemies = iv.game.enemies
            while len(enemies) > 1:
                enemies.remove(enemies[-1])
            iv.set_enemy_protocol(
                enemies[0], MovementAI.EnemyTargetPlayer,
                start=TilePoint(iv, tx=0, ty=0),
                start_dir=Direction(iv, "Right"),
                vision_distance=15,
                dir=Direction(iv, "Right"),
                player_seen=None)


class GangUpNoJump(BehavioralFixture):
    """Every enemy targets the player and jumps are disabled."""

    game = "amidar"
    max_frames = 5_000

    def intervene(self, tb):
        with AmidarIntervention(tb) as iv:
            for e in iv.game.enemies:
                iv.set_enemy_protocol(
                    e, MovementAI.EnemyTargetPlayer,
                    start=TilePoint(iv, tx=0, ty=0),
                    start_dir=Direction(iv, "Right"),
                    vision_distance=31,
                    dir=Direction(iv, "Right"),
                    player_seen=None)
            iv.game.jumps = 0

    def check(self, scores):
        return True  # survival scenario: scoring at all is informative


SCENARIOS = [EnemyRemoval, OneEnemyTarget, GangUpNoJump]
