"""Space Invaders intervention tests (reference space_invaders.py __main__
assertions + jitter/mothership knobs)."""

import pytest

from toybox_tpu import Input, Toybox
from toybox_tpu.interventions.space_invaders import (SpaceInvaders,
                                                     SpaceInvadersIntervention)


@pytest.fixture()
def tb():
    return Toybox("space_invaders")


def test_dirty_state(tb):
    with SpaceInvadersIntervention(tb) as iv:
        iv.game.lives = 1
        assert iv.dirty_state
    assert tb.get_lives() == 1


def test_jitter_config_knob(tb):
    with SpaceInvadersIntervention(tb) as iv:
        assert iv.get_jitter() == 0.5
        iv.set_jitter(0.9)
        assert iv.dirty_config
    # config write forces a new game; knob persists
    with SpaceInvadersIntervention(tb) as iv:
        assert iv.get_jitter() == 0.9


def test_remove_mothership(tb):
    with SpaceInvadersIntervention(tb) as iv:
        iv.remove_mothership(0)
        assert iv.dirty_state
    with SpaceInvadersIntervention(tb) as iv:
        assert iv.game.ufo.appearance_counter == -1


def test_shield_sprite_mirror(tb):
    with SpaceInvadersIntervention(tb) as iv:
        shields = iv.game.shields
        assert len(shields) == 3
        # 18 rows x 16 cols of Colors (reference SpriteData)
        assert len(shields[0].data) == 18
        assert len(shields[0].data[0]) == 16
        assert shields[0].x == 84


def test_enemy_mirror_and_edit(tb):
    with SpaceInvadersIntervention(tb) as iv:
        assert len(iv.game.enemies) == 36
        assert iv.game.enemies[0].points == 30
        assert iv.game.enemies[35].points == 10
        iv.game.enemies[0].alive = False
        assert iv.dirty_state
    with SpaceInvadersIntervention(tb) as iv:
        assert not iv.game.enemies[0].alive


def test_get_player_and_movement_state(tb):
    with SpaceInvadersIntervention(tb) as iv:
        ship = iv.get_player()
        assert ship.x == 68 and ship.y == 185
        assert iv.game.enemies_movement.move_dir.direction in (
            "Left", "Right")


def test_roundtrip_decode_encode(tb):
    with SpaceInvadersIntervention(tb) as iv:
        js = iv.game.encode()
        g2 = SpaceInvaders.decode(iv, js, SpaceInvaders)
        assert g2.encode() == js
