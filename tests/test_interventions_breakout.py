"""Port of reference test/interventions/test_breakout_interventions.py,
test_equality.py, and test_get_property.py."""

import pytest

import toybox_tpu.interventions.breakout as breakout
from toybox_tpu import Input, Toybox
from toybox_tpu.interventions.base import (InterventionNoneError,
                                           MutationError, SetEq)
from toybox_tpu.interventions.breakout import (Breakout, BreakoutIntervention,
                                               Brick, BrickCollection)
from toybox_tpu.interventions.core import (Color, get_property,
                                           parse_property_access)


@pytest.fixture()
def tb():
    tb = Toybox("breakout")
    tb.apply_action(Input(button1=True))
    return tb


def test_allowable_interventions(tb):
    with BreakoutIntervention(tb) as intervention:
        with pytest.raises(InterventionNoneError):
            intervention.game.paddle.intervention = None
        with pytest.raises(MutationError):
            intervention.game.paddle.intervention = intervention
        with pytest.raises(MutationError):
            intervention.game.paddle._in_init = True
        assert "intervention" in intervention.game.paddle.immutable_fields
        assert "_in_init" not in intervention.game.paddle.immutable_fields


def test_dirty_state(tb):
    with BreakoutIntervention(tb) as intervention:
        intervention.game.lives = 1
        assert intervention.dirty_state
        assert not intervention.dirty_config


def test_not_dirty_state(tb):
    with BreakoutIntervention(tb) as intervention:
        _ = intervention.game.lives
        assert not intervention.dirty_state
        assert not intervention.dirty_config


def test_removal_from_collection(tb):
    with BreakoutIntervention(tb) as intervention:
        nbricks = intervention.num_bricks_remaining()
        intervention.game.bricks[0].alive = False
        assert intervention.num_bricks_remaining() == nbricks - 1
    with BreakoutIntervention(tb) as intervention:
        nbricks = intervention.num_bricks_remaining()
        intervention.game.bricks[0].alive = True
        assert intervention.num_bricks_remaining() == nbricks + 1


def test_channel_manipulation(tb):
    with BreakoutIntervention(tb) as intervention:
        nbricks = intervention.num_bricks_remaining()
        intervention.add_channel(0)
        assert intervention.num_bricks_remaining() == \
            nbricks - intervention.num_rows()
        col, channel = intervention.find_channel()
        assert channel is not None
        assert intervention.channel_count() == 1
    # engine agrees (native query surface)
    assert tb.rstate.breakout_channel_count() == 1
    with BreakoutIntervention(tb) as intervention:
        nbricks = intervention.num_bricks_remaining()
        intervention.fill_column(0)
        assert intervention.num_bricks_remaining() == \
            nbricks + intervention.num_rows()


def test_brick_color_change(tb):
    with BreakoutIntervention(tb) as intervention:
        g_from = intervention.game.bricks[50].color.g
        intervention.game.bricks[50].color.g = 77
        g_to = intervention.game.bricks[50].color.g
    with BreakoutIntervention(tb) as intervention:
        g_check = intervention.game.bricks[50].color.g
    assert g_from != g_to
    assert g_to == g_check == 77


def test_get_ball_position_multiball(tb):
    with BreakoutIntervention(tb) as intervention:
        game = intervention.game
        assert len(game.balls) > 0
        ball = game.balls[0]
        game.balls.append(ball)
        assert len(intervention.get_ball_position()) == 2
        assert len(intervention.get_ball_velocity()) == 2
        game.balls.clear()
        game.balls.append(ball)
        intervention.get_ball_position()


def test_move_diagonally(tb):
    with BreakoutIntervention(tb) as intervention:
        ball_pos = intervention.get_ball_position()
        ball_pos.x = ball_pos.x + 1
        ball_pos.y = ball_pos.y + 1
    with BreakoutIntervention(tb) as intervention:
        ball_pos_post = intervention.get_ball_position()
        assert ball_pos_post.x == ball_pos.x


def test_change_ball_velocity(tb):
    with BreakoutIntervention(tb) as intervention:
        ball_vel = intervention.get_ball_velocity()
        ball_vel.x = ball_vel.x + 1
        ball_vel.y = ball_vel.y + 1
        assert intervention.get_ball_velocity().x == ball_vel.x


def test_move_paddle(tb):
    with BreakoutIntervention(tb) as intervention:
        pos = intervention.get_paddle_position()
        assert pos.x == pytest.approx(120.0)
        assert pos.y == pytest.approx(143.0)
        pos.x = pos.x + 10
        assert intervention.get_paddle_position().x == pytest.approx(pos.x)


def test_paddle_velocity_pins_y():
    tb = Toybox("breakout")
    with BreakoutIntervention(tb) as intervention:
        from toybox_tpu.interventions.core import Vec2D
        v = Vec2D.decode(intervention, {"x": 3.0, "y": 5.0}, Vec2D)
        intervention.game.paddle.velocity = v
        assert intervention.game.paddle.velocity.y == 0.0


# -- equality (reference test_equality.py) ---------------------------------

def test_standard_eq():
    with Toybox("breakout") as tb:
        tb.apply_action(Input(button1=True))
        with BreakoutIntervention(tb) as iv:
            s1 = iv.game
        with BreakoutIntervention(tb) as iv:
            s2 = iv.game
        with BreakoutIntervention(tb) as iv:
            iv.game.paddle_speed = 10
            s3 = iv.game
    assert s1 == s2
    assert s1 != s3
    assert s2 != s3


def test_set_eq():
    states = []
    for dspeed, dlives in [(0, 0), (0, 0), (1, 1), (1, 1), (2, 1)]:
        with Toybox("breakout") as tb:
            with BreakoutIntervention(tb, eq_mode=SetEq) as iv:
                iv.game.paddle_speed += dspeed
                iv.game.lives += dlives
                states.append(iv.game)
    initial, initial_copy, iv1, iv2, iv3 = states
    assert initial == initial_copy
    assert initial != iv1
    assert iv1 == iv2
    assert iv1 != iv3


def test_set_eq_diff_propagates():
    with Toybox("breakout") as tb:
        with BreakoutIntervention(tb, eq_mode=SetEq) as iv:
            s1 = Breakout.decode(iv, iv.game.encode(), Breakout)
            iv.game.bricks[50].color.g = 99
            s2 = Breakout.decode(iv, iv.game.encode(), Breakout)
    assert s1.bricks[49].color == s2.bricks[49].color
    assert s1.bricks[50].color != s2.bricks[50].color
    assert s1.bricks[49] == s2.bricks[49]
    assert s1.bricks[50] != s2.bricks[50]
    assert s1.bricks != s2.bricks
    assert s1 != s2
    diff = (s1.eq_mode(s1) == s2.eq_mode(s2))
    assert len(diff.differs) > 0


# -- property paths (reference test_get_property.py) ------------------------

def test_get_property_simple(tb):
    with BreakoutIntervention(tb) as iv:
        game = iv.game
        assert isinstance(get_property(game, "bricks"), BrickCollection)
        assert isinstance(get_property(game, "bricks[1]"), Brick)
        assert get_property(game, "bricks[1].col") == 0


def test_set_property(tb):
    with BreakoutIntervention(tb) as iv:
        game = iv.game
        assert get_property(game, "bricks[0].color.r", setval=72) == 72
        assert game.bricks[0].color.r == 72
        assert game.bricks[1].color.r != 72


def test_set_property_zero(tb):
    with BreakoutIntervention(tb) as iv:
        assert get_property(iv.game, "bricks[107].points", setval=0) == 0


def test_get_parent(tb):
    with BreakoutIntervention(tb) as iv:
        game = iv.game
        c = get_property(game, "bricks[0].color.r", setval=42,
                         get_container=True)
        assert isinstance(c, Color)
        assert c.r == 42
        bkout = get_property(game, "paddle_speed", setval=100.0,
                             get_container=True)
        assert isinstance(bkout, Breakout)
        assert bkout.paddle_speed == 100.0


def test_set_at_index(tb):
    with BreakoutIntervention(tb) as iv:
        game = iv.game
        new_brick = Brick.decode(iv, game.bricks[2].encode(), Brick)
        old_brick = game.bricks[1]
        assert new_brick != old_brick
        foo = get_property(game, "bricks[1]", setval=new_brick)
        assert isinstance(foo, Brick)
        assert foo == new_brick


def test_property_parsing():
    assert parse_property_access("abc.def[7][8].y[5]") == \
        ["abc", "def", 7, 8, "y", 5]


def test_set_partial_config(tb, tmp_path):
    import json
    f = tmp_path / "partial.json"
    f.write_text(json.dumps({"start_lives": 2}))
    with BreakoutIntervention(tb) as iv:
        iv.set_partial_config(str(f))
        assert iv.dirty_config
    # dirty config forces a new game with the merged config
    assert tb.get_lives() == 2
