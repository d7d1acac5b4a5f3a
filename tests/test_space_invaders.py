"""Space Invaders engine tests.

Contract sources: reference space_invaders_{state,config}_default.json
(formation layout, shield geometry, timers), toybox/interventions/
space_invaders.py (schema keys, jitter knob, remove_mothership).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import toybox_tpu.games.space_invaders as si
from toybox_tpu.core.types import Input

FIRE = Input(button1=True).as_arrays()
NOOP = Input().as_arrays()
LEFT = Input(left=True).as_arrays()
RIGHT = Input(right=True).as_arrays()


@pytest.fixture(scope="module")
def cfg():
    return si.default_config()


@pytest.fixture(scope="module")
def step():
    return jax.jit(si.step)


def run_intro(cfg, step, st):
    """Burn through the life_display_timer intro pause."""
    for _ in range(129):
        st = step(cfg, st, NOOP)
    return st


def test_new_game_defaults(cfg):
    st = si.new_game(cfg)
    assert int(st.lives) == 3
    assert int(st.score) == 0
    assert int(st.life_display_timer) == 128
    assert int(st.enemy_shot_delay) == 50
    assert not bool(st.ship_alive)          # alive after the intro pause
    assert int(st.ship_x) == 68 and int(st.ship_y) == 185
    assert int(jnp.sum(st.enemy_alive)) == 36
    # formation layout from the reference default state
    ex = np.asarray(st.enemy_x)
    ey = np.asarray(st.enemy_y)
    assert (ex[0], ey[0]) == (44, 31)
    assert (ex[35], ey[35]) == (44 + 5 * 32, 31 + 5 * 18)
    assert int(st.ufo_appearance_counter) == 500
    # shields: full reference mask
    assert st.shield_alpha.shape == (3, si.SHIELD_H, si.SHIELD_W)
    assert bool(jnp.all(st.shield_alpha == jnp.asarray(si.SHIELD_MASK)))


def test_intro_pause_then_ship_alive(cfg, step):
    st = si.new_game(cfg, seed=0)
    x0 = int(st.ship_x)
    st = step(cfg, st, RIGHT)
    assert int(st.ship_x) == x0          # frozen during intro
    st = run_intro(cfg, step, st)
    assert bool(st.ship_alive)
    st = step(cfg, st, RIGHT)
    assert int(st.ship_x) == x0 + 3      # speed 3


def test_ship_fires_single_laser(cfg, step):
    st = run_intro(cfg, step, si.new_game(cfg, seed=0))
    st = step(cfg, st, FIRE)
    assert bool(st.ship_laser_alive)
    y0 = int(st.ship_laser_y)
    st = step(cfg, st, FIRE)             # second FIRE: still only one laser
    assert int(st.ship_laser_y) == y0 - si.SHIP_LASER_SPEED


def test_laser_kills_enemy_and_scores(cfg, step):
    st = run_intro(cfg, step, si.new_game(cfg, seed=0))
    n0 = int(jnp.sum(st.enemy_alive))
    frames = 0
    while int(st.score) == 0 and frames < 600:
        st = step(cfg, st, FIRE)
        frames += 1
    assert int(st.score) > 0, "firing straight up never scored"
    assert int(jnp.sum(st.enemy_alive)) < n0


def test_bottom_row_scores_10(cfg, step):
    # bottom row (row 5) is directly above the ship; row_scores[5] == 10
    st = run_intro(cfg, step, si.new_game(cfg, seed=0))
    # park the ship under enemy col 0 (x=44) and fire
    st = st.replace(ship_x=jnp.asarray(44, jnp.int32))
    s0 = int(st.score)
    for _ in range(40):
        st = si.step(cfg, st, FIRE)
        if int(st.score) > s0:
            break
    assert int(st.score) - s0 in (10, 20)  # bottom rows worth 10/20


def test_march_advances_and_reverses(cfg, step):
    st = run_intro(cfg, step, si.new_game(cfg, seed=0))
    x0 = np.asarray(st.enemy_x).copy()
    dirs = set()
    lowest = int(np.asarray(st.enemy_y).max())
    for _ in range(4000):
        st = step(cfg, st, NOOP)
        dirs.add(int(st.move_dir))
        if len(dirs) == 2 and int(np.asarray(st.enemy_y).max()) > lowest:
            break
    x1 = np.asarray(st.enemy_x)
    assert (x1 != x0).any()
    assert {si.LEFT_D, si.RIGHT_D} <= dirs, "formation should reverse"
    assert int(np.asarray(st.enemy_y).max()) > lowest, "should drop"


def test_enemy_fire_and_ship_death(cfg, step):
    st = run_intro(cfg, step, si.new_game(cfg, seed=3))
    lost = False
    for _ in range(2000):
        st = step(cfg, st, NOOP)
        if int(st.lives) < 3:
            lost = True
            break
    assert lost, "parked ship was never hit by enemy fire"
    assert int(st.ship_death_counter) >= 0 or bool(st.ship_alive)


def test_shield_damage(cfg, step):
    st = run_intro(cfg, step, si.new_game(cfg, seed=0))
    # park the ship under shield 0 (x=84..100) and fire into it
    st = st.replace(ship_x=jnp.asarray(84, jnp.int32))
    cells0 = int(jnp.sum(st.shield_alpha))
    st = step(cfg, st, FIRE)
    for _ in range(9):
        st = step(cfg, st, NOOP)
    cells1 = int(jnp.sum(st.shield_alpha))
    assert cells1 < cells0, "ship laser should erode the shield"
    assert not bool(st.ship_laser_alive)


def test_json_roundtrip(cfg, step):
    st = run_intro(cfg, step, si.new_game(cfg, seed=5))
    for _ in range(80):
        st = step(cfg, st, FIRE)
    js = si.state_to_json(cfg, st)
    for k in si.schema()["required"]:
        assert k in js, k
    st2 = si.state_from_json(cfg, js)
    js2 = si.state_to_json(cfg, st2)
    assert json.dumps(js, sort_keys=True) == json.dumps(js2, sort_keys=True)


def test_trajectory_continues_after_roundtrip(cfg, step):
    st = run_intro(cfg, step, si.new_game(cfg, seed=9))
    for _ in range(50):
        st = step(cfg, st, FIRE)
    st2 = si.state_from_json(cfg, si.state_to_json(cfg, st))
    for _ in range(50):
        st = step(cfg, st, LEFT)
        st2 = step(cfg, st2, LEFT)
    assert int(st.score) == int(st2.score)
    np.testing.assert_array_equal(np.asarray(st.enemy_x),
                                  np.asarray(st2.enemy_x))
    np.testing.assert_array_equal(np.asarray(st.enemy_y),
                                  np.asarray(st2.enemy_y))
    assert int(st.ship_x) == int(st2.ship_x)


def test_config_roundtrip(cfg):
    js = si.config_to_json(cfg)
    assert js["jitter"] == 0.5
    assert js["enemy_protocol"] == "TargetPlayer"
    assert js["shields"] == [[84, 157], [148, 157], [212, 157]]
    cfg2 = si.config_from_json(js)
    assert si.config_to_json(cfg2) == js


def test_vmap_matches_single(cfg):
    n = 3
    sts = jax.vmap(lambda s: si.new_game(cfg, seed=s))(
        jnp.arange(n, dtype=jnp.uint32))
    singles = [si.new_game(cfg, seed=i) for i in range(n)]
    vstep = jax.jit(jax.vmap(si.step, in_axes=(None, 0, None)))
    sstep = jax.jit(si.step)
    for _ in range(140):
        sts = vstep(cfg, sts, FIRE)
        singles = [sstep(cfg, s, FIRE) for s in singles]
    for i in range(n):
        assert int(sts.score[i]) == int(singles[i].score)
        np.testing.assert_array_equal(np.asarray(sts.enemy_x[i]),
                                      np.asarray(singles[i].enemy_x))
        np.testing.assert_array_equal(np.asarray(sts.enemy_y[i]),
                                      np.asarray(singles[i].enemy_y))


def test_render(cfg, step):
    st = run_intro(cfg, step, si.new_game(cfg, seed=0))
    img = np.asarray(si.render(cfg, st))
    assert img.shape == (si.HEIGHT, si.WIDTH, 4)
    # shields visible
    sc = si.SHIELD_COLOR
    assert (img == sc).all(axis=-1).sum() == int(jnp.sum(st.shield_alpha)) \
        or (img == sc).all(axis=-1).sum() > 0
