"""Amidar engine tests.

Contract sources: reference test/interventions/test_amidar_interventions.py
(jump consumption, mode timers, tile tags), amidar_{state,config}_default.json
(board analysis: 60 junctions, 29 boxes, chase corners), and
toybox/interventions/amidar.py:508-518 (tile<->world queries).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import toybox_tpu.games.amidar as am
from toybox_tpu.core.types import Input

FIRE = Input(button1=True).as_arrays()
NOOP = Input().as_arrays()
UP = Input(up=True).as_arrays()
DOWN = Input(down=True).as_arrays()
LEFT = Input(left=True).as_arrays()


@pytest.fixture(scope="module")
def cfg():
    return am.default_config()


@pytest.fixture(scope="module")
def step():
    return jax.jit(am.step)


def test_board_analysis_matches_reference_defaults(cfg):
    # 60 junctions, 29 boxes, 4 chase junctions (reference default state)
    assert int(jnp.sum(cfg.junction_mask)) == 60
    assert int(jnp.sum(cfg.box_exists)) == 29
    chase = sorted(int(c) for c in np.asarray(cfg.chase_junctions) if c >= 0)
    assert chase == [0, 25, 768, 793]


def test_new_game_defaults(cfg):
    st = am.new_game(cfg)
    assert int(st.lives) == 3
    assert int(st.jumps) == 4
    assert int(st.score) == 0
    # player at tile (31, 15) -> world (1984, 1200) (reference default state)
    assert (int(st.player_x), int(st.player_y)) == (1984, 1200)
    assert int(jnp.sum(st.enemy_exists)) == 5


def test_fire_consumes_jump(cfg, step):
    # reference test_num_jumps: jumps == 3 after the setUp FIRE action
    st = am.new_game(cfg, seed=0)
    st = step(cfg, st, FIRE)
    assert int(st.jumps) == 3
    assert int(st.jump_timer) > 0
    # second FIRE while jump active does not consume another
    st = step(cfg, st, FIRE)
    assert int(st.jumps) == 3


def test_jump_timer_expires(cfg, step):
    st = am.new_game(cfg, seed=0)
    st = step(cfg, st, FIRE)
    t0 = int(st.jump_timer)
    for _ in range(t0 + 1):
        st = step(cfg, st, NOOP)
    assert int(st.jump_timer) == 0


def test_player_paints_and_scores(cfg, step):
    st = am.new_game(cfg, seed=0)
    s0 = int(st.score)
    for _ in range(30):
        st = step(cfg, st, UP)
    assert int(st.score) > s0
    tiles = np.asarray(st.tiles)
    assert (tiles == am.PAINTED).sum() > (np.asarray(cfg.base_tiles) == am.PAINTED).sum()


def test_player_stops_at_wall(cfg, step):
    st = am.new_game(cfg, seed=0)
    # player starts on the right edge column; moving further right is blocked
    from toybox_tpu.core.types import Input as I
    RIGHT_IN = I(right=True).as_arrays()
    p0 = (int(st.player_x), int(st.player_y))
    st = step(cfg, st, RIGHT_IN)
    assert (int(st.player_x), int(st.player_y)) == p0


def test_enemies_move(cfg, step):
    st = am.new_game(cfg, seed=0)
    e0 = np.stack([np.asarray(st.enemy_x), np.asarray(st.enemy_y)], -1)
    for _ in range(20):
        st = step(cfg, st, NOOP)
    e1 = np.stack([np.asarray(st.enemy_x), np.asarray(st.enemy_y)], -1)
    moved = (e0 != e1).any(axis=1)
    assert moved[:5].all(), f"all default enemies should move, got {moved}"


def test_enemies_stay_on_track(cfg, step):
    st = am.new_game(cfg, seed=0)
    walk = (np.asarray(cfg.base_tiles) != am.EMPTY).reshape(am.BOARD_H,
                                                             am.BOARD_W)
    for i in range(120):
        st = step(cfg, st, NOOP)
        txs = np.asarray(am._tx_of(st.enemy_x))
        tys = np.asarray(am._ty_of(st.enemy_y))
        for e in range(5):
            tx, ty = txs[e], tys[e]
            assert walk[ty, tx], f"enemy {e} off track at {(tx, ty)} frame {i}"


def test_mode_predicates(cfg, step):
    st = am.new_game(cfg, seed=0)
    assert am.query(cfg, st, "regular_mode")
    st = step(cfg, st, FIRE)
    assert am.query(cfg, st, "jump_mode")
    assert not am.query(cfg, st, "regular_mode")


def test_tile_world_queries(cfg):
    st = am.new_game(cfg)
    assert am.query(cfg, st, "tile_to_world", {"tx": 31, "ty": 15}) == [1984, 1200]
    assert am.query(cfg, st, "world_to_tile", {"x": 1984, "y": 1200}) == [31, 15]
    # inverse on every junction
    for tid in np.asarray(cfg.junction_ids):
        if tid < 0:
            continue
        tx, ty = int(tid % 32), int(tid // 32)
        w = am.query(cfg, st, "tile_to_world", {"tx": tx, "ty": ty})
        assert am.query(cfg, st, "world_to_tile", {"x": w[0], "y": w[1]}) == [tx, ty]


def test_json_roundtrip(cfg, step):
    st = am.new_game(cfg, seed=7)
    st = step(cfg, st, FIRE)
    for _ in range(17):
        st = step(cfg, st, UP)
    js = am.state_to_json(cfg, st)
    # required keys of the live schema
    for k in am.schema()["required"]:
        assert k in js, k
    st2 = am.state_from_json(cfg, js)
    js2 = am.state_to_json(cfg, st2)
    assert json.dumps(js, sort_keys=True) == json.dumps(js2, sort_keys=True)


def test_trajectory_continues_identically_after_roundtrip(cfg, step):
    st = am.new_game(cfg, seed=11)
    for _ in range(25):
        st = step(cfg, st, UP)
    st2 = am.state_from_json(cfg, am.state_to_json(cfg, st))
    for _ in range(25):
        st = step(cfg, st, LEFT)
        st2 = step(cfg, st2, LEFT)
    assert int(st.player_x) == int(st2.player_x)
    assert int(st.player_y) == int(st2.player_y)
    np.testing.assert_array_equal(np.asarray(st.enemy_x),
                                  np.asarray(st2.enemy_x))
    np.testing.assert_array_equal(np.asarray(st.enemy_y),
                                  np.asarray(st2.enemy_y))
    assert int(st.score) == int(st2.score)


def test_determinism_same_seed(cfg, step):
    st1 = am.new_game(cfg, seed=5)
    st2 = am.new_game(cfg, seed=5)
    for _ in range(50):
        st1 = step(cfg, st1, UP)
        st2 = step(cfg, st2, UP)
    assert int(st1.score) == int(st2.score)
    np.testing.assert_array_equal(np.asarray(st1.enemy_x),
                                  np.asarray(st2.enemy_x))


def test_box_completion_scores_bonus(cfg):
    """Painting every perimeter tile of a box pays box_bonus."""
    st = am.new_game(cfg, seed=0)
    # paint box 0's perimeter directly in state, then step once
    mask = np.asarray(cfg.box_masks[:, 0]) > 0
    tiles = np.asarray(st.tiles).copy()
    tiles[mask] = am.PAINTED
    st = st.replace(tiles=jnp.asarray(tiles))
    s0 = int(st.score)
    st = am.step(cfg, st, NOOP)
    assert bool(st.box_painted[0])
    assert int(st.score) >= s0 + int(cfg.box_bonus)


def test_chase_mode_catching(cfg):
    st = am.new_game(cfg, seed=0)
    st = st.replace(chase_timer=jnp.asarray(100, jnp.int32))
    # teleport enemy 0 onto the player
    st = st.replace(enemy_x=st.enemy_x.at[0].set(st.player_x),
                    enemy_y=st.enemy_y.at[0].set(st.player_y))
    s0 = int(st.score)
    st = am.step(cfg, st, NOOP)
    assert int(st.score) >= s0 + int(cfg.chase_score_bonus)
    assert bool(st.enemy_caught[0])
    assert int(st.lives) == 3  # no death in chase mode


def test_regular_collision_costs_life(cfg):
    st = am.new_game(cfg, seed=0)
    st = st.replace(enemy_x=st.enemy_x.at[0].set(st.player_x),
                    enemy_y=st.enemy_y.at[0].set(st.player_y))
    st = am.step(cfg, st, NOOP)
    assert int(st.lives) == 2
    # positions reset
    assert (int(st.player_x), int(st.player_y)) == (1984, 1200)


def test_jump_protects(cfg):
    st = am.new_game(cfg, seed=0)
    st = st.replace(jump_timer=jnp.asarray(50, jnp.int32))
    st = st.replace(enemy_x=st.enemy_x.at[0].set(st.player_x),
                    enemy_y=st.enemy_y.at[0].set(st.player_y))
    st = am.step(cfg, st, NOOP)
    assert int(st.lives) == 3


def test_vmap_matches_single(cfg):
    """vmapped step == single-env step (the reference test_vec_env pattern)."""
    n = 4
    seeds = jnp.arange(n, dtype=jnp.uint32)
    sts = jax.vmap(lambda s: am.new_game(cfg, seed=s))(seeds)
    singles = [am.new_game(cfg, seed=i) for i in range(n)]
    vstep = jax.jit(jax.vmap(am.step, in_axes=(None, 0, None)))
    sstep = jax.jit(am.step)
    for _ in range(10):
        sts = vstep(cfg, sts, UP)
        singles = [sstep(cfg, s, UP) for s in singles]
    for i in range(n):
        assert int(sts.player_x[i]) == int(singles[i].player_x)
        assert int(sts.player_y[i]) == int(singles[i].player_y)
        np.testing.assert_array_equal(np.asarray(sts.enemy_x[i]),
                                      np.asarray(singles[i].enemy_x))


def test_render_shape_and_content(cfg):
    st = am.new_game(cfg, seed=0)
    img = np.asarray(am.render(cfg, st))
    assert img.shape == (am.HEIGHT, am.WIDTH, 4)
    assert img.dtype == np.uint8
    # track pixels present (unpainted color)
    un = np.asarray(cfg.unpainted_color)
    assert (img == un).all(axis=-1).sum() > 1000
    # player sprite present
    pc = np.asarray(cfg.player_color)
    assert (img == pc).all(axis=-1).sum() > 0
