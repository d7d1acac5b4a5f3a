import jax
import jax.numpy as jnp
import numpy as np

import toybox_tpu.games.gridworld as gw
from toybox_tpu.core.types import Input

UP = Input(up=True)
DOWN = Input(down=True)
LEFT = Input(left=True)
RIGHT = Input(right=True)
NOOP = Input()


def test_default_layout():
    cfg = gw.default_config()
    st = gw.new_game(cfg)
    assert st.grid.shape == (7, 9)
    assert np.asarray(st.player).tolist() == [2, 4]
    assert int(st.score) == 0 and not bool(st.game_over)


def test_wall_blocks():
    cfg = gw.default_config()
    st = gw.new_game(cfg)
    # player at (2,4); tile above (2,3)... grid row3 = "100010001": col2='0' walkable
    st2 = gw.step(cfg, st, LEFT.as_arrays())
    assert np.asarray(st2.player).tolist() == [1, 4]
    st3 = gw.step(cfg, st2, LEFT.as_arrays())  # col0 is wall '1'
    assert np.asarray(st3.player).tolist() == [1, 4]


def test_reward_consumed_once():
    cfg = gw.default_config()
    st = gw.new_game(cfg)
    # reward 'R' at row4 col5 ("10001R111"): walk right from (2,4)->(3,4)->... (3,4) is '0'? row4: 1 0 0 0 1 R 1 1 1
    # path: (2,4) -> (2,3)? use known reward at (5,1) row1 "1000R0001" col4='R'? row1 col4 R at (4,1)
    # navigate: (2,4) up to (2,3) '0', up (2,2)? row2="101111101" col2='1' wall. Use left column x=1: (1,4),(1,3),(1,2),(1,1) then right to (4,1)
    moves = [LEFT, UP, UP, UP, RIGHT, RIGHT, RIGHT]
    for m in moves:
        st = gw.step(cfg, st, m.as_arrays())
    assert np.asarray(st.player).tolist() == [4, 1]
    assert int(st.score) == 1  # collected the R tile
    # step off and back: no double reward
    st = gw.step(cfg, st, LEFT.as_arrays())
    st = gw.step(cfg, st, RIGHT.as_arrays())
    assert int(st.score) == 1


def test_goal_ends_game():
    cfg = gw.default_config()
    st = gw.new_game(cfg)
    # goal at row5 "1000100G1" col7 -> (7,5); path from (2,4): down (2,5)? row5 col2='0' ok, right 3,5? row5="1000100G1": cols 1,2,3 '0', col4 '1'...
    # route: (2,4)->(2,5)->(3,5)-> blocked (4,5)='1'. go row4? (3,4)? row4 col3='0'
    # simpler: teleport player next to goal via state surgery
    st = st.replace(player=jnp.asarray([6, 5], jnp.int32))
    code = int(np.asarray(st.grid)[5, 6])
    assert bool(np.asarray(st.tile_walkable)[code])
    st = gw.step(cfg, st, RIGHT.as_arrays())
    assert np.asarray(st.player).tolist() == [7, 5]
    assert bool(st.game_over)
    assert int(st.score) == 10
    assert int(st.lives) == 0
    # frozen after game over
    st2 = gw.step(cfg, st, LEFT.as_arrays())
    assert np.asarray(st2.player).tolist() == [7, 5]


def test_vmap_batch():
    cfg = gw.default_config()
    n = 8
    st = jax.vmap(lambda _: gw.new_game(cfg))(jnp.arange(n))
    acts = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[(LEFT if i % 2 else RIGHT).as_arrays() for i in range(n)])
    st2 = jax.jit(jax.vmap(gw.step, in_axes=(None, 0, 0)))(cfg, st, acts)
    players = np.asarray(st2.player)
    assert (players[0::2] == [3, 4]).all()
    assert (players[1::2] == [1, 4]).all()


def test_json_roundtrip():
    cfg = gw.default_config()
    st = gw.new_game(cfg)
    st = gw.step(cfg, st, LEFT.as_arrays())
    js = gw.state_to_json(cfg, st)
    st2 = gw.state_from_json(cfg, js)
    assert gw.state_to_json(cfg, st2) == js
    cjs = gw.config_to_json(cfg)
    cfg2 = gw.config_from_json(cjs)
    assert gw.config_to_json(cfg2) == cjs


def test_render():
    cfg = gw.default_config()
    st = gw.new_game(cfg)
    img = np.asarray(gw.render(cfg, st))
    assert img.shape == (7 * gw.TILE_PX, 9 * gw.TILE_PX, 4)
    # player cell is red
    px, py = 2 * gw.TILE_PX + 2, 4 * gw.TILE_PX + 2
    assert img[py, px, 0] == 255 and img[py, px, 1] == 0
