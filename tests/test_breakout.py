import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import toybox_tpu.games.breakout as bk
from toybox_tpu.core.actions import ACTION_LOOKUP
from toybox_tpu.core.types import Input
from toybox_tpu.ctoybox import Toybox

FIRE = Input(button1=True)
NOOP = Input()
LEFT = Input(left=True)
RIGHT = Input(right=True)


@pytest.fixture(scope="module")
def cfg():
    return bk.default_config()


def test_new_game_defaults(cfg):
    st = bk.new_game(cfg)
    assert int(st.lives) == 5
    assert int(st.score) == 0
    assert bool(st.reset) and bool(st.is_dead)
    assert float(st.paddle_x) == 120.0 and float(st.paddle_y) == 143.0
    assert float(st.paddle_width) == 24.0
    assert int(jnp.sum(st.brick_exists)) == 108
    assert int(bk.bricks_remaining(st)) == 108
    # serve ball parked at one of the four start positions
    assert bool(st.ball_alive[0])
    pos = (float(st.ball_x[0]), float(st.ball_y[0]))
    starts = list(zip(np.asarray(cfg.ball_start_x), np.asarray(cfg.ball_start_y)))
    assert any(np.allclose(pos, s) for s in starts)


def test_serve_and_motion(cfg):
    st = bk.new_game(cfg)
    st = bk.step(cfg, st, FIRE.as_arrays())
    assert not bool(st.reset) and not bool(st.is_dead)
    p0 = np.asarray([st.ball_x[0], st.ball_y[0]])
    st = bk.step(cfg, st, NOOP.as_arrays())
    p1 = np.asarray([st.ball_x[0], st.ball_y[0]])
    assert not np.allclose(p0, p1)
    # slow-speed magnitude
    v = np.asarray([st.ball_vx[0], st.ball_vy[0]])
    np.testing.assert_allclose(np.linalg.norm(v), 2.0, rtol=1e-5)


def test_paddle_moves_and_clamps(cfg):
    st = bk.new_game(cfg)
    x0 = float(st.paddle_x)
    st = bk.step(cfg, st, LEFT.as_arrays())
    assert float(st.paddle_x) == x0 - 4.0
    for _ in range(100):
        st = bk.step(cfg, st, LEFT.as_arrays())
    assert float(st.paddle_x) == pytest.approx(12.0 + 12.0)  # wall + half width
    for _ in range(200):
        st = bk.step(cfg, st, RIGHT.as_arrays())
    assert float(st.paddle_x) == pytest.approx(228.0 - 12.0)


def test_ball_eventually_hits_bricks_and_scores(cfg):
    st = bk.new_game(cfg, seed=3)
    st = bk.step(cfg, st, FIRE.as_arrays())
    step = jax.jit(bk.step)
    hit = False
    for _ in range(400):
        st = step(cfg, st, NOOP.as_arrays())
        if int(st.score) > 0:
            hit = True
            break
    assert hit, "ball never hit a brick in 400 frames"
    assert int(bk.bricks_remaining(st)) < 108


def test_life_lost_when_ball_exits_bottom(cfg):
    st = bk.new_game(cfg, seed=0)
    st = bk.step(cfg, st, FIRE.as_arrays())
    step = jax.jit(bk.step)
    # never move the paddle away from under serve? paddle at center; ball will
    # eventually miss since we don't track it
    lives0 = int(st.lives)
    died = False
    for _ in range(2000):
        st = step(cfg, st, LEFT.as_arrays())
        if int(st.lives) < lives0:
            died = True
            break
    assert died, "never lost a life with paddle parked at the wall"
    assert bool(st.reset) and bool(st.is_dead)
    assert bool(st.ball_alive[0])  # serve ball re-parked


def test_trajectory_determinism(cfg):
    def run():
        st = bk.new_game(cfg, seed=123)
        step = jax.jit(bk.step)
        recs = []
        for i in range(50):
            inp = FIRE if i % 7 == 0 else (LEFT if i % 3 == 0 else RIGHT)
            st = step(cfg, st, inp.as_arrays())
            recs.append((int(st.score), float(st.ball_x[0]),
                         float(st.ball_y[0]), float(st.paddle_x)))
        return recs

    assert run() == run()


def test_vmap_equals_single(cfg):
    """The reference's vec-env consistency test pattern
    (baselines common/vec_env/test_vec_env.py): vmapped step == per-env step."""
    n = 4
    seeds = [0, 1, 2, 3]
    states = [bk.new_game(cfg, seed=s) for s in seeds]
    batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)

    actions = [Input(button1=True), Input(left=True), Input(right=True), Input()]
    binp = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[a.as_arrays() for a in actions])

    vstep = jax.jit(jax.vmap(bk.step, in_axes=(None, 0, 0)))
    for _ in range(30):
        batched = vstep(cfg, batched, binp)
        states = [bk.step(cfg, s, a.as_arrays()) for s, a in zip(states, actions)]

    singles = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
    for a, b in zip(jax.tree_util.tree_leaves(batched),
                    jax.tree_util.tree_leaves(singles)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_json_roundtrip(cfg):
    st = bk.new_game(cfg, seed=5)
    st = bk.step(cfg, st, FIRE.as_arrays())
    for _ in range(20):
        st = bk.step(cfg, st, NOOP.as_arrays())
    js = bk.state_to_json(cfg, st)
    # required keys of the live schema
    assert set(bk.schema()["required"]) <= set(js.keys())
    assert len(js["bricks"]) == 108
    assert json.dumps(js)  # serializable
    st2 = bk.state_from_json(cfg, js)
    js2 = bk.state_to_json(cfg, st2)
    assert js == js2


def test_config_json_roundtrip(cfg):
    js = bk.config_to_json(cfg)
    cfg2 = bk.config_from_json(js)
    assert bk.config_to_json(cfg2) == js


def test_render_shapes_and_content(cfg):
    st = bk.new_game(cfg)
    img = np.asarray(bk.render(cfg, st))
    assert img.shape == (160, 240, 4)
    assert img.dtype == np.uint8
    # brick row 0 color appears
    assert (img[43:47, 12:24, :3] == [200, 72, 72]).all()
    # paddle drawn
    assert (img[143, 120, :3] == [200, 72, 72]).all()
    # frame color on the side wall
    assert (img[100, 5, :3] == [144, 144, 144]).all()


def test_toybox_facade():
    with Toybox("breakout") as tb:
        assert tb.get_lives() == 5
        assert tb.get_score() == 0
        assert tb.get_width() == 240 and tb.get_height() == 160
        assert tb.get_legal_action_set() == [0, 1, 3, 4]
        tb.apply_ale_action(ACTION_LOOKUP["FIRE"])
        frame = tb.get_state()
        assert frame.shape == (160, 240, 1)
        rgb = tb.get_rgb_frame()
        assert rgb.shape == (160, 240, 3)
        js = tb.to_state_json()
        tb.apply_ale_action(0)
        tb.write_state_json(js)
        assert tb.to_state_json() == js
        assert tb.rstate.breakout_bricks_remaining() == 108
        assert tb.rstate.breakout_channel_count() == 0
        cfg_js = tb.config_to_json()
        tb.write_config_json(cfg_js)
        assert tb.config_to_json() == cfg_js


def test_seeding_determinism_facade():
    tb1 = Toybox("breakout")
    tb1.set_seed(42)
    tb1.new_game()
    tb2 = Toybox("breakout")
    tb2.set_seed(42)
    tb2.new_game()
    for _ in range(10):
        tb1.apply_ale_action(1)
        tb2.apply_ale_action(1)
    assert tb1.to_state_json() == tb2.to_state_json()


def test_channel_count_query(cfg):
    st = bk.new_game(cfg)
    # kill column 0
    alive = np.asarray(st.brick_alive).copy()
    cols = np.asarray(st.brick_col)
    alive[cols == 0] = False
    st = st.replace(brick_alive=jnp.asarray(alive))
    assert int(bk.channel_count(st)) == 1
    assert int(bk.bricks_remaining(st)) == 102
