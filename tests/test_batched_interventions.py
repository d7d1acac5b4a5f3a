"""Batched jit-compatible intervention tests: the reference's property
paths applied across the env axis (SURVEY §7.4)."""

import jax
import jax.numpy as jnp
import numpy as np

import toybox_tpu.games.breakout as bk
from toybox_tpu.core.types import Input
from toybox_tpu.interventions.batched import batched_get, batched_set


def _states(n=4):
    cfg = bk.default_config()
    return cfg, jax.vmap(lambda s: bk.new_game(cfg, seed=s))(
        jnp.arange(n, dtype=jnp.uint32))


def test_batched_get_set_scalar_field():
    cfg, sts = _states()
    lives = batched_get(sts, "breakout", "lives")
    np.testing.assert_array_equal(np.asarray(lives), [5, 5, 5, 5])
    sts = batched_set(sts, "breakout", "lives", 2)
    np.testing.assert_array_equal(np.asarray(sts.lives), [2, 2, 2, 2])


def test_batched_set_per_env_values_and_mask():
    cfg, sts = _states()
    xs = jnp.asarray([30.0, 60.0, 90.0, 120.0])
    sts = batched_set(sts, "breakout", "paddle.position.x", xs,
                      env_mask=jnp.asarray([True, False, True, False]))
    np.testing.assert_allclose(np.asarray(sts.paddle_x),
                               [30.0, 120.0, 90.0, 120.0])


def test_batched_brick_edit_under_jit():
    cfg, sts = _states()

    @jax.jit
    def cut_channel(states):
        # kill bricks of column 0 (indices 0..5 in the col-major layout)
        for i in range(6):
            states = batched_set(states, "breakout",
                                 f"bricks[{i}].alive", False)
        return states

    sts = cut_channel(sts)
    assert int(bk.channel_count(jax.tree_util.tree_map(
        lambda a: a[0], sts))) == 1
    assert np.asarray(batched_get(sts, "breakout", "bricks[3].alive")).sum() == 0


def test_batched_edit_persists_through_step():
    cfg, sts = _states()
    sts = batched_set(sts, "breakout", "bricks[10].alive", False)
    vstep = jax.jit(jax.vmap(bk.step, in_axes=(None, 0, None)))
    sts = vstep(cfg, sts, Input().as_arrays())
    assert not np.asarray(sts.brick_alive)[:, 10].any()


def test_unknown_path_raises():
    cfg, sts = _states()
    try:
        batched_set(sts, "breakout", "no.such.path", 0)
        assert False
    except KeyError:
        pass


def test_amidar_and_si_paths():
    import toybox_tpu.games.amidar as am
    import toybox_tpu.games.space_invaders as si

    acfg = am.default_config()
    asts = jax.vmap(lambda s: am.new_game(acfg, seed=s))(
        jnp.arange(2, dtype=jnp.uint32))
    asts = batched_set(asts, "amidar", "jumps", 9)
    assert np.asarray(batched_get(asts, "amidar", "jumps")).tolist() == [9, 9]
    asts = batched_set(asts, "amidar", "enemies[0].position.x", 640)
    assert np.asarray(asts.enemy_x)[:, 0].tolist() == [640, 640]

    scfg = si.default_config()
    ssts = jax.vmap(lambda s: si.new_game(scfg, seed=s))(
        jnp.arange(2, dtype=jnp.uint32))
    ssts = batched_set(ssts, "space_invaders", "enemies[3].alive", False)
    assert not np.asarray(ssts.enemy_alive)[:, 3].any()
    ssts = batched_set(ssts, "space_invaders", "enemies[3].x", 77)
    assert np.asarray(batched_get(ssts, "space_invaders",
                                  "enemies[3].x")).tolist() == [77, 77]
