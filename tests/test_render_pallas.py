"""Pallas renderer + matmul warp parity vs the XLA path (interpret mode
on the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np

import toybox_tpu.games.breakout as bk
from toybox_tpu.games.common import luma2d
from toybox_tpu.ops.obs import warp_frame2d
from toybox_tpu.ops.render_pallas import (make_breakout_gray_renderer,
                                          warp_matmul)


def test_pallas_render_matches_xla():
    n = 4
    cfg = bk.default_config()
    states = jax.vmap(lambda s: bk.new_game(cfg, seed=s))(
        jnp.arange(n, dtype=jnp.uint32))
    states = states.replace(reset=jnp.zeros(n, bool))
    # knock out some bricks so the grid path is exercised
    alive = np.asarray(states.brick_alive).copy()
    alive[:, 10:30] = False
    states = states.replace(brick_alive=jnp.asarray(alive))

    f_pl = np.asarray(make_breakout_gray_renderer(cfg, interpret=True)(states))
    f_xla = np.asarray(jax.vmap(lambda s: luma2d(bk.render(cfg, s)))(states))
    diff = np.abs(f_pl.astype(int) - f_xla.astype(int))
    assert diff.max() <= 1, f"pallas render mismatch: max {diff.max()}"


def test_warp_matmul_matches_resize():
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (3, 160, 240), np.uint8))
    a = np.asarray(warp_frame2d(frames, 84)).astype(int)
    b = np.asarray(warp_matmul(frames, 84)).astype(int)
    assert np.abs(a - b).max() <= 1


def test_pipeline_pallas_interpret_matches_xla():
    from toybox_tpu.envs.pipeline import make_rl_env

    n = 2
    seeds = jnp.arange(n, dtype=jnp.uint32)
    acts = jnp.ones(n, jnp.int32)
    env_x = make_rl_env("breakout", n, use_pallas=False)
    env_p = make_rl_env("breakout", n, use_pallas=True)
    sx, ox = env_x.reset(seeds)
    sp, op = env_p.reset(seeds)
    np.testing.assert_allclose(np.asarray(ox).astype(int),
                               np.asarray(op).astype(int), atol=1)
    for _ in range(3):
        sx, ox, rx, dx, _ = env_x.step(sx, acts)
        sp, op, rp, dp, _ = env_p.step(sp, acts)
    np.testing.assert_array_equal(np.asarray(rx), np.asarray(rp))
    np.testing.assert_allclose(np.asarray(ox).astype(int),
                               np.asarray(op).astype(int), atol=1)


def _rollout_states(game, n, steps, action=3, seed0=0):
    """Batch of states advanced `steps` frames (sprites off spawn)."""
    import toybox_tpu.games as games
    mod = games.get_game(game)
    cfg = mod.default_config()
    states = jax.vmap(lambda s: mod.new_game(cfg, seed=s))(
        jnp.arange(seed0, seed0 + n, dtype=jnp.uint32))
    from toybox_tpu.core.actions import ale_to_input
    step = jax.jit(jax.vmap(mod.step, in_axes=(None, 0, 0)))
    acts = ale_to_input(jnp.full(n, action, jnp.int32))
    for _ in range(steps):
        states = step(cfg, states, acts)
    return mod, cfg, states


def test_amidar_pallas_render_matches_xla():
    from toybox_tpu.ops.render_pallas import make_amidar_gray_renderer

    mod, cfg, states = _rollout_states("amidar", 4, 180, action=4)
    f_pl = np.asarray(make_amidar_gray_renderer(cfg, interpret=True)(states))
    f_xla = np.asarray(
        jax.vmap(lambda s: luma2d(mod.render(cfg, s)))(states))
    diff = np.abs(f_pl.astype(int) - f_xla.astype(int))
    assert diff.max() <= 1, f"amidar pallas mismatch: max {diff.max()}"


def test_si_pallas_render_matches_xla():
    from toybox_tpu.ops.render_pallas import make_si_gray_renderer

    # 300 steps of FIRE+RIGHT: lasers fly, shields erode, enemies march
    mod, cfg, states = _rollout_states("space_invaders", 4, 300, action=11)
    f_pl = np.asarray(make_si_gray_renderer(cfg, interpret=True)(states))
    f_xla = np.asarray(
        jax.vmap(lambda s: luma2d(mod.render(cfg, s)))(states))
    diff = np.abs(f_pl.astype(int) - f_xla.astype(int))
    assert diff.max() <= 1, f"si pallas mismatch: max {diff.max()}"


def test_amidar_si_pipeline_pallas_interpret_matches_xla():
    from toybox_tpu.envs.pipeline import make_rl_env

    for game in ("amidar", "space_invaders"):
        n = 2
        seeds = jnp.arange(n, dtype=jnp.uint32)
        acts = jnp.ones(n, jnp.int32)
        env_x = make_rl_env(game, n, use_pallas=False)
        env_p = make_rl_env(game, n, use_pallas=True)
        sx, ox = env_x.reset(seeds)
        sp, op = env_p.reset(seeds)
        np.testing.assert_allclose(np.asarray(ox).astype(int),
                                   np.asarray(op).astype(int), atol=1)
        for _ in range(3):
            sx, ox, rx, dx, _ = env_x.step(sx, acts)
            sp, op, rp, dp, _ = env_p.step(sp, acts)
        np.testing.assert_array_equal(np.asarray(rx), np.asarray(rp))
        np.testing.assert_allclose(np.asarray(ox).astype(int),
                                   np.asarray(op).astype(int), atol=1)


def test_maxpool_renderers_match_xla():
    """Fused two-frame max-pool kernels == max of the two XLA renders."""
    from toybox_tpu.ops import render_pallas as rp

    cases = [
        ("breakout", 3, 120, rp.make_breakout_gray_maxpool_renderer),
        ("amidar", 4, 180, rp.make_amidar_gray_maxpool_renderer),
        ("space_invaders", 11, 300, rp.make_si_gray_maxpool_renderer),
    ]
    for game, action, steps, factory in cases:
        mod, cfg, s1 = _rollout_states(game, 3, steps, action=action)
        step = jax.jit(jax.vmap(mod.step, in_axes=(None, 0, 0)))
        from toybox_tpu.core.actions import ale_to_input
        acts = ale_to_input(jnp.full(3, action, jnp.int32))
        s2 = step(cfg, s1, acts)
        if game == "breakout":
            s1 = s1.replace(reset=jnp.zeros(3, bool))
            s2 = s2.replace(reset=jnp.zeros(3, bool))
        f_pl = np.asarray(factory(cfg, interpret=True)(s1, s2))
        xla = jax.vmap(lambda s: luma2d(mod.render(cfg, s)))
        f_xla = np.maximum(np.asarray(xla(s1)), np.asarray(xla(s2)))
        diff = np.abs(f_pl.astype(int) - f_xla.astype(int))
        assert diff.max() <= 1, f"{game} maxpool mismatch: max {diff.max()}"
        if game == "breakout":   # in-kernel warp variant (warp_to=84)
            w_pl = np.asarray(factory(cfg, interpret=True, warp_to=84)(s1, s2))
            w_ref = np.asarray(warp_matmul(jnp.asarray(f_xla), 84))
            wdiff = np.abs(w_pl.astype(int) - w_ref.astype(int))
            assert wdiff.max() <= 1, f"warp_to mismatch: max {wdiff.max()}"
