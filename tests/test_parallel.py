"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

The reference has no multi-node tests (SURVEY.md §4); these are the
trajectory-parity-across-shardings asserts it lacked: the same batched
program must produce bit-identical results on 1 device and sharded over 8.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toybox_tpu.parallel import mesh as pm


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
    return pm.make_mesh(("env",))


def test_mesh_shape(mesh8):
    assert mesh8.shape == {"env": 8}


def test_sharded_env_step_matches_unsharded(mesh8):
    from toybox_tpu.envs.batched import make_batched_env

    n = 16
    fns = make_batched_env("breakout", n, obs_mode="none")
    seeds = jnp.arange(n, dtype=jnp.uint32)
    actions = jnp.ones(n, jnp.int32)

    # unsharded
    st, _ = jax.jit(fns.reset)(seeds)
    for _ in range(10):
        st, _, rew_u, done_u, _ = jax.jit(fns.step)(st, actions)

    # sharded over 8 devices
    st_s, _ = jax.jit(fns.reset, out_shardings=pm.env_sharding(mesh8))(seeds)
    step = jax.jit(fns.step)
    a_s = pm.shard_batch(actions, mesh8)
    for _ in range(10):
        st_s, _, rew_s, done_s, _ = step(st_s, a_s)

    np.testing.assert_array_equal(np.asarray(rew_u), np.asarray(rew_s))
    np.testing.assert_array_equal(np.asarray(done_u), np.asarray(done_s))
    for a, b in zip(jax.tree_util.tree_leaves(st),
                    jax.tree_util.tree_leaves(st_s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ppo_update_parity_across_shardings(mesh8):
    """One full PPO train step: sharded == single-device (the gradient
    all-reduce XLA inserts must be exact)."""
    from toybox_tpu.envs.pipeline import make_rl_env
    from toybox_tpu.rl.ppo import make_ppo

    n = 8
    env = make_rl_env("gridworld", n)
    init_fn, train_step, _ = make_ppo(env, nsteps=4, nminibatches=2,
                                      noptepochs=1, network="cnn_small",
                                      total_updates=4)
    state0 = init_fn(0)

    s1, m1 = jax.jit(train_step)(state0)

    state_sharded = state0.replace(
        env_state=pm.shard_batch(state0.env_state, mesh8),
        params=pm.replicate(state0.params, mesh8),
        opt_state=pm.replicate(state0.opt_state, mesh8))
    s2, m2 = jax.jit(train_step)(state_sharded)

    for k in m1:
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=2e-4, atol=1e-6, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6)


def test_mesh_moments(mesh8):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    x = jnp.arange(16.0)

    @jax.jit
    def f(x):
        def inner(xs):
            m, s, n = pm.mesh_moments(xs, "env")
            return jnp.stack([m, s, n])
        return shard_map(inner, mesh=mesh8, in_specs=P("env"),
                         out_specs=P())(x)

    m, s, n = np.asarray(f(x))
    assert n == 16
    np.testing.assert_allclose(m, x.mean(), rtol=1e-6)
    np.testing.assert_allclose(s, np.asarray(x).std(), rtol=1e-6)


def test_process_seed_offset():
    assert pm.process_seed_offset(100, 64) == 100  # single process
