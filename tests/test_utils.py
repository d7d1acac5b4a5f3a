"""Tests for misc utils, checkpointing, profiler, make_vec_env, lstm nets."""

import numpy as np
import jax
import jax.numpy as jnp


def test_explained_variance_and_discount():
    from toybox_tpu.utils.misc import discount, explained_variance
    y = np.array([1.0, 2.0, 3.0])
    assert explained_variance(y, y) == 1.0
    assert abs(explained_variance(np.zeros(3), y)) < 1e9
    d = discount(np.array([[1.0], [1.0], [1.0]]), 0.5)
    np.testing.assert_allclose(d[:, 0], [1.75, 1.5, 1.0])


def test_tile_images():
    from toybox_tpu.utils.misc import tile_images
    imgs = np.zeros((5, 4, 6, 3), np.uint8)
    grid = tile_images(imgs)
    assert grid.shape == (8, 18, 3)


def test_checkpoint_roundtrip(tmp_path):
    from toybox_tpu.rl.ppo import make_ppo
    from toybox_tpu.rl.test_envs import make_discrete_identity_env
    from toybox_tpu.utils.checkpoint import (latest_checkpoint,
                                             load_checkpoint,
                                             save_checkpoint)

    env = make_discrete_identity_env(4, dim=3)
    init_fn, step, _ = make_ppo(env, network="mlp", nsteps=4,
                                nminibatches=1, noptepochs=1,
                                network_kwargs=dict(num_hidden=16))
    state = init_fn(0)
    state, _ = jax.jit(step)(state)
    p = str(tmp_path / "ckpt_100.msgpack")
    save_checkpoint(p, state)
    template = init_fn(0)
    restored = load_checkpoint(p, template)
    assert int(restored.update) == int(state.update) == 1
    # resumed training continues identically
    s1, m1 = jax.jit(step)(state)
    s2, m2 = jax.jit(step)(restored)
    np.testing.assert_allclose(float(m1["policy_loss"]),
                               float(m2["policy_loss"]), rtol=1e-6)
    assert latest_checkpoint(str(tmp_path)) == p


def test_lstm_trunk_carries_state():
    from toybox_tpu.rl.models import LSTMTrunk, get_network_builder
    net = get_network_builder("cnn_lnlstm")(nlstm=16)
    carry = LSTMTrunk.initial_carry(2, 16)
    obs = jax.random.randint(jax.random.PRNGKey(1), (2, 84, 84, 4),
                             0, 255).astype(jnp.uint8)
    done = jnp.zeros(2, bool)
    params = net.init(jax.random.PRNGKey(0), obs, carry, done)
    out, carry2 = net.apply(params, obs, carry, done)
    assert out.shape == (2, 16)
    assert carry2[0].shape == (2, 16)
    # done resets the carry
    out3, carry3 = net.apply(params, obs, carry2, jnp.ones(2, bool))
    assert not np.allclose(np.asarray(carry2[0]), 0)


def test_make_vec_env_batched():
    from toybox_tpu.envs.vec_env import make_vec_env
    venv = make_vec_env("GridWorldToyboxNoFrameskip-v4", num_env=2, seed=0)
    obs = venv.reset()
    assert obs.shape[0] == 2
    obs, rew, done, infos = venv.step(np.zeros(2, np.int64))
    assert len(infos) == 2


def test_profiler_wall_timer():
    from toybox_tpu.utils import logger as lg
    from toybox_tpu.utils.profiler import wall_timer
    logger = lg.configure(dir="/tmp/_prof_test", format_strs=[])
    with wall_timer("thing", logger):
        pass
    assert "wait_thing" in logger.name2val
