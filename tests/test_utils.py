"""Tests for misc utils, checkpointing, profiler, make_vec_env, lstm nets."""

import os

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


def test_results_plotter(tmp_path):
    from toybox_tpu.results_plotter import (episodes_to_xy, load_monitor_dir,
                                            plot_results, running_mean,
                                            truncate_to_timesteps)
    from toybox_tpu.utils.monitor import BatchedMonitor

    mon = BatchedMonitor(str(tmp_path / "run0"))
    for r in (1.0, 2.0, 3.0, 4.0):
        mon.record_info({"episode_return": np.array([r, np.nan]),
                         "episode_length": np.array([10, 0])})
    mon.close()

    eps = load_monitor_dir(str(tmp_path))
    assert [e["r"] for e in eps] == [1.0, 2.0, 3.0, 4.0]

    x, y = episodes_to_xy(eps, "timesteps")
    np.testing.assert_allclose(x, [10, 20, 30, 40])
    np.testing.assert_allclose(running_mean(y, window=2),
                               [1.0, 1.5, 2.5, 3.5])
    assert len(truncate_to_timesteps(eps, 25)) == 2

    out = tmp_path / "curves.png"
    plot_results([str(tmp_path)], xaxis="episodes", title="t",
                 out=str(out))
    assert out.exists() and out.stat().st_size > 0


def test_learn_resumes_from_checkpoint_bit_exact(tmp_path):
    """Interrupted-then-resumed training == continuous training: learn()
    auto-restores the latest ckpt (the deepq restore-latest behavior,
    reference deepq/deepq.py:268-276, generalized) and the full state
    pytree carries everything, so resumption is exact."""
    from toybox_tpu.rl.ppo import learn
    from toybox_tpu.rl.test_envs import make_discrete_identity_env

    kw = dict(network="mlp", nsteps=4, nminibatches=1, noptepochs=1,
              seed=0, network_kwargs=dict(num_hidden=16))

    def env():
        return make_discrete_identity_env(4, dim=3)

    # full run, checkpointing every update (ckpt_1..ckpt_6)
    ckpt_dir = str(tmp_path / "ck")
    full = learn(env=env(), total_timesteps=6 * 16,
                 checkpoint_path=ckpt_dir, checkpoint_freq=1, **kw)

    # simulate an interruption after update 3: drop the later
    # checkpoints, then rerun with identical flags — learn() must
    # auto-restore ckpt_3 and replay updates 4-6 exactly
    for n in (4, 5, 6):
        os.remove(os.path.join(ckpt_dir, f"ckpt_{n}"))
    resumed = learn(env=env(), total_timesteps=6 * 16,
                    checkpoint_path=ckpt_dir, checkpoint_freq=1, **kw)

    assert int(full.update) == int(resumed.update) == 6
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        full.params, resumed.params)


def test_acktr_resumes_from_checkpoint_bit_exact(tmp_path):
    """Same contract for ACKTR, whose state additionally carries the EMA
    Kronecker stats and cached inverses — resume must reproduce the
    continuous run exactly, proving those serialize round-trip."""
    from toybox_tpu.rl.acktr import learn
    from toybox_tpu.rl.test_envs import make_discrete_identity_env

    kw = dict(nsteps=4, num_envs=4, seed=0, invert_every=2)

    def env():
        return make_discrete_identity_env(4, dim=3)

    ckpt_dir = str(tmp_path / "ck")
    full = learn(env=env(), total_timesteps=6 * 16,
                 checkpoint_path=ckpt_dir, checkpoint_freq=1, **kw)
    for n in (4, 5, 6):
        os.remove(os.path.join(ckpt_dir, f"ckpt_{n}"))
    resumed = learn(env=env(), total_timesteps=6 * 16,
                    checkpoint_path=ckpt_dir, checkpoint_freq=1, **kw)

    assert int(full.update) == int(resumed.update) == 6
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        (full.params, full.kfac_stats, full.kfac_inv),
        (resumed.params, resumed.kfac_stats, resumed.kfac_inv))
