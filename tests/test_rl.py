"""RL stack tests: policies/distributions, PPO/A2C/DQN train steps,
pipeline env, CLI plumbing. Learning-capability tests (the reference's
test_identity/test_cartpole pattern) run on gridworld in
test_rl_learning.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toybox_tpu.envs.pipeline import make_rl_env
from toybox_tpu.rl.distributions import CategoricalPd, DiagGaussianPd
from toybox_tpu.rl.policies import build_policy


def test_categorical_pd():
    logits = jnp.asarray([[0.0, 0.0, 10.0], [10.0, 0.0, 0.0]])
    pd = CategoricalPd(logits)
    assert pd.mode().tolist() == [2, 0]
    nl = pd.neglogp(jnp.asarray([2, 0]))
    assert float(jnp.max(nl)) < 1e-3
    ent_uniform = CategoricalPd(jnp.zeros((1, 4))).entropy()
    np.testing.assert_allclose(float(ent_uniform[0]), np.log(4), rtol=1e-5)
    s = pd.sample(jax.random.PRNGKey(0))
    assert s.shape == (2,)


def test_diag_gaussian_pd():
    pd = DiagGaussianPd(jnp.zeros((3, 2)), jnp.zeros((3, 2)))
    x = pd.sample(jax.random.PRNGKey(1))
    assert x.shape == (3, 2)
    nl = pd.neglogp(jnp.zeros((3, 2)))
    np.testing.assert_allclose(np.asarray(nl), np.log(2 * np.pi), rtol=1e-5)


def test_policy_shapes():
    module, init_fn, step_fn, value_fn = build_policy(
        (84, 84, 4), 4, "cnn_small")
    params = init_fn(jax.random.PRNGKey(0))
    obs = jnp.zeros((8, 84, 84, 4), jnp.uint8)
    a, v, nl, logits = step_fn(params, obs, jax.random.PRNGKey(1))
    assert a.shape == (8,) and v.shape == (8,)
    assert logits.shape == (8, 4)
    assert value_fn(params, obs).shape == (8,)


def test_pipeline_env_shapes():
    env = make_rl_env("breakout", 4)
    st, obs = jax.jit(env.reset)(jnp.arange(4, dtype=jnp.uint32))
    assert obs.shape == (4, 84, 84, 4)
    step = jax.jit(env.step)
    st, obs, rew, done, info = step(st, jnp.ones(4, jnp.int32))
    assert obs.dtype == jnp.uint8
    assert rew.shape == (4,)
    assert set(np.unique(np.asarray(rew))) <= {-1.0, 0.0, 1.0}


def test_ppo_train_step_runs_and_is_finite():
    from toybox_tpu.rl.ppo import make_ppo
    env = make_rl_env("gridworld", 4)
    init_fn, train_step, act = make_ppo(env, nsteps=8, nminibatches=2,
                                        noptepochs=2, network="cnn_small",
                                        total_updates=10)
    state = init_fn(0)
    step = jax.jit(train_step, donate_argnums=(0,))
    for _ in range(2):
        state, metrics = step(state)
    for k, v in metrics.items():
        if k in ("eprewmean", "eplenmean"):
            continue
        assert np.isfinite(float(v)), (k, v)
    assert int(state.update) == 2


def test_ppo_microbatched_update_matches_default():
    """Gradient-accumulation microbatching (the HBM lever for big env
    counts) must produce the same update as the one-shot minibatch up to
    fp summation reordering — advantages are normalized over the FULL
    minibatch before chunking, so the math is identical."""
    from toybox_tpu.rl.ppo import make_ppo
    env = make_rl_env("gridworld", 4)
    kw = dict(nsteps=8, nminibatches=2, noptepochs=2, network="cnn_small",
              total_updates=10)
    i1, t1, _ = make_ppo(env, **kw)
    s1, _ = jax.jit(t1)(i1(0))
    i2, t2, _ = make_ppo(env, microbatches=4, **kw)
    s2, _ = jax.jit(t2)(i2(0))
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)


def test_a2c_train_step_runs():
    from toybox_tpu.rl.a2c import make_a2c
    env = make_rl_env("gridworld", 4)
    init_fn, train_step = make_a2c(env, nsteps=5, network="cnn_small",
                                   total_updates=10)
    state = init_fn(0)
    state, metrics = jax.jit(train_step, donate_argnums=(0,))(state)
    assert np.isfinite(float(metrics["policy_loss"]))


def test_dqn_cycle_runs():
    from toybox_tpu.rl.dqn import make_dqn
    env = make_rl_env("gridworld", 2)
    init_fn, cycle, _ = make_dqn(env, buffer_size=256, batch_size=8,
                                 learning_starts=16, total_timesteps=1000,
                                 network="cnn_small")
    state = init_fn(0)
    step = jax.jit(cycle, donate_argnums=(0,))
    for _ in range(3):
        state, metrics = step(state)
    assert int(state.replay.size) > 0
    assert np.isfinite(float(metrics["loss"]))


def test_replay_ring_and_priorities():
    from toybox_tpu.rl.dqn import make_replay, replay_add, replay_sample
    rb = make_replay(8, (2, 2, 1))
    obs = jnp.ones((4, 2, 2, 1), jnp.uint8)
    rb = replay_add(rb, obs, obs * 2, jnp.arange(4), jnp.ones(4),
                    jnp.zeros(4, bool))
    assert int(rb.size) == 4 and int(rb.cursor) == 4
    rb = replay_add(rb, obs, obs, jnp.arange(4), jnp.ones(4),
                    jnp.zeros(4, bool))
    rb = replay_add(rb, obs, obs, jnp.arange(4), jnp.ones(4),
                    jnp.zeros(4, bool))
    assert int(rb.size) == 8 and int(rb.cursor) == 4  # wrapped
    batch, idx, w = replay_sample(rb, jax.random.PRNGKey(0), 16, 0.6, 0.4)
    assert batch[0].shape == (16, 2, 2, 1)
    assert np.all(np.asarray(idx) < 8)
    assert np.all(np.asarray(w) <= 1.0 + 1e-6)


def test_save_load_roundtrip(tmp_path):
    from toybox_tpu.rl.ppo import load_params, make_ppo, save_params
    env = make_rl_env("gridworld", 2)
    init_fn, _, _ = make_ppo(env, nsteps=4, nminibatches=1, noptepochs=1,
                             network="cnn_small")
    state = init_fn(0)
    path = str(tmp_path / "model.msgpack")
    save_params(path, state.params)
    loaded = load_params(path, state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state.params, loaded)


def test_serialization_across_algs(tmp_path):
    """The reference's test_serialization contract (tests/
    test_serialization.py:16-28): every algorithm's checkpoint survives a
    save/load round-trip and reproduces the same policy outputs."""
    from toybox_tpu.rl.policies import build_eval_policy
    from toybox_tpu.rl.ppo import load_params, save_params

    obs_shape, nact = (84, 84, 4), 6
    obs = (np.arange(np.prod((2,) + obs_shape)) % 255).reshape(
        (2,) + obs_shape).astype(np.uint8)
    key = jax.random.PRNGKey(1)
    for alg, network in [("ppo", "cnn_small"), ("a2c", "cnn_small"),
                         ("deepq", "conv_only"), ("acer", "cnn_small"),
                         ("acktr", "cnn"), ("trpo", "cnn_small"),
                         ("ppo1", "cnn_small")]:
        p_init, p_step = build_eval_policy(alg, obs_shape, nact, network)
        params = p_init(jax.random.PRNGKey(0))
        path = str(tmp_path / f"{alg}.msgpack")
        save_params(path, params)
        loaded = load_params(path, params)
        a0, v0, _, extra0 = p_step(params, jnp.asarray(obs), key)
        a1, v1, _, extra1 = p_step(loaded, jnp.asarray(obs), key)
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1))
        np.testing.assert_allclose(np.asarray(extra0), np.asarray(extra1))


def test_cli_plumbing():
    from toybox_tpu.run import (env_id_to_game, get_learn_function,
                                parse_cmdline_kwargs)
    assert env_id_to_game("BreakoutToyboxNoFrameskip-v4") == "breakout"
    assert env_id_to_game("SpaceInvadersToyboxNoFrameskip-v4") == \
        "space_invaders"
    assert env_id_to_game("AmidarNoFrameskip-v4") == "amidar"
    kw = parse_cmdline_kwargs(["--lr=0.001", "--network=cnn_small"])
    assert kw == {"lr": 0.001, "network": "cnn_small"}
    fn, defaults = get_learn_function("ppo")
    assert defaults["nsteps"] == 128


def test_schedules():
    from toybox_tpu.utils.schedules import LinearSchedule, PiecewiseSchedule
    s = LinearSchedule(100, final_p=0.1, initial_p=1.0)
    assert s.value(0) == 1.0
    assert abs(s.value(50) - 0.55) < 1e-9
    assert s.value(1000) == pytest.approx(0.1)
    p = PiecewiseSchedule([(0, 0.0), (10, 1.0)], outside_value=5.0)
    assert p.value(5) == pytest.approx(0.5)
    assert p.value(100) == 5.0


def test_logger(tmp_path):
    from toybox_tpu.utils import logger
    lg = logger.configure(dir=str(tmp_path), format_strs=["csv", "json"])
    lg.logkv("a", 1.0)
    lg.logkv_mean("b", 2.0)
    lg.logkv_mean("b", 4.0)
    out = lg.dumpkvs()
    assert out["b"] == 3.0
    lg.logkv("a", 2.0)
    lg.logkv("c", 1.0)  # new key triggers csv header rewrite
    lg.dumpkvs()
    csvf = (tmp_path / "progress.csv").read_text().splitlines()
    assert csvf[0].split(",")[0] in ("a", "b", "c")
    assert len(csvf) == 3


def test_network_dtype_string_and_bf16_compute():
    """bf16 compute path: dtype may arrive as a string from the CLI
    extras; params stay f32 so checkpoints interchange with the f32
    nets (gate-verified on chip: Breakout.ppo_bf16.model, avg 116.4)."""
    import jax
    import jax.numpy as jnp
    from toybox_tpu.rl.models import get_network_builder

    net = get_network_builder("cnn")(dtype="bfloat16")
    obs = jnp.zeros((2, 84, 84, 4), jnp.uint8)
    params = net.init(jax.random.PRNGKey(0), obs)
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.dtype == jnp.float32          # param dtype unchanged
    out = net.apply(params, obs)
    assert out.shape[0] == 2
