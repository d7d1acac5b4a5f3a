"""Learning-capability tests on the fake-env fixtures — the reference's
test_identity.py / test_fixed_sequence.py pattern: each algorithm must
beat random on a tiny seeded task within a small budget."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toybox_tpu.rl.test_envs import (make_box_identity_env,
                                     make_discrete_identity_env,
                                     make_fixed_sequence_env)

DIM = 4  # random baseline reward = 1/4


def mean_reward_after(train, n_updates, env, metric="mean_reward"):
    init_fn, step = train
    state = init_fn(0)
    step_jit = jax.jit(step, donate_argnums=(0,))
    last = None
    for _ in range(n_updates):
        state, metrics = step_jit(state)
        last = metrics
    return float(last[metric])


def test_ppo_learns_identity():
    from toybox_tpu.rl.ppo import make_ppo
    env = make_discrete_identity_env(16, dim=DIM)
    init_fn, step, _ = make_ppo(env, network="mlp", nsteps=16,
                                nminibatches=2, noptepochs=2, lr=1e-2,
                                cliprange=0.2, total_updates=60,
                                network_kwargs=dict(num_hidden=32))
    r = mean_reward_after((init_fn, step), 60, env)
    assert r > 0.8, f"ppo failed to learn identity: {r}"


def test_a2c_learns_identity():
    from toybox_tpu.rl.a2c import make_a2c
    env = make_discrete_identity_env(16, dim=DIM)
    # gamma ~ 0: the identity task is a per-step bandit; n-step returns at
    # gamma .99 bury the per-action signal in future-reward noise
    init_fn, step = make_a2c(env, network="mlp", nsteps=8, lr=1e-2,
                             gamma=0.1, total_updates=5000,
                             network_kwargs=dict(num_hidden=32))
    r = mean_reward_after((init_fn, step), 500, env)
    assert r > 0.8, f"a2c failed to learn identity: {r}"


def test_dqn_learns_identity():
    from toybox_tpu.rl.dqn import make_dqn
    env = make_discrete_identity_env(8, dim=DIM)
    init_fn, cycle, qnet = make_dqn(
        env, network="mlp", lr=5e-3, buffer_size=2048, batch_size=64,
        train_freq=2, learning_starts=128, target_network_update_freq=100,
        exploration_fraction=0.3, exploration_final_eps=0.02,
        total_timesteps=4000, network_kwargs=dict(num_hidden=32))
    state = init_fn(0)
    cyc = jax.jit(cycle, donate_argnums=(0,))
    for _ in range(250):
        state, metrics = cyc(state)
    # greedy accuracy on fresh observations
    obs = jnp.eye(DIM, dtype=jnp.float32)
    q = qnet.apply(state.params, obs)
    acc = float(jnp.mean(jnp.argmax(q, -1) == jnp.arange(DIM)))
    assert acc >= 0.75, f"dqn failed: greedy accuracy {acc}"


def test_dqn_param_noise_learns_identity():
    """Parameter-space-noise exploration (reference
    build_graph.py:146-279 act-with-param-noise): greedy w.r.t. a
    perturbed network, adaptive scale chasing the eps-matched KL
    threshold. The identity task is only solvable if the weight noise
    actually explores all actions."""
    from toybox_tpu.rl.dqn import make_dqn
    env = make_discrete_identity_env(8, dim=DIM)
    init_fn, cycle, qnet = make_dqn(
        env, network="mlp", lr=5e-3, buffer_size=2048, batch_size=64,
        train_freq=2, learning_starts=128, target_network_update_freq=100,
        exploration_fraction=0.3, exploration_final_eps=0.02,
        total_timesteps=4000, param_noise=True, param_noise_scale0=0.1,
        network_kwargs=dict(num_hidden=32))
    state = init_fn(0)
    cyc = jax.jit(cycle, donate_argnums=(0,))
    for _ in range(250):
        state, metrics = cyc(state)
    assert float(metrics["param_noise_scale"]) > 0.0
    obs = jnp.eye(DIM, dtype=jnp.float32)
    q = qnet.apply(state.params, obs)
    acc = float(jnp.mean(jnp.argmax(q, -1) == jnp.arange(DIM)))
    assert acc >= 0.75, f"param-noise dqn failed: greedy accuracy {acc}"


def test_trpo_learns_identity():
    from toybox_tpu.rl.trpo import make_trpo
    env = make_discrete_identity_env(16, dim=DIM)
    init_fn, step, _, _ = make_trpo(env, network="mlp", nsteps=32,
                                    max_kl=0.01, vf_stepsize=1e-2,
                                    vf_iters=3,
                                    network_kwargs=dict(num_hidden=32))
    r = mean_reward_after((init_fn, step), 40, env)
    assert r > 0.6, f"trpo failed to learn identity: {r}"


def test_acer_learns_identity():
    from toybox_tpu.rl.acer import make_acer
    env = make_discrete_identity_env(16, dim=DIM)
    init_fn, cycle = make_acer(env, network="mlp", nsteps=8, lr=5e-3,
                               gamma=0.1, replay_ratio=2, buffer_traj=16,
                               network_kwargs=dict(num_hidden=32))
    r = mean_reward_after((init_fn, cycle), 400, env)
    assert r > 0.7, f"acer failed to learn identity: {r}"


def test_ddpg_learns_box_identity():
    from toybox_tpu.rl.ddpg import make_ddpg
    env = make_box_identity_env(8, dim=2)
    init_fn, cycle, actor = make_ddpg(env, action_dim=2, actor_lr=3e-3,
                                      critic_lr=3e-3, batch_size=128,
                                      buffer_size=8192, noise_scale=0.2,
                                      learning_starts=256)
    state = init_fn(0)
    cyc = jax.jit(cycle, donate_argnums=(0,))
    last = None
    for _ in range(600):
        state, last = cyc(state)
    # mean squared error should be far below random (~ -0.9 avg reward)
    r = float(last["mean_reward"])
    assert r > -0.35, f"ddpg failed to learn box identity: {r}"


def test_fixed_sequence_env_contract():
    env = make_fixed_sequence_env(4, n_actions=3, episode_len=10)
    st, obs = env.reset(jnp.arange(4, dtype=jnp.uint32))
    total = 0.0
    for _ in range(10):
        st, obs, rew, done, info = env.step(st, jnp.zeros(4, jnp.int32))
        total += float(rew.sum())
    assert bool(done.all())
    assert 0 <= total <= 40


def test_her_learns_bitflip():
    from toybox_tpu.rl.her import make_her
    init_fn, cycle, _ = make_her(num_envs=16, n_bits=6, lr=1e-3)
    state = init_fn(0)
    cyc = jax.jit(cycle, donate_argnums=(0,))
    last = None
    for _ in range(400):
        state, last = cyc(state)
    sr = float(last["success_rate"])
    assert sr > 0.5, f"HER failed to learn bit-flipping: success {sr}"


def test_gail_imitates_identity_expert():
    from toybox_tpu.rl.gail import make_gail
    # expert demonstrations for the identity task: action == argmax(obs)
    dim = DIM
    key = jax.random.PRNGKey(0)
    targets = jax.random.randint(key, (2048,), 0, dim)
    expert_obs = jax.nn.one_hot(targets, dim, dtype=jnp.float32)
    expert_actions = targets

    env = make_discrete_identity_env(16, dim=dim)
    # low gamma: per-step imitation signal (see the a2c test note)
    init_fn, step = make_gail(env, expert_obs, expert_actions,
                              network="mlp", nsteps=16, gamma=0.1,
                              lam=0.5, pi_lr=5e-3,
                              network_kwargs=dict(num_hidden=32))
    state = init_fn(0)
    sj = jax.jit(step, donate_argnums=(0,))
    for _ in range(300):
        state, metrics = sj(state)
    # the imitator should now act like the expert: evaluate true reward
    from toybox_tpu.rl.policies import build_policy
    _, _, p_step, _ = build_policy(env.obs_shape, env.num_actions, "mlp",
                                   num_hidden=32)
    st, obs = env.reset(jnp.arange(16, dtype=jnp.uint32))
    correct = 0
    total = 0
    k = jax.random.PRNGKey(1)
    for _ in range(20):
        k, ak = jax.random.split(k)
        acts, _, _, _ = p_step(state.pi_params, st.frames, ak)
        st, obs, rew, done, info = env.step(st, acts)
        correct += float(rew.sum())
        total += 16
    acc = correct / total
    assert acc > 0.7, f"GAIL imitation accuracy {acc}"


def test_acktr_learns_identity():
    from toybox_tpu.rl.acktr import make_acktr
    env = make_discrete_identity_env(16, dim=DIM)
    init_fn, step, _ = make_acktr(env, nsteps=8, lr=0.2, gamma=0.1,
                                  hidden=32, kfac_clip=0.01,
                                  total_updates=3000)
    r = mean_reward_after((init_fn, step), 200, env)
    assert r > 0.7, f"acktr failed to learn identity: {r}"


def test_acktr_learns_with_periodic_inversion():
    """The cached-inverse path (invert_every > 1, the reference kfac's
    async inverse ops) must still precondition well enough to learn."""
    from toybox_tpu.rl.acktr import make_acktr
    env = make_discrete_identity_env(16, dim=DIM)
    init_fn, step, _ = make_acktr(env, nsteps=8, lr=0.2, gamma=0.1,
                                  hidden=32, kfac_clip=0.01,
                                  total_updates=3000, invert_every=8)
    r = mean_reward_after((init_fn, step), 200, env)
    assert r > 0.7, f"acktr (invert_every=8) failed to learn: {r}"


def test_acktr_conv_step_runs():
    """Conv K-FAC path compiles and produces finite metrics on images."""
    from toybox_tpu.envs.pipeline import make_rl_env
    from toybox_tpu.rl.acktr import make_acktr
    env = make_rl_env("gridworld", 2)
    init_fn, step, _ = make_acktr(env, nsteps=2, hidden=64,
                                  total_updates=4)
    state = init_fn(0)
    state, metrics = jax.jit(step, donate_argnums=(0,))(state)
    assert np.isfinite(float(metrics["policy_loss"]))
    assert np.isfinite(float(metrics["step_coeff"]))


def test_recurrent_ppo_learns_fixed_sequence():
    """The memorization task needs memory: a recurrent policy should beat
    the 1/n random baseline where a feedforward one plateaus (the
    reference's test_fixed_sequence pattern)."""
    from toybox_tpu.rl.ppo_recurrent import make_recurrent_ppo
    n_act = 3
    env = make_fixed_sequence_env(16, n_actions=n_act, episode_len=8)
    init_fn, step, _ = make_recurrent_ppo(
        env, network="lstm", nlstm=32, nsteps=16, nminibatches=2,
        noptepochs=4, lr=5e-3, cliprange=0.2, gamma=0.5,
        total_updates=4000, network_kwargs=dict(num_hidden=32))
    state = init_fn(0)
    sj = jax.jit(step, donate_argnums=(0,))
    last = None
    for _ in range(300):
        state, last = sj(state)
    r = float(last["mean_reward"])
    assert r > 0.6, f"recurrent ppo failed to memorize the sequence: {r}"


def test_ppo1_learns_identity():
    from toybox_tpu.rl.ppo1 import make_ppo1
    env = make_discrete_identity_env(16, dim=DIM)
    # gamma ~ 0 as in the a2c test: the identity task is a per-step
    # bandit, and ppo1's UNCLIPPED vf MSE on gamma-.99 returns swamps the
    # shared trunk (the reference uses separate pol/vf towers)
    init_fn, step = make_ppo1(
        env, network="mlp", timesteps_per_actorbatch=16,
        optim_batchsize=64, optim_epochs=2, optim_stepsize=1e-2,
        clip_param=0.2, entcoeff=0.0, schedule="constant", gamma=0.1,
        total_updates=60, network_kwargs=dict(num_hidden=32))
    r = mean_reward_after((init_fn, step), 60, env)
    assert r > 0.8, f"ppo1 failed to learn identity: {r}"


def test_ppo1_adaptive_kl_learns_identity():
    from toybox_tpu.rl.ppo1 import make_ppo1
    env = make_discrete_identity_env(16, dim=DIM)
    init_fn, step = make_ppo1(
        env, network="mlp", timesteps_per_actorbatch=16,
        optim_batchsize=64, optim_epochs=2, optim_stepsize=1e-2,
        clip_param=0.2, entcoeff=0.0, schedule="constant", kl_targ=0.01,
        gamma=0.1, total_updates=80, network_kwargs=dict(num_hidden=32))
    init_state = init_fn(0)
    state = init_state
    step_jit = jax.jit(step, donate_argnums=(0,))
    last = None
    betas = []
    for _ in range(80):
        state, metrics = step_jit(state)
        betas.append(float(state.kl_beta))
        last = metrics
    assert float(last["mean_reward"]) > 0.8
    # the adaptive penalty must have actually moved beta at least once
    assert len(set(betas)) > 1, "kl_beta never adapted"


def test_ppo1_ob_filter_updates():
    from toybox_tpu.rl.ppo1 import make_ppo1
    env = make_discrete_identity_env(8, dim=DIM)
    init_fn, step = make_ppo1(
        env, network="mlp", timesteps_per_actorbatch=8,
        normalize_observations=True, total_updates=3,
        network_kwargs=dict(num_hidden=16))
    state = init_fn(0)
    c0 = float(state.ob_rms.count)
    state, _ = jax.jit(step)(state)
    assert float(state.ob_rms.count) > c0, "ob_rms not updated"


def test_her_ddpg_relabeling_is_load_bearing():
    """The reference-parity HER stack (goal-conditioned DDPG, future
    strategy) must solve the sparse point-goal task while the same
    learner WITHOUT relabeling (replay_strategy='none', reference
    her.py:16-18) must not — i.e. the test fails if relabeling is
    removed."""
    from toybox_tpu.rl.her import make_her_ddpg

    def final_success(strategy):
        init_fn, cycle = make_her_ddpg(16, 2, replay_strategy=strategy)
        state = init_fn(0)
        cj = jax.jit(cycle, donate_argnums=(0,))
        succ = []
        for _ in range(150):
            state, m = cj(state)
            succ.append(float(m["success_rate"]))
        return sum(succ[-20:]) / 20

    her = final_success("future")
    plain = final_success("none")
    assert her > 0.5, f"HER failed the point-goal task: {her}"
    assert plain < 0.25, f"ablation unexpectedly solved it: {plain}"
    assert her > plain + 0.3


def _identity_expert(dim, n=2048, seed=0):
    key = jax.random.PRNGKey(seed)
    targets = jax.random.randint(key, (n,), 0, dim)
    return jax.nn.one_hot(targets, dim, dtype=jnp.float32), targets


def test_gail_trpo_discriminator_reward_is_load_bearing():
    """The reference-parity GAIL (TRPO generator on the discriminator
    reward, gail/trpo_mpi.py) must imitate the identity expert; with the
    adversarial reward ablated (reward_scale=0) the same learner must
    stay near chance — the test fails without the discriminator reward."""
    from toybox_tpu.rl.gail import make_gail_trpo

    expert_obs, expert_actions = _identity_expert(DIM)
    env = make_discrete_identity_env(16, dim=DIM)

    def final_true_reward(reward_scale):
        init_fn, step, *_ = make_gail_trpo(
            env, expert_obs, expert_actions, network="mlp", nsteps=16,
            gamma=0.1, lam=0.5, max_kl=0.05, reward_scale=reward_scale,
            disc_lr=1e-3, disc_steps=2,  # fast adversary: tiny task+budget
            network_kwargs=dict(num_hidden=32))
        state = init_fn(0)
        sj = jax.jit(step, donate_argnums=(0,))
        rs = []
        for _ in range(120):
            state, m = sj(state)
            rs.append(float(m["true_reward"]))
        return sum(rs[-20:]) / 20

    with_d = final_true_reward(1.0)
    without_d = final_true_reward(0.0)
    assert with_d > 0.6, f"gail-trpo failed to imitate: {with_d}"
    assert without_d < 0.45, f"ablation unexpectedly learned: {without_d}"
    assert with_d > without_d + 0.2


def test_behavior_clone_pretrains_policy():
    from toybox_tpu.rl.gail import behavior_clone
    from toybox_tpu.rl.policies import build_policy

    expert_obs, expert_actions = _identity_expert(DIM)
    env = make_discrete_identity_env(8, dim=DIM)
    params, bc_loss = behavior_clone(
        env, expert_obs, expert_actions, network="mlp", epochs=300,
        lr=1e-2, network_kwargs=dict(num_hidden=32))
    assert bc_loss < 0.2, f"bc loss too high: {bc_loss}"
    module, _, _, _ = build_policy(env.obs_shape, env.num_actions, "mlp",
                                   num_hidden=32)
    obs = jnp.eye(DIM, dtype=jnp.float32)
    logits, _ = module.apply(params, obs)
    acc = float(jnp.mean(jnp.argmax(logits, -1) == jnp.arange(DIM)))
    assert acc == 1.0, f"bc policy inaccurate: {acc}"


def test_expert_dataset_pipeline_roundtrip(tmp_path):
    """generate_expert_dataset -> npz save/load keeps shapes and dtypes
    (the gail/dataset/mujoco_dset.py + sample_trajectory surface)."""
    from toybox_tpu.rl.gail import (generate_expert_dataset,
                                    load_expert_dataset,
                                    save_expert_dataset)
    from toybox_tpu.rl.policies import build_policy

    env = make_discrete_identity_env(4, dim=DIM)
    _, p_init, _, _ = build_policy(env.obs_shape, env.num_actions, "mlp",
                                   num_hidden=16)
    params = p_init(jax.random.PRNGKey(0))
    obs, acts = generate_expert_dataset(env, params=params,
                                        n_transitions=64, network="mlp",
                                        network_kwargs=dict(num_hidden=16))
    assert obs.shape == (64,) + tuple(env.obs_shape)
    assert acts.shape == (64,)
    p = str(tmp_path / "expert.npz")
    save_expert_dataset(p, obs, acts)
    o2, a2 = load_expert_dataset(p)
    np.testing.assert_array_equal(obs, o2)
    np.testing.assert_array_equal(acts, a2)


def test_recurrent_a2c_learns_fixed_sequence():
    """a2c accepts the registered recurrent networks like the reference's
    build_policy does for every alg (common/models.py:79-160): a2c+lstm
    must memorize the sequence where feedforward a2c cannot."""
    from toybox_tpu.rl.a2c import make_recurrent_a2c
    n_act = 3
    env = make_fixed_sequence_env(16, n_actions=n_act, episode_len=8)
    init_fn, step = make_recurrent_a2c(
        env, network="lstm", nlstm=32, nsteps=8, lr=5e-3, gamma=0.5,
        ent_coef=0.01, total_updates=4000, network_kwargs=dict(num_hidden=32))
    state = init_fn(0)
    sj = jax.jit(step, donate_argnums=(0,))
    last = None
    for _ in range(400):
        state, last = sj(state)
    r = float(last["mean_reward"])
    assert r > 0.6, f"recurrent a2c failed to memorize the sequence: {r}"


def test_recurrent_acer_learns_fixed_sequence():
    """ACER accepts the registered recurrent networks (reference
    acer/policies.py lstm variant; replay re-runs the net from the zero
    state with episode-start masks, acer.py:258)."""
    from toybox_tpu.rl.acer import make_recurrent_acer
    n_act = 3
    env = make_fixed_sequence_env(16, n_actions=n_act, episode_len=8)
    init_fn, cycle = make_recurrent_acer(
        env, network="lstm", nlstm=32, nsteps=8, lr=1e-2, gamma=0.5,
        replay_ratio=4, buffer_traj=10, ent_coef=0.001,
        network_kwargs=dict(num_hidden=32))
    state = init_fn(0)
    sj = jax.jit(cycle, donate_argnums=(0,))
    last = None
    for _ in range(600):
        state, last = sj(state)
    r = float(last["mean_reward"])
    assert r > 0.6, f"recurrent acer failed to memorize the sequence: {r}"


def test_ppo_learns_image_classification():
    """The MnistEnv-pattern test (reference test_mnist.py): a conv policy
    learns to classify the seeded class images well above chance."""
    from toybox_tpu.rl.ppo import make_ppo
    from toybox_tpu.rl.test_envs import make_image_class_env
    env = make_image_class_env(16, n_classes=4, size=28, episode_len=4)
    init_fn, step, _ = make_ppo(
        env, network="cnn_small", nsteps=8, nminibatches=2, noptepochs=2,
        lr=1e-3, cliprange=0.2, gamma=0.1, total_updates=200)
    state = init_fn(0)
    sj = jax.jit(step, donate_argnums=(0,))
    last = None
    for _ in range(200):
        state, last = sj(state)
    r = float(last["mean_reward"])
    assert r > 0.6, f"ppo failed to classify images: {r} (chance 0.25)"
