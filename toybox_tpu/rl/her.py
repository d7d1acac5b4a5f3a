"""HER — hindsight experience replay.

Semantics from the reference's baselines/her: goal-conditioned off-policy
learning where stored episodes are relabeled with achieved goals
(the 'future' strategy with replay_k=4: each sampled transition's goal is
replaced, with probability replay_k/(replay_k+1), by the achieved state
at a random future timestep of the same episode — her.py:19-56). The
reference's MPI rollout workers and normalizers collapse into the batched
device env + jit.

Two learners ship here:

- ``make_her_ddpg``: the parity implementation of the reference stack
  (her/ddpg.py) — goal-conditioned DDPG with running o/g normalizers
  (normalizer.py), epsilon-random + gaussian action exploration
  (rollout.py:60-70), target return clipping to [-1/(1-gamma), 0]
  (ddpg.py _create_network), an action_l2 penalty on the actor, polyak
  target averaging, and per-cycle success-rate reporting — demonstrated
  on a continuous vector goal env (point-mass reacher).
- ``make_her``: a compact goal-conditioned DQN on the classic
  bit-flipping testbed (discrete-action HER capability).
"""

from __future__ import annotations

import time
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

F32 = jnp.float32
I32 = jnp.int32


# ---------------------------------------------------------------------------
# Bit-flip goal env (the canonical HER testbed)
# ---------------------------------------------------------------------------

@struct.dataclass
class BitFlipState:
    bits: jnp.ndarray    # bool[N, n]
    goal: jnp.ndarray    # bool[N, n]
    t: jnp.ndarray       # i32[N]
    key: jnp.ndarray


def make_bitflip_env(num_envs: int, n_bits: int = 8):
    """Action i flips bit i; reward 0 when bits == goal else -1; episode
    length n_bits."""

    def _new(key):
        key, k1, k2 = jax.random.split(key, 3)
        bits = jax.random.bernoulli(k1, 0.5, (num_envs, n_bits))
        goal = jax.random.bernoulli(k2, 0.5, (num_envs, n_bits))
        return key, bits, goal

    def obs_of(bits, goal):
        return jnp.concatenate([bits.astype(F32), goal.astype(F32)],
                               axis=-1)

    def reset(seeds):
        key = jax.random.PRNGKey(jnp.asarray(seeds).sum().astype(jnp.int32))
        key, bits, goal = _new(key)
        st = BitFlipState(bits=bits, goal=goal,
                          t=jnp.zeros(num_envs, I32), key=key)
        return st, obs_of(bits, goal)

    def step(state, actions, auto_reset=True):
        onehot = jax.nn.one_hot(actions, n_bits, dtype=jnp.bool_)
        # once solved, freeze (self-loop) so stored episodes stay coherent
        already = jnp.all(state.bits == state.goal, axis=-1)
        bits = jnp.where(already[:, None], state.bits, state.bits ^ onehot)
        solved = jnp.all(bits == state.goal, axis=-1)
        reward = jnp.where(solved, 0.0, -1.0)
        t = state.t + 1
        done = solved | (t >= n_bits)
        if auto_reset:
            key, nb, ng = _new(state.key)
            new_bits = jnp.where(done[:, None], nb, bits)
            new_goal = jnp.where(done[:, None], ng, state.goal)
            t = jnp.where(done, 0, t)
        else:
            key, new_bits, new_goal = state.key, bits, state.goal
        st = BitFlipState(bits=new_bits, goal=new_goal, t=t, key=key)
        info = {"achieved": bits, "solved": solved}
        return st, obs_of(new_bits, new_goal), reward, done, info

    return reset, step, n_bits


# ---------------------------------------------------------------------------
# Goal-conditioned DQN with hindsight relabeling
# ---------------------------------------------------------------------------

class GoalQNet(nn.Module):
    n_actions: int
    hidden: int = 256

    @nn.compact
    def __call__(self, obs):
        x = obs.astype(F32)
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(self.n_actions)(x)


@struct.dataclass
class HERReplay:
    """Episode-structured buffer: [cap, T, N, ...]."""
    bits: jnp.ndarray      # bool[cap, T+1, N, n]
    goals: jnp.ndarray     # bool[cap, N, n]
    actions: jnp.ndarray   # i32[cap, T, N]
    cursor: jnp.ndarray
    size: jnp.ndarray


@struct.dataclass
class HERState:
    params: Any
    target_params: Any
    opt_state: Any
    env_state: Any
    replay: HERReplay
    key: jnp.ndarray
    t: jnp.ndarray


def make_her(num_envs=16, n_bits=8, *, lr=1e-3, gamma=0.98,
             buffer_eps=256, batch_size=128, eps_greedy=0.2,
             replay_k=4, target_update=40):
    reset_env, step_env, _ = make_bitflip_env(num_envs, n_bits)
    qnet = GoalQNet(n_actions=n_bits)
    tx = optax.adam(lr)
    T = n_bits

    def init_fn(seed=0):
        key = jax.random.PRNGKey(seed)
        key, pkey = jax.random.split(key)
        params = qnet.init(pkey, jnp.zeros((1, 2 * n_bits), F32))
        env_state, _ = reset_env(jnp.arange(num_envs, dtype=jnp.uint32)
                                 + jnp.uint32(seed))
        replay = HERReplay(
            bits=jnp.zeros((buffer_eps, T + 1, num_envs, n_bits),
                           jnp.bool_),
            goals=jnp.zeros((buffer_eps, num_envs, n_bits), jnp.bool_),
            actions=jnp.zeros((buffer_eps, T, num_envs), I32),
            cursor=jnp.asarray(0, I32),
            size=jnp.asarray(0, I32))
        st = HERState(params=params,
                      target_params=jax.tree_util.tree_map(jnp.array,
                                                           params),
                      opt_state=tx.init(params), env_state=env_state,
                      replay=replay, key=key, t=jnp.asarray(0, I32))
        return jax.tree_util.tree_map(jnp.array, st)

    def obs_of(bits, goal):
        return jnp.concatenate([bits.astype(F32), goal.astype(F32)], -1)

    def cycle(state: HERState):
        """Collect one full episode batch + K sgd steps with hindsight."""
        # force-synchronized episodes: reset all envs
        key, ekey = jax.random.split(state.key)
        env_state, _ = reset_env(
            jax.random.randint(ekey, (num_envs,), 0, 2**31 - 1)
            .astype(jnp.uint32))
        goal0 = env_state.goal

        def rollout_body(carry, _):
            env_state, key = carry
            key, akey, rkey = jax.random.split(key, 3)
            obs = obs_of(env_state.bits, env_state.goal)
            q = qnet.apply(state.params, obs)
            greedy = jnp.argmax(q, axis=-1)
            rand = jax.random.randint(rkey, (num_envs,), 0, n_bits)
            explore = jax.random.uniform(akey, (num_envs,)) < eps_greedy
            actions = jnp.where(explore, rand, greedy).astype(I32)
            bits_before = env_state.bits
            env_state, _, reward, done, info = step_env(
                env_state, actions, auto_reset=False)
            return (env_state, key), (bits_before, actions)

        (env_state, key), (bits_seq, act_seq) = jax.lax.scan(
            rollout_body, (env_state, key), None, length=T)
        # achieved states after each action: shift bits by one
        bits_all = jnp.concatenate(
            [bits_seq, env_state.bits[None]], axis=0)      # [T+1, N, n]

        rb = state.replay
        cap = rb.bits.shape[0]
        cur = rb.cursor
        rb = rb.replace(
            bits=rb.bits.at[cur].set(bits_all),
            goals=rb.goals.at[cur].set(goal0),
            actions=rb.actions.at[cur].set(act_seq),
            cursor=(cur + 1) % cap,
            size=jnp.minimum(rb.size + 1, cap))

        # --- sample + hindsight relabel + sgd ----------------------------
        key, k1, k2, k3, k4, k5 = jax.random.split(key, 6)
        ep = jax.random.randint(k1, (batch_size,), 0,
                                jnp.maximum(rb.size, 1))
        tt = jax.random.randint(k2, (batch_size,), 0, T)
        en = jax.random.randint(k3, (batch_size,), 0, num_envs)

        s = rb.bits[ep, tt, en]                            # [B, n]
        s_next = rb.bits[ep, tt + 1, en]
        a = rb.actions[ep, tt, en]
        g = rb.goals[ep, en]
        # future strategy: with prob k/(k+1) use an achieved future state
        fut = tt + 1 + jax.random.randint(k4, (batch_size,), 0,
                                          jnp.maximum(T - tt, 1))
        fut = jnp.clip(fut, 0, T)
        g_fut = rb.bits[ep, fut, en]
        use_her = jax.random.uniform(k5, (batch_size,)) \
            < replay_k / (replay_k + 1)
        goal = jnp.where(use_her[:, None], g_fut, g)

        solved_next = jnp.all(s_next == goal, axis=-1)
        r = jnp.where(solved_next, 0.0, -1.0)
        done = solved_next

        def loss_fn(params):
            q = qnet.apply(params, obs_of(s, goal))
            q_a = jnp.take_along_axis(q, a[:, None], axis=-1)[:, 0]
            qn = qnet.apply(state.target_params, obs_of(s_next, goal))
            target = r + gamma * (1 - done.astype(F32)) * jnp.max(qn, -1)
            # clip target to the feasible return range [-T, 0]
            target = jnp.clip(target, -float(T), 0.0)
            return jnp.mean(jnp.square(q_a - jax.lax.stop_gradient(target)))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        t = state.t + 1
        sync = (t % target_update) == 0
        target_params = jax.tree_util.tree_map(
            lambda p, tp: jnp.where(sync, p, tp), params,
            state.target_params)

        # success metric: did the episode reach its original goal?
        success = jnp.mean(
            jnp.any(jnp.all(bits_all == goal0[None], axis=-1), axis=0)
            .astype(F32))
        return HERState(params=params, target_params=target_params,
                        opt_state=opt_state, env_state=env_state,
                        replay=rb, key=key, t=t), \
            dict(loss=loss, success_rate=success)

    return init_fn, cycle, qnet


# ---------------------------------------------------------------------------
# Continuous vector goal env: point-mass reacher
# ---------------------------------------------------------------------------

@struct.dataclass
class PointGoalState:
    pos: jnp.ndarray     # f32[N, d]
    goal: jnp.ndarray    # f32[N, d]
    t: jnp.ndarray       # i32[N]
    key: jnp.ndarray


def make_point_goal_env(num_envs: int, dim: int = 2, episode_len: int = 20,
                        eps: float = 0.1, max_step: float = 0.2):
    """Sparse-reward reacher in [-1, 1]^dim: action = clipped velocity,
    reward 0 within eps of the goal else -1 (the Fetch-env reward shape,
    reference her/experiment/config.py simple_goal_subtract + sparse)."""

    def _new(key):
        key, k1, k2 = jax.random.split(key, 3)
        pos = jax.random.uniform(k1, (num_envs, dim), F32, -1.0, 1.0)
        goal = jax.random.uniform(k2, (num_envs, dim), F32, -1.0, 1.0)
        return key, pos, goal

    def reset(seeds):
        key = jax.random.PRNGKey(jnp.asarray(seeds).sum().astype(jnp.int32))
        key, pos, goal = _new(key)
        return PointGoalState(pos=pos, goal=goal,
                              t=jnp.zeros(num_envs, I32), key=key)

    def is_success(pos, goal):
        return jnp.linalg.norm(pos - goal, axis=-1) < eps

    def step(state: PointGoalState, actions):
        """actions f32[N, dim] in [-1, 1]; episodes are fixed length (the
        Fetch convention: no early termination, only the time horizon)."""
        vel = jnp.clip(actions, -1.0, 1.0) * max_step
        pos = jnp.clip(state.pos + vel, -1.0, 1.0)
        reward = jnp.where(is_success(pos, state.goal), 0.0, -1.0)
        t = state.t + 1
        done = t >= episode_len
        st = state.replace(pos=pos, t=t)
        return st, reward, done

    return reset, step, is_success, episode_len


# ---------------------------------------------------------------------------
# Goal-conditioned DDPG (the reference her/ddpg.py stack)
# ---------------------------------------------------------------------------

class GoalActor(nn.Module):
    action_dim: int
    hidden: int = 256

    @nn.compact
    def __call__(self, og):
        x = og
        for _ in range(3):
            x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.tanh(nn.Dense(self.action_dim)(x))


class GoalCritic(nn.Module):
    hidden: int = 256

    @nn.compact
    def __call__(self, og, action):
        x = jnp.concatenate([og, action], axis=-1)
        for _ in range(3):
            x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(1)(x)[..., 0]


@struct.dataclass
class HERDDPGReplay:
    """Episode-structured buffer (reference her/replay_buffer.py layout
    {key: [size, T(+1), dim]}, here with the env batch axis kept)."""
    o: jnp.ndarray        # f32[cap, T+1, N, d_obs]
    ag: jnp.ndarray       # f32[cap, T+1, N, d_goal]
    g: jnp.ndarray        # f32[cap, N, d_goal]
    u: jnp.ndarray        # f32[cap, T, N, d_act]
    cursor: jnp.ndarray
    size: jnp.ndarray


@struct.dataclass
class HERDDPGState:
    actor: Any
    critic: Any
    target_actor: Any
    target_critic: Any
    opt_actor: Any
    opt_critic: Any
    o_stats: Any          # ObFilter over observations (normalizer.py)
    g_stats: Any          # ObFilter over goals
    replay: HERDDPGReplay
    key: jnp.ndarray
    t: jnp.ndarray


def make_her_ddpg(num_envs=16, dim=2, *, episode_len=20,
                  replay_strategy="future", replay_k=4, buffer_eps=128,
                  batch_size=256, n_batches=4, q_lr=1e-3, pi_lr=1e-3,
                  polyak=0.95, action_l2=1.0, noise_eps=0.2,
                  random_eps=0.3, gamma=None, goal_eps=0.1):
    """Build (init_fn, cycle_fn) for goal-conditioned DDPG with HER.

    replay_strategy: 'future' relabels with achieved future goals;
    'none' disables relabeling (plain DDPG — the reference her.py:16-18
    ablation switch). Defaults follow her/experiment/config.py
    (replay_k=4, polyak=0.95, action_l2=1.0, noise_eps=0.2,
    random_eps=0.3, gamma=1-1/T).
    """
    from toybox_tpu.rl.ppo1 import ObFilter

    reset_env, step_env, is_success, T = make_point_goal_env(
        num_envs, dim, episode_len, eps=goal_eps)
    if gamma is None:
        gamma = 1.0 - 1.0 / T
    clip_return = 1.0 / (1.0 - gamma)
    future_p = (replay_k / (replay_k + 1.0)
                if replay_strategy == "future" else 0.0)

    actor_net = GoalActor(action_dim=dim)
    critic_net = GoalCritic()
    tx_a = optax.adam(pi_lr)
    tx_c = optax.adam(q_lr)

    def _norm_og(o_stats, g_stats, o, g):
        return jnp.concatenate([o_stats.normalize(o), g_stats.normalize(g)],
                               axis=-1)

    def init_fn(seed=0):
        key = jax.random.PRNGKey(seed)
        key, ka, kc = jax.random.split(key, 3)
        og0 = jnp.zeros((1, 2 * dim), F32)
        a_params = actor_net.init(ka, og0)
        c_params = critic_net.init(kc, og0, jnp.zeros((1, dim), F32))
        replay = HERDDPGReplay(
            o=jnp.zeros((buffer_eps, T + 1, num_envs, dim), F32),
            ag=jnp.zeros((buffer_eps, T + 1, num_envs, dim), F32),
            g=jnp.zeros((buffer_eps, num_envs, dim), F32),
            u=jnp.zeros((buffer_eps, T, num_envs, dim), F32),
            cursor=jnp.asarray(0, I32), size=jnp.asarray(0, I32))
        st = HERDDPGState(
            actor=a_params, critic=c_params,
            target_actor=jax.tree_util.tree_map(jnp.array, a_params),
            target_critic=jax.tree_util.tree_map(jnp.array, c_params),
            opt_actor=tx_a.init(a_params), opt_critic=tx_c.init(c_params),
            o_stats=ObFilter.create((dim,)), g_stats=ObFilter.create((dim,)),
            replay=replay, key=key, t=jnp.asarray(0, I32))
        return jax.tree_util.tree_map(jnp.array, st)

    def cycle(state: HERDDPGState):
        """One reference 'cycle': a full episode batch rollout with
        exploration, normalizer update, then n_batches SGD steps with
        hindsight relabeling and polyak target sync."""
        key, ekey = jax.random.split(state.key)
        env_state = reset_env(
            jax.random.randint(ekey, (num_envs,), 0, 2**31 - 1)
            .astype(jnp.uint32))
        g = env_state.goal

        def rollout_body(carry, _):
            env_state, key = carry
            key, kn, kr, ku = jax.random.split(key, 4)
            og = _norm_og(state.o_stats, state.g_stats,
                          env_state.pos, env_state.goal)
            pi = actor_net.apply(state.actor, og)
            # gaussian noise + epsilon-random actions (rollout.py:60-70)
            noisy = pi + noise_eps * jax.random.normal(kn, pi.shape)
            rand_u = jax.random.uniform(ku, pi.shape, F32, -1.0, 1.0)
            take_rand = (jax.random.uniform(kr, (num_envs, 1))
                         < random_eps)
            u = jnp.clip(jnp.where(take_rand, rand_u, noisy), -1.0, 1.0)
            o_before = env_state.pos
            env_state, reward, done = step_env(env_state, u)
            return (env_state, key), (o_before, u)

        (env_state, key), (o_seq, u_seq) = jax.lax.scan(
            rollout_body, (env_state, key), None, length=T)
        o_all = jnp.concatenate([o_seq, env_state.pos[None]], axis=0)
        ag_all = o_all  # achieved goal == position for the point env

        rb = state.replay
        cap = rb.o.shape[0]
        cur = rb.cursor
        rb = rb.replace(
            o=rb.o.at[cur].set(o_all), ag=rb.ag.at[cur].set(ag_all),
            g=rb.g.at[cur].set(g), u=rb.u.at[cur].set(u_seq),
            cursor=(cur + 1) % cap, size=jnp.minimum(rb.size + 1, cap))

        # normalizer update from the fresh episode (ddpg.store_episode)
        o_stats = state.o_stats.update(o_all.reshape(-1, dim))
        g_stats = state.g_stats.update(g.reshape(-1, dim))

        def sgd_body(carry, bkey):
            actor, critic, t_actor, t_critic, opt_a, opt_c = carry
            k1, k2, k3, k4, k5 = jax.random.split(bkey, 5)
            ep = jax.random.randint(k1, (batch_size,), 0,
                                    jnp.maximum(rb.size, 1))
            tt = jax.random.randint(k2, (batch_size,), 0, T)
            en = jax.random.randint(k3, (batch_size,), 0, num_envs)
            o = rb.o[ep, tt, en]
            o2 = rb.o[ep, tt + 1, en]
            u = rb.u[ep, tt, en]
            goal = rb.g[ep, en]
            # future-strategy relabeling (her.py:33-45)
            fut = tt + 1 + jax.random.randint(k4, (batch_size,), 0,
                                              jnp.maximum(T - tt, 1))
            g_fut = rb.ag[ep, jnp.clip(fut, 0, T), en]
            use_her = jax.random.uniform(k5, (batch_size,)) < future_p
            goal = jnp.where(use_her[:, None], g_fut, goal)
            # recompute reward under the substituted goal
            r = jnp.where(is_success(o2, goal), 0.0, -1.0)

            og = _norm_og(o_stats, g_stats, o, goal)
            og2 = _norm_og(o_stats, g_stats, o2, goal)

            def critic_loss(c_params):
                q = critic_net.apply(c_params, og, u)
                pi2 = actor_net.apply(t_actor, og2)
                q2 = critic_net.apply(t_critic, og2, pi2)
                target = r + gamma * q2
                # feasible-return clipping (ddpg.py _create_network)
                target = jnp.clip(target, -clip_return, 0.0)
                return jnp.mean(jnp.square(
                    q - jax.lax.stop_gradient(target)))

            def actor_loss(a_params):
                pi = actor_net.apply(a_params, og)
                q = critic_net.apply(critic, og, pi)
                return -jnp.mean(q) + action_l2 * jnp.mean(jnp.square(pi))

            closs, cgrads = jax.value_and_grad(critic_loss)(critic)
            cupd, opt_c = tx_c.update(cgrads, opt_c, critic)
            critic = optax.apply_updates(critic, cupd)
            aloss, agrads = jax.value_and_grad(actor_loss)(actor)
            aupd, opt_a = tx_a.update(agrads, opt_a, actor)
            actor = optax.apply_updates(actor, aupd)
            # polyak-averaged target nets (ddpg.py update_target_net)
            t_actor = jax.tree_util.tree_map(
                lambda t, p: polyak * t + (1 - polyak) * p, t_actor, actor)
            t_critic = jax.tree_util.tree_map(
                lambda t, p: polyak * t + (1 - polyak) * p, t_critic,
                critic)
            return (actor, critic, t_actor, t_critic, opt_a, opt_c), \
                (closs, aloss)

        key, *bkeys = jax.random.split(key, n_batches + 1)
        carry = (state.actor, state.critic, state.target_actor,
                 state.target_critic, state.opt_actor, state.opt_critic)
        carry, (closs, aloss) = jax.lax.scan(sgd_body, carry,
                                             jnp.stack(bkeys))
        actor, critic, t_actor, t_critic, opt_a, opt_c = carry

        # success rate: episode final-step success (rollout.py:104-109)
        success = jnp.mean(is_success(env_state.pos, g).astype(F32))
        return HERDDPGState(
            actor=actor, critic=critic, target_actor=t_actor,
            target_critic=t_critic, opt_actor=opt_a, opt_critic=opt_c,
            o_stats=o_stats, g_stats=g_stats, replay=rb, key=key,
            t=state.t + 1), dict(critic_loss=jnp.mean(closs),
                                 actor_loss=jnp.mean(aloss),
                                 success_rate=success)

    return init_fn, cycle


def learn(*, n_bits=8, num_envs=16, total_episodes=2000, seed=0, lr=1e-3,
          gamma=0.98, replay_k=4, log_interval=100, logger=None,
          backend="ddpg", dim=2, episode_len=20, **_ignored):
    """backend='ddpg' runs the reference-parity goal-conditioned DDPG on
    the point goal env; backend='dqn' runs bit-flip goal DQN."""
    if backend == "ddpg":
        init_fn, cycle = make_her_ddpg(num_envs, dim,
                                       episode_len=episode_len,
                                       replay_k=replay_k)
    else:
        init_fn, cycle, _ = make_her(num_envs, n_bits, lr=lr, gamma=gamma,
                                     replay_k=replay_k)
    state = init_fn(seed)
    cycle_jit = jax.jit(cycle, donate_argnums=(0,))
    for i in range(1, max(total_episodes // num_envs, 1) + 1):
        state, metrics = cycle_jit(state)
        if logger is not None and i % log_interval == 0:
            for k, v in jax.device_get(metrics).items():
                logger.logkv(k, float(v))
            logger.dumpkvs()
    jax.block_until_ready(state.actor if hasattr(state, "actor")
                          else state.params)
    return state
