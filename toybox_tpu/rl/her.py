"""HER — hindsight experience replay.

Semantics from the reference's baselines/her: goal-conditioned off-policy
learning where stored episodes are relabeled with achieved goals
(the 'future' strategy, replay_k=4). The reference's MPI rollout workers
and normalizers collapse into the batched device env + sharded jit.

The classic demonstration task (bit-flipping) ships as a jax env fixture;
the learner is goal-conditioned DQN (discrete flips), with relabeling done
at sampling time: each sampled transition's goal is replaced, with
probability replay_k/(replay_k+1), by the achieved state at a random
future timestep of the same episode.
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


def learn(*, n_bits=8, num_envs=16, total_episodes=2000, seed=0, lr=1e-3,
          gamma=0.98, replay_k=4, log_interval=100, logger=None,
          **_ignored):
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
    jax.block_until_ready(state.params)
    return state
