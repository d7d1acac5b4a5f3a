"""DDPG — deep deterministic policy gradient (continuous actions).

Semantics from the reference's baselines/ddpg (actor-critic with target
networks, polyak averaging tau=0.01, Gaussian action noise, device replay;
defaults actor_lr 1e-4, critic_lr 1e-3, gamma 0.99, batch 64). The
reference's MPI-parallel workers and mpi_adam collapse into the sharded
batch under jit. Used with Box action spaces (e.g. the BoxIdentityEnv
fixture — toybox games are discrete; DDPG is part of the capability
surface like the reference's Mujoco support).
"""

from __future__ import annotations

import time
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

F32 = jnp.float32
I32 = jnp.int32


class Actor(nn.Module):
    action_dim: int
    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, obs):
        x = obs.astype(F32)
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        return nn.tanh(nn.Dense(self.action_dim)(x))


class Critic(nn.Module):
    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs.astype(F32), action.astype(F32)], axis=-1)
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        return nn.Dense(1)(x)[..., 0]


@struct.dataclass
class DDPGReplay:
    obs: jnp.ndarray
    next_obs: jnp.ndarray
    actions: jnp.ndarray
    rewards: jnp.ndarray
    dones: jnp.ndarray
    cursor: jnp.ndarray
    size: jnp.ndarray


@struct.dataclass
class DDPGState:
    actor: Any
    critic: Any
    target_actor: Any
    target_critic: Any
    actor_opt: Any
    critic_opt: Any
    env_state: Any
    replay: DDPGReplay
    key: jnp.ndarray
    t: jnp.ndarray


def make_ddpg(env_fns, action_dim, *, actor_lr=1e-4, critic_lr=1e-3,
              gamma=0.99, tau=0.01, buffer_size=100_000, batch_size=64,
              noise_scale=0.1, learning_starts=256):
    num_envs = env_fns.num_envs
    obs_shape = tuple(env_fns.obs_shape)
    actor_mod = Actor(action_dim=action_dim)
    critic_mod = Critic()
    a_tx = optax.adam(actor_lr)
    c_tx = optax.adam(critic_lr)

    def init_fn(seed=0):
        key = jax.random.PRNGKey(seed)
        key, k1, k2, ekey = jax.random.split(key, 4)
        dummy_o = jnp.zeros((1,) + obs_shape, F32)
        dummy_a = jnp.zeros((1, action_dim), F32)
        actor = actor_mod.init(k1, dummy_o)
        critic = critic_mod.init(k2, dummy_o, dummy_a)
        seeds = (jax.random.randint(ekey, (num_envs,), 0, 2**31 - 1)
                 .astype(jnp.uint32))
        env_state, _ = env_fns.reset(seeds)
        cp = jax.tree_util.tree_map(jnp.array, actor)
        cq = jax.tree_util.tree_map(jnp.array, critic)
        replay = DDPGReplay(
            obs=jnp.zeros((buffer_size,) + obs_shape, F32),
            next_obs=jnp.zeros((buffer_size,) + obs_shape, F32),
            actions=jnp.zeros((buffer_size, action_dim), F32),
            rewards=jnp.zeros(buffer_size, F32),
            dones=jnp.zeros(buffer_size, jnp.bool_),
            cursor=jnp.asarray(0, I32),
            size=jnp.asarray(0, I32))
        st = DDPGState(actor=actor, critic=critic, target_actor=cp,
                       target_critic=cq, actor_opt=a_tx.init(actor),
                       critic_opt=c_tx.init(critic), env_state=env_state,
                       replay=replay, key=key, t=jnp.asarray(0, I32))
        return jax.tree_util.tree_map(jnp.array, st)

    def cycle(state: DDPGState):
        key, nkey, skey = jax.random.split(state.key, 3)
        obs = state.env_state.frames
        actions = actor_mod.apply(state.actor, obs)
        actions = jnp.clip(
            actions + noise_scale * jax.random.normal(nkey, actions.shape),
            -1.0, 1.0)
        env_state, next_obs, rewards, dones, _ = env_fns.step(
            state.env_state, actions)

        # insert batch into the ring
        rb = state.replay
        cap = rb.obs.shape[0]
        idx = (rb.cursor + jnp.arange(num_envs)) % cap
        rb = rb.replace(
            obs=rb.obs.at[idx].set(obs.astype(F32)),
            next_obs=rb.next_obs.at[idx].set(next_obs.astype(F32)),
            actions=rb.actions.at[idx].set(actions),
            rewards=rb.rewards.at[idx].set(rewards),
            dones=rb.dones.at[idx].set(dones),
            cursor=(rb.cursor + num_envs) % cap,
            size=jnp.minimum(rb.size + num_envs, cap))

        # sample
        bidx = jax.random.randint(skey, (batch_size,), 0,
                                  jnp.maximum(rb.size, 1))
        bo, bno = rb.obs[bidx], rb.next_obs[bidx]
        ba, br, bd = rb.actions[bidx], rb.rewards[bidx], rb.dones[bidx]

        # critic update (TD target from target nets)
        next_a = actor_mod.apply(state.target_actor, bno)
        target_q = critic_mod.apply(state.target_critic, bno, next_a)
        y = br + gamma * (1.0 - bd.astype(F32)) * target_q

        def critic_loss(params):
            q = critic_mod.apply(params, bo, ba)
            return jnp.mean(jnp.square(q - jax.lax.stop_gradient(y)))

        closs, cgrads = jax.value_and_grad(critic_loss)(state.critic)
        cupd, critic_opt = c_tx.update(cgrads, state.critic_opt,
                                       state.critic)
        critic = optax.apply_updates(state.critic, cupd)

        # actor update (deterministic policy gradient)
        def actor_loss(params):
            a = actor_mod.apply(params, bo)
            return -jnp.mean(critic_mod.apply(critic, bo, a))

        aloss, agrads = jax.value_and_grad(actor_loss)(state.actor)
        warm = state.t >= learning_starts
        aupd, actor_opt = a_tx.update(agrads, state.actor_opt, state.actor)
        aupd = jax.tree_util.tree_map(
            lambda u: jnp.where(warm, u, jnp.zeros_like(u)), aupd)
        actor = optax.apply_updates(state.actor, aupd)

        # polyak target updates
        polyak = lambda t, p: jax.tree_util.tree_map(
            lambda a, b: (1 - tau) * a + tau * b, t, p)
        target_actor = polyak(state.target_actor, actor)
        target_critic = polyak(state.target_critic, critic)

        metrics = dict(critic_loss=closs, actor_loss=aloss,
                       mean_reward=jnp.mean(rewards))
        return DDPGState(actor=actor, critic=critic,
                         target_actor=target_actor,
                         target_critic=target_critic,
                         actor_opt=actor_opt, critic_opt=critic_opt,
                         env_state=env_state, replay=rb, key=key,
                         t=state.t + num_envs), metrics

    return init_fn, cycle, actor_mod


def learn(*, env, action_dim, total_timesteps=10_000, seed=0,
          actor_lr=1e-4, critic_lr=1e-3, gamma=0.99, tau=0.01,
          buffer_size=100_000, batch_size=64, noise_scale=0.1,
          log_interval=100, logger=None, **_ignored):
    init_fn, cycle, _ = make_ddpg(
        env, action_dim, actor_lr=actor_lr, critic_lr=critic_lr,
        gamma=gamma, tau=tau, buffer_size=buffer_size,
        batch_size=batch_size, noise_scale=noise_scale)
    state = init_fn(seed)
    cycle_jit = jax.jit(cycle, donate_argnums=(0,))
    ncycles = max(int(total_timesteps) // env.num_envs, 1)
    t0 = time.perf_counter()
    for i in range(1, ncycles + 1):
        state, metrics = cycle_jit(state)
        if logger is not None and i % log_interval == 0:
            m = jax.device_get(metrics)
            logger.logkv("steps", i * env.num_envs)
            for k, v in m.items():
                logger.logkv(k, float(v))
            logger.dumpkvs()
    jax.block_until_ready(state.actor)
    return state
