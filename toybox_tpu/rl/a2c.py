"""A2C — synchronous advantage actor-critic (reference baselines/a2c/a2c.py).

One jitted update: nsteps rollout, n-step discounted returns bootstrapped
from the value head (a2c/runner.py), single RMSProp gradient step on
pg_loss - ent_coef*entropy + vf_coef*value_loss with the reference
defaults (lr 7e-4, nsteps 5, gamma .99, ent .01, vf .5, RMSProp alpha .99
eps 1e-5, grad clip .5).
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from toybox_tpu.envs.pipeline import make_rl_env
from toybox_tpu.rl.policies import build_policy, pd_from_logits
from toybox_tpu.rl.ppo import load_params, save_params
from toybox_tpu.utils.checkpoint import Checkpointer

F32 = jnp.float32


@struct.dataclass
class A2CState:
    params: Any
    opt_state: Any
    env_state: Any
    key: jnp.ndarray
    update: jnp.ndarray


def make_a2c(env_fns, *, network="cnn", lr=7e-4, nsteps=5, gamma=0.99,
             ent_coef=0.01, vf_coef=0.5, max_grad_norm=0.5,
             alpha=0.99, epsilon=1e-5, total_updates=1,
             network_kwargs=None):
    num_envs = env_fns.num_envs
    module, p_init, p_step, p_value = build_policy(
        env_fns.obs_shape, env_fns.num_actions, network,
        **(network_kwargs or {}))

    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.scale_by_rms(decay=alpha, eps=epsilon),
        optax.scale(-1.0),
    )

    def init_fn(seed=0):
        key = jax.random.PRNGKey(seed)
        key, pkey, ekey = jax.random.split(key, 3)
        params = p_init(pkey)
        seeds = (jax.random.randint(ekey, (num_envs,), 0, 2**31 - 1)
                 .astype(jnp.uint32))
        env_state, _ = env_fns.reset(seeds)
        st = A2CState(params=params, opt_state=tx.init(params),
                      env_state=env_state, key=key,
                      update=jnp.asarray(0, jnp.int32))
        return jax.tree_util.tree_map(jnp.array, st)

    def train_step(state: A2CState):
        frac = jnp.maximum(
            1.0 - state.update.astype(F32) / max(total_updates, 1), 0.01)
        lrnow = lr * frac

        def body(carry, _):
            env_state, key = carry
            obs = env_state.frames
            key, akey = jax.random.split(key)
            actions, values, _, _ = p_step(state.params, obs, akey)
            env_state, _, rewards, dones, info = env_fns.step(env_state,
                                                              actions)
            return (env_state, key), (obs, actions, rewards, dones,
                                      info["episode_return"])

        (env_state, key), (obs, actions, rewards, dones, ep_ret) = \
            jax.lax.scan(body, (state.env_state, state.key), None,
                         length=nsteps)

        last_value = p_value(state.params, env_state.frames)

        def disc(next_ret, t):
            r, d = t
            ret = r + gamma * next_ret * (1.0 - d.astype(F32))
            return ret, ret

        _, returns = jax.lax.scan(disc, last_value, (rewards, dones),
                                  reverse=True)

        def fl(x):
            return x.reshape((nsteps * num_envs,) + x.shape[2:])

        def loss_fn(params):
            logits, vpred = module.apply(params, fl(obs))
            pd = pd_from_logits(env_fns.num_actions, logits)
            neglogp = pd.neglogp(fl(actions))
            adv = fl(returns) - vpred
            pg_loss = jnp.mean(jax.lax.stop_gradient(adv) * neglogp)
            vf_loss = 0.5 * jnp.mean(jnp.square(vpred - fl(returns)))
            entropy = jnp.mean(pd.entropy())
            loss = pg_loss - entropy * ent_coef + vf_loss * vf_coef
            return loss, dict(policy_loss=pg_loss, value_loss=vf_loss,
                              policy_entropy=entropy)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u: u * lrnow, updates)
        params = optax.apply_updates(state.params, updates)

        done_eps = ~jnp.isnan(ep_ret)
        n_eps = jnp.sum(done_eps.astype(F32))
        metrics["eprewmean"] = jnp.where(
            n_eps > 0, jnp.nansum(jnp.where(done_eps, ep_ret, 0.0)) / n_eps,
            jnp.nan)
        metrics["episodes"] = n_eps
        metrics["mean_reward"] = jnp.mean(rewards)
        return A2CState(params=params, opt_state=opt_state,
                        env_state=env_state, key=key,
                        update=state.update + 1), metrics

    return init_fn, train_step


@struct.dataclass
class RecurrentA2CState:
    params: Any
    opt_state: Any
    env_state: Any
    carry: Any              # live LSTM carry (tuple of [N, nlstm])
    prev_done: jnp.ndarray  # bool[N]
    key: jnp.ndarray
    update: jnp.ndarray


def make_recurrent_a2c(env_fns, *, network="cnn_lstm", nlstm=128, lr=7e-4,
                       nsteps=5, gamma=0.99, ent_coef=0.01, vf_coef=0.5,
                       max_grad_norm=0.5, alpha=0.99, epsilon=1e-5,
                       total_updates=1, network_kwargs=None):
    """A2C with an lstm/cnn_lstm/cnn_lnlstm policy: the carry rides the
    rollout scan and the (single) gradient step re-runs the network over
    the time axis from the rollout's initial carry with recorded done
    flags — the reference's recurrent build_policy scheme
    (common/models.py:79-160, a2c uses it through common/policies.py)."""
    from toybox_tpu.rl.distributions import CategoricalPd
    from toybox_tpu.rl.models import LSTMTrunk, get_network_builder
    from toybox_tpu.rl.ppo_recurrent import RecurrentPolicyWithValue

    num_envs = env_fns.num_envs
    trunk = get_network_builder(network)(nlstm=nlstm,
                                         **(network_kwargs or {}))
    assert isinstance(trunk, LSTMTrunk), f"{network} is not recurrent"
    module = RecurrentPolicyWithValue(trunk=trunk,
                                      n_actions=env_fns.num_actions)

    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.scale_by_rms(decay=alpha, eps=epsilon),
        optax.scale(-1.0),
    )

    def init_fn(seed=0):
        key = jax.random.PRNGKey(seed)
        key, pkey, ekey = jax.random.split(key, 3)
        seeds = (jax.random.randint(ekey, (num_envs,), 0, 2**31 - 1)
                 .astype(jnp.uint32))
        env_state, obs = env_fns.reset(seeds)
        carry = LSTMTrunk.initial_carry(num_envs, nlstm)
        params = module.init(pkey, obs, carry, jnp.zeros(num_envs, bool))
        st = RecurrentA2CState(
            params=params, opt_state=tx.init(params), env_state=env_state,
            carry=carry, prev_done=jnp.zeros(num_envs, bool), key=key,
            update=jnp.asarray(0, jnp.int32))
        return jax.tree_util.tree_map(jnp.array, st)

    def train_step(state: RecurrentA2CState):
        frac = jnp.maximum(
            1.0 - state.update.astype(F32) / max(total_updates, 1), 0.01)
        lrnow = lr * frac
        carry0, done0 = state.carry, state.prev_done

        def body(c, _):
            env_state, carry, prev_done, key = c
            obs = env_state.frames
            key, akey = jax.random.split(key)
            logits, _, new_carry = module.apply(state.params, obs, carry,
                                                prev_done)
            actions = CategoricalPd(logits).sample(akey)
            env_state, _, rewards, dones, info = env_fns.step(
                env_state, actions.astype(jnp.int32))
            out = (obs, actions, rewards, dones, prev_done,
                   info["episode_return"])
            return (env_state, new_carry, dones, key), out

        (env_state, carry, prev_done, key), traj = jax.lax.scan(
            body, (state.env_state, carry0, done0, state.key), None,
            length=nsteps)
        obs, actions, rewards, dones, prev_dones, ep_ret = traj

        _, last_value, _ = module.apply(state.params, env_state.frames,
                                        carry, prev_done)

        def disc(next_ret, t):
            r, d = t
            ret = r + gamma * next_ret * (1.0 - d.astype(F32))
            return ret, ret

        _, returns = jax.lax.scan(disc, last_value, (rewards, dones),
                                  reverse=True)

        def loss_fn(params):
            def scan_net(c, t):
                ob, dn = t
                logits, value, c = module.apply(params, ob, c, dn)
                return c, (logits, value)

            _, (logits, vpred) = jax.lax.scan(scan_net, carry0,
                                              (obs, prev_dones))
            pd = CategoricalPd(logits)
            neglogp = pd.neglogp(actions)
            adv = returns - vpred
            pg_loss = jnp.mean(jax.lax.stop_gradient(adv) * neglogp)
            vf_loss = 0.5 * jnp.mean(jnp.square(vpred - returns))
            entropy = jnp.mean(pd.entropy())
            loss = pg_loss - entropy * ent_coef + vf_loss * vf_coef
            return loss, dict(policy_loss=pg_loss, value_loss=vf_loss,
                              policy_entropy=entropy)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u: u * lrnow, updates)
        params = optax.apply_updates(state.params, updates)

        done_eps = ~jnp.isnan(ep_ret)
        n_eps = jnp.sum(done_eps.astype(F32))
        metrics["eprewmean"] = jnp.where(
            n_eps > 0, jnp.nansum(jnp.where(done_eps, ep_ret, 0.0)) / n_eps,
            jnp.nan)
        metrics["episodes"] = n_eps
        metrics["mean_reward"] = jnp.mean(rewards)
        return RecurrentA2CState(
            params=params, opt_state=opt_state, env_state=env_state,
            carry=carry, prev_done=prev_done, key=key,
            update=state.update + 1), metrics

    return init_fn, train_step


def learn(*, env=None, game="breakout", num_envs=16, total_timesteps=10_000,
          seed=0, network="cnn", nsteps=5, gamma=0.99, ent_coef=0.01,
          vf_coef=0.5, lr=7e-4, max_grad_norm=0.5, log_interval=100,
          save_path=None, load_path=None, logger=None, network_kwargs=None,
          checkpoint_path=None, checkpoint_freq=500, updates_per_jit=1,
          nlstm=128, **_ignored):
    from toybox_tpu.rl.policies import RECURRENT_NETWORKS

    env_fns = env if env is not None else make_rl_env(game, num_envs)
    nbatch = env_fns.num_envs * nsteps
    fpstep = getattr(env_fns, "frames_per_step", 1)  # actual frameskip
    total_updates = max(int(total_timesteps) // (nbatch * fpstep), 1)

    recurrent = network in RECURRENT_NETWORKS
    maker = make_recurrent_a2c if recurrent else make_a2c
    extra_kw = {"nlstm": nlstm} if recurrent else {}
    init_fn, train_step = maker(
        env_fns, network=network, lr=lr, nsteps=nsteps, gamma=gamma,
        ent_coef=ent_coef, vf_coef=vf_coef, max_grad_norm=max_grad_norm,
        total_updates=total_updates, network_kwargs=network_kwargs,
        **extra_kw)

    state = init_fn(seed)
    if load_path is not None:
        state = state.replace(params=load_params(load_path, state.params))

    ckpt = Checkpointer(checkpoint_path, checkpoint_freq)
    state = ckpt.restore(state)
    start_update = int(state.update)

    # A2C's classical regime is MANY small-batch updates (the reference
    # runs ~10^5 of them); a per-update host loop over a remote device is
    # dispatch-latency-bound, so scan a block of updates per dispatch.
    upj = max(int(updates_per_jit), 1)

    def step_block(state):
        def body(st, _):
            return train_step(st)

        state, ms = jax.lax.scan(body, state, None, length=upj)
        metrics = jax.tree_util.tree_map(lambda x: x[-1], ms)
        # episode stats aggregate across the whole block, not just its tail
        metrics["eprewmean"] = jnp.nanmean(ms["eprewmean"])
        metrics["episodes"] = jnp.sum(ms["episodes"])
        return state, metrics

    step_jit = jax.jit(step_block, donate_argnums=(0,))
    t0 = time.perf_counter()
    for block_end in range(start_update + upj, total_updates + 1, upj):
        state, metrics = step_jit(state)
        if logger is not None and (block_end // upj) % max(
                log_interval // upj, 1) == 0:
            m = jax.device_get(metrics)
            logger.logkv("nupdates", block_end)
            logger.logkv("total_timesteps", block_end * nbatch * fpstep)
            logger.logkv("fps",
                         int((block_end - start_update) * nbatch * fpstep /
                             (time.perf_counter() - t0)))
            for k, v in m.items():
                logger.logkv(k, float(v))
            logger.dumpkvs()
        ckpt.maybe_save(state, block_end)
    jax.block_until_ready(state.params)
    if save_path is not None:
        save_params(save_path, state.params)
    return state
